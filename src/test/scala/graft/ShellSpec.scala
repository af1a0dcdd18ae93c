package graft

import org.apache.spark.sql.functions._
import graft.sources.Catalog

/** The shell's procedure verbs must run the PRODUCTION prep path over a
  * registered corpus end-to-end: prepare → written + registered table →
  * SQL over the result; signature index → incremental prep against it;
  * the near-dup ladder as a queryable view. This is the interactive
  * client's analog of the reference CLI's job submission — the one verb
  * surface plain SQL can't express. */
class ShellProcedureSpec extends SparkSpec {
  import spark.implicits._

  test("shell prep/index/prep_incr/neardup run end-to-end over a registered corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shell").toString
    Tables.documents(spark, sfDir).write.parquet(s"$dir/documents.parquet")
    val cat = new Catalog(spark, dir)
    cat.registerAll()

    // full prep → registered table with the split assignment
    assert(Shell.execute("prep documents corpus_v1", spark, cat, dir))
    assert(cat.list().contains("corpus_v1"))
    val prepared = spark.table("corpus_v1")
    assert(prepared.count() > 0 && prepared.columns.contains("split"))
    // plain SQL over the registered result — the end-to-end contract
    assert(Shell.execute(
      "SELECT split, count(*) AS n FROM corpus_v1 GROUP BY split", spark, cat, dir))

    // signature index, then an incremental batch prepared against it:
    // the batch is a re-keyed copy of the corpus, so near-everything is
    // a cross-dup — the verb must still complete and register
    assert(Shell.execute("index documents doc_index", spark, cat, dir))
    Tables.documents(spark, sfDir)
      .withColumn("doc_id", $"doc_id" + 1000000L)
      .write.parquet(s"$dir/batch1.parquet")
    cat.registerAll()
    assert(Shell.execute("prep_incr batch1 doc_index corpus_inc", spark, cat, dir))
    assert(spark.table("corpus_inc").columns.contains("split"))

    // the size-routed near-dup ladder as a queryable view
    assert(Shell.execute("neardup documents", spark, cat, dir))
    assert(spark.table("documents_neardups").count() > 0)

    // tokenizer fitting from the shell: learned merge table as a view
    assert(Shell.execute("bpe documents 4", spark, cat, dir))
    assert(spark.table("documents_bpe_merges").count() == 4)

    // CCNet tercile bucketing as a view
    assert(Shell.execute("buckets documents", spark, cat, dir))
    assert(spark.table("documents_buckets")
      .select("bucket").distinct().count() == 3)

    // k-means over a registered embeddings table
    Tables.embeddings(spark, sfDir).write.parquet(s"$dir/emb.parquet")
    cat.registerAll()
    assert(Shell.execute("kmeans emb 4", spark, cat, dir))
    assert(spark.table("emb_kmeans")
      .select("cell_id").distinct().count() <= 4)

    // quantized-IVF ANN over the same table: 10 queries x k rows max
    assert(Shell.execute("ann emb 3", spark, cat, dir))
    val ann = spark.table("emb_ann")
    assert(ann.count() > 0)
    assert(ann.groupBy("query_id").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0) <= 3)

    assert(!Shell.execute("exit", spark, cat, dir))
  }

  test("graph verbs rank and census the trade network from the shell") {
    // read-only verbs over the star-schema dir itself
    val cat = new Catalog(spark, sfDir)
    assert(Shell.execute("pagerank 2", spark, cat, sfDir))
    val pr = spark.table("nation_pagerank")
    assert(pr.count() == 25)
    assert(pr.agg(sum("rank_scaled")).head().getLong(0) <= graft.operators.Graph.Scale)
    assert(Shell.execute("triangles", spark, cat, sfDir))
    assert(Shell.execute("degrees", spark, cat, sfDir))
    assert(Shell.execute("bfs", spark, cat, sfDir))
    assert(Shell.execute("gini", spark, cat, sfDir))
    assert(Shell.execute("audit", spark, cat, sfDir))
    assert(Shell.execute("vacuum", spark, cat, sfDir))
  }

  test("card verbs: analyze/abc/rfm/benford/changepoints run from the shell") {
    val cat = new Catalog(spark, sfDir)
    assert(Shell.execute("analyze lineitem l_orderkey l_returnflag", spark, cat, sfDir))
    assert(Shell.execute("analyze nation", spark, cat, sfDir))
    assert(Shell.execute("abc", spark, cat, sfDir))
    assert(Shell.execute("rfm", spark, cat, sfDir))
    assert(Shell.execute("benford", spark, cat, sfDir))
    assert(Shell.execute("changepoints", spark, cat, sfDir))
  }

  test("round-7c verbs: kcore/jaccard/dbscan/silhouette/chi2/acf/ttl") {
    val cat = new Catalog(spark, sfDir)
    assert(Shell.execute("kcore", spark, cat, sfDir))
    assert(Shell.execute("jaccard", spark, cat, sfDir))
    assert(Shell.execute("dbscan", spark, cat, sfDir))
    assert(Shell.execute("silhouette", spark, cat, sfDir))
    assert(Shell.execute("chi2", spark, cat, sfDir))
    assert(Shell.execute("acf", spark, cat, sfDir))
    assert(Shell.execute("dedup_eval", spark, cat, sfDir))
    assert(Shell.execute("drawdown", spark, cat, sfDir))
    // ttl writes a snapshot — run it against a writable copy
    val dir = java.nio.file.Files.createTempDirectory("graft-shell-ttl").toString
    Tables.orders(spark, sfDir).write.parquet(s"$dir/orders.parquet")
    val wcat = new Catalog(spark, dir)
    wcat.registerAll()
    assert(Shell.execute("ttl orders o_orderdate 883612800000000",
      spark, wcat, dir))
    assert(wcat.snapshotVersions("orders_ttl") == Seq(1))
  }

  test("round-9 verbs: quality/attribution/token_budget/mmr/ttest/anova") {
    val cat = new Catalog(spark, sfDir)
    assert(Shell.execute("quality_model", spark, cat, sfDir))
    assert(Shell.execute("quality_scores", spark, cat, sfDir))
    assert(Shell.execute("attribution 7", spark, cat, sfDir))
    assert(Shell.execute("token_budget 5000", spark, cat, sfDir))
    assert(Shell.execute("mmr 3", spark, cat, sfDir))
    assert(Shell.execute("ttest", spark, cat, sfDir))
    assert(Shell.execute("anova", spark, cat, sfDir))
    assert(Shell.execute("survival", spark, cat, sfDir))
    assert(Shell.execute("mwu", spark, cat, sfDir))
    assert(Shell.execute("mwu click error", spark, cat, sfDir))
    assert(Shell.execute("attribution_multi", spark, cat, sfDir))
    assert(Shell.execute("harmonic", spark, cat, sfDir))
  }

  test("round-12 verbs: phrase / pca run from the shell") {
    val cat = new Catalog(spark, sfDir)
    assert(Shell.execute("phrase data join", spark, cat, sfDir))
    assert(Shell.execute("pca 2", spark, cat, sfDir))
  }

  test("round-13 verbs: hardneg / zonemap run from the shell") {
    val cat = new Catalog(spark, sfDir,
      Some(java.nio.file.Files.createTempDirectory("graft-shell-zm").toString))
    assert(Shell.execute("hardneg 3", spark, cat, sfDir))
    assert(Shell.execute("zonemap 1996-01-01 1996-06-30", spark, cat, sfDir))
  }

  test("publish and explain verbs run from the shell") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shell-pub").toString
    Tables.documents(spark, sfDir).write.parquet(s"$dir/documents.parquet")
    val cat = new Catalog(spark, dir)
    cat.registerAll()
    assert(Shell.execute("publish documents release_v1", spark, cat, dir))
    assert(cat.loadDerived("release_v1/shards").count() > 0)
    assert(Shell.execute("explain SELECT count(*) FROM documents", spark, cat, dir))
    assert(Shell.execute("skew documents doc_id", spark, cat, dir))
    assert(Shell.execute("histogram documents n_chars", spark, cat, dir))
  }
}
