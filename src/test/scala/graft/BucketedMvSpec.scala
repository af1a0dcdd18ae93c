package graft

import org.apache.spark.sql.functions._
import graft.sources.Catalog

/** Hash-bucketed MV state: same merged values as the full-rewrite
  * rungs, O(touched) refresh — untouched buckets' files are never
  * opened or rewritten (mtimes prove it), the intent-file install
  * recovers from any crash point, and the exactly-once batch marker
  * survives the per-bucket swaps. */
class BucketedMvSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat() = new Catalog(spark, sfDir,
    Some(java.nio.file.Files.createTempDirectory("graft-bmv").toString))

  private def dayAgg(df: org.apache.spark.sql.DataFrame) = df
    .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
    .agg(count(lit(1)).as("n_orders"),
      sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_cents"))

  private def stateRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("bucketed agg state equals the full-rewrite rung across splits") {
    val ord = Tables.orders(spark, sfDir)
    val cat = freshCat()
    (0 until 3).foreach { i =>
      cat.refreshAggMv("flat", dayAgg(ord.where(col("o_orderkey") % 3 === i)),
        Seq("day"))
      cat.refreshAggMvBucketed("bucketed",
        dayAgg(ord.where(col("o_orderkey") % 3 === i)), Seq("day"), 8)
    }
    assert(stateRows(cat.bucketedMvState("bucketed")
        .select("day", "n_orders", "rev_cents")) ==
      stateRows(cat.mvState("flat").select("day", "n_orders", "rev_cents")))
  }

  test("a refresh leaves untouched buckets' files byte-for-byte alone (mtimes)") {
    val cat = freshCat()
    val base = (1 to 400).map(i => (s"k$i", 1L)).toDF("k", "n")
    cat.refreshAggMvBucketed("mv", base, Seq("k"), 16)
    val root = new java.io.File(s"${cat.derivedDir}/mv")
    def filesOf(b: String) =
      new java.io.File(root, b).listFiles().filter(_.getName.endsWith(".parquet"))
    // one key → exactly one touched bucket
    val delta = Seq(("k7", 5L)).toDF("k", "n")
    val touchedGb = delta
      .select(pmod(hash(col("k")), lit(16)).cast("int")).head().getInt(0)
    val before = root.listFiles().filter(_.getName.startsWith("gb="))
      .filterNot(_.getName == s"gb=$touchedGb")
      .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet")))
      .map(f => f.getPath -> f.lastModified()).toMap
    assert(before.nonEmpty)
    Thread.sleep(1100) // mtime granularity
    cat.refreshAggMvBucketed("mv", delta, Seq("k"), 16)
    before.foreach { case (p, m) =>
      val f = new java.io.File(p)
      assert(f.exists() && f.lastModified() == m, s"untouched file rewritten: $p")
    }
    // the touched bucket DID change, and the merged value is right
    assert(filesOf(s"gb=$touchedGb").nonEmpty)
    val k7 = cat.bucketedMvState("mv").where(col("k") === "k7")
      .select("n").as[Long].head()
    assert(k7 == 6L)
  }

  test("retry of a committed batch id is a no-op across the bucketed swap") {
    val cat = freshCat()
    cat.refreshAggMvBucketed("mv", Seq(("a", 1L)).toDF("k", "n"), Seq("k"), 4,
      Some(1L))
    cat.refreshAggMvBucketed("mv", Seq(("a", 2L)).toDF("k", "n"), Seq("k"), 4,
      Some(2L))
    cat.refreshAggMvBucketed("mv", Seq(("a", 2L)).toDF("k", "n"), Seq("k"), 4,
      Some(2L)) // retry: must not double-count
    assert(cat.bucketedMvState("mv").select("n").as[Long].head() == 3L)
  }

  test("staged debris without an intent rolls back; with one rolls forward") {
    val cat = freshCat()
    cat.refreshAggMvBucketed("mv", Seq(("a", 1L), ("b", 2L)).toDF("k", "n"),
      Seq("k"), 4, Some(1L))
    val before = stateRows2(cat.bucketedMvState("mv"))
    val root = new java.io.File(s"${cat.derivedDir}/mv")
    // 1) no intent → roll back: the staged junk is deleted, state intact
    val junk = new java.io.File(root, ".staged/data/gb=0")
    junk.mkdirs()
    assert(stateRows2(cat.bucketedMvState("mv")) == before)
    assert(!new java.io.File(root, ".staged").exists())
    // 2) intent committed → roll forward: a staged bucket dir swaps in
    //    and the marker advances to the intent's batch id
    val gbA = Seq(("a", 0L)).toDF("k", "n")
      .select(pmod(hash(col("k")), lit(4)).cast("int")).head().getInt(0)
    val stagedA = new java.io.File(root, s".staged/data/gb=$gbA")
    stagedA.getParentFile.mkdirs()
    Seq(("a", 9L)).toDF("k", "n").coalesce(1)
      .write.parquet(stagedA.getPath)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root.getPath, ".staged", "_intent"), "2")
    val healed = cat.bucketedMvState("mv")
    assert(healed.where(col("k") === "a").select("n").as[Long].head() == 9L)
    assert(!new java.io.File(root, ".staged").exists())
    // marker advanced: a replay of batch 2 is now a no-op
    cat.refreshAggMvBucketed("mv", Seq(("a", 100L)).toDF("k", "n"), Seq("k"), 4,
      Some(2L))
    assert(cat.bucketedMvState("mv")
      .where(col("k") === "a").select("n").as[Long].head() == 9L)
  }

  test("bucket count is frozen: a mismatched nBuckets is rejected") {
    val cat = freshCat()
    cat.refreshAggMvBucketed("mv", Seq(("a", 1L)).toDF("k", "n"), Seq("k"), 8)
    intercept[IllegalArgumentException] {
      cat.refreshAggMvBucketed("mv", Seq(("a", 1L)).toDF("k", "n"), Seq("k"), 16)
    }
  }

  test("bucketed CDC state equals refreshCdcMv at any batch order") {
    val cat = freshCat()
    val b1 = Seq((1L, 10L, "u", 100L), (2L, 10L, "u", 200L))
      .toDF("id", "seq", "op", "v")
    val b2 = Seq((1L, 20L, "d", 0L), (3L, 5L, "u", 300L))
      .toDF("id", "seq", "op", "v")
    Seq(b1, b2).foreach { b =>
      cat.refreshCdcMv("flat", b, "id", "seq", "op")
      cat.refreshCdcMvBucketed("bucketed", b, "id", "seq", "op", 4)
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "seq", "op", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(rows(cat.bucketedMvState("bucketed")) == rows(cat.mvState("flat")))
    assert(rows(cat.cdcStateBucketed("bucketed", "op")
        .withColumn("op", lit("u"))) ==
      rows(cat.cdcState("flat", "op").withColumn("op", lit("u"))))
  }

  test("bucketed KMV state equals refreshKmvMv (lossless k-minimum merge)") {
    import graft.operators.TextAnalysis
    val li = Tables.lineitem(spark, sfDir).select(col("l_returnflag"),
      TextAnalysis.portableHash60(col("l_partkey")).as("h"), col("l_orderkey"))
    val cat = freshCat()
    (0 until 3).foreach { b =>
      cat.refreshKmvMv("flat", li.where(pmod(col("l_orderkey"), lit(3)) === b),
        Seq("l_returnflag"), "h", 64)
      cat.refreshKmvMvBucketed("bucketed",
        li.where(pmod(col("l_orderkey"), lit(3)) === b),
        Seq("l_returnflag"), "h", 64, 4)
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("l_returnflag", "h")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows(cat.bucketedMvState("bucketed")) == rows(cat.mvState("flat")))
  }

  test("bucketed quantile-sketch state equals refreshQsketchMv (lossless merge)") {
    import graft.operators.TextAnalysis
    val li = Tables.lineitem(spark, sfDir).select(col("l_returnflag"),
      TextAnalysis.portableHash60(col("l_orderkey"),
        lit("-"), col("l_linenumber")).as("h"),
      col("l_extendedprice").as("val"), col("l_orderkey"))
    val cat = freshCat()
    (0 until 3).foreach { b =>
      cat.refreshQsketchMv("flat", li.where(pmod(col("l_orderkey"), lit(3)) === b),
        Seq("l_returnflag"), "h", "val", 64)
      cat.refreshQsketchMvBucketed("bucketed",
        li.where(pmod(col("l_orderkey"), lit(3)) === b),
        Seq("l_returnflag"), "h", "val", 64, 4)
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("l_returnflag", "h", "val")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows(cat.bucketedMvState("bucketed")) == rows(cat.mvState("flat")))
  }

  private def stateRows2(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "n").collect().map(r => (r.getString(0), r.getLong(1))).toSet
}
