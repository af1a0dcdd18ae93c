package graft

import org.apache.spark.sql.functions._

/** Re-run a handful of scale-smoke entries standalone (assumes
  * /tmp/graft_bigdocs.parquet + /tmp/graft_bigevents.parquet exist). */
object SmokeOne {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session(appName = "graft-smoke-one")
    lazy val bd = spark.read.parquet("/tmp/graft_bigdocs.parquet")
    lazy val be = spark.read.parquet("/tmp/graft_bigevents.parquet")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[smoke1] $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }
    for (a <- args) a match {
      case "redact" => time("redact_1m_events") {
        operators.TextAnalysis.redact(be, "event_id", "props")
          .write.format("noop").mode("overwrite").save()
      }
      case "minhash" => time("exact_then_minhash") {
        val keepers = operators.Dedup.exact(bd).select(col("keep_id").as("doc_id"))
        operators.Dedup.minhashLsh(bd.join(keepers, "doc_id"), 3, 64, 16, 0.5)
          .write.format("noop").mode("overwrite").save()
      }
      case "kmvjoin" => time("kmv_join_6m") {
        // 6M-row left vs 2M-row right: selectivity estimate without the join
        val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        val big = (0 until 10).map(i =>
            li.withColumn("l_partkey", col("l_partkey") + lit(i * 2000L)))
          .reduce(_ unionAll _)
        val pt = spark.read.parquet("/root/testdata/sf0.1/part.parquet")
        val bigp = (0 until 10).map(i =>
            pt.withColumn("p_partkey", col("p_partkey") + lit(i * 4000L)))
          .reduce(_ unionAll _)
        operators.Analytics.kmvJoinEstimate(big, "l_partkey", bigp, "p_partkey")
          .write.format("noop").mode("overwrite").save()
      }
      case "kmv" => time("kmv_6m_rows") {
        val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        val big = (0 until 10).map(i =>
            li.withColumn("l_partkey", col("l_partkey") + lit(i * 10000000L))
              .withColumn("l_suppkey", col("l_suppkey") + lit(i * 10000000L)))
          .reduce(_ unionAll _)
        operators.Analytics.kmvSummary(big)
          .write.format("noop").mode("overwrite").save()
      }
      case "bpe" => time("bpe_train_100k") {
        operators.Bpe.merges(bd, 8).write.format("noop").mode("overwrite").save()
      }
      case "bpe_vocab_only" => time("bpe_wordfreq_100k") {
        // the corpus-scan part alone (word-frequency table), to
        // separate scan cost from merge-round cost
        bd.select(explode(operators.TextAnalysis.tokens(col("text"))).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
          .write.format("noop").mode("overwrite").save()
      }
      case "importance" => time("importance_100k") {
        operators.TextAnalysis.importanceWeights(bd, col("lang") === "en")
          .write.format("noop").mode("overwrite").save()
      }
      case "importance_gate" => {
        // the production split: build the ratio table once, then score
        // map-only against the literal — time the two phases separately
        var ratios: Array[Long] = null
        time("ratio_build_100k") {
          ratios = operators.TextAnalysis.ratioArray(
            operators.TextAnalysis.importanceRatios(bd, col("lang") === "en"))
        }
        time("score_fixed_100k") {
          operators.TextAnalysis.importanceScore(bd, ratios)
            .write.format("noop").mode("overwrite").save()
        }
      }
      case "semantic" => time("semantic_100k") {
        val bv = spark.read.parquet("/tmp/graft_bigemb.parquet")
        operators.Similarity.semanticDedup(bv, 0.4, nCells = 64)
          .write.format("noop").mode("overwrite").save()
      }
      case "ivfsearch" => time("ivf_search_100k") {
        val bv = spark.read.parquet("/tmp/graft_bigemb.parquet")
        val idx = operators.Similarity.buildIvfIndex(bv, nCells = 64)
        val qs = bv.limit(100).selectExpr("vec_id AS query_id",
          "transform(embedding, x -> CAST(x AS DOUBLE)) AS qv")
        operators.Similarity.ivfSearch(idx, qs, 10)
          .write.format("noop").mode("overwrite").save()
      }
      case "simhash" => time("simhash_100k") {
        operators.Dedup.simhashNearDup(bd, 3)
          .write.format("noop").mode("overwrite").save()
      }
      case "exact" => time("exact_100k") {
        operators.Dedup.exact(bd).write.format("noop").mode("overwrite").save()
      }
      case "pack" => time("pack_1m_docs") {
        operators.Sampling.packSequences(bd)
          .write.format("noop").mode("overwrite").save()
      }
      case "repetition" => time("repetition_100k") {
        operators.TextAnalysis.repetition(bd)
          .write.format("noop").mode("overwrite").save()
      }
      // round 7: the graph family's distributed rungs on a synthetic
      // 100k-node / ~1.1M-edge graph (self-contained — builds its own
      // input; same construction as ScaleSmoke)
      case "graph" =>
        val n = 100000L
        val fan = 12L
        spark.range(n * fan).select(
            concat(lit("v"), expr(s"id div $fan")).as("src"),
            concat(lit("v"), pmod(xxhash64(col("id")), lit(n))).as("dst"),
            (pmod(xxhash64(col("id"), lit(1L)), lit(1000L)) + 1L).as("w"))
          .where(col("src") =!= col("dst"))
          .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
          .write.mode("overwrite").parquet("/tmp/graft_bigedges.parquet")
        val bedges = spark.read.parquet("/tmp/graft_bigedges.parquet")
        val bnodes = spark.range(n).select(concat(lit("v"), col("id")).as("node"))
          .localCheckpoint()
        println(s"[smoke1] graph nodes=$n edges=${bedges.count()}")
        time("pagerank_1m_dist") {
          operators.Graph.pagerank(bedges, bnodes, iters = 3, coalesceTo = None)
            .write.format("noop").mode("overwrite").save()
        }
        time("bfs_1m_dist") {
          val source = bnodes.agg(min(col("node")).as("__src"))
          operators.Graph.shortestPaths(bedges, bnodes, source,
              fanout = 3, maxHops = 8)
            .write.format("noop").mode("overwrite").save()
        }
        time("triangles_1m") {
          operators.Graph.triangleCensus(bedges)
            .write.format("noop").mode("overwrite").save()
        }
      case "knn" => time("knn_graph_sf01") {
        operators.Similarity.knnGraph(
            spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet"), 3)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
