package graft

/** Diagnostic: run selected queries twice in one JVM — the cold/warm gap
  * is planning + codegen compile cost, the warm number is real execution.
  * Usage: runMain graft.Profile <sfDir> [query...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("d_dedup_minhash", "d_dedup_simhash", "d_dedup_embed",
        "d_dedup_ngram", "fs_stats", "s_ann_ivf", "e_sessionize")
    val spark = Graft.session(appName = "graft-profile")
    for (n <- names; q = SparkEntry.queries(n)) {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        q(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache() // measure execution, not pin interplay
        t
      }
      println(f"[profile] $n%-18s cold=${times(0)}%7.2fs warm=${times(1)}%7.2fs")
    }
    spark.stop()
  }
}
