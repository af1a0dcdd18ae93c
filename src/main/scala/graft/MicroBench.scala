package graft

/** Ad-hoc per-query timing helper (not part of the driver contract):
  * `runMain graft.MicroBench q1 q2 ...` times each named query 3x at
  * sf0.1 with cache-clears between runs. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session(master = "local[32]", shufflePartitions = 32, appName = "micro")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1 << 20).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    for (name <- args; i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sf).write.format("noop").mode("overwrite").save()
      println(f"$name%-22s run$i ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
