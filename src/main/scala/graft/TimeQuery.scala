package graft

/** Min-of-N wall timing for a handful of driver entries (the Bench
  * convention: noop-write force, clearCache between runs, interleaved
  * passes). Usage: runMain graft.TimeQuery <sfDir> <iters> <q1,q2,..>
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args(1).toInt
    val names = args(2).split(",").toSeq
    val spark = Graft.session(appName = "graft-timequery")
    spark.range(1 << 20).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to iters; n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      samples(n) = (System.nanoTime() - t0) / 1e9 :: samples.getOrElse(n, Nil)
      spark.catalog.clearCache()
    }
    names.foreach { n =>
      println(f"[timequery] $n%-22s min ${samples(n).min}%6.2fs  all ${samples(n).reverse.map(x => f"$x%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
