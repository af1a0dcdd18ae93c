package graft

/** Dump the formatted physical plan of driver entries to files — the
  * plans/rNN/<query>_{before,after}.txt evidence the optimization
  * rounds commit. Usage:
  *   runMain graft.DumpPlan <sfDir> <outDir> <suffix> <q1,q2,...>
  * Streaming-replay entries RUN their replay while building the frame;
  * the captured plan is the served read-back plan, as in round 13. */
object DumpPlan {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, csv) = args.take(4)
    val names = csv.split(",").map(_.trim).filter(_.nonEmpty)
    val spark = Graft.session(appName = "graft-dumpplan")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"dumped $n -> $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
