package graft

/** Plan-audit main: prints the formatted physical plan of each named
  * query (or all) at the given sf dir. Used to keep the plans honest:
  * filters pushed to the parquet scan, dims broadcast, codegen spans
  * wide. `PLANS.md` captures the audited output.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = Graft.session(appName = "graft-explain")
    names.foreach { n =>
      println(s"\n===== $n =====")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
