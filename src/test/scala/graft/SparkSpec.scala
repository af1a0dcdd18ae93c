package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (reused across suites via getOrCreate). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Graft.session(master = "local[4]", shufflePartitions = 4)
  val sfDir = "/root/testdata/sf0.001"

  /** Executed-plan text with the `Tables.spread` input repartition
    * lines removed. The map-only / no-shuffle contracts in the specs
    * are about an OPERATOR's shape; the small-input spread
    * (`REPARTITION_BY_NUM`, self-disabling at scale — see
    * `Tables.spread`) is input layout, not operator cost, so it is
    * excluded from those assertions. */
  def opPlan(df: org.apache.spark.sql.DataFrame): String =
    stripSpread(df.queryExecution.executedPlan.toString)

  /** [[opPlan]] for an already-rendered plan string. */
  def stripSpread(plan: String): String =
    plan.linesIterator
      .filterNot(_.contains("REPARTITION_BY_NUM"))
      .mkString("\n")

  /** `df.opPlanString` — drop-in for the old
    * `df.queryExecution.executedPlan.toString` in plan-shape specs. */
  implicit class PlanStringOps(private val df: org.apache.spark.sql.DataFrame) {
    def opPlanString: String = opPlan(df)
  }
}
