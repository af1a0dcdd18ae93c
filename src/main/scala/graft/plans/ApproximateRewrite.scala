package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in approximate query processing (AQP), BlinkDB-style: with
  * `spark.graft.approx=true`, exact `count(DISTINCT x)` and
  * `percentile(x, p)` aggregates are rewritten at optimization time into
  * their constant-memory sketch equivalents (HyperLogLog++ and
  * t-digest-style approximate percentile).
  *
  * At 100 TB an exact count-distinct shuffles every distinct value and
  * an exact percentile sorts each group; the sketches are mergeable,
  * bounded-memory map-side state. The rewrite keeps result expression
  * ids, so references above the aggregate stay valid, and changes
  * nothing unless the session explicitly opts in.
  */
case class ApproximateRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.approx").exists(_.toBoolean)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(c: Count, _, true, _, _)
              if c.children.length == 1 =>
            ae.copy(
              aggregateFunction = HyperLogLogPlusPlus(c.children.head),
              isDistinct = false)
          case ae @ AggregateExpression(p: Percentile, _, false, _, _)
              if p.frequencyExpression == Literal(1L) =>
            ae.copy(aggregateFunction = new ApproximatePercentile(
              p.child, p.percentageExpression))
        }
    }
}
