package graft

import org.apache.spark.sql.functions._
import graft.operators.Cumulative

/** The two-level bucket-monotone running sum must be bit-identical to
  * the single-window form it replaces, and its plan must actually be
  * bucketed (the whole point is that no window partition scales with a
  * group's distinct-value count).
  */
class CumulativeSpec extends SparkSpec {

  private def referenceCum(vc: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vc.withColumn("cum", sum(col("c")).over(w))
  }

  test("runningSum equals the single-window cumulative sum") {
    import spark.implicits._
    // near-unique doubles (the LM-score shape), plus a heavy-tie group
    // and a degenerate all-equal group (min == max zero-width buckets)
    val rows =
      (1 to 500).map(i => ("en", i * 0.013 + (i % 7) * 1e-4, (i % 3) + 1L)) ++
      (1 to 50).map(i => ("fr", (i % 5).toDouble, i.toLong)) ++
      (1 to 4).map(i => ("zz", 42.0, i.toLong))
    val vc = rows.toDF("g", "rawv", "rawc")
      .groupBy(col("g"), col("rawv").as("v"))
      .agg(sum(col("rawc")).as("c"))
    val got = Cumulative.runningSum(vc, Seq("g"), "v", "c", "cum", nBuckets = 16)
      .select("g", "v", "cum").collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    val want = referenceCum(vc)
      .select("g", "v", "cum").collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("plan windows are bucket-partitioned; only the offset window is per-group") {
    import spark.implicits._
    val vc = (1 to 100).map(i => ("en", i.toDouble, 1L)).toDF("g", "v", "c")
    val plan = Cumulative.runningSum(vc, Seq("g"), "v", "c", "cum")
      .queryExecution.sparkPlan.toString
    // the corpus-sized window must include the monotone bucket in its
    // partition spec; the per-group-only window exists (offsets) but
    // runs over ≤ nBuckets+2 rows per group
    assert(plan.contains("__bk"), s"no bucketed window in plan:\n$plan")
  }
}
