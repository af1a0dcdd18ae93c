package graft

import org.apache.spark.sql.functions._
import graft.plans.PlanDoctor

/** PlanDoctor: the user-facing plan lint. Each rule is pinned with a
  * deliberately-bad plan and a clean counterpart — and lint() never
  * executes the frame (a would-be-huge cross join lints instantly). */
class PlanDoctorSpec extends SparkSpec {

  private def rules(df: org.apache.spark.sql.DataFrame): Set[String] =
    PlanDoctor.lint(df).collect().map(_.getString(0)).toSet

  test("cartesian product flagged as error; equi-join clean") {
    // both sides must clear the broadcast threshold or the planner
    // picks BNLJ instead; lint never executes, so the size is free
    val a = spark.range(100000000L).toDF("x")
    val b = spark.range(100000000L).toDF("y")
    val cross = a.crossJoin(b) // would be 10^16 rows if executed
    assert(rules(cross).contains("cartesian_product"))
    val clean = a.join(b.withColumnRenamed("y", "x"), "x")
    assert(!rules(clean).contains("cartesian_product"))
  }

  test("keyless broadcast join flagged as warn") {
    val big = spark.range(100000).toDF("x")
    val tiny = spark.range(3).toDF("y")
    val bnlj = big.join(broadcast(tiny), col("x") > col("y"))
    assert(rules(bnlj).contains("broadcast_nested_loop"))
  }

  test("unpartitioned window flagged; partitioned window clean") {
    import org.apache.spark.sql.expressions.Window
    val df = Tables.orders(spark, sfDir)
    val bad = df.withColumn("rn",
      row_number().over(Window.orderBy(col("o_orderkey"))))
    assert(rules(bad).contains("unpartitioned_window"))
    val good = df.withColumn("rn", row_number().over(
      Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))))
    assert(!rules(good).contains("unpartitioned_window"))
  }

  test("repartition(1) mid-pipeline flagged as single-partition exchange") {
    val df = Tables.orders(spark, sfDir)
      .select(col("o_orderkey")).repartition(1)
      .groupBy(col("o_orderkey") % 7).count()
    assert(rules(df).contains("single_partition_exchange"))
  }

  test("wide unfiltered scan nudged as info; pushed filter clean") {
    val wide = Tables.lineitem(spark, sfDir) // 16 columns, no filter
    assert(rules(wide).contains("unfiltered_wide_scan"))
    val filtered = Tables.lineitem(spark, sfDir)
      .where(col("l_orderkey") === 42L)
      .select(col("l_orderkey"), col("l_quantity"))
    assert(!rules(filtered).contains("unfiltered_wide_scan"))
  }

  test("a representative driver query lints clean") {
    val df = SparkEntry.queries("q1_agg")(spark, sfDir)
    assert(rules(df).isEmpty)
  }
}
