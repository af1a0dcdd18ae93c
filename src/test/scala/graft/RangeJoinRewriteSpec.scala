package graft

import org.apache.spark.sql.functions._

/** The automatic range-join binning rule. Eligibility is deliberately
  * narrow (inner join, cross-side lower AND upper bound on one point
  * expression, no existing equi conjunct), so the load-bearing asserts
  * are: rewritten plan loses its nested-loop/cartesian node, results
  * equal the naive plan exactly, and ineligible joins are untouched.
  */
class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def withBucket[A](width: Long)(f: => A): A = {
    spark.conf.set("spark.graft.rangeJoin.bucket", width.toString)
    try f finally spark.conf.unset("spark.graft.rangeJoin.bucket")
  }

  private def points = (0L until 2000L).map(i => (i, i * 13L % 1000L)).toDF("pid", "t")
  private def intervals = (0L until 50L).map { i =>
    (i, i * 20L, i * 20L + 35L) // overlapping spans
  }.toDF("iid", "lo", "hi")

  private def naiveJoin = points.join(intervals, $"t" >= $"lo" && $"t" < $"hi")

  test("point-in-interval join is rewritten to a binned equi-join (no nested loop)") {
    withBucket(16L) {
      val plan = naiveJoin.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"expected binned equi-join, got:\n$plan")
      assert(plan.contains("Generate"), "interval side must explode into cells")
    }
  }

  test("rewritten results equal the naive nested-loop results exactly") {
    val expected = naiveJoin.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val got = withBucket(16L) { naiveJoin.collect().map(_.toSeq).toSeq.sortBy(_.toString) }
    assert(got == expected)
    // multiplicity: points in several overlapping intervals appear once
    // per containing interval, never once per covered cell
    val perPoint = withBucket(4L) {
      naiveJoin.groupBy($"pid", $"iid").count().where($"count" > 1).count()
    }
    assert(perPoint == 0)
  }

  test("negative domains bucket with floor semantics (no cell-0 straddle)") {
    val p = Seq((1L, -5L), (2L, 3L), (3L, -100L)).toDF("pid", "t")
    val iv = Seq((10L, -8L, 4L)).toDF("iid", "lo", "hi")
    val naive = p.join(iv, $"t" >= $"lo" && $"t" <= $"hi")
      .select($"pid").as[Long].collect().toSet
    val binned = withBucket(16L) {
      p.join(iv, $"t" >= $"lo" && $"t" <= $"hi").select($"pid").as[Long].collect().toSet
    }
    assert(binned == naive && naive == Set(1L, 2L))
  }

  test("extra conjuncts survive the rewrite") {
    val naive = points.join(intervals,
      $"t" >= $"lo" && $"t" < $"hi" && $"pid" =!= $"iid")
    val expected = naive.count()
    val got = withBucket(16L) {
      val plan = naive.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"))
      naive.count()
    }
    assert(got == expected)
  }

  test("joins with an equi key are left alone") {
    val p2 = points.withColumn("k", $"pid" % 7)
    val iv2 = intervals.withColumn("k", $"iid" % 7)
    withBucket(16L) {
      val j = p2.join(iv2, p2("k") === iv2("k") && $"t" >= $"lo" && $"t" < $"hi")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Generate"), s"equi-join must not be rewritten:\n$plan")
    }
  }

  test("joins with a null-safe equi key (<=>) are left alone") {
    // Spark extracts <=> as a hash-join key just like ===, so the
    // rewrite would only add a pointless explode and forfeit AQE skew
    // handling
    val p2 = points.withColumn("k", $"pid" % 7)
    val iv2 = intervals.withColumn("k", $"iid" % 7)
    withBucket(16L) {
      val j = p2.join(iv2, p2("k") <=> iv2("k") && $"t" >= $"lo" && $"t" < $"hi")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Generate"),
        s"null-safe equi-join must not be rewritten:\n$plan")
    }
  }

  test("one-sided inequalities (triangular self-joins) are left alone") {
    val e = Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
    withBucket(16L) {
      val j = e.as("a").join(e.as("b"), col("a.id") < col("b.id"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Generate"))
      assert(j.count() == 1)
    }
  }

  test("rule is inert without the conf") {
    val plan = naiveJoin.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"))
  }
}

class RangeJoinGuardSpec extends SparkSpec {
  import spark.implicits._

  test("interval wider than maxCellsPerInterval raises a descriptive error") {
    spark.conf.set("spark.graft.rangeJoin.bucket", "1")
    try {
      val p = Seq((1L, 5L)).toDF("pid", "t")
      val iv = Seq((1L, 0L, 100000L)).toDF("iid", "lo", "hi")
      val e = intercept[Exception] {
        p.join(iv, $"t" >= $"lo" && $"t" < $"hi").count()
      }
      assert(e.getMessage.contains("graft range-join"), e.getMessage)
    } finally spark.conf.unset("spark.graft.rangeJoin.bucket")
  }

  test("reversed intervals (lo > hi) match nothing instead of materializing the descending range") {
    // a corrupt row with lo > hi would make step-less Sequence default
    // to step -1 and generate 20M cells DESCENDING — the one-sided
    // maxCells guard (hi - lo > max) never fires on a negative span.
    // The predicate is unsatisfiable for such a row, so the rewrite
    // maps it to the empty cell array: zero join rows, zero memory.
    spark.conf.set("spark.graft.rangeJoin.bucket", "1")
    try {
      val p = Seq((1L, 5L), (2L, 15L)).toDF("pid", "t")
      val iv = Seq((1L, 0L, 10L), (2L, 20000000L, 0L)).toDF("iid", "lo", "hi")
      val j = p.join(iv, $"t" >= $"lo" && $"t" < $"hi")
      assert(j.queryExecution.executedPlan.toString.contains("Generate"))
      val rows = j.select($"pid", $"iid").as[(Long, Long)].collect().toSet
      assert(rows == Set((1L, 1L)))
    } finally spark.conf.unset("spark.graft.rangeJoin.bucket")
  }

  test("malformed bucket conf disables the rule instead of failing every query") {
    spark.conf.set("spark.graft.rangeJoin.bucket", "15m")
    try {
      val p = Seq((1L, 5L)).toDF("pid", "t")
      val iv = Seq((1L, 0L, 10L)).toDF("iid", "lo", "hi")
      val j = p.join(iv, $"t" >= $"lo" && $"t" < $"hi")
      assert(!j.queryExecution.executedPlan.toString.contains("Generate"))
      assert(j.count() == 1)
    } finally spark.conf.unset("spark.graft.rangeJoin.bucket")
  }
}

/** The auto-rewritten maintenance-window operator must not leak its
  * enabling conf into the session: the rule reads session conf at
  * optimization time, so a leak would re-plan (or, via the maxCells
  * guard, fail) every later wide theta join just because this operator
  * ran once. */
class RangeJoinConfScopeSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Events

  test("maintenanceWindowCountsAuto scopes the rewrite conf to the call") {
    val key = "spark.graft.rangeJoin.bucket"
    assert(spark.conf.getOption(key).isEmpty)
    val events = Tables.events(spark, sfDir)
    val auto = Events.maintenanceWindowCountsAuto(events)
    // restored immediately — BEFORE any action on the result
    assert(spark.conf.getOption(key).isEmpty)
    // the returned frame already carries the binned equi-join plan
    val plan = auto.queryExecution.executedPlan.toString
    assert(plan.contains("Generate") && !plan.contains("NestedLoop") &&
      !plan.contains("Cartesian"), s"expected pre-rewritten binned plan:\n$plan")
    // same rows as the hand-binned operator
    val manual = Events.maintenanceWindowCounts(events).collect().map(_.toSeq).toSet
    assert(auto.collect().map(_.toSeq).toSet == manual)
    // an unrelated later theta join is NOT rewritten — no session leak
    val p = Seq((1L, 5L)).toDF("pid", "t")
    val iv = Seq((1L, 0L, 10L)).toDF("iid", "lo", "hi")
    val later = p.join(iv, $"t" >= $"lo" && $"t" < $"hi")
    assert(!later.queryExecution.executedPlan.toString.contains("Generate"))
  }

  test("maintenanceWindowCountsAuto restores a pre-existing conf value") {
    val key = "spark.graft.rangeJoin.bucket"
    spark.conf.set(key, "123456")
    try {
      Events.maintenanceWindowCountsAuto(Tables.events(spark, sfDir))
      assert(spark.conf.get(key) == "123456")
    } finally spark.conf.unset(key)
  }
}
