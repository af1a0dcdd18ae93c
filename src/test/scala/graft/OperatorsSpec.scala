package graft

import org.apache.spark.sql.functions._
import graft.operators._

class MapReduceOpsSpec extends SparkSpec {
  import spark.implicits._

  test("wordCount counts tokens, drops empties") {
    val df = Seq((1L, "a b  a\tc"), (2L, "b a")).toDF("doc_id", "text")
    val m = MapReduceOps.wordCount(df).as[(String, Long)].collect().toMap
    assert(m == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("grep pushes filter, keeps matching docs only") {
    val out = MapReduceOps.grep(Tables.documents(spark, sfDir), "data")
    assert(out.count() > 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("Filter"))
  }

  test("sortedTopN is globally ordered") {
    val rows = MapReduceOps.sortedTopN(Tables.lineitem(spark, sfDir), 50)
      .select("l_extendedprice").as[Double].collect()
    assert(rows.length == 50)
    assert(rows.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("topKWords deterministic tie-break") {
    val out = MapReduceOps.topKWords(Tables.documents(spark, sfDir), 5).collect()
    assert(out.length == 5)
  }

  test("distinctKeys yields unique pairs") {
    val out = MapReduceOps.distinctKeys(Tables.lineitem(spark, sfDir))
    assert(out.count() == out.distinct().count())
  }
}

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("q1 groups by flag/status with positive sums") {
    val rows = Analytics.q1(Tables.lineitem(spark, sfDir)).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Double]("sum_qty") > 0))
  }

  test("q5 uses broadcast joins for dimensions") {
    val plan = Analytics.q5(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("window rank capped at k per customer") {
    val out = Analytics.topOrdersPerCustomer(Tables.orders(spark, sfDir), 3)
    val maxPer = out.groupBy("o_custkey").count().agg(max("count")).as[Long].head()
    assert(maxPer <= 3)
  }

  test("semi+anti partition the customer set") {
    val c = Tables.customer(spark, sfDir)
    val out = Analytics.customersByOrderPresence(c, Tables.orders(spark, sfDir))
    assert(out.count() == c.count())
  }

  test("rollup contains the grand total row") {
    val out = Analytics.rollupSummary(Tables.lineitem(spark, sfDir))
    assert(out.where($"returnflag" === "ALL" && $"linestatus" === "ALL").count() == 1)
  }

  test("movingAvg ROWS frame survives empty years and short years") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Exact.cents
    // 1994: 5 days; 1995: only 3 days (shorter than the frame, so
    // 1997's first frames must reach back THROUGH 1995 into 1994);
    // 1996: empty; 1997: 10 days
    val days =
      (1 to 5).map(d => (f"1994-06-0$d", 100.0 + d)) ++
      (1 to 3).map(d => (f"1995-03-0$d", 200.0 + d)) ++
      (1 to 10).map(d => (f"1997-01-$d%02d", 300.0 + d))
    val orders = days.toDF("o_orderdate", "o_totalprice")
    val got = Analytics.movingAvgDailyRevenue(orders)
      .select($"day", $"mov_avg7").as[(String, Double)].collect().toMap
    // reference: the plain unpartitioned ROWS window (fine on 18 rows)
    val daily = orders.groupBy(to_date($"o_orderdate").as("day"))
      .agg(sum(cents($"o_totalprice")).as("cents"))
    val w = Window.orderBy($"day").rowsBetween(-6, Window.currentRow)
    val want = daily.select(date_format($"day", "yyyy-MM-dd").as("day"),
        (sum($"cents").over(w).cast("double") / 100.0 /
          count(lit(1)).over(w)).as("mov_avg7"))
      .as[(String, Double)].collect().toMap
    assert(got == want)
  }
}

class EventsSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize splits on gap > 30min") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val df = Seq(
      (1L, at(0), 1.0), (1L, at(10), 1.0), (1L, at(50), 1.0), // gap 40 → new session
      (2L, at(0), 1.0)
    ).toDF("user_id", "ts", "value")
    val sessions = Events.sessionize(df)
    assert(sessions.where($"user_id" === 1L).count() == 2)
    assert(sessions.where($"user_id" === 2L).count() == 1)
  }

  test("tumblingHourly aggregates per hour/type") {
    val out = Events.tumblingHourly(Tables.events(spark, sfDir))
    assert(out.count() > 0)
    assert(out.columns.toSet == Set("hour_start", "event_type", "cnt", "sum_value"))
  }

  test("anomalies decision stays exact past the int64 bound (Decimal moments)") {
    // v = 10¹⁰ cents ⇒ Q = Σv² = 10²⁰, past int64's 9.2·10¹⁸ — the old
    // long arithmetic wrapped here and flagged garbage. Exact math
    // (BigInt, mirrored by the operator's Decimal(38,0)): n=21, S=10¹⁰,
    // outlier dev = 21·10¹⁰ − 10¹⁰ = 2·10¹¹, dev² = 4·10²² >
    // 9·(21·10²⁰ − 10²⁰) = 1.8·10²² → only the outlier flags; each
    // zero row has dev² = 10²⁰ < 1.8·10²² → silent.
    val rows = (1L to 20L).map(i => (7L, i, 0.0)) :+ ((7L, 21L, 1.0e8))
    val df = rows.toDF("user_id", "event_id", "value")
    val flagged = Events.anomalies(df).select($"event_id").as[Long].collect().toSet
    assert(flagged == Set(21L))
  }
}

class ExactSpec extends SparkSpec {
  import spark.implicits._

  test("moneySum is invariant under repartitioning") {
    val df = Tables.lineitem(spark, sfDir)
    def total(parts: Int) = df.repartition(parts)
      .agg(graft.functions.Exact.moneySum($"l_extendedprice").as("s")).as[Double].head()
    assert(total(1) == total(7)) // bit-identical, not approximately equal
  }
}
