package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Events}

/** The distributed-selection quantile profile must be bit-identical to
  * the built-in `percentile` aggregate it replaced (which buffers every
  * group value in one non-spillable map — the 100 TB cliff this
  * operator removes) AND keep a scale-safe plan: the only per-group
  * state is the running cumulative window over DISTINCT values. */
class QuantileSelectionSpec extends SparkSpec {
  import spark.implicits._

  test("quantileProfile is bit-identical to the built-in percentile aggregate") {
    val orders = Tables.orders(spark, sfDir)
    val got = Analytics.quantileProfile(orders)
      .orderBy($"o_orderstatus").collect().map(_.toSeq).toSeq
    val builtin = orders.groupBy($"o_orderstatus")
      .agg(percentile($"o_totalprice", lit(0.25)).as("p25"),
        percentile($"o_totalprice", lit(0.5)).as("p50"),
        percentile($"o_totalprice", lit(0.75)).as("p75"),
        percentile($"o_totalprice", lit(0.95)).as("p95"),
        count(lit(1)).as("cnt"))
      .orderBy($"o_orderstatus").collect().map(_.toSeq).toSeq
    assert(got == builtin)
  }

  test("quantileProfile handles tiny and single-row groups exactly") {
    // n=1 (all ranks collapse), n=2 (every cut point interpolates), and
    // a heavy-tie group (rank spans wider than 1)
    val df = Seq(
      ("A", 10.0),
      ("B", 10.0), ("B", 20.0),
      ("C", 5.0), ("C", 5.0), ("C", 5.0), ("C", 50.0)
    ).toDF("o_orderstatus", "o_totalprice")
    val got = Analytics.quantileProfile(df)
      .orderBy($"o_orderstatus").collect().map(_.toSeq).toSeq
    val builtin = df.groupBy($"o_orderstatus")
      .agg(percentile($"o_totalprice", lit(0.25)).as("p25"),
        percentile($"o_totalprice", lit(0.5)).as("p50"),
        percentile($"o_totalprice", lit(0.75)).as("p75"),
        percentile($"o_totalprice", lit(0.95)).as("p95"),
        count(lit(1)).as("cnt"))
      .orderBy($"o_orderstatus").collect().map(_.toSeq).toSeq
    assert(got == builtin)
  }

  test("quantileProfile plan carries no Percentile buffer — only hash aggregates and a running window") {
    val plan = Analytics.quantileProfile(Tables.orders(spark, sfDir))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile("), s"built-in percentile crept back in:\n$plan")
    assert(plan.contains("Window"), "expected the running cumulative window")
  }
}

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  test("sample quantiles land inside a band around the exact quantiles") {
    val li = Tables.lineitem(spark, sfDir)
    val est = Analytics.quantileSketch(li)
      .select($"l_returnflag", $"p50_est", $"p95_est")
      .as[(String, Double, Double)].collect().map(r => r._1 -> r).toMap
    // exact p40/p60 and p90/p99 bands: a 256-point sample's order
    // statistics sit inside these with overwhelming probability
    val bands = li.groupBy($"l_returnflag").agg(
      expr("percentile(l_extendedprice, 0.40)").as("lo50"),
      expr("percentile(l_extendedprice, 0.60)").as("hi50"),
      expr("percentile(l_extendedprice, 0.90)").as("lo95"),
      expr("percentile(l_extendedprice, 0.99)").as("hi95"))
      .as[(String, Double, Double, Double, Double)].collect()
    bands.foreach { case (g, lo50, hi50, lo95, hi95) =>
      val (_, p50, p95) = est(g)
      assert(p50 >= lo50 && p50 <= hi50, s"$g p50=$p50 outside [$lo50, $hi50]")
      assert(p95 >= lo95 && p95 <= hi95, s"$g p95=$p95 outside [$lo95, $hi95]")
    }
  }

  test("sample is exact (the whole group) below k, and invariant to partitioning") {
    val li = Tables.lineitem(spark, sfDir)
    def run(df: org.apache.spark.sql.DataFrame) =
      Analytics.quantileSketch(df).orderBy($"l_returnflag")
        .as[(String, Long, Double, Double)].collect().toSeq
    assert(run(li.repartition(1)) == run(li.repartition(16)))
    // a 30-row group at k=256: the sample IS the group, estimate == exact
    val tiny = li.limit(30).withColumn("l_returnflag", lit("Z"))
    val out = Analytics.quantileSketch(tiny).as[(String, Long, Double, Double)].head()
    assert(out._2 == 30L)
    val exact = tiny.agg(expr("percentile(l_extendedprice, 0.5)")).as[Double].head()
    assert(math.abs(out._3 - exact) < 1e-6, s"${out._3} vs exact $exact")
  }
}

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("gap hours appear with zero counts; event totals are preserved") {
    val out = Events.resampleHourly(Tables.events(spark, sfDir))
    // dense grid: per user, rows == max(hr) - min(hr) + 1, no holes
    val spans = out.groupBy($"user_id")
      .agg(count(lit(1)).as("rows"), (max($"hr") - min($"hr") + 1).as("span"),
        sum($"cnt").as("total"))
    assert(spans.where($"rows" =!= $"span").count() == 0)
    // totals match the raw event counts per user
    val raw = Tables.events(spark, sfDir).groupBy($"user_id").count()
    val joined = spans.join(raw, "user_id")
    assert(joined.where($"total" =!= $"count").count() == 0)
    // and gaps exist in this data (otherwise the operator is untested)
    assert(out.where($"cnt" === 0).count() > 0)
  }
}
