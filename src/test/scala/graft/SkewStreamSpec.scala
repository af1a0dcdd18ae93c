package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Skew}
import graft.streaming.EventStream

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the rows of the plain join") {
    val li = Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_quantity")
    val o = Tables.orders(spark, sfDir)
      .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    val plain = li.join(o, Seq("l_orderkey"))
    val salted = Skew.saltedJoin(li, o, "l_orderkey", saltFactor = 8)
    assert(salted.count() == plain.count())
    assert(salted.agg(sum($"l_quantity")).as[Double].head() ==
      plain.agg(sum($"l_quantity")).as[Double].head())
  }

  test("saltColumn spreads fully identical duplicate rows across salts") {
    // the commonest hot-key shape: a partition full of IDENTICAL rows.
    // A content-hash salt maps them all to one salt (defeating the
    // spread); the position salt must not.
    val dups = spark.range(1000)
      .select(lit("hot").as("k"), lit(1.0).as("v")).repartition(4)
    val nSalts = dups.withColumn("s", Skew.saltColumn(8))
      .select($"s").distinct().count()
    assert(nSalts > 1, "identical rows funneled into a single salt")
    // and the salted aggregate still equals the plain one exactly
    val out = Skew.saltedAgg(dups, "k", "v").collect().head
    assert(out.getAs[Long]("cnt") == 1000L)
    assert(out.getAs[Double]("sum_value") == 1000.0)
  }
}

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("sketches land within documented error of exact values") {
    val approx = Analytics.sketchSummary(Tables.lineitem(spark, sfDir))
    val exact = Analytics.distinctCounts(Tables.lineitem(spark, sfDir))
    val joined = approx.join(exact, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val a = r.getAs[Double]("approx_parts")
      val e = r.getAs[Long]("n_parts").toDouble
      // KMV at k=512: σ ≈ 1/√(k−2) ≈ 4.4%; 4σ band (exact below k)
      assert(math.abs(a - e) / e < 0.18, s"approx $a vs exact $e")
    }
  }

  /** q_sketch's BOUNDED-ERROR verification at the driver's bench scale
    * (sf0.1) — the published-accuracy contract ON TOP of the
    * cross-engine oracle (round 14 moved the entry onto the portable
    * KMV + bottom-k kernels, so DuckDB now replays the exact values;
    * this spec separately pins that the estimates stay NEAR THE TRUTH,
    * which the oracle alone cannot say). KMV at k=512 has σ ≈
    * 1/√(k−2) ≈ 4.4%, so 4σ ≈ 17.7% relative error is the
    * essentially-never band (deterministic for fixed data — it either
    * holds or the implementation is wrong); the bottom-256 sample
    * median has rank-error σ = 1/(2√k) ≈ 3.1%, checked with 4× margin
    * against the exact quantiles at ranks 0.5 ± 0.125. */
  test("q_sketch estimates respect published error bounds vs exact counterparts at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    assume(new java.io.File(dir).isDirectory)
    val li = Tables.lineitem(spark, dir)
    val approx = Analytics.sketchSummary(li)
    val exactCd = Analytics.distinctCounts(li)
    val rsd = 1.0 / math.sqrt(510.0)
    approx.join(exactCd, "l_returnflag").collect().foreach { r =>
      for ((a, e) <- Seq(("approx_parts", "n_parts"), ("approx_supps", "n_supps"))) {
        val av = r.getAs[Double](a)
        val ev = r.getAs[Long](e).toDouble
        assert(math.abs(av - ev) / ev <= 4 * rsd,
          s"$a=$av outside 4·rsd of $e=$ev for ${r.getAs[String]("l_returnflag")}")
      }
    }
    val rankMargin = 4.0 / (2.0 * math.sqrt(256.0))
    val exactQ = li.groupBy($"l_returnflag").agg(
      percentile($"l_extendedprice", lit(0.5 - rankMargin)).as("qlo"),
      percentile($"l_extendedprice", lit(0.5 + rankMargin)).as("qhi"))
    approx.join(exactQ, "l_returnflag").collect().foreach { r =>
      val m = r.getAs[Double]("approx_median_price")
      val lo = r.getAs[Double]("qlo")
      val hi = r.getAs[Double]("qhi")
      assert(m >= lo && m <= hi,
        s"approx median $m outside exact rank band [$lo, $hi] " +
          s"for ${r.getAs[String]("l_returnflag")}")
    }
  }
}

class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming dedup drops duplicate event_ids within the watermark") {
    val batch = Tables.events(spark, sfDir).limit(200)
    val doubled = batch.unionAll(batch) // every id twice
    val srcDir = Files.createTempDirectory("graft-dedup-src").toString
    doubled.write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(doubled.schema).parquet(srcDir)
    val q = EventStream.dedupStream(stream)
      .writeStream.format("memory").queryName("dedup_out").outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("dedup_out")
    assert(out.count() == batch.count())
    assert(out.groupBy("event_id").count().where($"count" > 1).count() == 0)
  }
}
