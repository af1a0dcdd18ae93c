package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Specs for the mixture-shaping pair: per-group capping via the
  * bounded bottom-k-ids heap and temperature (alpha) stratum
  * rebalancing. */
class Round4SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("capPerGroup keeps at most k docs per group and is a pure set function") {
    val docs = Tables.documents(spark, sfDir)
    val capped = Sampling.capPerGroup(docs, 10)
    val over = capped.groupBy($"source").count().where($"count" > 10).count()
    assert(over == 0, "no source may exceed the cap")
    // every group with >= k rows is capped exactly at k, smaller groups whole
    val expectSizes = docs.groupBy($"source").count()
      .select($"source", least($"count", lit(10L)).as("want"))
    val gotSizes = capped.groupBy($"source").count()
    assert(gotSizes.join(expectSizes, "source").where($"count" =!= $"want").count() == 0)
    // deterministic under repartitioning (total order fixes the draw)
    val repart = Sampling.capPerGroup(docs.repartition(7, $"doc_id"), 10)
    assert(capped.exceptAll(repart).isEmpty && repart.exceptAll(capped).isEmpty)
  }

  test("capPerGroup plans a partial WindowGroupLimit before the exchange") {
    // the whole point of the window form: InferWindowGroupLimit bounds
    // map-side output at k rows per group, so a hot source never ships
    // more than k rows per task — assert the rewrite actually fired
    // and the Partial limit sits below the Exchange
    val plan = Sampling.capPerGroup(Tables.documents(spark, sfDir), 10)
      .queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toVector
    val partialAt = lines.indexWhere(l => l.contains("WindowGroupLimit") && l.contains("Partial"))
    val exchangeAt = lines.indexWhere(_.contains("Exchange"))
    assert(partialAt >= 0, s"expected a partial WindowGroupLimit:\n$plan")
    assert(exchangeAt >= 0 && exchangeAt < partialAt,
      s"partial group-limit must run below (before) the exchange:\n$plan")
  }

  test("temperatureSample keeps the rarest stratum whole and thins the rest") {
    val docs = Tables.documents(spark, sfDir)
    val in = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val nMin = in.values.min
    val out = Sampling.temperatureSample(docs)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    in.foreach { case (lang, n) =>
      if (n == nMin) assert(out(lang) == n, s"rarest stratum $lang must be kept whole")
      else {
        // binomial(n, sqrt(nMin/n)) within 5 standard deviations
        val p = math.sqrt(nMin.toDouble / n)
        val sd = math.sqrt(n * p * (1 - p))
        assert(math.abs(out(lang) - n * p) <= 5 * sd + 1,
          s"$lang kept ${out(lang)} of $n, expected ~${n * p} (sd $sd)")
      }
    }
    // flattening: the kept shares are strictly closer to uniform (max/min
    // ratio shrinks) whenever the input mix is skewed
    if (in.values.max > nMin)
      assert(out.values.max.toDouble / out.values.min <
        in.values.max.toDouble / in.values.min)
  }

  test("temperature and cap tolerate empty input") {
    val empty = Tables.documents(spark, sfDir).where(lit(false))
    assert(Sampling.temperatureSample(empty).count() == 0)
    assert(Sampling.capPerGroup(empty, 10).count() == 0)
  }
}

/** Specs for the span-scrub removal pass (the rewrite twin of the
  * d_span_dedup audit). */
class ScrubSpansSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Dedup

  test("scrub keeps exactly the audit's non-duplicated span count per doc") {
    val docs = Tables.documents(spark, sfDir)
    val audit = Dedup.spanDedup(docs)
      .select($"doc_id", ($"n_spans" - $"n_dup_spans").as("want"))
    val scrub = Dedup.scrubSpans(docs).select($"doc_id", $"n_spans_kept")
    assert(scrub.join(audit, "doc_id").where($"n_spans_kept" =!= $"want").count() == 0)
    assert(scrub.count() == audit.count(), "every audited doc must survive the scrub")
  }

  test("first occurrence survives, later copies scrubbed, order preserved") {
    // doc 1 owns spans A B; doc 2 repeats A then its own C; doc 3 is all copies
    val mk = (s: String) => s.split(" ").flatMap(w => Seq.fill(8)(w)).mkString(" ")
    val docs = Seq(
      (1L, mk("a b")), (2L, mk("a c")), (3L, mk("a b"))).toDF("doc_id", "text")
    val out = Dedup.scrubSpans(docs).orderBy($"doc_id")
      .as[(Long, Long, String)].collect()
    assert(out(0) == ((1L, 2L, mk("a b"))))
    assert(out(1) == ((2L, 1L, mk("c"))))
    assert(out(2) == ((3L, 0L, "")))
  }

  test("corpus-wide kept spans equal the number of distinct span hashes") {
    val docs = Tables.documents(spark, sfDir)
    val kept = Dedup.scrubSpans(docs).agg(sum($"n_spans_kept")).as[Long].head()
    val audit = Dedup.spanDedup(docs)
      .agg((sum($"n_spans") - sum($"n_dup_spans"))).as[Long].head()
    assert(kept == audit)
  }
}
