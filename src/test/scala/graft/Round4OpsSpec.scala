package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Specs for the round-4 surface beyond the codec suite: DSIR-shaped
  * importance weighting. */
class ImportanceWeightsSpec extends SparkSpec {
  import spark.implicits._

  test("importanceWeights matches the hand-computed smoothed ratios exactly") {
    // doc 1 (target) and doc 2 (not) share one bigram bucket; doc 3 is alone.
    // bucket A: n_raw=2, n_target=1 → (2·10⁶) div 3 = 666666
    // bucket B: n_raw=1, n_target=0 → (1·10⁶) div 2 = 500000
    val docs = Seq(
      (1L, "alpha beta", "en"), (2L, "alpha beta", "de"), (3L, "gamma delta", "de"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.importanceWeights(docs, $"lang" === "en").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_feats"), r.getAs[Double]("imp_score"))).toMap
    assert(out(1L) == ((1L, 0.666666)))
    assert(out(2L) == ((1L, 0.666666)))
    assert(out(3L) == ((1L, 0.5)))
  }

  test("target-slice documents outscore the rest on corpus data") {
    val docs = Tables.documents(spark, sfDir)
    val scored = TextAnalysis.importanceWeights(docs, col("lang") === "en")
      .join(docs.select($"doc_id", $"lang"), "doc_id")
    val Array(enAvg, restAvg) = scored
      .groupBy(($"lang" === "en").as("t")).agg(avg($"imp_score").as("s"))
      .orderBy($"t".desc).select($"s").as[Double].collect()
    assert(enAvg > restAvg,
      s"English target docs must outscore the rest: $enAvg <= $restAvg")
    // every doc with >= 2 tokens is scored
    assert(scored.count() == docs.where(size(TextAnalysis.tokens($"text")) >= 2).count())
  }

  test("fixed-table scorer reproduces importanceWeights on the source corpus") {
    val docs = Tables.documents(spark, sfDir)
    val ratios = TextAnalysis.ratioArray(
      TextAnalysis.importanceRatios(docs, col("lang") === "en"))
    val scored = TextAnalysis.importanceScore(docs, ratios)
    val full = TextAnalysis.importanceWeights(docs, col("lang") === "en")
    assert(scored.exceptAll(full).isEmpty && full.exceptAll(scored).isEmpty)
    // and the scorer is map-only: no exchange anywhere in its plan
    val plan = scored.opPlanString
    assert(!plan.contains("Exchange"), s"fixed-table scoring must not shuffle:\n$plan")
  }

  test("streaming importance gate equals the batch gate under batching") {
    import java.nio.file.Files
    import graft.streaming.DocStream
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text", $"lang")
    val ratios = TextAnalysis.ratioArray(
      TextAnalysis.importanceRatios(docs, col("lang") === "en"))
    // gate at the corpus median score so both sides of the gate are hit
    val cut = TextAnalysis.importanceScore(docs, ratios)
      .stat.approxQuantile("imp_score", Array(0.5), 0.0).head
    val dir = Files.createTempDirectory("graft-impgate").toString
    docs.repartition(4).write.mode("overwrite").parquet(dir) // several files → several batches
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = DocStream.importanceGate(stream, ratios, minScore = cut)
      .writeStream.format("memory").queryName("imp_gate").outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("imp_gate")
    val batch = DocStream.importanceGate(docs, ratios, minScore = cut)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(batch.count() > 0 && batch.count() < docs.count(),
      "the gate must pass some docs and drop some docs")
  }

  test("importanceSelect keeps exactly the above-corpus-mean documents") {
    val docs = Tables.documents(spark, sfDir)
    val scored = TextAnalysis.importanceWeights(docs, col("lang") === "en")
    val selected = TextAnalysis.importanceSelect(docs, col("lang") === "en")
      .select($"doc_id").as[Long].collect().toSet
    // recompute the exact criterion from the raw longs the score rounds
    val rows = scored.select($"doc_id", $"n_feats", $"imp_score").collect()
    assert(selected.nonEmpty && selected.size < rows.length)
    // selection is strictly score-monotone: every selected doc outscores
    // every non-selected doc up to the rounding granularity of imp_score
    val selScores = rows.filter(r => selected(r.getLong(0))).map(_.getDouble(2))
    val outScores = rows.filter(r => !selected(r.getLong(0))).map(_.getDouble(2))
    assert(selScores.min >= outScores.max - 1e-6,
      s"selection must be a score threshold: min-in=${selScores.min} max-out=${outScores.max}")
  }

  test("the ratio table never exceeds nBuckets rows and the plan broadcasts it") {
    val docs = Tables.documents(spark, sfDir)
    val plan = TextAnalysis.importanceWeights(docs, col("lang") === "en", nBuckets = 64)
      .opPlanString
    assert(plan.contains("BroadcastHashJoin"), s"ratio join must broadcast:\n$plan")
  }
}
