package graft

import org.apache.spark.sql.functions._
import graft.functions.HitCount.hitCount

class HitCountSpec extends SparkSpec {
  import spark.implicits._

  test("hit_count counts occurrences with multiplicity") {
    val df = Seq(
      Seq("the", "cat", "the", "dog"),
      Seq("a", "b"),
      Seq.empty[String]).toDF("tk")
    val out = df.select(hitCount($"tk", Seq("the", "a", "dog")).as("n")).as[Long].collect().toSeq
    assert(out == Seq(3L, 1L, 0L))
  }

  test("hit_count is null-preserving on a null token array") {
    val df = Seq(Some(Seq("x", "y")), None).toDF("tk")
    val out = df.select(hitCount($"tk", Seq("x")).as("n")).as[Option[Long]].collect().toSeq
    assert(out == Seq(Some(1L), None))
  }

  test("hit_count matches the array_remove formulation on real documents") {
    val words = operators.TextAnalysis.EnStopwords
    val tk = Tables.documents(spark, sfDir)
      .select(split(lower($"text"), "\\s+").as("tk"))
    val native = tk.select(hitCount($"tk", words).as("n")).as[Long].collect()
    val composed = tk.select(
      words.map(w => size($"tk") - size(array_remove($"tk", w))).reduce(_ + _)
        .cast("long").as("n")).as[Long].collect()
    assert(native.toSeq == composed.toSeq)
  }

  test("hit_count is registered for SQL and stays in whole-stage codegen") {
    // parquet-backed input so ConvertToLocalRelation can't fold the plan away
    Tables.documents(spark, sfDir)
      .select(split(lower($"text"), "\\s+").as("tk"))
      .createOrReplaceTempView("hc_t")
    val df = spark.sql("SELECT hit_count(tk, array('the')) AS n FROM hc_t")
    assert(df.agg(sum($"n")).as[Long].head() > 0L)
    // execute df itself: the input-spread exchange makes the plan
    // adaptive, and AQE renders codegen markers only once finalized
    df.collect()
    val plan = df.opPlanString
    assert("""\*\(\d+\) Project \[hitcount""".r.findFirstIn(plan).isDefined,
      s"hit_count must run inside whole-stage codegen:\n$plan")
  }
}
