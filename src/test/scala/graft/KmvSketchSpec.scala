package graft

import org.apache.spark.sql.functions._
import graft.functions.KmvSketch
import graft.operators.{Analytics, TextAnalysis}

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("estimate is exact when the group has fewer than k distinct values") {
    val df = Seq.tabulate(200)(i => ("g", i % 37)).toDF("g", "v")
    val out = df.groupBy($"g")
      .agg(KmvSketch.kmv(TextAnalysis.portableHash60($"v".cast("string")), 64).as("b"))
      .select(KmvSketch.estimate($"b", 64).as("est"), size($"b").as("n"))
      .as[(Double, Int)].head()
    assert(out == ((37.0, 37)))
  }

  test("estimate tracks exact distinct within ~3/sqrt(k) on lineitem") {
    val li = Tables.lineitem(spark, sfDir)
    val est = Analytics.kmvSummary(li)
      .select($"l_returnflag", $"est_parts").as[(String, Double)].collect().toMap
    val exact = li.groupBy($"l_returnflag").agg(countDistinct($"l_partkey").as("d"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (g, d) =>
      val relErr = math.abs(est(g) - d) / d
      assert(relErr < 3.0 / math.sqrt(64), f"group $g: est=${est(g)}%.1f exact=$d err=$relErr%.3f")
    }
  }

  test("sketch is invariant under repartitioning (merge correctness)") {
    val li = Tables.lineitem(spark, sfDir)
    def run(df: org.apache.spark.sql.DataFrame) =
      Analytics.kmvSummary(df).orderBy($"l_returnflag")
        .as[(String, Option[Long], Double, Option[Long], Double)].collect().toSeq
    assert(run(li.repartition(1)) == run(li.repartition(16)))
  }

  test("buffer drops re-seen hashes: duplicates do not displace distinct values") {
    // 5 distinct values, each repeated 100x, k=8: buffer must hold all 5
    val df = Seq.tabulate(500)(i => ("g", i % 5)).toDF("g", "v")
    val out = df.groupBy($"g")
      .agg(KmvSketch.kmv(TextAnalysis.portableHash60($"v".cast("string")), 8).as("b"))
      .select(size($"b")).as[Int].head()
    assert(out == 5)
  }
}
