package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

class StreamKmvSpec extends SparkSpec {
  import spark.implicits._

  test("streaming windowed KMV equals the batch sketch bit-for-bit") {
    val batch = Tables.events(spark, sfDir)
    val srcDir = Files.createTempDirectory("graft-kmv-src").toString
    batch.write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", 2).parquet(srcDir)
    val q = EventStream.windowedDistinctUsers(stream)
      .writeStream.format("memory").queryName("kmv_out").outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    // append mode emits only watermark-closed windows; compare those
    val streamed = spark.table("kmv_out")
      .as[(java.sql.Timestamp, Double)].collect().toMap
    assert(streamed.nonEmpty, "no windows closed — watermark never advanced")

    val batched = {
      import graft.functions.KmvSketch
      import graft.operators.TextAnalysis.portableHash60
      batch.groupBy(window(col("ts"), "1 hour"))
        .agg(udaf(KmvSketch.Kmv(64)).apply(
          portableHash60(col("user_id").cast("string"))).as("b"))
        .select(col("window.start").as("hour_start"),
          KmvSketch.estimate(col("b"), 64).as("approx_users"))
        .as[(java.sql.Timestamp, Double)].collect().toMap
    }
    streamed.foreach { case (hr, est) =>
      assert(batched(hr) == est, s"window $hr: streamed $est vs batch ${batched(hr)}")
    }
  }

  test("streaming windowed quantile equals the batch sketch bit-for-bit") {
    val batch = Tables.events(spark, sfDir)
    val srcDir = Files.createTempDirectory("graft-qs-src").toString
    batch.write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", 2).parquet(srcDir)
    val q = EventStream.windowedValueQuantiles(stream)
      .writeStream.format("memory").queryName("qs_out").outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("qs_out")
      .as[(java.sql.Timestamp, Double)].collect().toMap
    assert(streamed.nonEmpty)
    val batched = {
      import graft.functions.{BottomKSample, Exact}
      import graft.operators.TextAnalysis.portableHash60
      batch.groupBy(window(col("ts"), "1 hour"))
        .agg(udaf(BottomKSample.BottomK(256)).apply(
          portableHash60(col("event_id").cast("string")), col("value")).as("b"))
        .select(col("window.start").as("hour_start"),
          Exact.round6(BottomKSample.sampleQuantile(col("b"), 0.5)).as("p50_value"))
        .as[(java.sql.Timestamp, Double)].collect().toMap
    }
    streamed.foreach { case (hr, est) =>
      assert(batched(hr) == est, s"window $hr: streamed $est vs batch ${batched(hr)}")
    }
  }
}

class StreamTopKSpec extends SparkSpec {
  import spark.implicits._
  import java.nio.file.Files
  import graft.streaming.EventStream

  test("streaming windowed top-k equals the batch aggregate bit-for-bit") {
    val batch = Tables.events(spark, sfDir)
    val srcDir = Files.createTempDirectory("graft-topk-src").toString
    batch.write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", 2).parquet(srcDir)
    val q = EventStream.windowedTopValues(stream)
      .writeStream.format("memory").queryName("topk_out").outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("topk_out")
      .as[(java.sql.Timestamp, Seq[Double])].collect().toMap
    assert(streamed.nonEmpty, "no windows closed — watermark never advanced")
    val batched = {
      import graft.functions.TopKAggregate
      batch.groupBy(window(col("ts"), "1 hour"))
        .agg(TopKAggregate.topk(col("value"), 5).as("top_values"))
        .select(col("window.start").as("hour_start"), col("top_values"))
        .as[(java.sql.Timestamp, Seq[Double])].collect().toMap
    }
    streamed.foreach { case (hr, top) =>
      assert(batched(hr) == top, s"window $hr: streamed $top vs batch ${batched(hr)}")
    }
  }
}
