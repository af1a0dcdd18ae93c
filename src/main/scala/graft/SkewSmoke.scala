package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Diagnostic: MEASURED skew — a planted 50%-hot key joined with and
  * without salting, reporting the per-task time spread of the heaviest
  * stage (the straggler histogram, not just wall time: one pinned
  * reducer is invisible in totals until it IS the total).
  *
  * AQE and auto-broadcast are disabled for the measurement: AQE's
  * skew-join splitting solves this case at runtime (and is ON in
  * production sessions — [[Graft.session]]); `saltedJoin` is the
  * explicit form for plans AQE can't split, which is exactly the regime
  * this smoke isolates. Usage: runMain graft.SkewSmoke
  */
object SkewSmoke {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session(appName = "graft-skew-smoke")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    // task-duration + shuffle-write capture, keyed by stage
    val taskMs = scala.collection.concurrent.TrieMap[Int, List[Long]]()
    val shufBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null) {
          taskMs.updateWith(te.stageId)(old => Some(te.taskInfo.duration :: old.getOrElse(Nil)))
          if (te.taskMetrics != null)
            shufBytes.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
    })

    // 50% of rows carry key 0; the rest spread over 100k keys. The
    // right side is the "too big to broadcast, cheap to replicate"
    // regime saltedJoin targets — salt 8 replicates 100k rows, noise
    // next to spreading a 10M-row hot key over 8 reducers
    val n = 20000000L
    val nKeys = 100000L
    val left = spark.range(n).select(
      when(col("id") % 2 === 0, lit(0L)).otherwise(pmod(col("id"), lit(nKeys))).as("k"),
      (col("id") % 97).cast("double").as("v"))
    val right = spark.range(nKeys).select(col("id").as("k"), (col("id") % 13).as("w"))

    def phase(name: String)(f: => Unit): Unit = {
      taskMs.clear(); shufBytes.set(0L)
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async — wait for the bus to quiesce before
      // reading, or late task events leak into the next phase's counters
      var last = -1L
      while ({ val n = taskMs.values.map(_.size).sum + shufBytes.get
               val moved = n != last; last = n; moved }) Thread.sleep(400)
      // heaviest stage = the reducer stage the hot key pins
      val (stage, times) = taskMs.toSeq.maxBy(_._2.sum)
      val s = times.sorted
      def pct(p: Double) = s(math.min(s.length - 1, (p * s.length).toInt))
      println(f"[skew] $name%-14s wall ${wall}%6.2fs  stage $stage%4d  tasks ${s.length}%4d  " +
        f"max ${s.last / 1000.0}%6.2fs  p95 ${pct(0.95) / 1000.0}%6.2fs  " +
        f"median ${pct(0.5) / 1000.0}%6.2fs  max/median ${s.last.toDouble / math.max(1, pct(0.5))}%5.1fx  " +
        f"shuffle ${shufBytes.get / 1048576.0}%8.1f MiB")
    }

    // warm the scan/codegen paths once
    left.join(right, "k").limit(1).count()

    phase("plain_join") {
      left.join(right, "k")
        .agg(sum(col("v") * col("w")).as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    phase("salted_join") {
      operators.Skew.saltedJoin(left, right, "k", 8)
        .agg(sum(col("v") * col("w")).as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    // the AUTO form: same plain-spelled join as phase 1, salted by
    // AutoSaltRewrite off the preflight-registered ratio — the measured
    // proof that detect→rewrite reproduces the hand-salted profile
    operators.Skew.preflight(left, "k")
    spark.conf.set("spark.graft.autoSalt.factor", "8")
    spark.conf.set("spark.graft.autoSalt.maxBroadcastBytes", "0")
    try phase("auto_salt") {
      left.join(right, "k")
        .agg(sum(col("v") * col("w")).as("s"))
        .write.format("noop").mode("overwrite").save()
    } finally {
      spark.conf.unset("spark.graft.autoSalt.factor")
      spark.conf.unset("spark.graft.autoSalt.maxBroadcastBytes")
      operators.Skew.clearHotKeys(spark)
    }

    // per-group cap under the same 50%-hot skew (20 source-like
    // groups): InferWindowGroupLimit turns `row_number ≤ k` into a
    // PARTIAL WindowGroupLimit BEFORE the exchange, so map tasks
    // forward ≤ k rows per group — the hot group ships the same bytes
    // as a cold one. The second phase excludes the rule to expose what
    // the naive window plan would shuffle and sort on one reducer.
    val nSrc = 20L
    val capped = spark.range(n).select(
      when(col("id") % 2 === 0, lit(0L)).otherwise(pmod(col("id"), lit(nSrc))).as("g"),
      xxhash64(col("id")).as("h"), col("id"))
    def windowCap() = {
      import org.apache.spark.sql.expressions.Window
      capped.withColumn("rn", row_number().over(
          Window.partitionBy(col("g")).orderBy(col("h"), col("id"))))
        .where(col("rn") <= 100).select(col("g"), col("id"))
    }
    phase("cap_grouplimit") {
      windowCap().write.format("noop").mode("overwrite").save()
    }
    val exclKey = "spark.sql.optimizer.excludedRules"
    spark.conf.set(exclKey,
      "org.apache.spark.sql.catalyst.optimizer.InferWindowGroupLimit")
    try phase("cap_norule") {
      windowCap().write.format("noop").mode("overwrite").save()
    } finally spark.conf.unset(exclKey)

    // Bloom semi-join reduction under the same broadcast-disabled
    // regime ("key set fits a bitmap, not a hash table"): a 20M-row
    // probe against 100k keys at ~10% hit rate. The plain semi join
    // shuffles every probe row; the bloom-prefiltered form shuffles
    // only the might-match minority, the exact join re-checks. The
    // anti phases measure the BYPASS: definitely-absent rows (90%)
    // skip the shuffle entirely.
    val bprobe = spark.range(n).select(
      pmod(xxhash64(col("id")), lit(1000000L)).as("k"),
      (col("id") % 97).cast("double").as("v"))
    val bkeys = spark.range(100000L).select((col("id") * 10L).as("bk"))
    phase("semi_plain") {
      bprobe.join(bkeys, col("k") === col("bk"), "left_semi")
        .agg(sum(col("v")).as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    phase("semi_bloom") { // buildBits runs inside the phase: honest total
      operators.BloomJoin.semiJoin(bprobe, "k", bkeys, "bk")
        .agg(sum(col("v")).as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    phase("anti_plain") {
      bprobe.join(bkeys, col("k") === col("bk"), "left_anti")
        .agg(sum(col("v")).as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    phase("anti_bloom") {
      operators.BloomJoin.antiJoin(bprobe, "k", bkeys, "bk")
        .agg(sum(col("v")).as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
