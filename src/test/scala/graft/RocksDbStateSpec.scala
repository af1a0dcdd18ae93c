package graft

import graft.streaming.{EventStream, Replay}

/** RocksDB state store for the stateful replays: the provider changes
  * WHERE streaming state lives (executor local disk, incremental-
  * checkpointed) — never WHAT it holds. Pins (a) the RocksDB
  * sessionization replay emits exactly the default-provider multiset,
  * (b) the conf is scoped to the replay (no session leak), and (c) the
  * run really used RocksDB (its working dir appears under the
  * checkpoint's state path via the provider's own layout). */
class RocksDbStateSpec extends SparkSpec {

  test("sessionize replay under RocksDB == default provider, no conf leak") {
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(confKey)
    val rocks = EventStream.sessionizeReplayRocksDb(spark, sfDir)
      .collect().toSet
    assert(spark.conf.getOption(confKey) == before, "conf leaked")
    val default = EventStream.sessionizeReplay(spark, sfDir)
      .collect().toSet
    assert(rocks == default)
    assert(rocks.nonEmpty)
  }

  test("the RocksDB provider is actually engaged for the run") {
    // run a tiny stateful replay and capture the provider from the
    // query's own progress/metrics surface: RocksDB reports its
    // distinctive customMetrics (rocksdbGetLatency etc.) which the
    // default HDFS-backed provider never emits
    import org.apache.spark.sql.functions._
    val src = Replay.source(spark, sfDir)
    var sawRocks = false
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        if (e.progress.stateOperators.exists(_.customMetrics
            .keySet().toString.contains("rocksdb"))) sawRocks = true
    }
    spark.streams.addListener(listener)
    try {
      EventStream.sessionizeReplayRocksDb(spark, sfDir).collect()
      // progress events are async; poke until the listener saw one
      var waited = 0
      while (!sawRocks && waited < 50) { Thread.sleep(200); waited += 1 }
    } finally spark.streams.removeListener(listener)
    assert(sawRocks, "no rocksdb custom metrics in state operator progress")
  }
}
