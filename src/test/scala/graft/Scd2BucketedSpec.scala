package graft

import org.apache.spark.sql.functions._
import graft.sources.Catalog

/** Hash-bucketed SCD2 open state — the last MV rung that still paid a
  * full-state rewrite per refresh. Same history as the flat rung at
  * any batch granularity, O(touched) open-state writes, the emptied-
  * bucket drop list replaying idempotently from the intent, and the
  * whole read/compact/backfill verb family layout-transparent. */
class Scd2BucketedSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat() = new Catalog(spark, sfDir,
    Some(java.nio.file.Files.createTempDirectory("graft-scd2b").toString))

  // an upsert chain, a tombstone, a re-creation, and two quiet keys
  private def changes = Seq(
    ("a", 10L, 1L, "u"), ("a", 20L, 4L, "u"), ("a", 0L, 6L, "d"),
    ("a", 30L, 8L, "u"),
    ("b", 7L, 2L, "u"), ("b", 9L, 5L, "u"),
    ("c", 1L, 3L, "u"))
    .toDF("k", "v", "seq", "op")

  private def histSet(df: org.apache.spark.sql.DataFrame) = df
    .select(col("k"), col("v"), col("valid_from"), col("valid_to"),
      col("is_current"))
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) null else r.getLong(3), r.getBoolean(4))).toSet

  test("bucketed history equals the flat rung at any ordered split") {
    val expected = histSet(Catalog.scd2History(changes, "k", "seq", "op"))
    def streamed(bounds: Seq[Long]) = {
      val cat = freshCat()
      val lo = Long.MinValue +: bounds
      val hi = bounds :+ Long.MaxValue
      lo.zip(hi).zipWithIndex.foreach { case ((l, h), i) =>
        cat.refreshScd2MvBucketed("h",
          changes.where(col("seq") > l && col("seq") <= h),
          "k", "seq", "op", i.toLong, nBuckets = 4)
      }
      histSet(cat.scd2MvHistory("h", "seq", "op"))
    }
    assert(expected.nonEmpty)
    assert(streamed(Nil) == expected)
    assert(streamed(Seq(4L)) == expected)
    assert(streamed(Seq(2L, 5L, 7L)) == expected)
  }

  test("a refresh leaves untouched open buckets' files alone (mtimes)") {
    val cat = freshCat()
    val base = (1 to 400)
      .map(i => (s"k$i", i.toLong, 1L, "u")).toDF("k", "v", "seq", "op")
    cat.refreshScd2MvBucketed("h", base, "k", "seq", "op", 0L, nBuckets = 16)
    val openRoot = new java.io.File(s"${cat.derivedDir}/h/open")
    val delta = Seq(("k7", 99L, 10L, "u")).toDF("k", "v", "seq", "op")
    val touchedGb = delta
      .select(pmod(hash(col("k")), lit(16)).cast("int")).head().getInt(0)
    val before = openRoot.listFiles().filter(_.getName.startsWith("gb="))
      .filterNot(_.getName == s"gb=$touchedGb")
      .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet")))
      .map(f => f.getPath -> f.lastModified()).toMap
    assert(before.nonEmpty)
    Thread.sleep(1100) // mtime granularity
    cat.refreshScd2MvBucketed("h", delta, "k", "seq", "op", 1L, nBuckets = 16)
    before.foreach { case (p, m) =>
      val f = new java.io.File(p)
      assert(f.exists() && f.lastModified() == m, s"untouched file rewritten: $p")
    }
    // and the touched key's version history is right
    val h = histSet(cat.scd2MvHistory("h", "seq", "op"))
    assert(h.contains(("k7", 7L, 1L, 10L, false)))
    assert(h.contains(("k7", 99L, 10L, null, true)))
  }

  test("a tombstone-only batch EMPTIES its bucket via the intent drop list") {
    val cat = freshCat()
    val keys = (1 to 20).map(i => s"k$i")
    val gbOf = keys.toDF("k")
      .select(col("k"), pmod(hash(col("k")), lit(2)).cast("int").as("gb"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val dropKeys = keys.filter(gbOf(_) == 0)
    val keepKeys = keys.filter(gbOf(_) == 1)
    assert(dropKeys.nonEmpty && keepKeys.nonEmpty)
    cat.refreshScd2MvBucketed("h",
      keys.zipWithIndex.map { case (k, i) => (k, 1L, i.toLong + 1, "u") }
        .toDF("k", "v", "seq", "op"),
      "k", "seq", "op", 0L, nBuckets = 2)
    // close EVERY key in bucket 0 — partitionBy stages nothing for it,
    // so only the intent's drop list can retire the live dir
    cat.refreshScd2MvBucketed("h",
      dropKeys.map(k => (k, 0L, 100L, "d")).toDF("k", "v", "seq", "op"),
      "k", "seq", "op", 1L, nBuckets = 2)
    assert(!new java.io.File(s"${cat.derivedDir}/h/open/gb=0").exists(),
      "emptied bucket's live dir survived the install")
    val h = histSet(cat.scd2MvHistory("h", "seq", "op"))
    dropKeys.foreach(k => assert(!h.exists(t => t._1 == k && t._5), k))
    keepKeys.foreach(k => assert(h.exists(t => t._1 == k && t._5), k))
  }

  test("closing the LAST live bucket keeps one schema-bearing empty bucket") {
    val cat = freshCat()
    // nBuckets=1: every key in one bucket, so closing all keys empties it
    cat.refreshScd2MvBucketed("h",
      Seq(("a", 1L, 1L, "u"), ("b", 2L, 2L, "u")).toDF("k", "v", "seq", "op"),
      "k", "seq", "op", 0L, nBuckets = 1)
    cat.refreshScd2MvBucketed("h",
      Seq(("a", 0L, 3L, "d"), ("b", 0L, 4L, "d")).toDF("k", "v", "seq", "op"),
      "k", "seq", "op", 1L, nBuckets = 1)
    val h = histSet(cat.scd2MvHistory("h", "seq", "op"))
    assert(h == Set(("a", 1L, 1L, 3L, false), ("b", 2L, 2L, 4L, false)))
    assert(!h.exists(_._5)) // nothing open
    // the state stays readable and the stream goes on
    cat.refreshScd2MvBucketed("h",
      Seq(("c", 5L, 5L, "u")).toDF("k", "v", "seq", "op"),
      "k", "seq", "op", 2L, nBuckets = 1)
    assert(histSet(cat.scd2MvHistory("h", "seq", "op"))
      .contains(("c", 5L, 5L, null, true)))
  }

  test("retried batch id is a no-op; flat and bucketed layouts refuse to mix") {
    val cat = freshCat()
    cat.refreshScd2MvBucketed("h", changes.where(col("seq") <= 4),
      "k", "seq", "op", 0L, nBuckets = 4)
    cat.refreshScd2MvBucketed("h", changes.where(col("seq") > 4),
      "k", "seq", "op", 1L, nBuckets = 4)
    val before = histSet(cat.scd2MvHistory("h", "seq", "op"))
    cat.refreshScd2MvBucketed("h", changes.limit(2), "k", "seq", "op", 1L,
      nBuckets = 4)
    assert(histSet(cat.scd2MvHistory("h", "seq", "op")) == before)
    // layout guards, both directions
    val exFlat = intercept[IllegalArgumentException](
      cat.refreshScd2Mv("h", changes.limit(1), "k", "seq", "op", 9L))
    assert(exFlat.getMessage.contains("hash-bucketed"))
    val cat2 = freshCat()
    cat2.refreshScd2Mv("f", changes.limit(2), "k", "seq", "op", 0L)
    val exBucketed = intercept[IllegalArgumentException](
      cat2.refreshScd2MvBucketed("f", changes.limit(1), "k", "seq", "op", 1L))
    assert(exBucketed.getMessage.contains("flat"))
  }

  test("compaction and backfill both preserve the bucketed layout") {
    val cat = freshCat()
    Seq((1L, 4L), (4L, 6L), (6L, Long.MaxValue)).zipWithIndex.foreach {
      case ((l, h), i) =>
        cat.refreshScd2MvBucketed("h",
          changes.where(col("seq") >= l && col("seq") < h),
          "k", "seq", "op", i.toLong, nBuckets = 4)
    }
    val before = histSet(cat.scd2MvHistory("h", "seq", "op"))
    cat.compactScd2("h")
    assert(histSet(cat.scd2MvHistory("h", "seq", "op")) == before)
    def sidecar() = new java.io.File(
      s"${cat.derivedDir}/h/open/_graft_buckets")
    assert(sidecar().exists(), "compaction dropped the bucket sidecar")
    // a late upsert for b lands under its tombstone-free history
    cat.scd2Backfill("h",
      Seq(("b", 8L, 3L, "u")).toDF("k", "v", "seq", "op"), "k", "seq", "op")
    val h = histSet(cat.scd2MvHistory("h", "seq", "op"))
    assert(h.contains(("b", 8L, 3L, 5L, false))) // late span closed by seq 5
    assert(h.contains(("b", 9L, 5L, null, true)))
    assert(sidecar().exists(), "backfill dropped the bucket sidecar")
    // and the repaired state still refreshes BUCKETED — the layout held
    cat.refreshScd2MvBucketed("h",
      Seq(("d", 1L, 20L, "u")).toDF("k", "v", "seq", "op"),
      "k", "seq", "op", 3L, nBuckets = 4)
    assert(histSet(cat.scd2MvHistory("h", "seq", "op"))
      .contains(("d", 1L, 20L, null, true)))
  }

  test("the bucketed live replay equals the flat replay at any granularity") {
    val flat = streaming.EventStream
      .scd2Replay(spark, sfDir, maxFilesPerTrigger = 5).collect().toSet
    val bucketed = streaming.EventStream
      .scd2Replay(spark, sfDir, maxFilesPerTrigger = 3, bucketed = true)
      .collect().toSet
    assert(flat.nonEmpty)
    assert(bucketed == flat)
  }

  test("a torn post-intent install (with a drop list) heals on next read") {
    val cat = freshCat()
    cat.refreshScd2MvBucketed("h",
      Seq(("a", 1L, 1L, "u"), ("b", 2L, 2L, "u")).toDF("k", "v", "seq", "op"),
      "k", "seq", "op", 0L, nBuckets = 1)
    // fabricate the crash state a batch-1 refresh would leave right
    // after committing its intent: staged replacement bucket + a drop
    // of gb=0, nothing installed yet
    val open = new java.io.File(s"${cat.derivedDir}/h/open")
    val staged = new java.io.File(open, ".staged")
    Seq(("c", 9L, 5L, "u")).toDF("k", "v", "seq", "op").repartition(1)
      .write.parquet(s"$staged/data/gb=0")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$staged/_intent"),
      "1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first read heals: the staged bucket swaps in, marker advances
    val h = histSet(cat.scd2MvHistory("h", "seq", "op"))
    assert(h.exists(t => t._1 == "c" && t._5))
    assert(!h.exists(t => t._1 == "a" && t._5)) // old bucket replaced
    // the healed marker makes a replay of batch 1 a no-op
    cat.refreshScd2MvBucketed("h",
      Seq(("z", 0L, 9L, "u")).toDF("k", "v", "seq", "op"),
      "k", "seq", "op", 1L, nBuckets = 1)
    assert(!histSet(cat.scd2MvHistory("h", "seq", "op")).exists(_._1 == "z"))
  }
}
