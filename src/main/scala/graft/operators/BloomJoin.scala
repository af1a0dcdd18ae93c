package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BloomContains

/** Semi-/anti-join REDUCTION behind a prepared Bloom filter — the
  * distributed-systems classic for "filter a huge fact stream by a key
  * set that fits a bitmap but not a broadcast hash table". The
  * reference's shuffle ships EVERY mapper output file to its reducer
  * with no key-set pruning (dfs/compute_engine/compute_engine.go:141-157);
  * here the probe side is prefiltered MAP-SIDE by k bit tests before
  * any row pays the shuffle, and an EXACT join re-checks the
  * survivors, so the Bloom filter's false-positive rate moves BYTES,
  * never results.
  *
  * Relationship to Spark's own runtime Bloom pruning (ON in
  * [[graft.Graft.session]]): the built-in
  * `spark.sql.optimizer.runtime.bloomFilter` injects a filter only
  * when its size/selectivity heuristics fire, sizes it itself, and
  * rebuilds it per query. This operator is the DETERMINISTIC, owned
  * form: the caller picks the bit budget, the build runs once, and the
  * same bits can prefilter many probe queries (the prepared-artifact
  * shape every Catalog index follows). Use it when the heuristics
  * don't fire — or when one expensive key set gates a whole family of
  * scans (e.g. "documents already ingested" in front of every
  * incremental corpus batch).
  *
  * Scale shape: `buildBits` reduces the build side to ≤ m/64 longs via
  * a map-side-combinable `bit_or` — driver cost is bounded by the
  * FILTER size (m bits), never the build cardinality, the same bound
  * Spark's own runtime filter accepts when it broadcasts its bloom.
  * The probe pass is a map-only projection inside whole-stage codegen
  * ([[BloomContains]] unpacks the literal bitset once per task).
  */
object BloomJoin {

  /** Build the m-bit Bloom bitset over a key column, distributed:
    * k double-hashed positions per key → (word, mask) → one
    * map-side-combinable `bit_or` per word → collect ≤ m/64 rows.
    * m is the caller's byte budget (default 2²⁰ bits = 128 KiB —
    * ~0.5% false positives at 100k keys, k=4); at 100 TB pick m from
    * the expected key count, the filter still ships as metadata. */
  def buildBits(build: DataFrame, key: Column,
      mBits: Int = 1 << 20, k: Int = 4): Array[Long] = {
    val words = wordDelta(build, key, mBits, k).collect()
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** The distributed half of [[buildBits]]: keys reduced to `(w, b)`
    * word/mask rows via ONE map-side-combinable `bit_or` — ≤ m/64 rows
    * out regardless of input. Exposed separately because bit-OR is
    * idempotent/commutative/associative, which makes this delta the
    * MERGEABLE BUFFER of the Bloom membership MV
    * ([[graft.sources.Catalog.refreshBloomMv]]): folding per-batch
    * word deltas yields bits IDENTICAL to one pass over everything. */
  def wordDelta(build: DataFrame, key: Column,
      mBits: Int = 1 << 20, k: Int = 4): DataFrame = {
    require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64: $mBits")
    require(k >= 1 && k <= 16, s"k probes out of range: $k")
    val (h1, h2) = BloomContains.hashPair(key)
    // mod-first double hashing (matches BloomContains.probe): both
    // hashes reduce mod m before combining, so the sum never overflows
    val (h1m, h2m) = (pmod(h1, lit(mBits.toLong)), pmod(h2, lit(mBits.toLong)))
    val pos = explode(array((0 until k).map(i =>
      pmod(h1m + lit(i.toLong) * h2m, lit(mBits.toLong))): _*))
    build.select(pos.as("p"))
      .select(shiftright(col("p"), 6).cast("int").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").as("b"))
      .groupBy("w").agg(expr("bit_or(b)").as("b"))
  }

  /** Membership probe column over a prepared bitset — reusable across
    * any number of probe queries (k must match the build's). */
  def mightContain(bits: Array[Long], key: Column, k: Int = 4): Column =
    BloomContains.mightContain(bits, key, k)

  /** `probe LEFT SEMI JOIN build` with a map-side Bloom prefilter:
    * only rows whose key MIGHT be in the build side pay the shuffle;
    * the exact semi join re-checks survivors (false positives drop
    * here), so the result equals the plain semi join for ANY m/k. */
  def semiJoin(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      mBits: Int = 1 << 20, k: Int = 4): DataFrame = {
    // the re-check key rides under a reserved alias: with the natural
    // spelling (both sides named "id") an unqualified
    // col(probeKey) === col(buildKey) is ambiguous across the join and
    // Spark rejects it — the alias makes the condition side-unique for
    // ANY key names (probe columns may not start with "__graft")
    val keys = build.select(col(buildKey).as(BuildKeyAlias))
    val bits = buildBits(keys, col(BuildKeyAlias), mBits, k)
    probe.where(mightContain(bits, col(probeKey), k))
      .join(keys, col(probeKey) === col(BuildKeyAlias), "left_semi")
  }

  /** `probe LEFT ANTI JOIN build` with a Bloom BYPASS: a key the
    * filter rejects is DEFINITELY absent (no false negatives), so
    * those rows skip the shuffle entirely and only the might-match
    * minority pays the exact anti join — at 100 TB, when most of the
    * fact stream is new (the incremental-ingest case), almost nothing
    * shuffles. Null probe keys hash to the empty-input digest and
    * route like any value; whichever branch they take keeps them,
    * matching left_anti's null-never-matches semantics. */
  def antiJoin(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      mBits: Int = 1 << 20, k: Int = 4): DataFrame = {
    val keys = build.select(col(buildKey).as(BuildKeyAlias))
    val bits = buildBits(keys, col(BuildKeyAlias), mBits, k)
    val might = mightContain(bits, col(probeKey), k)
    probe.where(!might)
      .unionByName(probe.where(might)
        .join(keys, col(probeKey) === col(BuildKeyAlias), "left_anti"))
  }

  /** Side-unique name the exact re-check join binds the build key
    * under (see [[semiJoin]]) — identical probe/build key names stay
    * unambiguous. */
  private val BuildKeyAlias = "__graft_bloom_bk"
}
