package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Typed compatibility surface for the reference's pluggable MapReduce
  * jobs (reference: mapreduce_plugin_mock/word-count.go:56,
  * reviews.go:57; mapper contract dfs/compute_engine/context.go:93 —
  * map(lineNumber, lineText) emits key/value pairs, reduce(key, values)
  * folds them).
  *
  * A user of the reference ports a plugin by translating its Map/Reduce
  * bodies into two Scala closures — the engine around them is Spark's
  * typed Dataset pipeline: flatMap → groupByKey → reduce. Prefer
  * [[runCombinable]] whenever the reducer is a semigroup merge: it
  * executes as an Aggregator with map-side partial aggregation (the
  * combiner the reference lacks), so shuffle volume is O(distinct keys)
  * not O(emitted pairs). [[run]] is the fully-general form (arbitrary
  * reducer over all values of a key, e.g. order statistics) and shuffles
  * every pair, exactly like the reference's TSV shuffle — use it only
  * when the reduce genuinely needs the whole group.
  *
  * For anything expressible declaratively, use [[MapReduceOps]] /
  * DataFrame ops instead — Catalyst can't see inside these closures.
  */
object MapReduceJob {

  /** Chunk-local line numbers — the reference mapper's input contract
    * (line number within the chunk, not global), which is exactly a
    * partition-local index: no shuffle, no global coordination. */
  def numberedLines(lines: Dataset[String]): Dataset[(Long, String)] = {
    implicit val enc: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    lines.mapPartitions(_.zipWithIndex.map { case (l, i) => (i.toLong, l) })
  }

  /** Fully-general grouped reduce: every emitted pair shuffles. */
  def run[K, V, R](lines: Dataset[(Long, String)])(
      mapFn: (Long, String) => IterableOnce[(K, V)])(
      reduceFn: (K, Iterator[V]) => R)(
      implicit kvEnc: Encoder[(K, V)], kEnc: Encoder[K],
      krEnc: Encoder[(K, R)]): Dataset[(K, R)] =
    lines
      .flatMap { case (n, t) => mapFn(n, t) }
      .groupByKey(_._1)
      .mapGroups((key, it) => (key, reduceFn(key, it.map(_._2))))

  /** Semigroup reduce: executes with map-side partial aggregation. */
  def runCombinable[K, V](lines: Dataset[(Long, String)])(
      mapFn: (Long, String) => IterableOnce[(K, V)])(
      merge: (V, V) => V)(
      implicit kvEnc: Encoder[(K, V)], kEnc: Encoder[K]): Dataset[(K, V)] =
    lines
      .flatMap { case (n, t) => mapFn(n, t) }
      .groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, merge(a._2, b._2)))
      .map { case (k, (_, v)) => (k, v) }

  /** Port of word-count.go: tabs → spaces, split on single spaces, emit
    * (word, 1); reduce sums. */
  def wordCountJob(lines: Dataset[String]): Dataset[(String, Long)] = {
    import lines.sparkSession.implicits._
    runCombinable(numberedLines(lines))(
      (_, text) => text.replace('\t', ' ').split(" ").iterator
        .filter(_.nonEmpty).map(_ -> 1L))(
      _ + _)
  }

  /** Port of reviews.go: parse a CSV-ish "key,value" line, emit
    * (key, (cents, 1)); reduce merges partial sums; finish with the
    * average. Money kept in integer cents until the final division so
    * the result is order-independent and engine-exact. */
  def avgByKeyJob(lines: Dataset[String]): Dataset[(String, Double)] = {
    import lines.sparkSession.implicits._
    runCombinable(numberedLines(lines))(
      (_, line) => {
        val parts = line.split(",")
        if (parts.length < 2) Iterator.empty
        else Iterator(parts(0) -> (math.round(parts(1).toDouble * 100), 1L))
      })(
      (a, b) => (a._1 + b._1, a._2 + b._2))
      .map { case (k, (cents, n)) => (k, cents / 100.0 / n) }
  }
}
