package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch over engine-portable
  * hashes.
  *
  * Keeps the k SMALLEST DISTINCT 60-bit hashes per group in a bounded,
  * mergeable buffer — same map-side shape as [[TopKAggregate]]: partial
  * buffers cap at k longs per group per task, so the shuffle carries
  * O(groups × k) instead of the O(distinct) that an exact count needs.
  * Estimate: (k-1) · 2⁶⁰ / h₍ₖ₎, exact when the group has < k distinct
  * hashes (the buffer then IS the distinct set).
  *
  * Unlike HLL (whose bucket layout is engine-private, so
  * `approx_count_distinct` can never be value-verified across engines),
  * KMV over [[graft.operators.TextAnalysis.portableHash60]] is
  * reproducible by ANY engine with md5 and a window function — the
  * DuckDB mirror is `row_number() OVER (ORDER BY h) = k`. That makes
  * the sketch itself oracle-checkable, not just rows-only.
  */
object KmvSketch {

  /** Buffer invariant: ascending-sorted distinct longs, length ≤ k.
    * reduce is a bounded insert — O(1) rejection once the buffer is
    * full and the value is above the ceiling (the common case), O(k)
    * copy otherwise. */
  case class Kmv(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Vector.empty
    override def reduce(buf: Seq[Long], v: Long): Seq[Long] =
      if (buf.length >= k && v >= buf.last) buf
      else {
        val i = buf.indexWhere(v <= _)
        if (i >= 0 && buf(i) == v) buf // distinct: drop re-seen hashes
        else {
          val at = if (i < 0) buf.length else i
          val ins = (buf.take(at) :+ v) ++ buf.drop(at)
          if (ins.length > k) ins.take(k) else ins
        }
      }
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
      // deduplicating linear merge of two ascending buffers, capped at k
      val out = Vector.newBuilder[Long]
      var (i, j, n) = (0, 0, 0)
      var last: Option[Long] = None
      while (n < k && (i < a.length || j < b.length)) {
        val v = if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
                else { val x = b(j); j += 1; x }
        if (!last.contains(v)) { out += v; last = Some(v); n += 1 }
      }
      out.result()
    }
    override def finish(buf: Seq[Long]): Seq[Long] = buf
    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
  }

  /** kmv(hashCol, k): the ≤k smallest distinct hashes as an ascending
    * array column. `hashCol` must be uniform on [0, 2⁶⁰) — use
    * [[graft.operators.TextAnalysis.portableHash60]]. */
  def kmv(c: Column, k: Int): Column = udaf(Kmv(k)).apply(c)

  /** The k-th smallest hash from a kmv buffer, null when the group had
    * fewer than k distinct values (CaseWhen keeps the ANSI-mode
    * element_at from ever seeing an out-of-range index). */
  def kthHash(buf: Column, k: Int): Column =
    when(size(buf) >= k, element_at(buf, k))

  /** Distinct-count estimate from a kmv buffer: exact below k, else
    * (k-1) · 2⁶⁰ / h₍ₖ₎. 2⁶⁰ is a power of two, hence double-exact, and
    * the expression shape is mirrored verbatim in the oracle SQL so the
    * IEEE arithmetic is bit-identical cross-engine. */
  def estimate(buf: Column, k: Int): Column =
    when(size(buf) < k, size(buf).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(1152921504606846976.0) /
        element_at(buf, k).cast("double"))
}
