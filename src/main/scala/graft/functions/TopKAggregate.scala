package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Map-side top-k aggregate: `topk(col, k)` keeps the k largest values
  * per group with a bounded buffer.
  *
  * The window-function route (`row_number` + filter) shuffles EVERY row
  * to its group's reducer; this aggregate's partial buffers cap at k
  * values per group per map task, so shuffle volume drops from O(rows)
  * to O(groups × k) — the difference between feasible and not at 100 TB
  * for top-k-per-key questions.
  */
object TopKAggregate {

  /** Buffer invariant: always sorted descending, length ≤ k. reduce is a
    * bounded insert — O(1) rejection once the buffer is full and the
    * value is below the floor (the overwhelmingly common case on big
    * groups), O(k) copy otherwise; never a per-row sort. */
  case class TopK(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
    override def zero: Seq[Double] = Vector.empty
    override def reduce(buf: Seq[Double], v: Double): Seq[Double] =
      if (buf.length >= k && v <= buf.last) buf
      else {
        val i = buf.indexWhere(v > _)
        val at = if (i < 0) buf.length else i
        val ins = (buf.take(at) :+ v) ++ buf.drop(at)
        if (ins.length > k) ins.take(k) else ins
      }
    override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] = {
      // linear merge of two descending-sorted buffers, capped at k
      val out = Vector.newBuilder[Double]
      var (i, j, n) = (0, 0, 0)
      while (n < k && (i < a.length || j < b.length)) {
        if (j >= b.length || (i < a.length && a(i) >= b(j))) { out += a(i); i += 1 }
        else { out += b(j); j += 1 }
        n += 1
      }
      out.result()
    }
    override def finish(buf: Seq[Double]): Seq[Double] = buf
    override def bufferEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] = bufferEncoder
  }

  /** topk(col, k) as an untyped aggregate Column. */
  def topk(c: Column, k: Int): Column = udaf(TopK(k)).apply(c)
}
