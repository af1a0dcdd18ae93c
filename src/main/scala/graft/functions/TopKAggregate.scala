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

  case class TopK(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
    override def zero: Seq[Double] = Vector.empty
    override def reduce(buf: Seq[Double], v: Double): Seq[Double] = trim(buf :+ v)
    override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] = trim(a ++ b)
    override def finish(buf: Seq[Double]): Seq[Double] = buf
    private def trim(s: Seq[Double]): Seq[Double] =
      if (s.length <= k) s.sorted(Ordering[Double].reverse)
      else s.sorted(Ordering[Double].reverse).take(k)
    override def bufferEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] = bufferEncoder
  }

  /** topk(col, k) as an untyped aggregate Column. */
  def topk(c: Column, k: Int): Column = udaf(TopK(k)).apply(c)
}
