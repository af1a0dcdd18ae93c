package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Cast, Descending, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** As-of join as a FIRST-CLASS operator: logical node → planner
  * strategy → physical sort-merge exec. This is rung (c) of the
  * extension ladder — whole-operator semantics Spark lacks, planned
  * like a built-in join:
  *
  *  - the logical node declares the output (left columns + one nullable
  *    `asof_<col>` per right payload column);
  *  - [[AsOfJoinStrategy]] plans it to [[AsOfJoinExec]];
  *  - the exec node REQUIRES clustering on the key and ordering on
  *    (key, ts, payload) from its children — `EnsureRequirements`
  *    inserts exactly the one co-partitioning exchange + per-partition
  *    sort a built-in SortMergeJoin would get, and AQE sizes it — then
  *    streams both sorted sides through a single-pass merge: O(L+R)
  *    per partition, no window buffering, no row ever revisited.
  *
  * Semantics match [[graft.operators.AsOfJoin.asOf]] exactly
  * (spec-asserted): for each left row, the right row with the same key
  * and the greatest `rightTs` ≤ `leftTs`; among equal-`rightTs` rows
  * the lexicographically greatest payload wins (the required child
  * ordering includes the payload columns, and the merge keeps the LAST
  * qualifying row — ascending sort makes that the struct max the
  * composed operator computes). Left rows with no match get nulls.
  *
  * Key and timestamp columns must be integral (epoch-µs longs are the
  * expected currency).
  */
/** Attributes (not names) ride in the node so optimizer copies — column
  * pruning in particular — keep references and output exprIds stable;
  * `asofOutput` is minted ONCE at construction (in
  * [[graft.operators.AsOfJoin.asOfExec]]) for the same reason. The
  * attribute fields double as the node's `expressions`, so the default
  * `references` is exactly what the operator consumes and pruning keeps
  * precisely those columns alive. */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    lKey: Attribute, rKey: Attribute, lTs: Attribute, rTs: Attribute,
    rPayload: Seq[Attribute], asofOutput: Seq[Attribute],
    forward: Boolean = false)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ asofOutput

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofOutput)

  // everything emitted from the left side must survive pruning (the
  // default expression-derived references would let unused left columns
  // be pruned out from under `output`)
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output ++ Seq(rKey, rTs) ++ rPayload)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

class AsOfJoinStrategy(spark: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(planLater(n.left), planLater(n.right),
        n.lKey, n.rKey, n.lTs, n.rTs, n.rPayload, n.asofOutput, n.forward) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    lKey: Attribute, rKey: Attribute, lTs: Attribute, rTs: Attribute,
    rPayload: Seq[Attribute], asofOutput: Seq[Attribute],
    forward: Boolean = false)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ asofOutput

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofOutput)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(lKey)) :: ClusteredDistribution(Seq(rKey)) :: Nil

  // ordering on (key, ts, payload...) — the payload tail makes the
  // "last qualifying row wins" rule equal the composed operator's
  // lexicographic struct extremum under timestamp ties: backward scans
  // ascending and keeps max(struct); FORWARD scans ts+payload DESCENDING
  // (key still ascending) so the last qualifying row is the EARLIEST
  // right row at-or-after, min payload on ties — exactly asOfForward's
  // running min(struct)
  private def dir = if (forward) Descending else Ascending
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(lKey, Ascending), SortOrder(lTs, dir)),
    SortOrder(rKey, Ascending) +:
      (rTs +: rPayload).map(a => SortOrder(a, dir)))

  override protected def doExecute(): RDD[InternalRow] = {
    val carried = rTs +: rPayload // what the merge carries off the right side
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(
        Seq(Cast(lKey, LongType), Cast(lTs, LongType)), left.output)
      val rKeyProj = UnsafeProjection.create(
        Seq(Cast(rKey, LongType), Cast(rTs, LongType)), right.output)
      val rCarryProj = UnsafeProjection.create(carried, right.output)
      val carrySchema = carried.map(a =>
        AttributeReference(a.name, a.dataType, nullable = true)())
      val nullCarry = new GenericInternalRow(carried.length)
      // final projection drops the carried rTs (position 0) and keeps
      // the payload tail as the asof_* output columns
      val resultProj = UnsafeProjection.create(
        left.output ++ carrySchema.drop(1), left.output ++ carrySchema)
      val joined = new JoinedRow

      val rBuf = rIter.buffered
      var bestKey = 0L
      var best: InternalRow = null

      lIter.map { lRow =>
        val lk = lKeyProj(lRow)
        val k = lk.getLong(0)
        val t = lk.getLong(1)
        // advance the right side to the last row with key == k and
        // ts <= t (backward) / ts >= t (forward — descending scan)
        var advance = true
        while (advance && rBuf.hasNext) {
          val peek = rKeyProj(rBuf.head)
          val rk = peek.getLong(0)
          val rt = peek.getLong(1)
          if (rk < k || (rk == k && (if (forward) rt >= t else rt <= t))) {
            val row = rBuf.next()
            if (rk == k) { best = rCarryProj(row).copy(); bestKey = k }
          } else advance = false
        }
        val carry = if (best != null && bestKey == k) best else nullCarry
        resultProj(joined(lRow, carry))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
