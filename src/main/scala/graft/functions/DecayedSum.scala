package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: the dyadic-decay fold
  * `Σ arr(i) << (i + depth − n)` over an `array<long>` frame of n ≤
  * depth elements (oldest first) — element n−1 (the current row)
  * weighs 2^(depth−1), each older element half that. This is the
  * per-row kernel of [[graft.operators.Events.ewmaDecayedSum]]; the
  * equivalent `transform`+`aggregate` higher-order pair is
  * CodegenFallback, and ONE interpreted expression ejects its whole
  * projection from whole-stage codegen (the library's round-2
  * `VectorFunctions.toDouble` lesson) — this `doGenCode` loop keeps
  * the EWMA projection fused. Pure integer shifts and adds: exact in
  * any evaluation order, same bits as the HOF formulation
  * (spec-pinned). Registered as SQL `decayed_sum` via
  * [[GraftExtensions]].
  */
case class DecayedSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"decayed_sum expects (array<bigint>, int), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, d: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val depth = d.asInstanceOf[Int]
    val n = arr.numElements()
    var acc = 0L; var i = 0
    while (i < n) { acc += arr.getLong(i) << (i + depth - n); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, d) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) << ($i + $d - $n);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DecayedSum {
  /** Column entry point; requires a [[GraftExtensions]] session. */
  def decayedSum(frame: Column, depth: Column): Column =
    call_function("decayed_sum", frame, depth)
}
