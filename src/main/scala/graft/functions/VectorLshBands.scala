package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Hyperplane-LSH band keys for an embedding vector — the row-local
  * kernel behind [[graft.plans.AutoLadderRewrite]]'s banded rewrite of
  * cosine-threshold joins (and usable directly as SQL
  * `vector_lsh_bands(vec, nBands, bitsPerBand, seed)`).
  *
  * Band `i`'s key packs `bitsPerBand` sign bits, each the sign of the
  * dot product with a pseudo-random Rademacher (±1-component)
  * hyperplane derived from `(seed, bitIndex, component)` by a splitmix
  * mix — no hyperplane materialization, any dimensionality, and the
  * same key on every engine/run for a fixed seed. The band index rides
  * the high bits of the key, so keys from different bands can never
  * collide and ONE exploded long column per side is a complete band
  * equi-join key. Two vectors at angle θ agree on one sign bit with
  * probability 1 − θ/π (Goemans–Williamson), so P(some band matches) =
  * 1 − (1 − p^bits)^bands — sized for the high-cosine near-dup regime;
  * identical-direction vectors (cos = 1) match EVERY band, so exact
  * duplicates are never lost.
  *
  * Map-only projection: O(bands · bits · dim) flops per row, zero
  * state, codegen'd.
  */
case class VectorLshBands(children: Seq[Expression]) extends Expression {

  private def vec = children(0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = vec.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    def fail(msg: String) = TypeCheckResult.TypeCheckFailure(msg)
    if (children.length != 4) fail("vector_lsh_bands expects (vec, nBands, bitsPerBand, seed)")
    else vec.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        if (children.tail.forall(_.foldable)) TypeCheckResult.TypeCheckSuccess
        else fail("nBands, bitsPerBand and seed must be literals")
      case other => fail(s"expected array<float|double>, got $other")
    }
  }

  private lazy val isFloat = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val nBands = children(1).eval().asInstanceOf[Number].intValue()
  private lazy val bits = children(2).eval().asInstanceOf[Number].intValue()
  private lazy val seed = children(3).eval().asInstanceOf[Number].longValue()

  def bands(v: ArrayData): ArrayData =
    VectorLshBands.bands(v, isFloat, nBands, bits, seed)

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) null else bands(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("lshBands", this, classOf[VectorLshBands].getName)
    val c = vec.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $self.bands(${c.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object VectorLshBands {

  /** splitmix64 finalizer over (seed, bit, component) — the ±1 draw. */
  private def rademacherNegative(seed: Long, bit: Long, m: Long): Boolean = {
    var z = seed ^ (bit * 0x9E3779B97F4A7C15L) ^ (m * 0xC2B2AE3D27D4EB4FL)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z & 1L) != 0L
  }

  def bands(v: ArrayData, isFloat: Boolean, nBands: Int, bits: Int, seed: Long): ArrayData = {
    val d = v.numElements()
    val out = new Array[Long](nBands)
    var band = 0
    while (band < nBands) {
      var key = 0L
      var bit = 0
      while (bit < bits) {
        val k = (band * bits + bit).toLong
        var dot = 0.0
        var m = 0
        while (m < d) {
          val x = if (isFloat) v.getFloat(m).toDouble else v.getDouble(m)
          dot += (if (rademacherNegative(seed, k, m.toLong)) -x else x)
          m += 1
        }
        key = (key << 1) | (if (dot > 0.0) 1L else 0L)
        bit += 1
      }
      out(band) = (band.toLong << bits) | key
      band += 1
    }
    new GenericArrayData(out)
  }

  def vectorLshBands(vec: Column, nBands: Column, bitsPerBand: Column,
      seed: Column): Column =
    call_function("vector_lsh_bands", vec, nBands, bitsPerBand, seed)
}
