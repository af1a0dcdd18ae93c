package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, ObjectType, StringType}

/** Native engine-portable 60-bit hash: the value of
  * `conv(substring(md5(x),1,15),16,10)` — the first 15 hex nibbles of
  * the md5 digest — computed straight from the digest bytes, skipping
  * the 32-char hex string render and the base-16 string parse the
  * column composition pays per row. Bit-identical by construction
  * (spec-asserted), so every DuckDB mirror
  * (`CAST('0x' || substr(md5(x),1,15) AS BIGINT)`) is untouched.
  *
  * This hash is the portability workhorse (KMV/quantile sketches,
  * fingerprints, span dedup, simhash, sampling), so the per-row string
  * round-trip it drops was paid in a dozen operators' hot scans.
  *
  * Registered as SQL `portable_hash60(s)` via [[GraftExtensions]].
  */
case class PortableHash60(children: Seq[Expression]) extends Expression {

  private def child = children(0)

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    def fail(msg: String) = TypeCheckResult.TypeCheckFailure(msg)
    if (children.length != 1) fail("portable_hash60 expects (s)")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => fail(s"expected string, got $other")
    }
  }

  def hash(s: org.apache.spark.unsafe.types.UTF8String): Long =
    PortableHash60.hash60(s.getBytes)

  override def eval(input: InternalRow): Any = {
    val s = child.eval(input)
    if (s == null) null
    else hash(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode.global(
      ctx.addReferenceObj("portableHash60", this, classOf[PortableHash60].getName),
      ObjectType(classOf[PortableHash60]))
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          ${ev.value} = $self.hash(${c.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object PortableHash60 {
  /** MD5 instances are stateful; one per thread (shared with
    * [[SimHashSig]]). */
  @transient private lazy val digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex nibbles of md5(bytes) as a long: bytes 0..6 fully,
    * high nibble of byte 7. */
  def hash60(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  def portableHash60(c: Column): Column = call_function("portable_hash60", c)
}
