package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ObjectType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native engine-portable 60-bit hash: the value of
  * `conv(substring(md5(x),1,15),16,10)` — the first 15 hex nibbles of
  * the md5 digest — computed straight from the digest bytes, skipping
  * the 32-char hex string render and the base-16 string parse the
  * column composition pays per row. Bit-identical by construction
  * (spec-asserted), so every DuckDB mirror
  * (`CAST('0x' || substr(md5(x),1,15) AS BIGINT)`) is untouched.
  *
  * BATCH KERNEL form: takes 1..n arguments, each string or integral,
  * and hashes the md5 of their CONCATENATED string renderings —
  * `portable_hash60(a, '-', b)` ≡ `portable_hash60(concat(cast(a as
  * string), '-', cast(b as string)))` — without materializing any of
  * the per-row strings: integral args render their decimal digits into
  * a thread-local scratch buffer (no `Cast` to string, no UTF8String),
  * string args feed the digest zero-copy, the md5 state is updated
  * incrementally (md5(a ++ b) = md5 of the updates in order, so
  * concatenation is free), and the digest lands in a reusable 16-byte
  * output buffer (the JDK's one-shot `digest(bytes)` allocates per
  * call). This hash is the portability workhorse (KMV/quantile
  * sketches, fingerprints, span dedup, simhash, sampling order draws),
  * so the per-row cast+concat+allocation chain it drops was paid in a
  * dozen operators' hot scans. NULL if any argument is NULL (the same
  * semantics the cast+concat composition had).
  *
  * Registered as SQL `portable_hash60(args...)` via [[GraftExtensions]].
  */
case class PortableHash60(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  private val okTypes = Set[DataType](StringType, ByteType, ShortType, IntegerType, LongType)

  override def checkInputDataTypes(): TypeCheckResult = {
    def fail(msg: String) = TypeCheckResult.TypeCheckFailure(msg)
    if (children.isEmpty) fail("portable_hash60 expects at least one argument")
    else children.find(c => !okTypes.contains(c.dataType)) match {
      case Some(bad) => fail(s"expected string or integral, got ${bad.dataType}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  /** Single-string fast path kept for [[SimHashSig]] and the
    * interpreted one-arg case. */
  def hash(s: UTF8String): Long = PortableHash60.hash60(s.getBytes)

  override def eval(input: InternalRow): Any = {
    val md = PortableHash60.md()
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      children(i).dataType match {
        case StringType => PortableHash60.updString(md, v.asInstanceOf[UTF8String])
        case ByteType => PortableHash60.updLong(md, v.asInstanceOf[Byte].toLong)
        case ShortType => PortableHash60.updLong(md, v.asInstanceOf[Short].toLong)
        case IntegerType => PortableHash60.updLong(md, v.asInstanceOf[Int].toLong)
        case LongType => PortableHash60.updLong(md, v.asInstanceOf[Long])
      }
      i += 1
    }
    PortableHash60.finish(md)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("ph60kernel", PortableHash60,
      PortableHash60.getClass.getName)
    val codes = children.map(_.genCode(ctx))
    val md = ctx.freshName("md")
    val updates = children.zip(codes).map { case (c, code) =>
      val upd = c.dataType match {
        case StringType => s"$kernel.updString($md, ${code.value});"
        case _ => s"$kernel.updLong($md, (long) ${code.value});"
      }
      s"""
        ${code.code}
        if (!${ev.isNull}) {
          if (${code.isNull}) { ${ev.isNull} = true; }
          else { $upd }
        }
      """
    }.mkString("\n")
    ev.copy(code =
      code"""
        boolean ${ev.isNull} = false;
        long ${ev.value} = 0L;
        java.security.MessageDigest $md = $kernel.md();
        $updates
        if (!${ev.isNull}) { ${ev.value} = $kernel.finish($md); }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object PortableHash60 {
  /** MD5 instances are stateful; one per thread (shared with
    * [[SimHashSig]]). `digest(out,0,16)` resets the instance, so a
    * fresh `md()` always starts clean. */
  @transient private lazy val digestLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Reusable per-thread buffers: 20 bytes covers any long's decimal
    * render ('-' + 19 digits), 16 the md5 output. */
  @transient private lazy val scratchLocal =
    ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](20))
  @transient private lazy val outLocal =
    ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](16))

  private val minLongBytes =
    Long.MinValue.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** The per-row entry: a clean md5 instance (cleared by the previous
    * row's finish; reset() here guards the partially-updated-then-null
    * abort path). */
  def md(): java.security.MessageDigest = {
    val m = digestLocal.get()
    m.reset()
    m
  }

  /** Feed a long's decimal digits (Java `Long.toString` byte-exact —
    * what `CAST(x AS STRING)` renders) without allocating. */
  def updLong(md: java.security.MessageDigest, v: Long): Unit = {
    if (v == Long.MinValue) { md.update(minLongBytes); return }
    val buf = scratchLocal.get()
    var x = if (v < 0) -v else v
    var i = 20
    while ({ i -= 1; buf(i) = ('0' + (x % 10)).toByte; x /= 10; x != 0 }) ()
    if (v < 0) { i -= 1; buf(i) = '-'.toByte }
    md.update(buf, i, 20 - i)
  }

  /** Feed a string's UTF-8 bytes; `getBytes` is zero-copy for exactly-
    * spanning on-heap UTF8Strings (the common scan/literal case). */
  def updString(md: java.security.MessageDigest, s: UTF8String): Unit =
    md.update(s.getBytes)

  /** Digest into the reusable 16-byte buffer and assemble the first 15
    * nibbles: bytes 0..6 fully, high nibble of byte 7. */
  def finish(md: java.security.MessageDigest): Long = {
    val d = outLocal.get()
    md.digest(d, 0, 16)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** One-shot form over raw bytes (shared with [[SimHashSig]]). */
  def hash60(bytes: Array[Byte]): Long = {
    val m = md()
    m.update(bytes)
    finish(m)
  }

  def portableHash60(cols: Column*): Column = call_function("portable_hash60", cols: _*)
}
