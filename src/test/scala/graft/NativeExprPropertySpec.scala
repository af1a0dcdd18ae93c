package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.{Literal, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{MinHashSig, PortableHash60, RepetitionStats, ShingleHashes}

/** Randomized expression-level properties of the native row-local
  * kernels, against independent straight-line Scala references (no
  * Spark session — `eval` on literal inputs). Seeded, reproducible.
  * Inputs include unicode, empty strings, heavy duplication, and
  * boundary lengths around the shingle width.
  */
class NativeExprPropertySpec extends AnyFunSuite {
  private val rng = new scala.util.Random(1234)
  private val vocab = Array("a", "the", "δοκιμή", "中文", "x1", "☃", "longer-token",
    "z", "", "repeat", "repeat", "q9")

  private def randTokens(): Array[String] =
    Array.fill(rng.nextInt(40))(vocab(rng.nextInt(vocab.length)))

  private def arr(tokens: Array[String]) =
    new GenericArrayData(tokens.map(UTF8String.fromString(_).asInstanceOf[Any]))

  private def refShingleHashes(tokens: Array[String], n: Int): Array[Long] =
    if (tokens.length < n) Array.emptyLongArray
    else (0 to tokens.length - n).map { i =>
      XXH64.hashUTF8String(UTF8String.fromString(tokens.slice(i, i + n).mkString(" ")), 42L)
    }.toArray

  test("shingle_hashes equals the straight-line reference on 500 random docs") {
    val expr = ShingleHashes(Seq(
      Literal.create(null, ArrayType(StringType)), Literal(3, IntegerType)))
    (1 to 500).foreach { _ =>
      val tk = randTokens()
      val got = expr.hashAll(arr(tk)).asInstanceOf[GenericArrayData].toLongArray()
      assert(got.toSeq == refShingleHashes(tk, 3).toSeq, s"tokens=${tk.mkString("|")}")
    }
  }

  test("minhash_sig mins and set equal the reference on 500 random docs") {
    val k = 8
    val expr = MinHashSig(Seq(
      Literal.create(null, ArrayType(StringType)),
      Literal(3, IntegerType), Literal(k, IntegerType)))
    (1 to 500).foreach { _ =>
      val tk = randTokens()
      val bases = refShingleHashes(tk, 3)
      val out = expr.sign(arr(tk))
      if (tk.length < 3) assert(out == null)
      else {
        val row = out.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        val mh = row.getArray(0).toLongArray()
        val ss = row.getArray(1).toLongArray()
        val distinct = bases.distinct.sorted
        assert(ss.toSeq == distinct.toSeq, "verification set is sorted distinct bases")
        val expectMins = (0 until k).map { i =>
          if (distinct.isEmpty) Long.MaxValue
          else distinct.map(b => XXH64.hashInt(i, XXH64.hashLong(b, 42L))).min
        }
        assert(mh.toSeq == expectMins, s"tokens=${tk.mkString("|")}")
      }
    }
  }

  test("repetition_stats equals a naive reference on 500 random docs") {
    val expr = RepetitionStats(Seq(Literal.create(null, ArrayType(StringType))))
    def r6(x: Double) = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    (1 to 500).foreach { _ =>
      val tk = randTokens()
      val out = expr.stats(arr(tk))
      if (tk.isEmpty) assert(out == null)
      else {
        val row = out.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        val n = tk.length.toDouble
        val grouped = tk.groupBy(identity)
        assert(row.getLong(0) == tk.length)
        assert(row.getDouble(1) == r6(grouped.size / n))
        assert(row.getDouble(2) == r6(grouped.values.map(_.length).max / n))
        val expected2 =
          if (tk.length < 2) 0.0
          else {
            val bi = tk.sliding(2).map(_.mkString(" ")).toSeq
            r6(bi.groupBy(identity).values.map(_.length).max.toDouble / bi.length)
          }
        assert(row.getDouble(3) == expected2, s"tokens=${tk.mkString("|")}")
      }
    }
  }

  test("portable_hash60 equals the hex-parse reference on random strings") {
    (1 to 300).foreach { _ =>
      val s = Seq.fill(rng.nextInt(30))(vocab(rng.nextInt(vocab.length))).mkString(" ")
      val bytes = UTF8String.fromString(s).getBytes
      val hex = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map(b => f"$b%02x").mkString.take(15)
      assert(PortableHash60.hash60(bytes) == java.lang.Long.parseLong(hex, 16), s"s=$s")
    }
  }

}

/** DataFrame-level (codegen-path) bit-identity of the varargs
  * `portable_hash60` batch kernel against the cast+concat+hex column
  * composition it replaces. */
class PortableHash60VarargsSpec extends SparkSpec {
  private val rng = new scala.util.Random(4321)

  test("varargs portable_hash60 over integrals is bit-identical to the cast+concat composition") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis.{legacyPortableHash60, portableHash60}
    // codegen path over a DataFrame; edge longs included (negative, 0,
    // Long.MinValue where -x overflows, Long.MaxValue)
    val edge = Seq(0L, -1L, 1L, Long.MinValue, Long.MaxValue, -999999999999L)
    val longs = edge ++ Seq.fill(500)(rng.nextLong())
    val df = longs.zipWithIndex.map { case (a, i) => (a, i.toLong - 250L) }.toDF("a", "b")
    val out = df.select(
      portableHash60($"a").as("k1"),
      legacyPortableHash60($"a".cast("string")).as("r1"),
      portableHash60($"a", lit("-"), $"b").as("k2"),
      legacyPortableHash60(concat($"a".cast("string"), lit("-"), $"b".cast("string"))).as("r2"),
      portableHash60($"a", lit(":salt")).as("k3"),
      legacyPortableHash60(concat($"a".cast("string"), lit(":salt"))).as("r3"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"single-long mismatch: $r")
      assert(r.getLong(2) == r.getLong(3), s"pair mismatch: $r")
      assert(r.getLong(4) == r.getLong(5), s"salted mismatch: $r")
    }
  }

  test("varargs portable_hash60 mixes strings and integrals; null anywhere nulls the hash") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis.{legacyPortableHash60, portableHash60}
    val df = Seq(
      (Some("héllo wörld"), Some(42L)),
      (Some(""), Some(-7L)),
      (None: Option[String], Some(1L)),
      (Some("x"), None: Option[Long])
    ).toDF("s", "n")
    val rows = df.select(
      portableHash60($"s", lit("|"), $"n").as("k"),
      legacyPortableHash60(concat($"s", lit("|"), $"n".cast("string"))).as("r"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null-shape mismatch: $r")
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1), s"value mismatch: $r")
    }
    // the two all-present rows hash; the two null-bearing rows are null
    assert(rows.count(_.isNullAt(0)) == 2)
  }
}
