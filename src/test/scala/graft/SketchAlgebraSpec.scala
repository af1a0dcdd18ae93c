package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{BottomKSample, KmvSketch}

/** Algebraic properties of the hand-rolled sketch aggregators, checked
  * over randomized inputs / partitionings / merge orders (seeded —
  * reproducible). These are the invariants Spark's partial aggregation
  * relies on: any reduce/merge evaluation tree must equal the
  * reference semantics computed on the flat input set.
  */
class SketchAlgebraSpec extends AnyFunSuite {
  private val rng = new scala.util.Random(42)

  private def randomTree[B](parts: Seq[B], merge: (B, B) => B): B = {
    val buf = scala.collection.mutable.ArrayBuffer(parts: _*)
    while (buf.length > 1) {
      val i = rng.nextInt(buf.length)
      val a = buf.remove(i)
      val j = rng.nextInt(buf.length)
      buf(j) = merge(buf(j), a)
    }
    buf.head
  }

  test("Kmv: any partitioning/merge order equals sorted-distinct-take-k") {
    val agg = KmvSketch.Kmv(16)
    (1 to 300).foreach { _ =>
      val n = rng.nextInt(120)
      // small value domain so duplicates are common
      val xs = Seq.fill(n)(rng.nextInt(60).toLong)
      val nParts = 1 + rng.nextInt(6)
      val parts = xs.grouped(math.max(1, (n + nParts - 1) / nParts)).toSeq
      val bufs = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged =
        if (bufs.isEmpty) agg.zero else randomTree(bufs, agg.merge)
      assert(merged == xs.distinct.sorted.take(16), s"input $xs")
    }
  }

  test("BottomK: any partitioning/merge order equals per-hash-min, sorted, take-k") {
    val agg = BottomKSample.BottomK(8)
    (1 to 300).foreach { _ =>
      val n = rng.nextInt(100)
      // colliding hashes on purpose: same hash, different values
      val xs = Seq.fill(n)((rng.nextInt(25).toLong, rng.nextInt(1000).toDouble))
      val nParts = 1 + rng.nextInt(5)
      val parts = xs.grouped(math.max(1, (n + nParts - 1) / nParts)).toSeq
      val bufs = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged =
        if (bufs.isEmpty) agg.zero else randomTree(bufs, agg.merge)
      val want = xs.groupBy(_._1).map { case (h, vs) => (h, vs.map(_._2).min) }
        .toSeq.sortBy(_._1).take(8)
      assert(merged == want, s"input $xs")
    }
  }

  test("TopK: any partitioning/merge order equals sorted-desc-take-k (with duplicates)") {
    val agg = graft.functions.TopKAggregate.TopK(5)
    (1 to 300).foreach { _ =>
      val n = rng.nextInt(80)
      val xs = Seq.fill(n)(rng.nextInt(40).toDouble)
      val nParts = 1 + rng.nextInt(5)
      val parts = xs.grouped(math.max(1, (n + nParts - 1) / nParts)).toSeq
      val bufs = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged =
        if (bufs.isEmpty) agg.zero else randomTree(bufs, agg.merge)
      assert(merged == xs.sorted(Ordering[Double].reverse).take(5), s"input $xs")
    }
  }
}
