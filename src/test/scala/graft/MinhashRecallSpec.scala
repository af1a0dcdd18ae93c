package graft

import graft.operators.Dedup

/** Quantified MinHash-LSH recall in the regime the banding actually
  * gates: planted near-dup pairs at Jaccard ≈ 0.45–0.75, where the
  * 16-band × 4-row S-curve p(s) = 1-(1-s⁴)¹⁶ is far from both 0 and 1
  * (p(0.5) ≈ 0.64, p(0.7) ≈ 0.99). A j≈0.98 planted set — where every
  * band matches almost surely — proves nothing about this threshold
  * region, which is where real near-dup corpora live.
  *
  * Truth is the exact shingle-set Jaccard (Dedup.ngramJaccard); the
  * assertion compares measured candidate recall per pair against the
  * band curve's expectation with a binomial-noise tolerance.
  */
class MinhashRecallSpec extends SparkSpec {
  import spark.implicits._

  private val L = 60          // tokens per document
  private val pairsPerK = 25  // pairs per replacement count

  /** Pair i: doc A = L disjoint-namespace tokens; doc B = A with k
    * tokens replaced at positions spaced 8 apart, each replacement
    * killing its 3 covering 3-shingles → shingle Jaccard ≈
    * (L-2-3k)/(L-2+3k), spanning ≈0.47..0.72 for k = 3..7. */
  private def corpus: Seq[(Long, String)] =
    (0 until 5 * pairsPerK).flatMap { i =>
      val k = 3 + i / pairsPerK
      val a = (0 until L).map(j => s"w${i}t$j").toArray
      val b = a.clone()
      (0 until k).foreach(r => b(r * 8 + 1) = s"x${i}r$r")
      Seq((2L * i, a.mkString(" ")), (2L * i + 1, b.mkString(" ")))
    }

  test("LSH candidate recall at Jaccard 0.45-0.75 meets the 16x4 band curve") {
    val docs = corpus.toDF("doc_id", "text")
    // exact truth, with each pair's true Jaccard (planted pairs only —
    // disjoint token namespaces make cross-pair Jaccard zero)
    val truth = Dedup.ngramJaccard(docs, 3, 0.4)
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => b == a + 1 && a % 2 == 0 }
    assert(truth.length >= 4 * pairsPerK, s"only ${truth.length} planted pairs above 0.4")
    val js = truth.map(_._3)
    assert(js.min < 0.55 && js.max > 0.65,
      s"planted Jaccards [${js.min}, ${js.max}] must span the hard regime")

    val found = Dedup.minhashLsh(docs, 3, 64, 16, 0.4)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val expected = js.map(s => 1.0 - math.pow(1.0 - math.pow(s, 4), 16)).sum / js.length
    val measured = truth.count { case (a, b, _) => found.contains((a, b)) }.toDouble / truth.length
    info(f"pairs=${truth.length} expected recall=$expected%.3f measured=$measured%.3f")
    // binomial sd of the mean over ~100 pairs is ≤ 0.05; 0.12 ≈ 2.5σ
    assert(measured >= expected - 0.12,
      f"measured recall $measured%.3f below band-curve expectation $expected%.3f")
  }
}
