package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The fuzzy rung's edit-distance verify must be bounded per pair:
  * thresholded levenshtein (banded DP, early exit) + length-delta
  * prefilter, never the full O(len_a·len_b) table.
  */
class FuzzyDedupSpec extends SparkSpec {

  test("thresholded verify equals the unbounded-distance-then-filter form") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def mutate(s: String, k: Int): String = {
      val b = s.toCharArray
      (1 to k).foreach(_ => b(rnd.nextInt(b.length)) = ('a' + rnd.nextInt(26)).toChar)
      new String(b)
    }
    val base = (1 to 40).map(_ => (1 to 30).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    val pairs = base.map(s => (s, mutate(s, rnd.nextInt(12) + 1)))
    val df = pairs.toDF("a", "b")
    val maxDist = 8
    val bounded = df
      .where(abs(length(col("a")) - length(col("b"))) <= maxDist)
      .withColumn("d", levenshtein(col("a"), col("b"), maxDist))
      .where(col("d") >= 0)
      .select("a", "b", "d").collect().toSet
    val unbounded = df
      .withColumn("d", levenshtein(col("a"), col("b")))
      .where(col("d") <= maxDist)
      .select("a", "b", "d").collect().toSet
    assert(bounded == unbounded)
  }

  test("a long-document pair costs O(maxDist·len), not O(len²)") {
    import spark.implicits._
    // 200 KB docs, wildly different: the full DP table is 4·10¹⁰ cells
    // (minutes on one core); the banded form proves d > 8 in
    // O(maxDist·len) ≈ 1.6M cells and returns −1 in milliseconds
    val a = "a" * 200000
    val b = "b" * 200000
    val t0 = System.nanoTime()
    val d = Seq((a, b)).toDF("a", "b")
      .select(levenshtein(col("a"), col("b"), 8).as("d"))
      .head().getInt(0)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(d == -1)
    assert(secs < 30.0, s"banded levenshtein took ${secs}s — not banded?")
  }

  test("fuzzyDedup still verifies true re-edits on the documents table") {
    // smoke: the operator end-to-end, pairs must satisfy the contract
    val out = Dedup.fuzzyDedup(Tables.documents(spark, sfDir)).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("edit_dist") >= 0 && r.getAs[Long]("edit_dist") <= 8)
    }
  }
}
