package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** BM25 lexical retrieval: the score replays in pure Scala on a hand
  * corpus (same formula, same constants), ranking is (rounded score
  * desc, doc_id asc), and query-term pruning happens before any join. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "data join"),
    (2L, "data data scan"),
    (3L, "the the the")).toDF("doc_id", "text")

  /** The textbook formula, computed independently of Spark. */
  private def expectedScore(tfdf: Seq[(Long, Long)], dl: Long,
      n: Long, avgdl: Double, k1: Double = 1.2, b: Double = 0.75): Double = {
    val raw = tfdf.map { case (tf, df) =>
      math.log((n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5) + 1.0) *
        (tf.toDouble * (k1 + 1.0)) /
        (tf.toDouble + k1 * ((1.0 - b) + b * (dl.toDouble / avgdl)))
    }.sum
    math.floor(raw * 1e6 + 0.5) / 1e6
  }

  test("scores equal the hand replay and rank tf-heavy docs first") {
    val got = TextAnalysis.bm25(corpus, Seq("data", "scan"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val avgdl = 8.0 / 3.0
    // d2: data tf=2 df=2, scan tf=1 df=1, dl=3; d1: data tf=1 df=2, dl=2
    val d2 = expectedScore(Seq((2L, 2L), (1L, 1L)), 3L, 3L, avgdl)
    val d1 = expectedScore(Seq((1L, 2L)), 2L, 3L, avgdl)
    assert(got == Seq((2L, d2), (1L, d1)), s"got $got")
    assert(d2 > d1) // the rarer term + higher tf dominates
  }

  test("docs without any query term never appear") {
    val ids = TextAnalysis.bm25(corpus, Seq("scan"))
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(2L))
  }

  test("k caps the result and ties break on doc_id") {
    val twins = Seq((1L, "scan"), (2L, "scan"), (3L, "scan")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(twins, Seq("scan"), k = 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L)) // identical scores -> smallest ids win
  }

  test("term pruning reaches below the tf aggregate: only query terms survive the scan") {
    // the tf branch must filter to the query terms BEFORE grouping —
    // the plan carries the isin filter under the first aggregate
    val plan = TextAnalysis.bm25(corpus, Seq("data")).queryExecution
      .optimizedPlan.toString
    assert(plan.contains("data"), plan)
    assert(plan.toLowerCase.contains("filter"), plan)
  }

  test("empty query is refused") {
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25(corpus, Seq.empty)
    }
  }
}
