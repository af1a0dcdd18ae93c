package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** More-like-this: the self-derived query finds the overlapping doc,
  * the query doc never ranks itself, and the card is a well-formed
  * descending top-k. */
class MltSpec extends SparkSpec {
  import spark.implicits._

  test("planted fixture: the doc sharing the rare terms ranks first") {
    val docs = Seq(
      (1L, "quantum flux capacitor quantum"),
      (2L, "quantum flux capacitor banana"),
      (3L, "apple orange pear banana"),
      (4L, "the the the the")).toDF("doc_id", "text")
    val out = TextAnalysis.moreLikeThis(docs, 1L, topTerms = 3, k = 3)
      .collect()
    // only doc 2 contains any of doc 1's terms — it is the whole card
    assert(out.map(_.getLong(0)).toSeq == Seq(2L))
    assert(out.head.getDouble(1) > 0.0)
  }

  test("real corpus: query doc excluded, scores positive and descending") {
    val out = TextAnalysis
      .moreLikeThis(Tables.documents(spark, sfDir), queryDocId = 42L)
      .collect()
    assert(out.nonEmpty && out.length <= 10)
    assert(!out.map(_.getLong(0)).contains(42L))
    val scores = out.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
    assert(scores.forall(_ > 0.0))
  }

  test("a term only the query doc contains cannot drive the ranking") {
    val docs = Seq(
      (1L, "zzzuniquezzz shared shared"),
      (2L, "shared other words"),
      (3L, "unrelated text entirely")).toDF("doc_id", "text")
    // the unique term's df over the rest is 0 — the inner join drops
    // it, and the pick falls back to the shared vocabulary
    val out = TextAnalysis.moreLikeThis(docs, 1L, topTerms = 2, k = 3)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L))
  }
}
