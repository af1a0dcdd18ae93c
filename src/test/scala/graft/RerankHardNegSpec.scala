package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Approximate-then-exact serving (ivfSearchQReranked) and
  * hard-negative mining: exhaustive parameters must reproduce the
  * exact brute-force answers bit-for-bit, and serving parameters must
  * never be FARTHER from exact than the raw quantized search. */
class RerankHardNegSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val idx = Similarity.buildIvfIndexQ(emb)

  private def rowSet(df: DataFrame) =
    df.collect().map(_.toSeq).toSet

  private def recallVs(exact: DataFrame, approx: DataFrame): Double = {
    val t = exact.select($"query_id", $"neighbor_id")
    val hits = t.intersect(approx.select($"query_id", $"neighbor_id")).count()
    hits.toDouble / t.count()
  }

  test("exhaustive rerank (all probes, alpha covering the corpus) equals brute force exactly") {
    val q = Similarity.queryVectors(emb, 5)
    val rr = Similarity.ivfSearchQReranked(idx, emb, q, k = 10, alpha = 50, nProbe = 16)
    val brute = Similarity.bruteForceTopK(emb, 5, 10)
    assert(rowSet(rr) == rowSet(brute),
      "with every vector in the candidate pool the refine IS the exact search")
  }

  test("serving-shape rerank is never farther from exact than the raw quantized search") {
    val q = Similarity.queryVectors(emb, 5)
    val brute = Similarity.bruteForceTopK(emb, 5, 10)
    val raw = Similarity.ivfSearchQ(idx, q, 10, nProbe = 4)
    val rr = Similarity.ivfSearchQReranked(idx, emb, q, k = 10, alpha = 3, nProbe = 4)
    val (rRaw, rRr) = (recallVs(brute, raw), recallVs(brute, rr))
    assert(rRr >= rRaw,
      s"rerank recall $rRr regressed below raw quantized recall $rRaw")
    // the served scores are exact: every (q, n, cos) row must agree with
    // the brute scores for the same pair
    val bruteScores = brute.select($"query_id", $"neighbor_id", $"cos".as("bcos"))
    val joined = rr.join(bruteScores, Seq("query_id", "neighbor_id"))
    assert(joined.where($"cos" =!= $"bcos").count() == 0,
      "reranked pairs must carry the exact cosine, not the quantized one")
  }

  test("hard negatives: wrong label always, self never, k per query") {
    val hn = Similarity.hardNegatives(emb, maxQueryId = 5, k = 10)
    assert(hn.count() == 50)
    assert(hn.where($"query_id" === $"neighbor_id").count() == 0)
    val labels = emb.select($"vec_id", $"label")
    val withLabels = hn
      .join(labels.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("label", "qlabel"), "query_id")
      .join(labels.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("label", "nlabel"), "neighbor_id")
    assert(withLabels.where($"qlabel" === $"nlabel").count() == 0,
      "a hard negative sharing the query's label is a positive")
    // hardness: each query's top negative must outrank its WORST
    // same-label neighbor would — i.e. scores are genuinely high
    assert(hn.where($"rnk" === 1 && $"cos" <= 0).count() == 0,
      "top hard negatives on this corpus should be positively similar")
  }

  test("exhaustive hardNegativesIvf equals the brute hard-negative mine") {
    val brute = Similarity.hardNegatives(emb, 5, 10)
    val ivf = Similarity.hardNegativesIvf(idx, emb, 5, k = 10, alpha = 50, nProbe = 16)
    assert(rowSet(ivf) == rowSet(brute))
  }
}
