package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** The corpus-scale silhouette rung: hand-computed fixtures for
  * [[Similarity.silhouetteCentroid]] plus a gate-checked agreement
  * floor against the exact [[Similarity.silhouette]] on the real
  * embedding table — the simplified form must approximate the exact
  * card, not merely run.
  */
class SilhouetteCentroidSpec extends SparkSpec {

  private def emb(rows: (Long, Long, Seq[Double])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "label", "embedding")
  }

  test("silhouetteCentroid: clean separation and a mislabeled point, by hand") {
    // label 0: (1,0)×2 plus a mislabeled (0,1); label 1: (0,1)×2.
    // c0 = (2/3, 1/3), c1 = (0, 1). On the 1e-6 grid:
    //   v1,v2=(1,0): a = 1e6−894427 = 105573 (cos 2/√5), b = 1e6
    //               → s = (1e6−105573)/1e6 = 0.894427
    //   v5=(0,1) mislabeled: a = 1e6−447214 = 552786 (cos 1/√5),
    //               b = 0 (cos 1 to c1) → s = −552786/552786 = −1.0
    //   v3,v4=(0,1): a = 0, b = 552786 → s = 1.0
    val got = Similarity.silhouetteCentroid(emb(
        (1L, 0L, Seq(1.0, 0.0)), (2L, 0L, Seq(1.0, 0.0)),
        (5L, 0L, Seq(0.0, 1.0)),
        (3L, 1L, Seq(0.0, 1.0)), (4L, 1L, Seq(0.0, 1.0))))
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 1L, 0.894427), (2L, 1L, 0.894427), (3L, 0L, 1.0),
      (4L, 0L, 1.0), (5L, 1L, -1.0)))
  }

  test("silhouetteCentroid: a singleton label takes the textbook s = 0") {
    val got = Similarity.silhouetteCentroid(emb(
        (1L, 0L, Seq(1.0, 0.0)), (2L, 0L, Seq(1.0, 0.0)),
        (9L, 7L, Seq(0.5, 0.5))))
      .where(col("vec_id") === 9L).collect()
    assert(got.length == 1 && got(0).getDouble(3) == 0.0)
  }

  test("silhouetteCentroid: agreement floor against the exact silhouette") {
    val e = Tables.embeddings(spark, sfDir)
    val exact = Similarity.silhouette(e)
      .select(col("vec_id"), col("b_label").as("bx"), col("sil").as("sx"))
    val simp = Similarity.silhouetteCentroid(e)
      .select(col("vec_id"), col("b_label").as("bs"), col("sil").as("ss"))
    val m = exact.join(simp, "vec_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("bx") === col("bs"), 1L).otherwise(0L)).as("bl"),
        avg(abs(col("sx") - col("ss"))).as("mad"),
        corr(col("sx"), col("ss")).as("r"))
      .collect()(0)
    val (n, bl, mad, r) =
      (m.getLong(0), m.getLong(1), m.getDouble(2), m.getDouble(3))
    // measured on sf0.001: b_label match 453/500, MAD 0.106, r 0.976 —
    // floors set with headroom so a params/data drift that degrades
    // the approximation fails loudly
    assert(bl.toDouble / n >= 0.85, s"b_label agreement $bl/$n below floor")
    assert(mad <= 0.20, s"mean |Δsil| $mad above ceiling")
    assert(r >= 0.90, s"correlation $r below floor")
  }

  test("silhouetteCentroid: empty input yields the empty card") {
    import org.apache.spark.sql.types._
    val e = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType),
        StructField("label", LongType),
        StructField("embedding", ArrayType(DoubleType)))))
    assert(Similarity.silhouetteCentroid(e).count() == 0)
  }
}
