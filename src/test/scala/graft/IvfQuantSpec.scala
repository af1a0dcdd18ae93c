package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType}
import graft.operators.Similarity

/** The int8-residual IVF index must (a) actually store byte codes —
  * that IS the 8× memory claim, (b) bound per-coordinate reconstruction
  * error by s/2 (the scalar-quantizer grid guarantee), and (c) retain
  * ≥0.7 of the float IVF path's neighbors at EQUAL probe budget.
  */
class IvfQuantSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val idx = Similarity.buildIvfIndexQ(emb, nCells = 16)
  private lazy val fidx = Similarity.buildIvfIndex(emb, nCells = 16)

  test("codes are int8 arrays (dim bytes per vector, not 8*dim)") {
    assert(idx.assignments.schema("q").dataType == ArrayType(ByteType, true))
  }

  test("per-coordinate reconstruction error is bounded by s/2") {
    import graft.functions.VectorFunctions.toDouble
    val recon = idx.assignments
      .join(broadcast(idx.centroids), "cell_id")
      .join(emb.select(col("vec_id"), toDouble(col("embedding")).as("v")), "vec_id")
      .withColumn("vr", zip_with(col("cv"), col("q"),
        (c, qq) => c + qq.cast("double") * col("s")))
      .withColumn("err", array_max(zip_with(col("v"), col("vr"),
        (a, b) => abs(a - b))))
      .select(max(col("err") - col("s") * 0.5).as("worst"))
      .head().getDouble(0)
    assert(recon <= 1e-9, s"reconstruction error exceeds s/2 by $recon")
  }

  test("recall >= 0.7 of the float IVF path at equal probe budget") {
    import graft.functions.VectorFunctions.toDouble
    val queries = emb.where(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), toDouble(col("embedding")).as("qv"))
    val k = 10
    def neighborSets(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val floatN = neighborSets(Similarity.ivfSearch(fidx, queries, k, nProbe = 4))
    val quantN = neighborSets(Similarity.ivfSearchQ(idx, queries, k, nProbe = 4))
    val recalls = floatN.map { case (q, fs) =>
      quantN.getOrElse(q, Set.empty).intersect(fs).size.toDouble / fs.size
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall vs float IVF: $mean%.3f over ${recalls.size} queries")
    assert(mean >= 0.7, f"quantized recall $mean%.3f < 0.7 of float path")
  }
}
