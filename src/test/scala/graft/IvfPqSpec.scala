package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType}
import graft.operators.Similarity

/** The IVF-PQ index must (a) store m-byte codes — that IS the further
  * shrink over the int8 index's dim bytes, (b) ship an exact
  * reconstructed norm (the reconstruction is fully determined by
  * cell + codes, so |ĉ| recomputed from the codebooks must match), and
  * (c) retain ≥0.9 of the int8 path's neighbors at EQUAL probe budget
  * (the round-6 verdict's acceptance bar).
  */
class IvfPqSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val pq = Similarity.buildIvfIndexPq(emb, nCells = 16)
  private lazy val q8 = Similarity.buildIvfIndexQ(emb, nCells = 16)

  test("codes are m tinyints per vector (m bytes, not dim)") {
    assert(pq.assignments.schema("codes").dataType == ArrayType(ByteType, true))
    val lens = pq.assignments.select(size(col("codes"))).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(lens == Set(pq.m), s"code length $lens != m=${pq.m}")
  }

  test("shipped rnorm equals the norm recomputed from cell + codes") {
    val recon = pq.assignments
      .join(broadcast(pq.centroids), "cell_id")
      .select(col("vec_id"), col("cv"), col("codes"), col("rnorm"),
        posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(pq.codebooks), Seq("sub", "code"))
      .groupBy(col("vec_id"))
      .agg(first(col("cv")).as("cv"), first(col("rnorm")).as("rnorm"),
        array_sort(collect_list(struct(col("sub"), col("cb")))).as("sc"))
      .withColumn("rq", flatten(expr("transform(sc, s -> s.cb)")))
      .withColumn("vr", zip_with(col("cv"), col("rq"), (c, r) => c + r))
      .withColumn("n2",
        sqrt(graft.functions.CosineSimilarity.dotProduct(col("vr"), col("vr"))))
      .select(max(abs(col("n2") - col("rnorm"))).as("worst"))
      .head().getDouble(0)
    assert(recon <= 1e-12, s"rnorm drifts from recomputation by $recon")
  }

  test("recall >= 0.9 of the int8 IVF path at equal probe budget") {
    import graft.functions.VectorFunctions.toDouble
    val queries = emb.where(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), toDouble(col("embedding")).as("qv"))
    val k = 10
    def neighborSets(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val int8N = neighborSets(Similarity.ivfSearchQ(q8, queries, k, nProbe = 4))
    val pqN = neighborSets(Similarity.ivfSearchPq(pq, queries, k, nProbe = 4))
    val recalls = int8N.map { case (q, fs) =>
      pqN.getOrElse(q, Set.empty).intersect(fs).size.toDouble / fs.size
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall vs int8 IVF: $mean%.3f over ${recalls.size} queries")
    assert(mean >= 0.9, f"PQ recall $mean%.3f < 0.9 of int8 path")
  }
}
