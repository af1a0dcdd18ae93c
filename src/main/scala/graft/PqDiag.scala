package graft

import org.apache.spark.sql.functions._

/** Diagnostic: IVF-PQ reconstruction quality + recall vs the int8 path
  * across (m, ksub, cbPasses) configurations on a chosen SF dir —
  * the measurement card behind the defaults in
  * [[graft.operators.Similarity.buildIvfIndexPq]].
  * Usage: runMain graft.PqDiag [sfDir]
  */
object PqDiag {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session(appName = "pq-diag")
    import graft.operators.Similarity
    import graft.functions.VectorFunctions.toDouble
    import graft.functions.CosineSimilarity.{cosineSim, dotProduct}
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val emb = Tables.embeddings(spark, dir)
    val v = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val queries = emb.where(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), toDouble(col("embedding")).as("qv"))
    val k = 10
    def neighborSets(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val q8 = Similarity.buildIvfIndexQ(emb, nCells = 16)
    val r8 = q8.assignments.join(broadcast(q8.centroids), "cell_id")
      .withColumn("vr", zip_with(col("cv"), col("q"),
        (c, qq) => c + qq.cast("double") * col("s")))
      .join(v, "vec_id")
      .select(avg(cosineSim(col("v"), col("vr"))).as("c")).head
    println(s"[pq] int8 mean cos(v, vhat)=${r8.getDouble(0)}")
    val int8N = neighborSets(Similarity.ivfSearchQ(q8, queries, k, nProbe = 4))
    for ((m, ks, passes) <- Seq((16, 128, 4), (32, 128, 2), (32, 128, 4), (32, 128, 8))) {
      val pq = Similarity.buildIvfIndexPq(emb, nCells = 16, m = m, ksub = ks,
        cbPasses = passes)
      val rq = pq.assignments
        .join(broadcast(pq.centroids), "cell_id")
        .select(col("vec_id"), col("cv"), posexplode(col("codes")).as(Seq("sub", "code")))
        .join(broadcast(pq.codebooks), Seq("sub", "code"))
        .groupBy(col("vec_id"))
        .agg(first(col("cv")).as("cv"),
          array_sort(collect_list(struct(col("sub"), col("cb")))).as("sc"))
        .withColumn("vr", zip_with(col("cv"),
          flatten(expr("transform(sc, s -> s.cb)")), (c, r) => c + r))
        .join(v, "vec_id")
        .select(avg(cosineSim(col("v"), col("vr"))).as("c")).head
      val pqN = neighborSets(Similarity.ivfSearchPq(pq, queries, k, nProbe = 4))
      val recalls = int8N.map { case (q, fs) =>
        pqN.getOrElse(q, Set.empty).intersect(fs).size.toDouble / fs.size }
      println(f"[pq] m=$m ksub=$ks passes=$passes " +
        f"recon_cos=${rq.getDouble(0)}%.4f recall_vs_int8=${recalls.sum / recalls.size}%.3f")
    }
    spark.stop()
  }
}
