package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.CosineSimilarity.{cosineSim, dotProduct}
import graft.functions.VectorFunctions.toDouble

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * bruteForce is the exact baseline (and the oracle for recall checks);
  * lshAnn is the scale path: random-hyperplane signatures bucket the
  * corpus so each query only scores its own bucket — at 100 TB the
  * bucket join replaces the full cross product, and the hyperplanes are
  * a tiny broadcast literal.
  *
  * All scoring goes through the native `cosine_sim` / `dot_product`
  * Catalyst expressions: a tight generated loop per pair keeps the plan
  * and its generated code small (a dim-unrolled expression tree at
  * dim=64 made every scoring stage megabytes of Java — slow to compile,
  * hostile to JIT), while the arithmetic stays the same left-to-right
  * double accumulation the DuckDB oracle uses.
  */
object Similarity {

  val Dim = 64

  private def prepared(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), toDouble(col("embedding")).as("v"))

  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"),
        row_number().over(w).as("rnk"))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), graft.functions.Exact.round6(col("cos")).as("cos"), col("rnk"))
  }

  /** Exact top-k cosine neighbors for each query vector (queries chosen
    * by id predicate). The per-query top-k is a rank-filtered window — at
    * scale the corpus side streams once past the broadcast query set. */
  def bruteForceTopK(embeddings: DataFrame, maxQueryId: Long, k: Int): DataFrame = {
    val e = prepared(embeddings)
    val q = e.where(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosineSim(col("qv"), col("v")))
    topKPerQuery(scored, k)
  }

  /** Deterministic pseudo-random unit hyperplanes (fixed seed) as a
    * literal — broadcast-sized metadata, never shuffled. */
  private def planes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val rng = new scala.util.Random(42)
    Array.fill(nPlanes, dim)(rng.nextGaussian())
  }

  /** Sign-of-projection LSH bucket id for a double vector column: one
    * native dot_product per plane against an array literal. */
  def lshBucket(v: Column, nPlanes: Int, dim: Int): Column = {
    val ps = planes(nPlanes, dim)
    (0 until nPlanes).map { p =>
      when(dotProduct(v, lit(ps(p))) > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)
  }

  /** IVF (inverted-file) ANN: a coarse quantizer of C centroids
    * partitions the corpus; queries probe only the nProbe nearest cells.
    *
    * Centroids are a deterministic hash-ordered sample (TakeOrdered —
    * one reduction pass, no full count/shuffle); one k-means refinement
    * pass would drop in as one extra aggregate without changing the plan
    * shape. All stages are linear: assignment is a broadcast join
    * against C centroids, search touches ~(nProbe/C) of the corpus per
    * query. */
  def ivfAnn(embeddings: DataFrame, maxQueryId: Long, k: Int,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = prepared(embeddings)
    val centroids = e
      .orderBy(pmod(xxhash64(col("vec_id")), lit(1000003L)), col("vec_id"))
      .limit(nCells)
      .select(col("vec_id").as("cell_id"), col("v").as("cv"))
    // assign every vector to its nearest centroid (rank 1), queries to nProbe cells
    def assign(df: DataFrame, take: Int, idCol: String): DataFrame = {
      val w = Window.partitionBy(col(idCol)).orderBy(col("csim").desc, col("cell_id"))
      df.join(broadcast(centroids), lit(true))
        .withColumn("csim", cosineSim(col("v"), col("cv")))
        .withColumn("crnk", row_number().over(w))
        .where(col("crnk") <= take)
        .drop("cv", "csim", "crnk")
    }
    val corpus = assign(e, 1, "vec_id")
    val queries = assign(e.where(col("vec_id") < maxQueryId), nProbe, "vec_id")
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("cell_id"))
    val scored = corpus
      .join(broadcast(queries),
        corpus("cell_id") === queries("cell_id") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosineSim(col("qv"), col("v")))
    topKPerQuery(scored, k)
  }

  /** One-time IVF index build: every vector assigned to its nearest
    * coarse centroid (cells are named by their centroid's vec_id, so the
    * centroid set is recoverable from the index itself). Persist this
    * once — ideally `Catalog.writeBucketed(..., "cell_id", …)` so probe
    * joins are exchange-free — and answer every future query batch with
    * [[ivfSearch]]. Rebuilding the assignment per query batch (what a
    * monolithic IVF call does) costs more than brute force until the
    * query count is large; the index is what makes IVF pay at scale. */
  def buildIvfIndex(embeddings: DataFrame, nCells: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = prepared(embeddings)
    val centroids = e
      .orderBy(pmod(xxhash64(col("vec_id")), lit(1000003L)), col("vec_id"))
      .limit(nCells)
      .select(col("vec_id").as("cell_id"), col("v").as("cv"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cell_id"))
    e.join(broadcast(centroids), lit(true))
      .withColumn("csim", cosineSim(col("v"), col("cv")))
      .withColumn("crnk", row_number().over(w))
      .where(col("crnk") === 1)
      .select(col("vec_id"), col("v"), col("cell_id"))
  }

  /** Probe-only IVF search against a prebuilt index: queries are scored
    * against the (tiny, broadcast) centroid set to pick nProbe cells,
    * then join only those cells' vectors. The corpus is never re-scored.
    * `queries` needs (query_id, qv: array<double>). */
  def ivfSearch(index: DataFrame, queries: DataFrame, k: Int,
      nProbe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = index.where(col("vec_id") === col("cell_id"))
      .select(col("cell_id"), col("v").as("cv"))
    val qw = Window.partitionBy(col("query_id")).orderBy(col("csim").desc, col("cell_id"))
    // rename the probe-side cell key: queries may themselves derive from
    // the index (self-join lineage), so qualified names must differ
    val probed = queries.join(broadcast(centroids), lit(true))
      .withColumn("csim", cosineSim(col("qv"), col("cv")))
      .withColumn("crnk", row_number().over(qw))
      .where(col("crnk") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell_id").as("probe_cell"))
    val scored = index
      .join(broadcast(probed),
        col("cell_id") === col("probe_cell") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosineSim(col("qv"), col("v")))
    topKPerQuery(scored, k)
  }

  /** SemDeDup-style semantic dedup: cluster by coarse centroid, then
    * find cosine-near-dup pairs ONLY within each cell. Bounds the
    * quadratic pair scoring to cell populations (expected n/C per cell),
    * which is what makes embedding dedup tractable at corpus scale; the
    * price is missed pairs that straddle a cell boundary (raise nCells'
    * inverse or probe neighbors to trade recall vs cost). Every emitted
    * pair carries its exact cosine, so results are a subset of
    * Dedup.embeddingNearDup at the same threshold. */
  def semanticDedup(embeddings: DataFrame, threshold: Double = 0.4,
      nCells: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = prepared(embeddings)
    val centroids = e
      .orderBy(pmod(xxhash64(col("vec_id")), lit(1000003L)), col("vec_id"))
      .limit(nCells)
      .select(col("vec_id").as("cell_id"), col("v").as("cv"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cell_id"))
    val assigned = e.join(broadcast(centroids), lit(true))
      .withColumn("csim", cosineSim(col("v"), col("cv")))
      .withColumn("crnk", row_number().over(w))
      .where(col("crnk") === 1)
      .select(col("vec_id"), col("v"), col("cell_id"))
    // intra-cell pair scoring: the self-join key is the cell, so the
    // cross product never leaves a cell
    assigned.as("a")
      .join(assigned.as("b"),
        col("a.cell_id") === col("b.cell_id") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", cosineSim(col("a.v"), col("b.v")))
      .where(col("cos") >= threshold)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        graft.functions.Exact.round6(col("cos")).as("cos"))
  }

  /** LSH-bucketed ANN: queries score only vectors in their own bucket.
    * Approximate by construction (recall < 1 across bucket boundaries);
    * nPlanes trades recall vs bucket size. */
  def lshAnn(embeddings: DataFrame, maxQueryId: Long, k: Int, nPlanes: Int = 4,
      dim: Int = 64): DataFrame = {
    val e = prepared(embeddings).withColumn("bucket", lshBucket(col("v"), nPlanes, dim))
    val q = e.where(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("bucket").as("qbucket"))
    val scored = e
      .join(broadcast(q), col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosineSim(col("qv"), col("v")))
    topKPerQuery(scored, k)
  }
}
