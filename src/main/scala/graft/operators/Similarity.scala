package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * bruteForce is the exact baseline (and the oracle for recall checks);
  * lshAnn is the scale path: random-hyperplane signatures bucket the
  * corpus so each query only scores its own bucket — at 100 TB the
  * bucket join replaces the full cross product, and the hyperplanes are
  * a tiny broadcast literal.
  */
object Similarity {

  val Dim = 64

  private def prepared(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", normFixed(col("v"), Dim))

  /** Exact top-k cosine neighbors for each query vector (queries chosen
    * by id predicate). The sort+limit per query is TakeOrdered — no
    * global sort. */
  def bruteForceTopK(embeddings: DataFrame, maxQueryId: Long, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = prepared(embeddings)
    val q = e.where(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosineWithNorms(dotFixed(col("qv"), col("v"), Dim), col("qn"), col("nrm")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"),
        row_number().over(w).as("rnk"))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"), col("rnk"))
  }

  /** Deterministic pseudo-random unit hyperplanes (fixed seed) as a
    * literal — broadcast-sized metadata, never shuffled. */
  private def planes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val rng = new scala.util.Random(42)
    Array.fill(nPlanes, dim)(rng.nextGaussian())
  }

  /** Sign-of-projection LSH bucket id for a double vector column. */
  def lshBucket(v: Column, nPlanes: Int, dim: Int): Column = {
    val ps = planes(nPlanes, dim)
    (0 until nPlanes).map { p =>
      val plane = lit(ps(p).head) +: (1 until dim).map(d => lit(ps(p)(d)))
      val proj = (0 until dim)
        .map(d => element_at(v, d + 1) * lit(ps(p)(d)))
        .reduce(_ + _)
      when(proj > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)
  }

  /** IVF (inverted-file) ANN: a coarse quantizer of C centroids
    * partitions the corpus; queries probe only the nProbe nearest cells.
    *
    * Centroids here are a deterministic sample (every (n/C)-th vector by
    * id) — one k-means refinement pass would drop in as one extra
    * aggregate without changing the plan shape. All stages are linear:
    * assignment is a broadcast join against C centroids, search touches
    * ~(nProbe/C) of the corpus per query. */
  def ivfAnn(embeddings: DataFrame, maxQueryId: Long, k: Int,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = prepared(embeddings)
    // deterministic coarse centroids: sample by id stride
    val n = e.count()
    val stride = math.max(n / nCells, 1L)
    val centroids = e.where(pmod(col("vec_id"), lit(stride)) === 0)
      .limit(nCells)
      .select(col("vec_id").as("cell_id"), col("v").as("cv"), col("nrm").as("cn"))
    // assign every vector to its nearest centroid (rank 1), queries to nProbe cells
    def assign(df: DataFrame, take: Int, idCol: String): DataFrame = {
      val w = Window.partitionBy(col(idCol)).orderBy(col("csim").desc, col("cell_id"))
      df.join(broadcast(centroids), lit(true))
        .withColumn("csim", cosineWithNorms(dotFixed(col("v"), col("cv"), Dim), col("nrm"), col("cn")))
        .withColumn("crnk", row_number().over(w))
        .where(col("crnk") <= take)
        .drop("cv", "cn", "csim", "crnk")
    }
    val corpus = assign(e, 1, "vec_id")
    val queries = assign(e.where(col("vec_id") < maxQueryId), nProbe, "vec_id")
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cell_id"))
    val scored = corpus
      .join(broadcast(queries),
        corpus("cell_id") === queries("cell_id") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosineWithNorms(dotFixed(col("qv"), col("v"), Dim), col("qn"), col("nrm")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"),
        row_number().over(w).as("rnk"))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"), col("rnk"))
  }

  /** LSH-bucketed ANN: queries score only vectors in their own bucket.
    * Approximate by construction (recall < 1 across bucket boundaries);
    * nPlanes trades recall vs bucket size. */
  def lshAnn(embeddings: DataFrame, maxQueryId: Long, k: Int, nPlanes: Int = 4,
      dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = prepared(embeddings).withColumn("bucket", lshBucket(col("v"), nPlanes, dim))
    val q = e.where(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket").as("qbucket"))
    val scored = e
      .join(broadcast(q), col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosineWithNorms(dotFixed(col("qv"), col("v"), Dim), col("qn"), col("nrm")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"),
        row_number().over(w).as("rnk"))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"), col("rnk"))
  }
}
