package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns.
  *
  * Built from codegen'd higher-order functions (`zip_with`/`aggregate`)
  * — no UDF serialization in the hot path. Floats are widened to double
  * BEFORE any arithmetic so accumulation error is engine-portable (the
  * fold is sequential left-to-right in both Spark and DuckDB's
  * list_dot_product, giving bit-identical sums on identical inputs).
  */
object VectorFunctions {

  /** Exact widening float → double per element. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product of two double vectors (sequential fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity given precomputed norms (preferred in joins — the
    * norms are computed once per vector, not once per pair). */
  def cosineWithNorms(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)
}
