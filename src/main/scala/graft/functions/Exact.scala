package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-exact money/measure aggregation.
  *
  * Summing doubles is aggregation-order-dependent, and two engines (or two
  * cluster runs with different partitioning) can differ in the last ulp —
  * which flips `round(sum, 2)` at half-cent boundaries. Instead: scale each
  * row to integer hundredths (deterministic per row), sum exactly in
  * 64-bit integers (commutative), and divide back at the end. The final
  * double is bit-identical regardless of partitioning, executor count, or
  * engine. SQL mirror: `CAST(round(x * 100) AS BIGINT)` /
  * `CAST(sum(c) AS DOUBLE) / 100.0`.
  */
object Exact {
  /** Per-row integer hundredths. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Order-independent sum of a money/measure column, as double. */
  def moneySum(c: Column): Column = sum(cents(c)).cast("double") / 100.0

  /** Order-independent average, as double. */
  def moneyAvg(c: Column): Column =
    sum(cents(c)).cast("double") / 100.0 / count(lit(1))
}
