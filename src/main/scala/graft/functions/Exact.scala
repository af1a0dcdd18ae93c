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
  /** Per-row integer hundredths. Safe whenever the source value carries
    * at most 2 decimals (money columns): x*100 then sits on an integer
    * ± 1 ulp, far from the .5 boundary where Spark's decimal-string
    * rounding and a binary-rounding engine can disagree (see round6). */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Order-independent sum of a money/measure column, as double. */
  def moneySum(c: Column): Column = sum(cents(c)).cast("double") / 100.0

  /** Order-independent average, as double. */
  def moneyAvg(c: Column): Column =
    sum(cents(c)).cast("double") / 100.0 / count(lit(1))

  /** Engine-portable 6-decimal rounding: floor(x·10⁶ + 0.5)/10⁶.
    * `round()` is NOT portable — Spark rounds via the decimal string
    * (BigDecimal HALF_UP) while DuckDB rounds the scaled binary double,
    * and a score landing exactly on a half-boundary (x·10⁶ == N.5, which
    * synthetic dyadic ratios hit systematically) flips between them.
    * Scaled-floor is a pure function of the input double, so two engines
    * that computed the same double emit the same 6-decimal value. SQL
    * mirror: `floor(x * 1000000 + 0.5) / 1000000`. */
  def round6(c: Column): Column = floor(c * 1000000.0 + 0.5) / 1000000.0
}
