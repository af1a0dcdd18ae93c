package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Assignment is by salted md5 of the row id compared against hex-string
  * thresholds: fixed-width lowercase hex orders lexicographically exactly
  * as its numeric value, so the same rule runs unchanged on any engine
  * (no portable float RNG needed) and the assignment is stable under
  * repartitioning, re-runs, and engine swaps — the property that matters
  * when a 100 TB corpus is split or sampled incrementally. Both ops are
  * narrow (per-row predicate/projection, no shuffle at all).
  */
object Sampling {

  private def saltedHex(id: Column, salt: Column, width: Int): Column =
    substring(md5(concat(id.cast("string"), salt)), 1, width)

  /** train/val/test ≈ 80/10/10 assignment ('cc'/256 = 0.797,
    * 'e6'/256 = 0.898) as a plain column — usable as a map-only
    * `withColumn` with no join. */
  def splitColumn(id: Column): Column = {
    val b = saltedHex(id, lit(":split"), 2)
    when(b < "cc", "train").when(b < "e6", "val").otherwise("test")
  }

  /** train/val/test hash split of a docs table. */
  def hashSplit(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), splitColumn(col("doc_id")).as("split"))

  /** Deterministic 25% sample within each stratum ('4'/16 = 0.25); the
    * stratum is part of the salt so strata sample independently. */
  def stratifiedSample(docs: DataFrame, stratum: String = "lang"): DataFrame =
    docs
      .where(saltedHex(col("doc_id"), concat(lit(":sample:"), col(stratum)), 1) < "4")
      .select(col("doc_id"), col(stratum))
}
