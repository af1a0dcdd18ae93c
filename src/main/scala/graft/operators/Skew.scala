package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins whose key distribution is heavy-
  * tailed (the classic 100 TB failure mode: one hot key pins one
  * reducer).
  *
  * AQE's skew-join splitting (on in Graft.session) handles most cases at
  * runtime; saltedJoin is the explicit form for when the skew is known
  * ahead of time or AQE can't apply (e.g., aggregations after the join
  * need the salt anyway, or non-sort-merge plans).
  */
object Skew {

  /** Salted inner equi-join: the left (large, skewed) side gets a random-
    * but-deterministic salt derived from row content; the right side is
    * replicated `saltFactor` ways so every (key, salt) bucket finds its
    * match. Hot keys spread over `saltFactor` reducers at the cost of
    * replicating the right side — use when right is small-ish but too big
    * to broadcast. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col).toSeq: _*)), lit(saltFactor)))
    val replicated = right
      .withColumn("__salt", explode(sequence(lit(0L), lit(saltFactor - 1L))))
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }
}
