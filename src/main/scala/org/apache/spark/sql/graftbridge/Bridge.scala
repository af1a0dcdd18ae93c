package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}

/** The one `private[sql]` doorway a library adding its own logical
  * operators needs: turning a hand-built [[LogicalPlan]] back into a
  * [[DataFrame]]. Placed under `org.apache.spark.sql` (the standard
  * extension-library pattern) so `Dataset.ofRows` is visible; nothing
  * else from the internal surface is touched.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** The analyzed plan behind a DataFrame (for building composite
    * logical nodes from user-supplied frames). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed
}
