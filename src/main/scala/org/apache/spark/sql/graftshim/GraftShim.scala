package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Package-private escape hatch: `classic.Dataset.ofRows` (plan → DataFrame)
  * is `private[sql]`, so the one call-site lives in an `org.apache.spark.sql`
  * subpackage — the standard pattern for out-of-tree Spark plan extensions.
  */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
