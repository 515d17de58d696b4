package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal accessor for the `private[sql]` DataFrame-from-LogicalPlan
  * constructor, needed to surface a custom logical operator
  * ([[graft.plans.AsOfJoinNode]]) as a DataFrame. This is the standard
  * extension seam third-party Spark connectors use; nothing else from
  * the private API is touched. */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
