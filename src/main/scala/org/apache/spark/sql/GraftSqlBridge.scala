package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one sanctioned crossing into Spark's `private[sql]` surface:
  * constructing a DataFrame from a custom [[LogicalPlan]] node
  * (`Dataset.ofRows` has no public equivalent). Everything else in the
  * graft library stays on public API; keeping this file to two
  * one-liners keeps the private-API blast radius auditable.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
