package org.apache.spark.sql.graftplan

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Lives under the org.apache.spark.sql namespace solely to reach the
  * `private[sql]` `classic.Dataset.ofRows` — the one hop needed to wrap a
  * custom [[LogicalPlan]] node (graft's native as-of join) back into a
  * public DataFrame. No Spark internals are modified; the analyzed plans
  * of the child DataFrames are likewise read through the public
  * `queryExecution` surface by the caller.
  */
object PlanBuilder {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
