package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset.ofRows constructor: optimizer
  * rules that splice an operator pipeline built with the public
  * DataFrame API back into a logical plan (graft.plans.PyUdfBatchRule)
  * need a DataFrame over an arbitrary LogicalPlan.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
