package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the package-private Dataset factory so graft's custom logical
  * plans (AsOfJoinPlan) can be wrapped as DataFrames — the standard pattern
  * for libraries extending Catalyst (cf. SparkSessionExtensions docs).
  */
object GraftDatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
