package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{classic, DataFrame, SparkSession}

/** Bridge to the `private[sql]` `Dataset.ofRows` — the standard way a
  * third-party operator library materializes a DataFrame from a custom
  * LogicalPlan (every public Spark extension with its own logical nodes
  * ships an equivalent shim in this package).
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
