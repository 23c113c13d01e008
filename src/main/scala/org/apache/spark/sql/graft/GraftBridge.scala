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

  /** Column from a catalyst Expression (`private[sql]`
    * ExpressionUtils) — lets hot-path Column builders use graft's
    * native expressions WITHOUT the session-level function
    * registration `call_function` needs (a Column builder has no
    * session to register on).
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    classic.ExpressionUtils.column(e)

  /** The reverse direction, for feeding Column children into directly
    * constructed expressions.
    */
  def expression(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
