package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` plan construction — the standard pattern
  * Spark extension libraries use to turn a custom LogicalPlan into a
  * public DataFrame (classic `Dataset.ofRows` is package-private).
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Column <-> catalyst Expression, for the codegen kernel
    * constructors (classic.ExpressionUtils is private[sql]).
    */
  def columnOf(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expressionOf(
      c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
