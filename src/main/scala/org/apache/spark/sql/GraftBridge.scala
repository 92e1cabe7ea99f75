package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal accessor for the private[sql] Dataset factory, so graft's
  * custom logical operators (graft.plans.*) can be turned into public
  * DataFrames. Lives in the org.apache.spark.sql package solely to cross
  * the private[sql] boundary — the standard pattern for third-party
  * Catalyst operator libraries. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Column → Catalyst Expression (Spark 4 hides the expression behind
    * the ColumnNode API). */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Catalyst Expression → Column (the inverse bridge: lets graft's
    * native expressions be used from the DataFrame API without SQL
    * function registration). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
