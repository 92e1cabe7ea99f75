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

  /** Schema-evolution merge (the private[sql] StructType.merge):
    * union of fields, numeric-compatible type promotion, error on
    * incompatible types. All fields forced nullable — an evolved
    * column is absent (null) in pre-evolution files. */
  def mergeSchemas(
      a: org.apache.spark.sql.types.StructType,
      b: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType =
    a.merge(b).asNullable

  def nullableSchema(
      s: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType =
    s.asNullable

  /** Partitions actually selected by the frame's parquet scan after
    * partition pruning (planning-time directory pruning — note
    * `df.inputFiles` can NOT show this: it lists the pre-pruning file
    * index). None when the plan has no file scan. */
  def prunedPartitionCount(df: DataFrame): Option[Int] =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }

  /** RDD[InternalRow] → DataFrame without the Row encode/decode round
    * trip (the private[sql] twin of createDataFrame). The rows must
    * already be in catalyst format and safe to buffer (copied). */
  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
