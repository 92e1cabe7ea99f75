package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate (materialized view) over an
  * append-only TxnTable: each refresh reads ONLY the rows appended since
  * the last cursor (`TxnTable.readChanges`), aggregates the delta, and
  * merges it into the view's stored state — the incremental-ETL pattern
  * that replaces the reference DAG's recompute-the-world daily run with
  * work proportional to new data.
  *
  * Exactness under merging: the view stores its sums as DECIMAL(38,6),
  * not double. Decimal addition is exact and associative, so
  * delta-merge-delta produces BIT-IDENTICAL state to a full recompute at
  * any refresh cadence — merging partial DOUBLE sums would not (each
  * partial's final rounding differs from one global rounding; k88's
  * oracle hash-compares against the full recompute to prove the merge
  * introduces no drift). Counts merge as plain longs. The view itself
  * is a TxnTable, so refreshes commit atomically and readers never see
  * a half-merged state. */
object IncrementalView {

  private val Dec = org.apache.spark.sql.types.DecimalType(38, 6)

  /** Refresh the view at `viewTable` from `sourceTable`'s appends since
    * `cursor`: group the delta by `keyCol`, count rows and decimal-sum
    * `valCol`, merge into existing state, commit. Returns the new
    * cursor (persist it; pass it to the next refresh). */
  def refresh(spark: SparkSession, sourceTable: String, viewTable: String,
              keyCol: String, valCol: String, cursor: Long): Long = {
    val (delta, newCursor) = TxnTable.readChanges(spark, sourceTable, cursor)
    if (newCursor == cursor) return cursor // nothing new
    val deltaAgg = delta
      .groupBy(col(keyCol).as("k"))
      .agg(
        count(lit(1)).as("n"),
        sum(col(valCol).cast(Dec)).as("dec_sum"))
    val merged =
      if (TxnTable.latestVersion(spark, viewTable).isEmpty) deltaAgg
      else TxnTable.read(spark, viewTable)
        .unionByName(deltaAgg)
        .groupBy(col("k"))
        .agg(
          sum(col("n")).as("n"),
          sum(col("dec_sum")).as("dec_sum"))
    TxnTable.commitOverwrite(
      merged.select(
        col("k"),
        col("n").cast("long").as("n"),
        col("dec_sum").cast(Dec).as("dec_sum")),
      viewTable)
    newCursor
  }

  /** The view's queryable face: key, row count, sum as double (one
    * final deterministic decimal→double rounding — same as Num.dsum). */
  def read(spark: SparkSession, viewTable: String): DataFrame =
    TxnTable.read(spark, viewTable)
      .select(
        col("k"),
        col("n").cast("long").as("n"),
        col("dec_sum").cast("double").as("sum_val"))
}
