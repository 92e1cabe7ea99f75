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

  private def appId(sourceTable: String) = s"graft-incrview:$sourceTable"

  /** The view's DURABLE cursor: the source version whose delta the
    * committed state already includes, recorded as a txn marker in the
    * SAME commit as the state. The startup call after a crash. */
  def committedCursor(spark: SparkSession, sourceTable: String,
                      viewTable: String): Long =
    TxnTable.lastCommittedBatch(spark, viewTable, appId(sourceTable))
      .getOrElse(0L)

  /** Refresh the view at `viewTable` from `sourceTable`'s appends since
    * `cursor`: group the delta by `keyCol`, count rows and decimal-sum
    * `valCol`, merge into existing state, commit. Returns the new
    * cursor.
    *
    * Crash-safe: the cursor is committed WITH the view state as a
    * `(appId, sourceVersion)` txn marker, and the marker — not the
    * caller's argument — is authoritative. A caller that crashes
    * between refresh and persisting the returned cursor re-offers a
    * stale one on restart; the durable marker advances the effective
    * cursor past the already-applied delta, so nothing double-counts
    * (the in-memory cursor is an optimization, never the truth). */
  def refresh(spark: SparkSession, sourceTable: String, viewTable: String,
              keyCol: String, valCol: String, cursor: Long): Long = {
    val effective = math.max(cursor, committedCursor(spark, sourceTable, viewTable))
    val (delta, newCursor) = TxnTable.readChanges(spark, sourceTable, effective)
    if (newCursor == effective) return effective // nothing new
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
    TxnTable.commitOverwriteIdempotent(
      merged.select(
        col("k"),
        col("n").cast("long").as("n"),
        col("dec_sum").cast(Dec).as("dec_sum")),
      viewTable, appId(sourceTable), newCursor)
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
