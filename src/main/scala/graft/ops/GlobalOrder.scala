package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scale-safe replacements for global-order windows.
  *
  * `ROW_NUMBER() OVER (ORDER BY …)` / `COUNT(*) OVER ()` force every row
  * through ONE partition — the textbook 100 TB killer (a single task sorts
  * the whole table). The operators here produce the same answers with a
  * range repartition (distributes across the cluster) plus one tiny
  * metadata pass:
  *
  *   pass 1  range-partition + sort within partitions on the order key —
  *           partitions are globally ordered, rows ordered within each
  *   pass 2  per-partition row counts → driver (numPartitions longs, not
  *           rows) → cumulative offsets
  *   pass 3  partition-local numbering starting at the partition's offset
  *
  * Passes 2 and 3 run over ONE shared RDD, so the range exchange is
  * materialized once and the second job skips its map stage (shuffle-file
  * reuse) — two separate DataFrame actions would have recompiled the plan
  * and paid the shuffle twice. This is the genuinely-imperative
  * per-partition case where the RDD hop is the right tool; `RDD.zipWithIndex`
  * is built the same way.
  *
  * The hop stays at the INTERNALROW level (`queryExecution.toRdd` in,
  * `internalCreateDataFrame` out): rows are never decoded to external
  * `Row`s and back — the counting pass touches no fields at all, and the
  * numbering pass prepends the id via a `JoinedRow` over a buffer copy
  * of the (reused) UnsafeRow. The old `.rdd`/`createDataFrame` spelling
  * paid a full per-field deserialize + re-encode of the entire table —
  * at 100 TB that is the numbering pass costing more than the sort.
  *
  * Contract with the reference's SERIAL-id semantics
  * (ref `dags/s3-etl-wallet-csv.py:210`): ids are contiguous from 1 in the
  * total order of `sortCols`, which must be a unique key for the order —
  * and therefore the numbering — to be deterministic.
  */
object GlobalOrder {

  /** Prepend a contiguous 1-based `idCol` in the total order of `sortCols`
    * without a single-partition exchange. */
  def globalRowNumber(
      df: DataFrame,
      sortCols: Seq[Column],
      idCol: String,
      numPartitions: Int = 0): DataFrame =
    withGlobalRank(df, sortCols, idCol, numPartitions)._1

  /** Globally-numbered frame plus the total row count (free from the
    * offsets pass) — building block for rank-selection statistics
    * (median, quantiles) without `COUNT(*) OVER ()`. */
  def withGlobalRank(
      df: DataFrame,
      sortCols: Seq[Column],
      idCol: String = "rn",
      numPartitions: Int = 0): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sortedRdd = df
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .queryExecution.toRdd // InternalRow; shared by both jobs below

    // pass 2: one long per partition to the driver — O(parts), not
    // O(rows), and no field is ever decoded
    val counts = sortedRdd
      .mapPartitionsWithIndex { (pid, it) =>
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }
        Iterator.single(pid -> n)
      }
      .collect()
      .toMap
    val offsets = new Array[Long](parts)
    var acc = 0L
    var p = 0
    while (p < parts) { offsets(p) = acc; acc += counts.getOrElse(p, 0L); p += 1 }

    // pass 3: partition-local numbering from the broadcast offsets; the
    // range-exchange map stage is skipped here (already materialized).
    // copy() the source row (scan iterators reuse one UnsafeRow buffer;
    // downstream operators may hold references) and prepend the id with
    // a JoinedRow — no per-field extraction.
    val numbered = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      var i = offsets(pid)
      it.map { row =>
        i += 1
        new JoinedRow(
          new GenericInternalRow(Array[Any](i)), row.copy()): InternalRow
      }
    }
    val outSchema = StructType(
      StructField(idCol, LongType, nullable = false) +: df.schema.fields)
    (GraftBridge.internalCreateDataFrame(spark, numbered, outSchema), acc)
  }
}
