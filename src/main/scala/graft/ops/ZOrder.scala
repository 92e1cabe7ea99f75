package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) layout: multi-dimensional data clustering for
  * file skipping — the optimization a 100 TB table reaches for when
  * queries filter on TWO columns and hive-partitioning can only serve
  * one. Interleaving the bits of both keys gives a 1-D sort order in
  * which ranges of EITHER column map to bounded curve segments, so
  * range-partitioned files carry narrow min/max footer stats on both
  * columns at once and a predicate on either prunes most files
  * (Delta/Iceberg `OPTIMIZE ZORDER BY`; the locality win is measured,
  * not assumed, in ZOrderSpec).
  *
  * The z-value is pure bit arithmetic (mask → spread → interleave), so
  * it is a codegen'd projection here and restated verbatim in the
  * DuckDB oracle — cross-engine bit-identical by construction. */
object ZOrder {

  /** Low 16 bits of `v` spread to the even bit positions of a 32-bit
    * lane (the classic Morton magic-mask cascade). */
  private def spreadBits(v: Column): Column = {
    val s1 = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton z-value of two keys (low 16 bits each → one 32-bit curve
    * position, as BIGINT). pmod, not %: a sign-preserving remainder on
    * a negative key would feed a negative value into the bit-spread
    * masks and return a garbage curve position — pmod folds negatives
    * into [0, 65536) so every input lands on the curve (negative keys
    * wrap, which preserves locality within each 65536-wide window; for
    * full-range keys normalize first, as `cluster` does). */
  def zvalue(x: Column, y: Column): Column =
    spreadBits(pmod(x.cast("long"), lit(65536L)))
      .bitwiseOR(shiftleft(spreadBits(pmod(y.cast("long"), lit(65536L))), 1))

  /** The oracle-side spelling: same masks, same shifts, same order. */
  def spreadSql(e: String): String = {
    val s1 = s"((($e) | (($e) << 8)) & 16711935)"
    val s2 = s"(($s1 | ($s1 << 4)) & 252645135)"
    val s3 = s"(($s2 | ($s2 << 2)) & 858993459)"
    s"(($s3 | ($s3 << 1)) & 1431655765)"
  }
  def zvalueSql(x: String, y: String): String =
    s"(${spreadSql(s"((($x) % 65536) + 65536) % 65536")} | " +
      s"(${spreadSql(s"((($y) % 65536) + 65536) % 65536")} << 1))"

  /** Write `df` into `numFiles` parquet files clustered along the
    * z-curve of (x, y): range-partition on the z-value, sort within
    * partitions — every file owns a contiguous curve segment, so its
    * min/max stats are narrow in BOTH dimensions. One shuffle, exactly
    * like a single-column sort layout; only the sort key changes.
    *
    * Both dimensions are min/max-NORMALIZED to the full 16-bit lane
    * first — interleaving raw values whose magnitudes differ lets the
    * wider column's high bits own the curve's top bits and the layout
    * degenerates to a single-column sort (measured: custkey span went
    * 0.96 → ~0.3 of range once normalized). Equal-width scaling needs
    * one 4-value aggregate broadcast; heavily skewed columns would use
    * rank instead (GlobalOrder at scale), same interleave after. */
  /** `df` re-clustered along the z-curve: range-partitioned into
    * `numFiles` partitions of the normalized z-value, sorted within.
    * Feed to any sink — zorderWrite for a plain dir, or a TxnTable
    * commit with stats on BOTH columns (k92) so range reads skip files
    * on either dimension. */
  def cluster(df: DataFrame, x: String, y: String, numFiles: Int): DataFrame = {
    val mm = df.agg(
      min(col(x)).cast("double").as("__xmin"),
      max(col(x)).cast("double").as("__xmax"),
      min(col(y)).cast("double").as("__ymin"),
      max(col(y)).cast("double").as("__ymax"))
    def norm(c: Column, lo: Column, hi: Column): Column =
      floor((c.cast("double") - lo) * 65535.0 /
        Num.nullIfZero(hi - lo)).cast("long")
    df.crossJoin(broadcast(mm))
      .withColumn("__z", coalesce(
        zvalue(
          norm(col(x), col("__xmin"), col("__xmax")),
          norm(col(y), col("__ymin"), col("__ymax"))),
        lit(0L)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__xmin", "__xmax", "__ymin", "__ymax")
  }

  def zorderWrite(df: DataFrame, path: String, x: String, y: String,
                  numFiles: Int): Unit =
    cluster(df, x, y, numFiles)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  /** N-way Morton interleave: each of the N normalized lanes
    * contributes `bits` bits, bit i of lane j landing at position
    * i*N + j. Lane width shrinks with N so the curve position stays
    * inside a non-negative long (N=2 → 16 bits, matching `zvalue`;
    * N=4 → 15; N=6 → 10). Built as a flat OR-reduction of
    * shift-and-mask terms — pure codegen'd integer ops, no UDF. */
  private[graft] def laneBits(n: Int): Int = math.min(16, 62 / n)

  private[graft] def zvalueN(lanes: Seq[Column]): Column = {
    val n = lanes.size
    val bits = laneBits(n)
    (for {
      i <- 0 until bits
      (c, j) <- lanes.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j))
      .reduce(_ bitwiseOR _)
  }

  /** `cluster` for ANY number of dimensions (Delta's ZORDER BY takes an
    * arbitrary column list): min/max-normalize every column to its lane
    * width, interleave, range-partition + sort on the curve position.
    * Same single-shuffle plan shape as the 2-column path; per-file
    * stat-span quality degrades gracefully as N grows (each dimension's
    * expected span is ~numFiles^(-1/N) of its range — the standard
    * multi-dim trade-off, not an implementation artifact). */
  def clusterN(df: DataFrame, cols: Seq[String], numFiles: Int): DataFrame = {
    require(cols.size >= 2, s"z-order needs at least 2 columns, got $cols")
    val bits = laneBits(cols.size)
    val hiVal = (1L << bits) - 1L
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c)).cast("double").as(s"__min$i"),
        max(col(c)).cast("double").as(s"__max$i")) }
    val mm = df.agg(aggs.head, aggs.tail: _*)
    def norm(c: Column, lo: Column, hi: Column): Column =
      floor((c.cast("double") - lo) * hiVal.toDouble /
        Num.nullIfZero(hi - lo)).cast("long")
    val lanes = cols.zipWithIndex.map { case (c, i) =>
      coalesce(norm(col(c), col(s"__min$i"), col(s"__max$i")), lit(0L)) }
    df.crossJoin(broadcast(mm))
      .withColumn("__z", zvalueN(lanes))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z" +: cols.indices.flatMap(i => Seq(s"__min$i", s"__max$i")): _*)
  }
}
