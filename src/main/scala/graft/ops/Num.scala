package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Numeric helpers that make aggregate results *bit-stable* across engines
  * and across partitionings.
  *
  * A plain `sum(double)` is order-dependent: Spark's partial aggregation adds
  * in partition order, DuckDB in its own order, so the last few mantissa bits
  * differ and a hash-compare fails (SURVEY.md §7.5 "float tolerance vs
  * hash-match"). Summing through `DECIMAL(38,6)` is exact and
  * order-independent; casting the final decimal back to double is a single
  * deterministic rounding both engines perform identically. This also means
  * results don't drift when the partition count changes — i.e. the same
  * query gives the same bytes at local[32] and on a 1000-executor cluster.
  *
  * Oracle-side equivalents (DuckDB):
  *   dsum(x)  ≙ CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)
  *   davg(x)  ≙ CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(x)
  */
object Num {
  private val Dec = DecimalType(38, 6)

  /** Order-independent double sum (exact decimal accumulation). */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Order-independent double mean: exact decimal sum, one double divide. */
  def davg(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType) / count(c)

  /** NULL instead of a division-by-zero edge (SURVEY.md §4.3): engines
    * disagree on x/0; both agree x/NULL = NULL. */
  def nullIfZero(c: Column): Column = when(c === 0, lit(null)).otherwise(c)

  /** Max-scaling denominator: MAX(|c|) guarded against 0 and NULL. */
  def safeDiv(num: Column, den: Column): Column = num / nullIfZero(den)
}
