package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table IO: pre-shuffle a fact table ONCE by its join/agg key so
  * every later equi-join or aggregation on that key is exchange-free.
  *
  * This is the 100 TB answer to "the same fact⋈fact join runs nightly":
  * at write time each side is hash-partitioned into N buckets (and sorted
  * within), so Spark plans SortMergeJoin with NO Exchange on either side —
  * the dominant shuffle disappears from every downstream run.
  * BucketingSpec asserts the exchange-free plan. */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two tables previously written with the same bucket spec on the
    * same key — plans without any Exchange. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
