package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The actual surface lives in graft.Registry; this object is the stable
  * facade the driver calls. */
object SparkEntry {

  /** Flagship query on sf=0.001 (SURVEY.md §7.3): the reference's
    * max-scaling / label-encoding / date-part feature pipeline
    * (ref `spark/jobs/pr-wallet-data-tf.py:76-120`) re-expressed on
    * lineitem as one global aggregate + broadcast cross join. */
  def entry(spark: SparkSession): DataFrame =
    Registry.queries("q02_maxscale_features")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
