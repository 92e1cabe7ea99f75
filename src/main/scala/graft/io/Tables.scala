package graft.io

import org.apache.spark.sql.{DataFrame, DataFrameReader, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Zone/IO layer (SURVEY.md §2.1, §2.2, §7.2-1).
  *
  * The reference moves whole CSV files between object-store "zones"
  * (landing → processing → curated → serving; ref `dags/s3-etl-wallet-csv.py:24-27`)
  * and reads them with an explicit 23-field schema
  * (ref `spark/jobs/pr-wallet-data-tf.py:60-64`). Here a zone is just a path
  * prefix over any Hadoop-compatible FS; every reader takes an explicit schema
  * (never inferred — schema inference is a full extra scan at 100 TB).
  */
object Tables {

  /** Recursive local-FS delete for scratch zones — null-safe against a
    * race-deleted directory (listFiles() returns null, not empty). One
    * shared helper instead of a per-query copy. */
  private[graft] def deleteTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteTree))
    f.delete(); ()
  }

  /** Star-schema + extension tables the driver generates (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet table from a scale-factor directory. Parquet gives the
    * vectorized reader, column pruning and filter pushdown for free —
    * the scan layer we want under every query at 100 TB. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet has shipped `ts` both as INT64 TIMESTAMP(NANOS) (which
    * Spark's vectorized reader rejects — loaded as raw long via the legacy
    * conf) and, currently, as plain TIMESTAMP(MICROS). Branch on the dtype
    * the scan actually produced instead of assuming either vintage:
    *  - LongType ⇒ legacy nanos file: convert with integer division
    *    (`ts div 1000`, NOT `/1000` + cast — epoch-nanos ≈ 1.7e18 exceeds a
    *    double's 2^53 exact range, so float division would corrupt digits);
    *  - any timestamp type ⇒ just normalize to TIMESTAMP_NTZ, matching how
    *    the other tables' timestamps load (parquet isAdjustedToUTC=false). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table of a scale-factor dir as a temp view, so
    * `spark.sql` queries (scalar subqueries, CTEs) can reference them by the
    * same names the DuckDB oracle uses. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val p = new java.io.File(s"$dir/$n.parquet")
      // events goes through its nanos-normalizing loader, not a raw scan
      if (p.exists()) (if (n == "events") events(spark, dir) else load(spark, dir, n))
        .createOrReplaceTempView(n)
    }

  /** CSV scan with header + explicit schema — operator S1
    * (ref `spark/jobs/pr-wallet-data-tf.py:60-64`). UTF-8 forced: the wallet
    * data contains `São Paulo` (ref `data/wallet-data.csv:2`). */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .options(Map("header" -> "true", "encoding" -> "UTF-8"))
      .schema(schema)
      .csv(path)

  /** CSV sink, overwrite, with header — operator K1
    * (ref `spark/jobs/pr-wallet-data-tf.py:127-131`). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Parquet sink with optional hive-style partitioning — the scale-path
    * sink the reference lacked (its Delta jar was shipped but unused,
    * ref `spark/jars/delta-core_2.12-0.7.0.jar`). Partition columns enable
    * partition pruning on downstream scans. */
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Write `df` as ONE parquet file at exactly `destFile` — the shape of a
    * single-object landing-zone drop (the reference's sensor watches for
    * whole files arriving, ref `dags/s3-etl-wallet-csv.py:144-145`).
    * Stages through a temp dir because Spark writers emit part files;
    * only for bounded frames (coalesce(1) serializes the write). */
  def writeSingleFile(df: DataFrame, destFile: String): Unit = {
    val stage = java.nio.file.Files.createTempDirectory("graft_stage").toFile
    try {
      df.coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(stage.getAbsolutePath)
      val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(destFile)
      dest.getParentFile.mkdirs()
      java.nio.file.Files.move(part.toPath, dest.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    } finally {
      graft.io.Tables.deleteTree(stage)
    }
  }

  /** JDBC append — operator K3 (ref `dags/s3-etl-wallet-csv.py:120-135`).
    * The reference used pandas `to_sql(chunksize=10)` ≈ 200k round-trips for
    * its stated 2M-row target; Spark's writer batches 10k rows per statement
    * and parallelizes across partitions. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                props: java.util.Properties, batchSize: Int = 10000): Unit =
    df.write.mode(SaveMode.Append)
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, props)

  /** DDL bootstrap — operator K4 (ref `dags/s3-etl-wallet-csv.py:204-236`).
    * Spark's JDBC writer can't emit `SERIAL PRIMARY KEY`, so DDL goes through
    * a plain JDBC statement, exactly once, before the append. */
  def ddl(url: String, props: java.util.Properties, sql: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try { val st = conn.createStatement(); try st.execute(sql) finally st.close() }
    finally conn.close()
  }
}
