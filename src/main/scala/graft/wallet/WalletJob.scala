package graft.wallet

import org.apache.spark.sql.SparkSession
import graft.io.Tables

/** The reference's whole 9-task Airflow DAG (ref `dags/s3-etl-wallet-csv.py:247-248`)
  * collapsed to one idempotent Spark job — SURVEY.md §2.8's mapping:
  *
  *   sensor/list/copy/delete zone moves (O1-O4, O7)  → direct read of the
  *     landing path; zone hops become stages of one lazy plan, no
  *     copy-then-delete races
  *   pandas cleanse (O5)                             → Wallet.cleanse
  *   spark-submit flagship (O6)                      → Wallet.features
  *   warehouse DDL + load (O8, O9)                   → Tables.ddl +
  *     Tables.writeJdbc (opt-in via --jdbc-url)
  *
  * Usage: runMain graft.wallet.WalletJob <landing.csv> <outDir>
  *            [--bug-compat-drop-first] [--jdbc-url <url> --jdbc-table <t>]
  *
  * Retries/scheduling stay external (the job is idempotent: overwrite
  * semantics on every sink), per SURVEY.md §2.8.
  */
object WalletJob {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: WalletJob <landing.csv> <outDir> [flags]")
    val (landing, outDir) = (args(0), args(1))
    val flags = args.drop(2)
    def flagValue(name: String): Option[String] =
      flags.sliding(2).collectFirst { case Array(`name`, v) => v }

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("wallet-etl")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // reference task policy: 1 retry after a delay (see Retry); delay is
    // configurable so tests/demos don't wait 5 minutes
    val retries = flagValue("--retries").map(_.toInt).getOrElse(0)
    val retryDelayMs = flagValue("--retry-delay-ms").map(_.toLong).getOrElse(300000L)

    Retry.withRetry(retries, retryDelayMs) {
    val raw = Wallet.readRaw(spark, landing)
    val cleansed0 = Wallet.cleanse(raw)
    val cleansed =
      if (flags.contains("--bug-compat-drop-first")) Wallet.dropFirstDataRow(cleansed0)
      else cleansed0
    val feats = Wallet.features(cleansed).cache() // one compute, two sinks

    // curated/serving sinks (K1/K2): CSV for the TF consumer, parquet as
    // the scale-path format the reference never used its Delta jar for.
    Tables.writeCsv(feats, s"$outDir/wallet-features-csv")
    Tables.writeParquet(feats, s"$outDir/wallet-features-parquet")

    // warehouse load (K3/K4), only when a DW is configured. DDL is
    // caller-supplied (--jdbc-ddl), mirroring the reference's explicit
    // Postgres DDL task (ref `dags/s3-etl-wallet-csv.py:204-236`) — SQL
    // dialects disagree on IF NOT EXISTS/type names, so the engine never
    // guesses; without it, Spark's JDBC writer creates the table using
    // the target dialect's own type mapping.
    flagValue("--jdbc-url").foreach { url =>
      val table = flagValue("--jdbc-table").getOrElse("wallet_features")
      val props = new java.util.Properties()
      flagValue("--jdbc-ddl").foreach(Tables.ddl(url, props, _))
      Tables.writeJdbc(feats, url, table, props)
    }

    println(s"""{"rows":${feats.count()},"out":"$outDir"}""")
    }
    spark.stop()
  }
}
