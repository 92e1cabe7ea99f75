package graft.wallet

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Num.safeDiv

/** The reference's wallet pipeline, Spark-first.
  *
  * Reference semantics reproduced here:
  *  - 23-column schema, 7 int / 6 double / 10 string, all nullable
  *    (ref `spark/jobs/pr-wallet-data-tf.py:34-57`)
  *  - pandas cleanse stage: canonical column names + `dd/MM/yyyy` →
  *    `yyyy-MM-dd` date rewrite, None for empty
  *    (ref `dags/s3-etl-wallet-csv.py:53-55,78-106`)
  *  - flagship feature query: max-scaling, label encodings, date-part
  *    features, 34 output columns (ref `spark/jobs/pr-wallet-data-tf.py:76-120`)
  *
  * Architectural difference (SURVEY.md §4.3): the reference runs 10
  * uncorrelated scalar subqueries, rescanning the input up to 11× per
  * action on Spark 3.0.2. Here all 10 maxima come from ONE aggregate pass
  * whose 1-row result is broadcast into the projection — 2 scans total,
  * invariant at any data size.
  */
object Wallet {

  val columns: Seq[String] = Seq(
    "empresa", "marca", "empreendimento", "cliente", "regional", "obra",
    "bloco", "unidade", "dt_venda", "dt_chaves", "carteira_sd_gerencial",
    "saldo_devedor", "data_base", "total_atraso", "faixa_de_atraso",
    "dias_atraso", "valor_pago_atualizado", "valor_pago", "status",
    "dt_reneg", "descosn", "vaga", "vgv")

  /** The 34 flagship output columns, exact order of the reference's golden
    * output header (ref `data/parsed-data.csv:1`). */
  val featureColumns: Seq[String] = Seq(
    "empresa", "p_empresa", "marca", "p_marca", "obra", "p_obra", "bloco",
    "p_bloco", "unidade", "p_unidade", "dt_venda", "p_dt_venda_day",
    "p_dt_venda_month", "p_dt_venda_year", "dt_chaves", "p_dt_chaves_day",
    "p_dt_chaves_month", "p_dt_chaves_year", "carteira_sd_gerencial",
    "p_carteira_sd_gerencial", "saldo_devedor", "p_saldo_devedor",
    "p_data_base_day", "p_data_base_month", "p_data_base_year", "dias_atraso",
    "p_dias_atraso", "p_dias_atraso_category", "valor_pago_atualizado",
    "p_valor_pago_atualizado", "valor_pago", "p_valor_pago", "vgv", "p_vgv")

  /** Explicit landing/curated schema (ref `spark/jobs/pr-wallet-data-tf.py:35-57`).
    * IntegerType on `empresa/bloco/unidade` intentionally strips leading
    * zeros ('0164' → 164), matching the reference's lossy parse. */
  val schema: StructType = StructType(Seq(
    StructField("empresa", IntegerType),
    StructField("marca", StringType),
    StructField("empreendimento", StringType),
    StructField("cliente", StringType),
    StructField("regional", StringType),
    StructField("obra", IntegerType),
    StructField("bloco", IntegerType),
    StructField("unidade", IntegerType),
    StructField("dt_venda", StringType),
    StructField("dt_chaves", StringType),
    StructField("carteira_sd_gerencial", IntegerType),
    StructField("saldo_devedor", DoubleType),
    StructField("data_base", StringType),
    StructField("total_atraso", DoubleType),
    StructField("faixa_de_atraso", IntegerType),
    StructField("dias_atraso", IntegerType),
    StructField("valor_pago_atualizado", DoubleType),
    StructField("valor_pago", DoubleType),
    StructField("status", StringType),
    StructField("dt_reneg", StringType),
    StructField("descosn", StringType),
    StructField("vaga", StringType),
    StructField("vgv", DoubleType)))

  /** Read a landing-zone wallet CSV (header, UTF-8, explicit schema). */
  def readRaw(spark: SparkSession, path: String): DataFrame =
    graft.io.Tables.csv(spark, path, schema)

  /** Cleanse stage (replaces the reference's single-process pandas step,
    * ref `dags/s3-etl-wallet-csv.py:57-118`): normalize the four date
    * columns from `dd/MM/yyyy` to ISO `yyyy-MM-dd`. Null/empty pass
    * through as NULL — same as the reference's `format_date_to_postgres`
    * returning None on non-str (ref `dags/s3-etl-wallet-csv.py:53-55`).
    * A codegen'd `to_date`/`date_format` pair per column replaces the
    * reference's per-element Python `.apply` loop. */
  def cleanse(df: DataFrame): DataFrame = {
    // try_to_date, not to_date: under ANSI (Spark 4 default) to_date throws
    // on unparseable input; the reference maps empty/garbage to None.
    def iso(c: String): Column =
      date_format(try_to_date(col(c), "dd/MM/yyyy"), "yyyy-MM-dd").as(c)
    df.withColumns(Map(
      "dt_venda" -> iso("dt_venda"),
      "dt_chaves" -> iso("dt_chaves"),
      "data_base" -> iso("data_base"),
      "dt_reneg" -> iso("dt_reneg")))
  }

  /** Bug-compat replica of the reference's pandas `header=1`, which
    * silently drops the FIRST DATA ROW of the file (SURVEY.md §1.4;
    * ref `dags/s3-etl-wallet-csv.py:103`). Only meaningful for single-file
    * inputs where file order is row order; kept out of the default path
    * and used by the golden-file test. */
  def dropFirstDataRow(df: DataFrame): DataFrame = {
    val withIdx = df.rdd.zipWithIndex().filter(_._2 > 0).map(_._1)
    df.sparkSession.createDataFrame(withIdx, df.schema)
  }

  /** Flagship feature stage: 34 columns in the exact order of the
    * reference's golden output (ref `data/parsed-data.csv:1`, SQL at
    * `spark/jobs/pr-wallet-data-tf.py:76-120`). */
  def features(df: DataFrame): DataFrame = {
    val mx = df.agg(
      max(col("empresa")).as("mx_empresa"),
      max(col("obra")).as("mx_obra"),
      max(col("bloco")).as("mx_bloco"),
      max(col("unidade")).as("mx_unidade"),
      max(col("carteira_sd_gerencial")).as("mx_carteira"),
      max(col("saldo_devedor")).as("mx_saldo"),
      max(abs(col("dias_atraso"))).as("mx_abs_dias"),
      max(col("valor_pago_atualizado")).as("mx_vpa"),
      max(col("valor_pago")).as("mx_vp"),
      max(col("vgv")).as("mx_vgv"))

    def dpart(c: String, fn: Column => Column, div: Double): Column =
      fn(to_date(col(c))) / lit(div)

    df.crossJoin(broadcast(mx)).select(
      col("empresa"),
      safeDiv(col("empresa"), col("mx_empresa")).as("p_empresa"),
      col("marca"),
      when(lower(col("marca")) === "cyrela", 1)
        .when(lower(col("marca")) === "living", 2)
        .when(lower(col("marca")) === "vivaz", 3)
        .otherwise(0).as("p_marca"),
      col("obra"),
      safeDiv(col("obra"), col("mx_obra")).as("p_obra"),
      col("bloco"),
      safeDiv(col("bloco"), col("mx_bloco")).as("p_bloco"),
      col("unidade"),
      safeDiv(col("unidade"), col("mx_unidade")).as("p_unidade"),
      col("dt_venda"),
      dpart("dt_venda", dayofmonth, 30.0).as("p_dt_venda_day"),
      dpart("dt_venda", month, 12.0).as("p_dt_venda_month"),
      dpart("dt_venda", year, 2000.0).as("p_dt_venda_year"),
      col("dt_chaves"),
      dpart("dt_chaves", dayofmonth, 30.0).as("p_dt_chaves_day"),
      dpart("dt_chaves", month, 12.0).as("p_dt_chaves_month"),
      dpart("dt_chaves", year, 2000.0).as("p_dt_chaves_year"),
      col("carteira_sd_gerencial"),
      safeDiv(col("carteira_sd_gerencial"), col("mx_carteira")).as("p_carteira_sd_gerencial"),
      col("saldo_devedor"),
      safeDiv(col("saldo_devedor"), col("mx_saldo")).as("p_saldo_devedor"),
      dpart("data_base", dayofmonth, 30.0).as("p_data_base_day"),
      dpart("data_base", month, 12.0).as("p_data_base_month"),
      dpart("data_base", year, 2000.0).as("p_data_base_year"),
      col("dias_atraso"),
      safeDiv(abs(col("dias_atraso")), col("mx_abs_dias")).as("p_dias_atraso"),
      when(col("dias_atraso") >= -30, 0)
        .when(col("dias_atraso") >= -90, 1)
        .otherwise(2).as("p_dias_atraso_category"),
      col("valor_pago_atualizado"),
      safeDiv(col("valor_pago_atualizado"), col("mx_vpa")).as("p_valor_pago_atualizado"),
      col("valor_pago"),
      safeDiv(col("valor_pago"), col("mx_vp")).as("p_valor_pago"),
      col("vgv"),
      safeDiv(col("vgv"), col("mx_vgv")).as("p_vgv"))
  }

  /** End-to-end pipeline: landing CSV → cleanse → features. One job, two
    * scans (agg pass + projection pass), no intermediate materialization —
    * vs the reference's 4 zone hops and up-to-22 scans per day. */
  def pipeline(spark: SparkSession, rawPath: String): DataFrame =
    features(cleanse(readRaw(spark, rawPath)))
}
