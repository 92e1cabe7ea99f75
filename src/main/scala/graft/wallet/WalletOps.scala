package graft.wallet

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.{Q => RQ}

/** The reference's own flagship pipeline as a registered query: landing
  * CSV → cleanse → 34-column feature stage, bug-compat first-row drop —
  * the exact computation whose output equals the committed golden file
  * `data/parsed-data.csv` (WalletGoldenSpec pins the equality).
  *
  * Oracle: DuckDB replays the same pipeline over the same CSV —
  * `read_csv(header=false, skip=2, ...)` reproduces the pandas
  * `header=1` first-data-row drop (ref `dags/s3-etl-wallet-csv.py:103`,
  * SURVEY.md §1.4), `try_strptime/strftime` the cleanse (ref
  * `dags/s3-etl-wallet-csv.py:53-55`), and a single max CTE the 10
  * scalar subqueries of the flagship SQL (ref
  * `spark/jobs/pr-wallet-data-tf.py:76-120`). Every division is a single
  * IEEE double op in both engines, so values are bit-identical.
  *
  * The ORDER BY keys are a superset of every source column that feeds the
  * 34 outputs, so rows tying on all keys are byte-identical rows and the
  * order is total for comparison purposes. NULLS FIRST is stated
  * explicitly in the oracle (DuckDB defaults to NULLS LAST; Spark ASC is
  * NULLS FIRST). */
object WalletOps {

  private val refCsv = "/root/reference/data/wallet-data.csv"

  /** Total-order keys: every base column the 34 outputs derive from. */
  private val orderKeys = Seq(
    "carteira_sd_gerencial", "saldo_devedor", "unidade", "obra", "empresa",
    "bloco", "dt_venda", "dt_chaves", "dias_atraso", "valor_pago",
    "valor_pago_atualizado", "vgv", "marca")

  private def flagship(spark: SparkSession, dir: String): DataFrame =
    Wallet.features(Wallet.cleanse(
      Wallet.dropFirstDataRow(Wallet.readRaw(spark, refCsv))))
      .orderBy(orderKeys.map(col): _*)

  private val oracle: String = {
    val cols = Seq(
      "empresa" -> "INTEGER", "marca" -> "VARCHAR",
      "empreendimento" -> "VARCHAR", "cliente" -> "VARCHAR",
      "regional" -> "VARCHAR", "obra" -> "INTEGER", "bloco" -> "INTEGER",
      "unidade" -> "INTEGER", "dt_venda" -> "VARCHAR",
      "dt_chaves" -> "VARCHAR", "carteira_sd_gerencial" -> "INTEGER",
      "saldo_devedor" -> "DOUBLE", "data_base" -> "VARCHAR",
      "total_atraso" -> "DOUBLE", "faixa_de_atraso" -> "INTEGER",
      "dias_atraso" -> "INTEGER", "valor_pago_atualizado" -> "DOUBLE",
      "valor_pago" -> "DOUBLE", "status" -> "VARCHAR",
      "dt_reneg" -> "VARCHAR", "descosn" -> "VARCHAR", "vaga" -> "VARCHAR",
      "vgv" -> "DOUBLE")
      .map { case (n, t) => s"'$n':'$t'" }.mkString(", ")
    def iso(c: String) =
      s"strftime(try_strptime($c, '%d/%m/%Y'), '%Y-%m-%d') AS $c"
    val order = orderKeys.map(k => s"$k NULLS FIRST").mkString(", ")
    s"""WITH raw AS (
       |  SELECT * FROM read_csv('$refCsv', header=false, skip=2,
       |    columns={$cols})
       |), clean AS (
       |  SELECT empresa, marca, obra, bloco, unidade,
       |    ${iso("dt_venda")}, ${iso("dt_chaves")}, ${iso("data_base")},
       |    carteira_sd_gerencial, saldo_devedor, dias_atraso,
       |    valor_pago_atualizado, valor_pago, vgv
       |  FROM raw
       |), mx AS (
       |  SELECT
       |    NULLIF(MAX(empresa), 0)               AS m_empresa,
       |    NULLIF(MAX(obra), 0)                  AS m_obra,
       |    NULLIF(MAX(bloco), 0)                 AS m_bloco,
       |    NULLIF(MAX(unidade), 0)               AS m_unidade,
       |    NULLIF(MAX(carteira_sd_gerencial), 0) AS m_carteira,
       |    NULLIF(MAX(saldo_devedor), 0)         AS m_saldo,
       |    NULLIF(MAX(ABS(dias_atraso)), 0)      AS m_abs_dias,
       |    NULLIF(MAX(valor_pago_atualizado), 0) AS m_vpa,
       |    NULLIF(MAX(valor_pago), 0)            AS m_vp,
       |    NULLIF(MAX(vgv), 0)                   AS m_vgv
       |  FROM clean
       |)
       |SELECT
       |  empresa,
       |  empresa / m_empresa AS p_empresa,
       |  marca,
       |  CASE WHEN lower(marca) = 'cyrela' THEN 1
       |       WHEN lower(marca) = 'living' THEN 2
       |       WHEN lower(marca) = 'vivaz'  THEN 3
       |       ELSE 0 END AS p_marca,
       |  obra,
       |  obra / m_obra AS p_obra,
       |  bloco,
       |  bloco / m_bloco AS p_bloco,
       |  unidade,
       |  unidade / m_unidade AS p_unidade,
       |  dt_venda,
       |  day(CAST(dt_venda AS DATE)) / 30.0     AS p_dt_venda_day,
       |  month(CAST(dt_venda AS DATE)) / 12.0   AS p_dt_venda_month,
       |  year(CAST(dt_venda AS DATE)) / 2000.0  AS p_dt_venda_year,
       |  dt_chaves,
       |  day(CAST(dt_chaves AS DATE)) / 30.0    AS p_dt_chaves_day,
       |  month(CAST(dt_chaves AS DATE)) / 12.0  AS p_dt_chaves_month,
       |  year(CAST(dt_chaves AS DATE)) / 2000.0 AS p_dt_chaves_year,
       |  carteira_sd_gerencial,
       |  carteira_sd_gerencial / m_carteira AS p_carteira_sd_gerencial,
       |  saldo_devedor,
       |  saldo_devedor / m_saldo AS p_saldo_devedor,
       |  day(CAST(data_base AS DATE)) / 30.0    AS p_data_base_day,
       |  month(CAST(data_base AS DATE)) / 12.0  AS p_data_base_month,
       |  year(CAST(data_base AS DATE)) / 2000.0 AS p_data_base_year,
       |  dias_atraso,
       |  ABS(dias_atraso) / m_abs_dias AS p_dias_atraso,
       |  CASE WHEN dias_atraso >= -30 THEN 0
       |       WHEN dias_atraso >= -90 THEN 1
       |       ELSE 2 END AS p_dias_atraso_category,
       |  valor_pago_atualizado,
       |  valor_pago_atualizado / m_vpa AS p_valor_pago_atualizado,
       |  valor_pago,
       |  valor_pago / m_vp AS p_valor_pago,
       |  vgv,
       |  vgv / m_vgv AS p_vgv
       |FROM clean, mx
       |ORDER BY $order""".stripMargin
  }

  /** The reference DAG's MEDALLION SHAPE on the transactional substrate:
    * landing CSV → processing zone (cleansed) → curated zone (features),
    * each hop ONE atomic idempotent TxnTable commit replacing the
    * reference's non-atomic copy-then-delete zone moves (ref
    * `dags/s3-etl-wallet-csv.py:161-176`). The WHOLE DAG is then
    * re-run against the same batch id — the daily-retry scenario — and
    * both zones must show zero new versions (REQUIREd in-query).
    * The final curated content is gated by the SAME oracle as w70: the
    * medallion staging must be a pure re-plumbing, bit-identical
    * through two parquet round trips. */
  private def medallion(spark: SparkSession, dir: String): DataFrame = {
    import graft.io.TxnTable
    val zone = java.nio.file.Files
      .createTempDirectory("graft_w71_medallion").toFile
    try {
      val processing = s"${zone.getAbsolutePath}/processing"
      val curated = s"${zone.getAbsolutePath}/curated"
      def runDag(batchId: Long): Unit = {
        TxnTable.commitOverwriteIdempotent(
          Wallet.cleanse(Wallet.dropFirstDataRow(Wallet.readRaw(spark, refCsv))),
          processing, appId = "wallet-dag-processing", batchId = batchId)
        TxnTable.commitOverwriteIdempotent(
          Wallet.features(TxnTable.read(spark, processing)),
          curated, appId = "wallet-dag-curated", batchId = batchId)
      }
      runDag(1L)
      val (vP, vC) = (TxnTable.latestVersion(spark, processing).get,
        TxnTable.latestVersion(spark, curated).get)
      runDag(1L) // the daily retry re-offers the same batch: no-ops
      require(TxnTable.latestVersion(spark, processing).contains(vP) &&
        TxnTable.latestVersion(spark, curated).contains(vC),
        "replayed DAG run must not re-commit either zone")
      val result = TxnTable.read(spark, curated)
        .orderBy(orderKeys.map(col): _*)
      spark.createDataFrame(
        java.util.Arrays.asList(result.collect(): _*), result.schema)
    } finally {
      graft.io.Tables.deleteTree(zone)
    }
  }

  val all: Seq[RQ] =
    if (new java.io.File(refCsv).exists())
      Seq(
        RQ("w70_wallet_flagship", flagship, Some(oracle)),
        RQ("w71_wallet_medallion", medallion, Some(oracle)))
    else Seq.empty
}
