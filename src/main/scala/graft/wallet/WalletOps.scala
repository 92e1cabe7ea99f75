package graft.wallet

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.{Q => RQ}

/** The reference's own flagship pipeline as a registered query: landing
  * CSV → cleanse → 34-column feature stage, bug-compat first-row drop —
  * the exact computation whose output equals the committed golden file
  * `data/parsed-data.csv` (WalletGoldenSpec pins the equality).
  *
  * No DuckDB oracle: the input is the reference's CSV, not the sfDir
  * parquet tables the oracle harness mounts, so the driver applies the
  * rows-only check (2,998 rows expected). */
object WalletOps {

  private val refCsv = "/root/reference/data/wallet-data.csv"

  private def flagship(spark: SparkSession, dir: String): DataFrame =
    Wallet.features(Wallet.cleanse(
      Wallet.dropFirstDataRow(Wallet.readRaw(spark, refCsv))))
      .orderBy(col("carteira_sd_gerencial"), col("saldo_devedor"),
        col("unidade"), col("obra"), col("empresa"))

  val all: Seq[RQ] =
    if (new java.io.File(refCsv).exists())
      Seq(RQ("w70_wallet_flagship", flagship, None))
    else Seq.empty
}
