package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.wallet.Wallet

/** Golden-file test: the reference's only correctness artifact is the
  * committed pair `data/wallet-data.csv` (input) → `data/parsed-data.csv`
  * (expected flagship output, 2,998 rows × 34 cols, first input row dropped
  * by the pandas `header=1` quirk). SURVEY.md §5.1. */
class WalletGoldenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Spec.spark

  private val refData = "/root/reference/data"

  private val goldenSchema = StructType(Wallet.featureColumns.map {
    case n @ ("empresa" | "obra" | "bloco" | "unidade" | "carteira_sd_gerencial"
        | "dias_atraso" | "p_marca" | "p_dias_atraso_category") =>
      StructField(n, IntegerType)
    case n @ ("marca" | "dt_venda" | "dt_chaves") => StructField(n, StringType)
    case n => StructField(n, DoubleType)
  })

  test("flagship pipeline reproduces data/parsed-data.csv") {
    assume(new java.io.File(s"$refData/wallet-data.csv").exists())
    val ours = Wallet.features(Wallet.cleanse(
      Wallet.dropFirstDataRow(Wallet.readRaw(spark, s"$refData/wallet-data.csv"))))
    val golden = spark.read
      .options(Map("header" -> "true", "encoding" -> "UTF-8"))
      .schema(goldenSchema)
      .csv(s"$refData/parsed-data.csv")

    assert(ours.columns.toSeq == golden.columns.toSeq, "column order")

    val sortKeys = Seq("carteira_sd_gerencial", "saldo_devedor", "unidade",
      "obra", "empresa", "dt_venda", "vgv").map(org.apache.spark.sql.functions.col)
    val a = ours.orderBy(sortKeys: _*).collect()
    val b = golden.orderBy(sortKeys: _*).collect()
    assert(a.length == b.length, s"row count ${a.length} vs golden ${b.length}")

    val cols = ours.columns
    a.zip(b).zipWithIndex.foreach { case ((ra, rb), i) =>
      cols.indices.foreach { j =>
        (ra.get(j), rb.get(j)) match {
          case (null, null) => ()
          case (x: Double, y: Double) =>
            assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y)),
              s"row $i col ${cols(j)}: $x vs $y")
          case (x, y) =>
            assert(x == y, s"row $i col ${cols(j)}: $x vs $y")
        }
      }
    }
  }

  test("cleanse reformats dd/MM/yyyy to ISO and keeps nulls null") {
    import spark.implicits._
    val df = Seq(("31/03/2021", null: String), ("01/07/2023", ""), (null: String, "05/02/1999"))
      .toDF("dt_venda", "dt_reneg")
      .withColumn("dt_chaves", org.apache.spark.sql.functions.lit(null: String))
      .withColumn("data_base", org.apache.spark.sql.functions.lit(null: String))
    val out = Wallet.cleanse(df).collect()
    assert(out(0).getString(0) == "2021-03-31")
    assert(out(1).getString(0) == "2023-07-01")
    assert(out(0).isNullAt(1) && out(1).isNullAt(1))
    assert(out(2).isNullAt(0) && out(2).getString(1) == "1999-02-05")
  }
}
