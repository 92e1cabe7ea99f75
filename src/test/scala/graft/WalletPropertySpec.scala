package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.wallet.Wallet

/** Property tests for the wallet feature stage (SURVEY.md §5.2): bounds,
  * label totality, and date round-trips over seeded-random data. */
class WalletPropertySpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  /** Seeded-random raw wallet frame (post-cleanse shape: ISO dates). */
  private def randomWallet(n: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    def isoDate() = f"${2015 + rnd.nextInt(10)}%04d-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d"
    val brands = Seq("CYRELA", "LIVING", "VIVAZ", "OTHER", null)
    val rows = (1 to n).map { i =>
      Row(
        1 + rnd.nextInt(9999), brands(rnd.nextInt(brands.length)), s"emp$i", s"CLIENTE $i",
        "São Paulo", 1 + rnd.nextInt(9000), 1 + rnd.nextInt(99), 1 + rnd.nextInt(999),
        isoDate(), isoDate(), 1 + rnd.nextInt(900000), rnd.nextDouble() * 1e6,
        isoDate(), rnd.nextDouble() * 1e4, 0, -rnd.nextInt(1200),
        rnd.nextDouble() * 1e5, rnd.nextDouble() * 1e5, null, null, null, null,
        rnd.nextDouble() * 1e6)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Wallet.schema)
  }

  test("max-scaled features lie in [0,1]; labels are total") {
    val out = Wallet.features(randomWallet(500, seed = 7)).collect()
    val cols = Wallet.featureColumns.zipWithIndex.toMap
    val unit = Seq("p_empresa", "p_obra", "p_bloco", "p_unidade",
      "p_carteira_sd_gerencial", "p_saldo_devedor", "p_dias_atraso",
      "p_valor_pago_atualizado", "p_valor_pago", "p_vgv")
    out.foreach { r =>
      unit.foreach { c =>
        if (!r.isNullAt(cols(c))) {
          val v = r.getDouble(cols(c))
          assert(v >= 0.0 && v <= 1.0, s"$c = $v out of [0,1]")
        }
      }
      assert(Set(0, 1, 2, 3).contains(r.getInt(cols("p_marca"))))
      assert(Set(0, 1, 2).contains(r.getInt(cols("p_dias_atraso_category"))))
      // date-part features: day/30 ∈ (0, 31/30], month/12 ∈ (0, 1]
      val day = r.getDouble(cols("p_dt_venda_day"))
      assert(day > 0.0 && day <= 31.0 / 30.0)
      val month = r.getDouble(cols("p_dt_venda_month"))
      assert(month > 0.0 && month <= 1.0)
    }
  }

  test("dd/MM/yyyy dates survive cleanse round-trip") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dates = (1 to 200).map { _ =>
      f"${1 + rnd.nextInt(28)}%02d/${1 + rnd.nextInt(12)}%02d/${1980 + rnd.nextInt(45)}%04d"
    }
    val df = dates.toDF("dt_venda")
      .withColumn("dt_chaves", org.apache.spark.sql.functions.lit(null: String))
      .withColumn("data_base", org.apache.spark.sql.functions.lit(null: String))
      .withColumn("dt_reneg", org.apache.spark.sql.functions.lit(null: String))
    val iso = Wallet.cleanse(df).collect().map(_.getString(0))
    dates.zip(iso).foreach { case (orig, is) =>
      val Array(d, m, y) = orig.split("/")
      assert(is == s"$y-$m-$d", s"$orig -> $is")
    }
  }
}
