package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q => RQ}

/** Source/sink format coverage as VERIFIED queries (SURVEY.md §2.1 S1 /
  * §2.2 K1): each query writes a table through a text format into a temp
  * zone, reads it back with an explicit schema (never inferred — inference
  * is a second full scan at 100 TB), and aggregates the round-tripped
  * rows. The oracle runs the same aggregate on the ORIGINAL parquet, so a
  * hash match proves byte-faithful write→read fidelity: CSV quoting and
  * escaping (p_type holds spaces), JSON double round-tripping
  * (shortest-representation print → exact re-parse), and column order.
  *
  * FormatsSpec covers the unit-level cases; these entries put the formats
  * under the driver's oracle gate too. */
object FormatOps {

  private def tmpZone(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getAbsolutePath

  // ---------------------------------------------------------------- k80
  /** CSV sink → CSV scan round-trip on part (strings with spaces, ints,
    * doubles), aggregated for comparison against the parquet original. */
  private def k80(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orig = Tables.part(spark, dir)
    val zone = tmpZone("graft_k80_csv")
    Tables.writeCsv(orig, zone)
    Tables.csv(spark, zone, orig.schema)
      .agg(
        count(lit(1)).cast("bigint").as("n"),
        sum($"p_size").cast("bigint").as("sum_size"),
        graft.ops.Num.dsum($"p_retailprice").as("sum_price"),
        md5(array_join(array_sort(collect_list($"p_name")), "|")).as("names_md5"),
        md5(array_join(array_sort(collect_list($"p_type")), "|")).as("types_md5"))
  }
  private val k80Sql =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n,
      | CAST(SUM(p_size) AS BIGINT) AS sum_size,
      | CAST(SUM(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
      | MD5(STRING_AGG(p_name, '|' ORDER BY p_name)) AS names_md5,
      | MD5(STRING_AGG(p_type, '|' ORDER BY p_type)) AS types_md5
      |FROM part""".stripMargin

  // ---------------------------------------------------------------- k81
  /** JSON-lines sink → JSON scan round-trip on supplier (bigint keys,
    * double balances), same oracle principle as k80. */
  private def k81(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orig = Tables.supplier(spark, dir)
    val zone = tmpZone("graft_k81_json")
    orig.write.mode(org.apache.spark.sql.SaveMode.Overwrite).json(zone)
    spark.read.schema(orig.schema).json(zone)
      .agg(
        count(lit(1)).cast("bigint").as("n"),
        sum($"s_suppkey").cast("bigint").as("sum_key"),
        graft.ops.Num.dsum($"s_acctbal").as("sum_bal"),
        md5(array_join(array_sort(collect_list($"s_name")), "|")).as("names_md5"))
  }
  private val k81Sql =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n,
      | CAST(SUM(s_suppkey) AS BIGINT) AS sum_key,
      | CAST(SUM(CAST(s_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_bal,
      | MD5(STRING_AGG(s_name, '|' ORDER BY s_name)) AS names_md5
      |FROM supplier""".stripMargin

  val all: Seq[RQ] = Seq(
    RQ("k80_csv_roundtrip", k80, Some(k80Sql)),
    RQ("k81_json_roundtrip", k81, Some(k81Sql)))
}
