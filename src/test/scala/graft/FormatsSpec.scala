package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Source/sink format breadth: parquet-read data round-trips through ORC,
  * JSON, and CSV sinks + scans without loss (schema supplied on the
  * schemaless formats, as the engine's IO layer mandates). */
class FormatsSpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  test("lineitem round-trips through orc, json, csv") {
    val li = Tables.lineitem(spark, Spec.sf0001)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    val expectN = li.count()
    val expectSum = li.agg(sum(col("l_quantity").cast("decimal(38,6)"))).collect()(0).getDecimal(0)
    val base = java.nio.file.Files.createTempDirectory("graft-fmt").toString

    li.write.mode("overwrite").orc(s"$base/orc")
    li.write.mode("overwrite").json(s"$base/json")
    li.write.mode("overwrite").option("header", "true").csv(s"$base/csv")

    val orc = spark.read.orc(s"$base/orc")
    val json = spark.read.schema(li.schema).json(s"$base/json")
    val csv = spark.read.schema(li.schema).option("header", "true").csv(s"$base/csv")

    for ((name, df) <- Seq("orc" -> orc, "json" -> json, "csv" -> csv)) {
      assert(df.count() == expectN, s"$name row count")
      val s = df.agg(sum(col("l_quantity").cast("decimal(38,6)"))).collect()(0).getDecimal(0)
      assert(s.compareTo(expectSum) == 0, s"$name sum: $s vs $expectSum")
    }
  }
}
