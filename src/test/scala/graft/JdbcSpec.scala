package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Warehouse-load operators K3/K4 (ref `dags/s3-etl-wallet-csv.py:120-135,
  * 204-236`) against an embedded Derby database: DDL bootstrap via plain
  * JDBC, batched append through Spark's JDBC writer, then read-back
  * through the JDBC source. */
class JdbcSpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  test("ddl bootstrap + batched jdbc append + jdbc scan round-trip") {
    val dbDir = java.nio.file.Files.createTempDirectory("graft-derby")
    val url = s"jdbc:derby:$dbDir/wh;create=true"
    val props = new java.util.Properties()

    // K4: DDL through a plain JDBC statement (SERIAL-style identity col
    // is exactly what Spark's writer can't emit — ref survey §2.2)
    Tables.ddl(url, props,
      """CREATE TABLE wallet_ids (
        | id INT GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
        | tag VARCHAR(16))""".stripMargin)

    // K3: batched append of real data (writer creates the table)
    val src = Tables.orders(spark, Spec.sf0001)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    Tables.writeJdbc(src, url, "orders_dw", props, batchSize = 500)

    val back = spark.read.jdbc(url, "orders_dw", props)
    assert(back.count() == src.count())
    val a = back.agg(sum(col("o_totalprice").cast("decimal(38,6)"))).collect()(0).getDecimal(0)
    val b = src.agg(sum(col("o_totalprice").cast("decimal(38,6)"))).collect()(0).getDecimal(0)
    assert(a.compareTo(b) == 0)

    // appending again doubles the rows (append semantics, not overwrite)
    Tables.writeJdbc(src, url, "orders_dw", props, batchSize = 500)
    assert(spark.read.jdbc(url, "orders_dw", props).count() == 2 * src.count())
  }
}
