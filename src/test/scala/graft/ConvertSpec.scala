package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.{Tables, TxnTable}

/** CONVERT TO GRAFT — in-place adoption of an existing parquet dir
  * (Delta 0.7's CONVERT TO DELTA; ref spark/jars/delta-core_2.12-0.7.0.jar):
  * manifest v1 lists the existing files, zero rewrite; hive layouts
  * keep partition values path-derived. */
class ConvertSpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toString
    new java.io.File(d).delete(); d
  }

  private def parquetFiles(dir: String): Set[String] = {
    val base = java.nio.file.Paths.get(dir)
    val out = scala.collection.mutable.Set.empty[String]
    java.nio.file.Files.walk(base).forEach { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".parquet")) out += base.relativize(p).toString
    }
    out.toSet
  }

  test("flat convert: zero rewrite, identical rows, DML + time travel work") {
    val dir = tmp("graft-convert-flat")
    val seed = Tables.orders(spark, Spec.sf0001)
    seed.repartition(4).write.parquet(dir)
    val before = parquetFiles(dir)
    assert(TxnTable.convert(spark, dir, statsCols = Seq("o_orderkey")) == 1L)
    // the adoption wrote ONLY the manifest — no data file moved or landed
    assert(parquetFiles(dir) == before)
    val got = TxnTable.read(spark, dir)
    assert(got.count() == seed.count())
    assert(got.exceptAll(seed).isEmpty && seed.exceptAll(got).isEmpty)
    // stats pruning works off the convert-collected stats
    val (_, scanned, total) =
      TxnTable.readRangeOn(spark, dir, "o_orderkey", 1, 10)
    assert(total == 4 && scanned <= total)
    // DML: copy-on-write delete rewrites only what it must
    val key = seed.select(min("o_orderkey")).head().getLong(0)
    TxnTable.deleteEquals(spark, dir, "o_orderkey", key)
    assert(TxnTable.read(spark, dir).filter(col("o_orderkey") === key).isEmpty)
    // time travel: v1 is the adopted snapshot, untouched
    assert(TxnTable.readVersion(spark, dir, 1L).count() == seed.count())
  }

  test("hive-partitioned convert: path-derived values, pruning, OPTIMIZE") {
    val dir = tmp("graft-convert-hive")
    val seed = Tables.orders(spark, Spec.sf0001)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"))
    seed.write.partitionBy("o_orderstatus").parquet(dir)
    val before = parquetFiles(dir)
    TxnTable.convert(spark, dir, statsCols = Seq("o_orderkey"))
    assert(parquetFiles(dir) == before, "convert must not rewrite data")
    // partition values come back from the paths
    val got = TxnTable.read(spark, dir)
    assert(got.select(countDistinct(col("o_orderstatus"))).head().getLong(0) ==
      seed.select(countDistinct(col("o_orderstatus"))).head().getLong(0))
    assert(got.exceptAll(seed).isEmpty && seed.exceptAll(got).isEmpty)
    // partition pruning IS stats pruning: single-valued files
    val (rows, scanned, total) =
      TxnTable.readEquals(spark, dir, "o_orderstatus", "F")
    assert(rows.count() == seed.filter(col("o_orderstatus") === "F").count())
    assert(scanned < total, s"expected pruning, scanned $scanned of $total")
    // SQL over the converted table: the split scan fills partition
    // columns from paths (no graft-written files yet)
    spark.sql(s"CREATE TABLE graft_cvt_t USING graft OPTIONS (path '$dir')")
    try {
      val viaSql = spark.sql(
        "SELECT count(*) AS n FROM graft_cvt_t WHERE o_orderstatus = 'O'")
        .head().getLong(0)
      assert(viaSql == seed.filter(col("o_orderstatus") === "O").count())
    } finally spark.sql("DROP TABLE graft_cvt_t")
    // appends conform to the adopted partitioning; mixed layout reads
    // correctly through the TxnTable path (two legs unioned)
    val extra = seed.limit(5).withColumn("o_orderkey", col("o_orderkey") + 1000000L)
    TxnTable.commitAppend(extra, dir, statsCols = Seq("o_orderkey"))
    val mixed = TxnTable.read(spark, dir)
    assert(mixed.count() == seed.count() + 5)
    assert(mixed.filter(col("o_orderstatus").isNull).isEmpty)
    // OPTIMIZE materializes everything into graft-written files and the
    // sticky flag drops with the last adopted file
    TxnTable.compact(spark, dir, targetFiles = 2)
    val opt = TxnTable.read(spark, dir)
    assert(opt.count() == seed.count() + 5)
    assert(opt.filter(col("o_orderstatus").isNull).isEmpty)
  }

  test("two-level hive convert: nested partition values both path-derive") {
    val dir = tmp("graft-convert-hive2")
    val seed = Tables.orders(spark, Spec.sf0001)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"),
        col("o_orderpriority"))
    seed.write.partitionBy("o_orderstatus", "o_orderpriority").parquet(dir)
    TxnTable.convert(spark, dir)
    assert(TxnTable.partitionColumns(spark, dir) ==
      Seq("o_orderstatus", "o_orderpriority"))
    val got = TxnTable.read(spark, dir)
    assert(got.exceptAll(seed).isEmpty && seed.exceptAll(got).isEmpty)
    // both nesting levels prune via single-valued stats
    val (rows, scanned, total) =
      TxnTable.readEquals(spark, dir, "o_orderpriority", "1-URGENT")
    assert(rows.count() ==
      seed.filter(col("o_orderpriority") === "1-URGENT").count())
    assert(scanned < total)
  }

  test("a flat converted table streams: commit-log source from v1") {
    val dir = tmp("graft-convert-stream")
    val seed = Tables.nation(spark, Spec.sf0001)
    seed.repartition(2).write.parquet(dir)
    TxnTable.convert(spark, dir)
    // adopted files carry every column in-file, so the commit-log
    // stream serves the v1 snapshot as its first batch
    val q = spark.readStream.format("graft").load(dir)
      .writeStream.format("memory").queryName("cvt_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(60000) finally if (q.isActive) q.stop()
    assert(spark.table("cvt_stream").count() == seed.count())
  }

  test("convert refuses a dir that is already a graft table, and w= layouts") {
    val dir = tmp("graft-convert-refuse")
    Tables.nation(spark, Spec.sf0001).write.parquet(dir)
    TxnTable.convert(spark, dir)
    val e = intercept[IllegalArgumentException](TxnTable.convert(spark, dir))
    assert(e.getMessage.contains("already has graft commits"))
  }
}
