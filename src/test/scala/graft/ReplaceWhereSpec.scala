package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.TxnTable

/** replaceRange semantics beyond k125's partition-aligned query: the
  * boundary-rewrite path on a range layout, delete-only replacement,
  * and the typed change feed of a replace commit. */
class ReplaceWhereSpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  private def withZone(f: String => Unit): Unit = {
    val zone = java.nio.file.Files.createTempDirectory("graft_rw").toFile
    try f(zone.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete(); ()
      }
      rm(zone)
    }
  }

  test("boundary files keep only their out-of-range rows") {
    withZone { zone =>
      import spark.implicits._
      val table = s"$zone/t"
      // 1..100 range-partitioned into 4 files of 25; replace [30, 70]
      // straddles two files (26-50, 51-75) and covers none fully
      TxnTable.commitOverwrite(
        (1L to 100L).map(i => (i, i * 1.0)).toDF("id", "v")
          .repartitionByRange(4, $"id").sortWithinPartitions($"id"),
        table, statsCols = Seq("id"))
      val before = TxnTable.snapshotFiles(spark, table, 1L)
      TxnTable.replaceRange(
        Seq((50L, -1.0)).toDF("id", "v"), table, "id", 30L, 70L)
      val out = TxnTable.read(spark, table)
      assert(out.count() == 100L - 41L + 1L) // 41 replaced by 1
      assert(out.filter($"id".between(30L, 70L)).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq == Seq((50L, -1.0)))
      // the two stats-disjoint files carried by identity
      val after = TxnTable.snapshotFiles(spark, table, 2L).toSet
      val stats = TxnTable.fileStats(spark, table, 1L)
      val untouched = before.filter(f =>
        stats.getOrElse(f, Nil).exists(s =>
          s.col == "id" && (s.max < 30.0 || s.min > 70.0)))
      assert(untouched.nonEmpty && untouched.forall(after.contains))
    }
  }

  test("an empty replacement is a scoped truncate") {
    withZone { zone =>
      import spark.implicits._
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        (1L to 100L).map(i => (i, i * 1.0)).toDF("id", "v")
          .repartitionByRange(4, $"id").sortWithinPartitions($"id"),
        table, statsCols = Seq("id"))
      TxnTable.replaceRange(
        Seq.empty[(Long, Double)].toDF("id", "v"), table, "id", 1L, 25L)
      assert(TxnTable.read(spark, table).count() == 75L)
      assert(TxnTable.read(spark, table)
        .agg(min($"id")).head().getLong(0) == 26L)
    }
  }

  test("the change feed classifies a replace as deletes + inserts") {
    withZone { zone =>
      import spark.implicits._
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        (1L to 20L).map(i => (i, i * 1.0)).toDF("id", "v")
          .repartitionByRange(2, $"id").sortWithinPartitions($"id"),
        table, statsCols = Seq("id"), cdf = Some(true))
      TxnTable.replaceRange(
        Seq((5L, 50.0), (6L, 60.0)).toDF("id", "v"), table, "id", 1L, 10L)
      val feed = spark.sql(s"SELECT * FROM graft_changes('$table', 1)")
      val byType = feed.groupBy(col(TxnTable.ChangeTypeCol)).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byType == Map("delete" -> 10L, "insert" -> 2L))
      val inserted = feed
        .filter(col(TxnTable.ChangeTypeCol) === "insert")
        .select("id").collect().map(_.getLong(0)).toSet
      assert(inserted == Set(5L, 6L))
    }
  }

  test("SQL INSERT OVERWRITE PARTITION routes to the scoped overwrite") {
    withZone { zone =>
      val table = s"$zone/t"
      spark.sql("DROP TABLE IF EXISTS rw_sql_t")
      spark.sql(
        s"""CREATE TABLE rw_sql_t (id BIGINT, v DOUBLE, p STRING)
           |USING graft PARTITIONED BY (p)
           |OPTIONS (path '$table')""".stripMargin)
      try {
        spark.sql(
          "INSERT INTO rw_sql_t VALUES (1, 1.0, 'a'), (2, 2.0, 'a'), " +
            "(3, 3.0, 'b')")
        val v1 = TxnTable.latestVersion(spark, table).get
        val before = TxnTable.snapshotFiles(spark, table, v1)
        val stats = TxnTable.fileStats(spark, table, v1)
        val bFiles = before.filter(f => stats.getOrElse(f, Nil)
          .exists(s => s.col == "p" && s.minV == "b"))
        spark.sql(
          "INSERT OVERWRITE rw_sql_t PARTITION (p = 'a') VALUES (10, 10.0)")
        val out = spark.table("rw_sql_t").collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
        assert(out == Set((10L, 10.0, "a"), (3L, 3.0, "b")))
        // the untouched partition's files carried by identity
        val after = TxnTable.snapshotFiles(spark, table,
          TxnTable.latestVersion(spark, table).get)
        assert(bFiles.nonEmpty && bFiles.forall(after.contains))
      } finally spark.sql("DROP TABLE rw_sql_t")
    }
  }

  test("dynamic partition overwrite replaces exactly the incoming partitions") {
    withZone { zone =>
      import spark.implicits._
      val table = s"$zone/t"
      Seq((1L, 1.0, "a"), (2L, 2.0, "a"), (3L, 3.0, "b"), (4L, 4.0, "c"))
        .toDF("id", "v", "p")
        .write.format("graft").option("statsCols", "id")
        .partitionBy("p").mode("overwrite").save(table)
      val v1 = TxnTable.latestVersion(spark, table).get
      val before = TxnTable.snapshotFiles(spark, table, v1)
      val stats = TxnTable.fileStats(spark, table, v1)
      val cFiles = before.filter(f => stats.getOrElse(f, Nil)
        .exists(s => s.col == "p" && s.minV == "c"))
      // the daily job recomputed partitions a and b — c must survive
      Seq((10L, 10.0, "a"), (30L, 30.0, "b"))
        .toDF("id", "v", "p")
        .write.format("graft").mode("overwrite")
        .option("dynamicPartitionOverwrite", "true").save(table)
      val out = spark.read.format("graft").load(table).collect()
        .map(r => (r.getLong(0), r.getString(2))).toSet
      assert(out == Set((10L, "a"), (30L, "b"), (4L, "c")))
      // the untouched partition's files carried by identity
      val after = TxnTable.snapshotFiles(spark, table,
        TxnTable.latestVersion(spark, table).get)
      assert(cFiles.nonEmpty && cFiles.forall(after.contains))
      // replaceValues over a value set feeds the change feed the same
      // way and rejects rows outside the declared set
      assert(intercept[IllegalArgumentException] {
        TxnTable.replaceValues(
          Seq((99L, 9.0, "zzz")).toDF("id", "v", "p"), table, "p",
          Seq("a"))
      }.getMessage.contains("scoped-overwrite contract"))
    }
  }

  test("NULL-keyed rows survive a replace (SQL range semantics)") {
    withZone { zone =>
      import spark.implicits._
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        Seq((Some(1L), 1.0), (Some(2L), 2.0), (None, 99.0))
          .toDF("id", "v").coalesce(1),
        table, statsCols = Seq("id"))
      TxnTable.replaceRange(
        Seq((Some(1L), 10.0)).toDF("id", "v"), table, "id", 1L, 1L)
      val out = TxnTable.read(spark, table).collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getDouble(1))
        .toMap
      assert(out == Map(1L -> 10.0, 2L -> 2.0, -1L -> 99.0))
    }
  }
}
