package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.TxnTable

/** SQL table functions: graft_history (DESCRIBE HISTORY) and
  * graft_changes (the table_changes spelling of the change feed). */
class GraftTvfSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark

  private def withTable(body: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_tvf").toFile
    try body(s"${root.getAbsolutePath}/t")
    finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(root)
    }
  }

  test("graft_snapshot_diff: what changed between two versions, metadata-only") {
    import spark.implicits._
    withTable { table =>
      Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v").coalesce(1)
        .write.format("graft").option("statsCols", "id")
        .mode("overwrite").save(table)                       // v1
      Seq((3L, 3.0), (4L, 4.0), (5L, 5.0)).toDF("id", "v").coalesce(1)
        .write.format("graft").mode("append").save(table)    // v2
      TxnTable.deleteRange(spark, table, "id", 1L, 2L)       // v3: v1's file drops
      val v = TxnTable.latestVersion(spark, table).get
      val diff = spark.sql(
        s"SELECT * FROM graft_snapshot_diff('$table', 1, $v)")
        .collect().map(r => (r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq.sorted
      // vs v1: the append's file (3 rows) added, v1's own file removed
      assert(diff == Seq(("added", 3L), ("removed", 2L)), s"got $diff")
      // a no-op span diffs empty
      assert(spark.sql(
        s"SELECT * FROM graft_snapshot_diff('$table', $v, $v)").count() == 0L)
      // aggregated row delta matches the table's real movement
      val delta = spark.sql(
        s"""SELECT COALESCE(SUM(CASE WHEN change = 'added' THEN n_rows
           |  ELSE -n_rows END), 0) AS d
           |FROM graft_snapshot_diff('$table', 1, $v)""".stripMargin)
        .head().getLong(0)
      assert(delta == 1L, s"2 rows -> 3 rows means +1, got $delta")
    }
  }

  test("graft_detail / DESCRIBE DETAIL reports the snapshot's shape") {
    import spark.implicits._
    withTable { table =>
      Seq((1L, "x", 1.0), (2L, "y", 2.0)).toDF("id", "p", "v")
        .write.format("graft").option("statsCols", "id")
        .option("enableChangeFeed", "true")
        .partitionBy("p").mode("overwrite").save(table)
      TxnTable.addCheck(spark, table, "v_pos", "v > 0")
      val d = spark.sql(s"DESCRIBE DETAIL '$table'").head()
      assert(d.getAs[String]("format") == "graft")
      assert(d.getAs[Long]("version") == 2L)
      assert(d.getAs[Long]("num_files") >= 2L) // one per partition value
      assert(d.getAs[Long]("size_bytes") > 0L)
      assert(d.getAs[String]("partition_columns") == "p")
      assert(d.getAs[Long]("num_constraints") == 1L)
      assert(d.getAs[Boolean]("change_feed"))
      assert(!d.getAs[Boolean]("merge_on_read"))
      assert(!d.getAs[Boolean]("converted_in_place"))
      assert(d.getAs[String]("column_aliases") == "")
      assert(d.getAs[String]("generated_columns") == "")
      assert(d.getAs[String]("identity_column") == "")
      assert(d.getAs[Long]("num_delete_files") == 0L)
      assert(d.getAs[String]("analyzed_columns") == "")
      // a positional delete and an ANALYZE surface in the detail row
      TxnTable.deleteWherePos(spark, table, df => df("v") > 1.5)
      TxnTable.analyzeTable(spark, table, Seq("v"))
      val dd = spark.sql(s"DESCRIBE DETAIL '$table'").head()
      assert(dd.getAs[Long]("num_delete_files") == 1L)
      assert(dd.getAs[Long]("num_delete_rows") == 1L)
      assert(dd.getAs[String]("analyzed_columns") == "v")
      // layout states surface after a rename (id: no constraint on it)
      TxnTable.renameColumn(spark, table, "id", "row_id")
      val d2 = spark.sql(s"DESCRIBE DETAIL '$table'").head()
      assert(d2.getAs[String]("column_aliases") == "row_id<-id")
      // the TVF spelling composes with ordinary SQL
      assert(spark.sql(
        s"SELECT num_files FROM graft_detail('$table')").head().getLong(0) ==
        d.getAs[Long]("num_files"))
    }
  }

  test("graft_history lists commits newest first with ops and counts") {
    import spark.implicits._
    withTable { table =>
      TxnTable.commitOverwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "s"),
        table, statsCols = Seq("k"), cdf = Some(true))
      TxnTable.commitAppend(Seq((3L, "c")).toDF("k", "s"), table)
      TxnTable.deleteRangeOn(spark, table, "k", 1L, 1L)
      val h = spark.sql(s"SELECT * FROM graft_history('$table')")
        .select($"version", $"op").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(h == Seq((3L, "delete"), (2L, "append"), (1L, "overwrite")))
      // timestamps are nondecreasing down the history
      val ts = spark.sql(s"SELECT ts FROM graft_history('$table')")
        .collect().map(_.getTimestamp(0).getTime).toSeq
      assert(ts == ts.sorted.reverse)
      // composes with ordinary SQL (aggregation over the TVF)
      val nOps = spark.sql(
        s"SELECT COUNT(DISTINCT op) FROM graft_history('$table')")
        .head().getLong(0)
      assert(nOps == 3L)
    }
  }

  test("graft_changes returns the typed feed for a version window") {
    import spark.implicits._
    withTable { table =>
      TxnTable.commitOverwrite(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"),
        table, statsCols = Seq("k"), cdf = Some(true))
      TxnTable.commitAppend(Seq((3L, 30.0)).toDF("k", "v"), table)
      TxnTable.merge(Seq((2L, 99.0)).toDF("k", "v"), table, "k")
      val got = spark.sql(
        s"SELECT k, _change_type, _commit_version FROM graft_changes('$table', 1)")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == Set(
        (3L, "insert", 2L),
        (2L, "update_preimage", 3L), (2L, "update_postimage", 3L)))
      // explicit end version bounds the window
      val windowed = spark.sql(
        s"SELECT k, _change_type FROM graft_changes('$table', 1, 2)")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(windowed == Set((3L, "insert")))
      // aggregates compose
      val counts = spark.sql(
        s"""SELECT _change_type, COUNT(*) AS n
           |FROM graft_changes('$table', 0) GROUP BY 1 ORDER BY 1""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(counts == Seq(("insert", 3L),
        ("update_postimage", 1L), ("update_preimage", 1L)))
    }
  }

  test("non-constant or malformed arguments refuse loudly") {
    withTable { table =>
      import spark.implicits._
      TxnTable.commitOverwrite(Seq((1L, "a")).toDF("k", "s"), table)
      val e = intercept[Exception] {
        spark.sql(s"SELECT * FROM graft_changes('$table')").collect()
      }
      assert(e.getMessage.contains("usage: graft_changes"))
    }
  }

  test("graft_files lists per-file rows, bytes, and skipping stats") {
    import spark.implicits._
    withTable { table =>
      Seq.range(0L, 100L).map(k => (k, k * 1.0)).toDF("k", "v")
        .repartitionByRange(4, org.apache.spark.sql.functions.col("k"))
        .write.format("graft").option("statsCols", "k")
        .mode("overwrite").save(table)
      val rows = spark.sql(s"SELECT * FROM graft_files('$table') ORDER BY file")
        .collect()
      assert(rows.length == 4)
      assert(rows.map(_.getAs[Long]("rows")).sum == 100L)
      assert(rows.forall(_.getAs[Long]("bytes") > 0L))
      // range-partitioned seed: each file's stat window is disjoint
      val statsStrs = rows.map(_.getAs[String]("stats"))
      assert(statsStrs.forall(_.contains("k=[")),
        s"every file must carry a k stat: ${statsStrs.mkString(" | ")}")
      // composes with SQL: find small files like an operator would
      val small = spark.sql(
        s"SELECT count(*) FROM graft_files('$table') WHERE bytes < 1000000")
        .head().getLong(0)
      assert(small == 4L)
      // version argument pins an older snapshot's file list
      TxnTable.compact(spark, table, targetFiles = 1)
      val latest = spark.sql(s"SELECT count(*) FROM graft_files('$table')")
        .head().getLong(0)
      assert(latest == 1L)
      val old = spark.sql(s"SELECT count(*) FROM graft_files('$table', 1)")
        .head().getLong(0)
      assert(old == 4L)
    }
  }

  test("graft_partitions aggregates the manifest per partition value") {
    import spark.implicits._
    withTable { table =>
      Seq.range(0L, 90L).map(k => (k, (k % 3).toString))
        .toDF("k", "p")
        .write.format("graft").option("partitionBy", "p")
        .mode("overwrite").save(table)
      val rows = spark.sql(
        s"SELECT * FROM graft_partitions('$table') ORDER BY partition")
        .collect()
      assert(rows.map(_.getAs[String]("partition")).toSeq ==
        Seq("p=0", "p=1", "p=2"))
      assert(rows.forall(_.getAs[Long]("n_rows") == 30L))
      assert(rows.forall(_.getAs[Long]("n_files") >= 1L))
      assert(rows.forall(_.getAs[Long]("bytes") > 0L))
      // the partition spec is sticky: a plain append lands in its value dir
      Seq((1000L, "9")).toDF("k", "p")
        .write.format("graft").mode("append").save(table)
      val all = spark.sql(
        s"SELECT partition, n_rows FROM graft_partitions('$table')")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(all("p=9") == 1L && all("p=0") == 30L)
      // the version argument pins an older snapshot's layout
      val v1 = spark.sql(
        s"SELECT count(*) FROM graft_partitions('$table', 1)")
        .head().getLong(0)
      assert(v1 == 3L)
      // the SHOW PARTITIONS statement spelling shares the rows
      val shown = spark.sql(s"SHOW PARTITIONS '$table'")
        .collect().map(_.getAs[String]("partition")).sorted.toSeq
      assert(shown == Seq("p=0", "p=1", "p=2", "p=9"))
    }
  }
}
