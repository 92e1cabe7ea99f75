package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.TxnTable

/** CHANGE DATA FEED: commit-op classification, eager/lazy change files,
  * the batch changeFeed frame, and the streaming readChangeFeed source. */
class TxnCdfSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark

  private def withZone(body: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_cdf").toFile
    try body(s"${root.getAbsolutePath}/t")
    finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(root)
    }
  }

  test("append commits feed as inserts; compact feeds nothing") {
    import spark.implicits._
    withZone { table =>
      TxnTable.commitOverwrite(
        Seq((1L, "a"), (2L, "b")).toDF("k", "s"), table,
        statsCols = Seq("k"), cdf = Some(true))
      TxnTable.commitAppend(Seq((3L, "c")).toDF("k", "s"), table)
      TxnTable.compactSmall(spark, table, smallBytes = 1L << 40)
      val feed = TxnTable.changeFeed(spark, table, sinceVersion = 0L)
      val got = feed.select($"k", $"_change_type", $"_commit_version")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == Set(
        (1L, "insert", 1L), (2L, "insert", 1L), (3L, "insert", 2L)))
      // the compaction (v3) contributed no change rows
      assert(TxnTable.commitChanges(spark, table, 3L).op == "compact")
    }
  }

  test("range delete: covered file feeds lazily, boundary eagerly") {
    import spark.implicits._
    withZone { table =>
      // two files: k in [0,9] (covered by the delete) and [10,19]
      // (boundary: only half its rows match)
      val df = Seq.range(0L, 20L).map(k => (k, k * 2.0)).toDF("k", "v")
        .repartitionByRange(2, $"k")
      TxnTable.commitOverwrite(df, table, statsCols = Seq("k"), cdf = Some(true))
      TxnTable.deleteRangeOn(spark, table, "k", 0L, 14L)
      val cc = TxnTable.commitChanges(spark, table, 2L)
      assert(cc.op == "delete")
      assert(cc.deletes.nonEmpty, "covered file must feed as a lazy #cdcdel")
      assert(cc.cdc.nonEmpty, "boundary deletions must land in eager change files")
      val feed = TxnTable.changeFeed(spark, table, sinceVersion = 1L)
      val got = feed.select($"k", $"_change_type")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == (0L until 15L).map(k => (k, "delete")).toSet)
      // table state is untouched by the feed machinery
      assert(TxnTable.read(spark, table).select(min($"k")).head().getLong(0) == 15L)
    }
  }

  test("merge feeds update pre/post images and inserts") {
    import spark.implicits._
    withZone { table =>
      TxnTable.commitOverwrite(
        Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), table,
        statsCols = Seq("k"), cdf = Some(true))
      TxnTable.merge(Seq((2L, 99.0), (5L, 50.0)).toDF("k", "v"), table, "k")
      val feed = TxnTable.changeFeed(spark, table, sinceVersion = 1L)
      val got = feed.select($"k", $"v", $"_change_type")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
      assert(got == Set(
        (2L, 20.0, "update_preimage"),
        (2L, 99.0, "update_postimage"),
        (5L, 50.0, "insert")))
    }
  }

  test("overwrite feeds delete-all + insert-all; truncate delete-all") {
    import spark.implicits._
    withZone { table =>
      TxnTable.commitOverwrite(Seq((1L, "a")).toDF("k", "s"), table,
        cdf = Some(true))
      TxnTable.commitOverwrite(Seq((2L, "b")).toDF("k", "s"), table)
      val feed = TxnTable.changeFeed(spark, table, 1L, 2L)
      val got = feed.select($"k", $"_change_type")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "delete"), (2L, "insert")))
    }
  }

  test("a rewrite committed with CDF off refuses feed reads, loudly") {
    import spark.implicits._
    withZone { table =>
      TxnTable.commitOverwrite(
        Seq.range(0L, 10L).map(k => (k, k * 1.0)).toDF("k", "v"), table,
        statsCols = Seq("k")) // CDF not enabled
      TxnTable.deleteRangeOn(spark, table, "k", 0L, 20L)
      val e = intercept[IllegalStateException] {
        TxnTable.changeFeed(spark, table, 1L)
      }
      assert(e.getMessage.contains("change data feed"))
    }
  }

  test("batch spark.read readChangeFeed honors starting/endingVersion") {
    import spark.implicits._
    withZone { table =>
      TxnTable.commitOverwrite(
        Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), table,
        statsCols = Seq("k"), cdf = Some(true))
      TxnTable.commitAppend(Seq((3L, 30.0)).toDF("k", "v"), table)
      TxnTable.merge(Seq((2L, 99.0)).toDF("k", "v"), table, "k")
      def feed(opts: Map[String, String]) = {
        var r = spark.read.format("graft").option("readChangeFeed", "true")
        opts.foreach { case (k, v) => r = r.option(k, v) }
        r.load(table).select($"k", $"_change_type", $"_commit_version")
          .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toSet
      }
      // default: full history to the pinned tip
      assert(feed(Map.empty) == Set(
        (1L, "insert", 1L), (2L, "insert", 1L), (3L, "insert", 2L),
        (2L, "update_preimage", 3L), (2L, "update_postimage", 3L)))
      // half-open (start, end] window
      assert(feed(Map("startingVersion" -> "1", "endingVersion" -> "2"))
        == Set((3L, "insert", 2L)))
      // plain read is unaffected by feed machinery
      assert(spark.read.format("graft").load(table).count() == 3L)
      // timestamp window: every commit at-or-after v2's wall clock
      val log = TxnTable.commitLog(spark, table)
      val v2ts = log.find(_.version == 2L).get.tsMillis
      val v3ts = log.find(_.version == 3L).get.tsMillis
      if (v3ts > v2ts) { // same-millisecond commits can't be split
        assert(feed(Map("startingTimestamp" -> v3ts.toString))
          == Set((2L, "update_preimage", 3L), (2L, "update_postimage", 3L)))
        assert(feed(Map("startingTimestamp" -> v2ts.toString,
          "endingTimestamp" -> v2ts.toString)) == Set((3L, "insert", 2L)))
      }
      // version + timestamp spellings are mutually exclusive
      val e = intercept[Exception] {
        feed(Map("startingVersion" -> "1", "startingTimestamp" -> "0"))
      }
      assert(e.getMessage.contains("mutually exclusive"))
    }
  }

  test("change feed on a partitioned table: changes typed, layout kept") {
    import spark.implicits._
    withZone { table =>
      val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
        .toDF("k", "seg", "v")
      TxnTable.commitOverwrite(df, table, statsCols = Seq("k"),
        partitionCols = Seq("seg"), cdf = Some(true))
      spark.sql(s"CREATE TABLE cdf_part_t USING graft OPTIONS (path '$table')")
      try {
        spark.sql("UPDATE cdf_part_t SET v = v + 1.0 WHERE k >= 2")
      } finally spark.sql("DROP TABLE cdf_part_t")
      val feed = TxnTable.changeFeed(spark, table, sinceVersion = 1L)
        .select($"k", $"v", $"_change_type")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
      assert(feed == Set(
        (2L, 20.0, "update_preimage"), (2L, 21.0, "update_postimage"),
        (3L, 30.0, "update_preimage"), (3L, 31.0, "update_postimage")))
      // the rewrite preserved the partition layout; change files are
      // metadata (never listed as table data)
      assert(TxnTable.partitionColumns(spark, table) == Seq("seg"))
      val v = TxnTable.latestVersion(spark, table).get
      val stats = TxnTable.fileStats(spark, table, v)
      val files = TxnTable.snapshotFiles(spark, table, v)
      assert(files.forall(f => stats.getOrElse(f, Nil).exists(s =>
        s.col == "seg" && s.minV == s.maxV)))
      assert(TxnTable.read(spark, table).count() == 3L)
    }
  }

  test("change feed spans a schema evolution; old changes read as NULL-extended") {
    import spark.implicits._
    withZone { table =>
      TxnTable.commitOverwrite(Seq((1L, 10.0)).toDF("k", "v"), table,
        statsCols = Seq("k"), cdf = Some(true))
      TxnTable.deleteRangeOn(spark, table, "k", 1L, 1L) // v2: pre-evolution change
      // v3 evolves the schema (new column s), v4 changes under it
      TxnTable.commitAppend(Seq((2L, 20.0, "x")).toDF("k", "v", "s"), table)
      TxnTable.merge(Seq((2L, 99.0, "y")).toDF("k", "v", "s"), table, "k")
      val feed = TxnTable.changeFeed(spark, table, sinceVersion = 0L)
        .select($"k", $"v", $"s", $"_change_type", $"_commit_version")
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)),
          r.getString(3), r.getLong(4))).toSet
      assert(feed == Set(
        (1L, 10.0, None, "insert", 1L),
        (1L, 10.0, None, "delete", 2L), // pre-evolution file: s reads NULL
        (2L, 20.0, Some("x"), "insert", 3L),
        (2L, 20.0, Some("x"), "update_preimage", 4L),
        (2L, 99.0, Some("y"), "update_postimage", 4L)))
    }
  }

  test("vacuum reclaims dropped commits' change files, keeps the retained feed") {
    import spark.implicits._
    withZone { table =>
      TxnTable.commitOverwrite(
        Seq.range(0L, 20L).map(k => (k, k * 1.0)).toDF("k", "v")
          .repartitionByRange(2, $"k"),
        table, statsCols = Seq("k"), cdf = Some(true))
      TxnTable.deleteRangeOn(spark, table, "k", 0L, 4L) // v2: eager+lazy changes
      TxnTable.compact(spark, table, targetFiles = 1)   // v3: full manifest
      TxnTable.merge(Seq((10L, -1.0)).toDF("k", "v"), table, "k") // v4: changes
      def cdcOnDisk(): Long = {
        def walk(f: java.io.File): Long =
          if (f.isDirectory) f.listFiles().map(walk).sum
          else if (f.getPath.contains("/_cdc/") &&
            f.getName.endsWith(".parquet")) 1L
          else 0L
        walk(new java.io.File(table))
      }
      assert(cdcOnDisk() > 0L)
      TxnTable.vacuum(spark, table, keep = 1) // retain v3 (base) + v4
      // v4's change feed still reads; the reclaimed v2 change files are
      // gone with their commit dirs
      val feed = TxnTable.changeFeed(spark, table, sinceVersion = 3L)
        .select($"k", $"_change_type")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(feed == Set((10L, "update_preimage"), (10L, "update_postimage")))
      val e = intercept[Exception] {
        TxnTable.changeFeed(spark, table, sinceVersion = 1L, untilVersion = 2L)
          .collect()
      }
      assert(e.getMessage != null) // vacuumed history refuses, not half-reads
      // on disk: exactly the retained commits' change files survive
      assert(cdcOnDisk() == TxnTable.commitChanges(spark, table, 4L).cdc.size,
        "dropped commits' change files must be reclaimed, retained ones kept")
    }
  }

  test("streaming readChangeFeed drains typed changes exactly once") {
    import spark.implicits._
    withZone { table =>
      val root = new java.io.File(table).getParent
      TxnTable.commitOverwrite(
        Seq.range(0L, 100L).map(k => (k, k * 1.0)).toDF("k", "v")
          .repartitionByRange(4, $"k"),
        table, statsCols = Seq("k"), cdf = Some(true))
      TxnTable.commitAppend(
        Seq.range(100L, 110L).map(k => (k, k * 1.0)).toDF("k", "v"), table)
      TxnTable.deleteRangeOn(spark, table, "k", 0L, 24L)
      def drain(): Unit = {
        val q = spark.readStream.format("graft")
          .option("readChangeFeed", "true")
          .option("startingVersion", "1")
          .load(table)
          .writeStream.format("graft")
          .option("checkpointLocation", s"$root/cp")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start(s"$root/sink")
        q.awaitTermination()
      }
      drain()
      // maintenance between drains contributes nothing and wedges nothing
      TxnTable.compactSmall(spark, table, smallBytes = 1L << 40)
      TxnTable.merge(Seq((50L, -1.0), (200L, 2.0)).toDF("k", "v"), table, "k")
      drain()
      val sink = TxnTable.read(spark, s"$root/sink")
      val byType = sink.groupBy($"_change_type").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byType == Map(
        "insert" -> 11L,           // v2 append (10) + merge insert (1)
        "delete" -> 25L,           // range delete 0..24
        "update_preimage" -> 1L,   // merge hit k=50
        "update_postimage" -> 1L))
      val versions = sink.select($"_commit_version").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(versions == Set(2L, 3L, 5L)) // v4 compaction feeds nothing
    }
  }

  test("change feed spans a zero-rewrite RENAME: old changes surface new name") {
    import spark.implicits._
    withZone { table =>
      TxnTable.commitOverwrite(Seq((1L, 10.0)).toDF("k", "v"), table,
        statsCols = Seq("k"), cdf = Some(true))
      TxnTable.deleteRangeOn(spark, table, "k", 1L, 1L) // v2: pre-rename change
      TxnTable.renameColumn(spark, table, "v", "val")   // v3: metadata-only
      TxnTable.commitAppend(Seq((2L, 20.0)).toDF("k", "val"), table) // v4
      val feed = TxnTable.changeFeed(spark, table, sinceVersion = 0L)
        .select($"k", $"val", $"_change_type", $"_commit_version")
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3)))
        .toSet
      // pre-rename commits' bytes sit under the OLD physical name; the
      // feed reads them through the alias coalesce as the new column
      assert(feed == Set(
        (1L, 10.0, "insert", 1L),
        (1L, 10.0, "delete", 2L),
        (2L, 20.0, "insert", 4L)))
    }
  }
}
