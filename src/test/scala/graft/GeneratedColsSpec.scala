package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.TxnTable

/** GENERATED columns (Delta's delta.generationExpression on graft's
  * schema log — k132): definitions ride as StructField metadata inside
  * the `#schema=` manifest header, appends auto-fill the column,
  * contradicting writes refuse, the definition survives schema
  * evolution and compaction, and a predicate on the generation SOURCE
  * column prunes files (derived partition pruning via the auto-added
  * source stats). */
class GeneratedColsSpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  private def withZone(f: String => Unit): Unit = {
    val zone = java.nio.file.Files.createTempDirectory("graft_gen").toFile
    try f(zone.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete(); ()
      }
      rm(zone)
    }
  }

  import java.sql.Timestamp
  private def seedRows(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i, new Timestamp(86400000L * (i % 5) + 3600000L), i * 1.5))
      .toDF("id", "ts", "v")
  }

  test("definition is recorded, filled on create, and auto-filled on append") {
    withZone { zone =>
      val table = s"$zone/t"
      val df = TxnTable.withGeneratedColumn(
        seedRows(1L to 20L), "p_date", "CAST(ts AS DATE)")
      assert(df.columns.contains("p_date"))
      TxnTable.commitOverwrite(df, table, partitionCols = Seq("p_date"))
      val schema = TxnTable.snapshotSchema(spark, table,
        TxnTable.latestVersion(spark, table).get).get
      assert(TxnTable.generatedColumns(schema) ==
        Map("p_date" -> "CAST(ts AS DATE)"))
      // append WITHOUT the column: commit computes it
      TxnTable.commitAppend(seedRows(21L to 30L), table)
      val out = TxnTable.read(spark, table)
      assert(out.count() == 30L)
      assert(out.filter(col("p_date") =!= expr("CAST(ts AS DATE)")).count() == 0L)
      assert(out.filter(col("p_date").isNull).count() == 0L)
      // the definition survived the append's schema merge
      val schema2 = TxnTable.snapshotSchema(spark, table,
        TxnTable.latestVersion(spark, table).get).get
      assert(TxnTable.generatedColumns(schema2).contains("p_date"))
    }
  }

  test("a contradicting supplied value refuses; an agreeing one commits") {
    withZone { zone =>
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        TxnTable.withGeneratedColumn(seedRows(1L to 5L), "p_date",
          "CAST(ts AS DATE)"), table)
      // agreeing explicit value: fine
      TxnTable.commitAppend(
        seedRows(6L to 8L).withColumn("p_date", expr("CAST(ts AS DATE)")),
        table)
      assert(TxnTable.read(spark, table).count() == 8L)
      // contradicting value: refused before any file lands
      val v = TxnTable.latestVersion(spark, table).get
      val bad = seedRows(9L to 9L)
        .withColumn("p_date", expr("DATE'1999-01-01'"))
      val e = intercept[IllegalArgumentException] {
        TxnTable.commitAppend(bad, table)
      }
      assert(e.getMessage.contains("GENERATED column p_date"))
      assert(TxnTable.latestVersion(spark, table).get == v)
      assert(TxnTable.read(spark, table).count() == 8L)
    }
  }

  test("definition survives compaction and added columns") {
    withZone { zone =>
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        TxnTable.withGeneratedColumn(seedRows(1L to 10L), "p_date",
          "CAST(ts AS DATE)"), table)
      TxnTable.commitAppend(seedRows(11L to 20L), table)
      TxnTable.compactSmall(spark, table, smallBytes = 32L << 20)
      val s1 = TxnTable.snapshotSchema(spark, table,
        TxnTable.latestVersion(spark, table).get).get
      assert(TxnTable.generatedColumns(s1).contains("p_date"))
      TxnTable.addColumns(spark, table,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("note",
            org.apache.spark.sql.types.StringType))))
      val s2 = TxnTable.snapshotSchema(spark, table,
        TxnTable.latestVersion(spark, table).get).get
      assert(TxnTable.generatedColumns(s2).contains("p_date"))
      // appends still fill after both maintenance commits
      TxnTable.commitAppend(seedRows(21L to 25L), table)
      val out = TxnTable.read(spark, table)
      assert(out.filter(col("p_date").isNull).count() == 0L)
    }
  }

  test("idempotent (streaming-sink) appends fill; replay is a no-op; DESCRIBE DETAIL reports the definition") {
    withZone { zone =>
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        TxnTable.withGeneratedColumn(seedRows(1L to 5L), "p_date",
          "CAST(ts AS DATE)"), table)
      // the streaming sink's exactly-once path: same (appId, batchId)
      // re-offered must not double-append (and the first offer fills)
      val v1 = TxnTable.commitAppendIdempotent(
        seedRows(6L to 8L), table, "app", 1L)
      val v2 = TxnTable.commitAppendIdempotent(
        seedRows(6L to 8L), table, "app", 1L)
      assert(v1 == v2)
      val out = TxnTable.read(spark, table)
      assert(out.count() == 8L)
      assert(out.filter(col("p_date").isNull ||
        col("p_date") =!= expr("CAST(ts AS DATE)")).count() == 0L)
      val d = spark.sql(s"DESCRIBE DETAIL '$table'").head()
      assert(d.getAs[String]("generated_columns")
        == "p_date AS (CAST(ts AS DATE))")
    }
  }

  test("SQL UPDATE on a generation source recomputes the derived column") {
    withZone { zone =>
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        TxnTable.withGeneratedColumn(seedRows(1L to 10L), "p_date",
          "CAST(ts AS DATE)"), table, statsCols = Seq("id"))
      spark.sql(s"CREATE TABLE gen_upd USING graft OPTIONS (path '$table')")
      try {
        spark.sql(
          "UPDATE gen_upd SET ts = TIMESTAMP'2030-06-01 12:00:00' WHERE id <= 3")
        val out = TxnTable.read(spark, table)
        assert(out.filter(col("p_date") =!= expr("CAST(ts AS DATE)"))
          .count() == 0L, "UPDATE must not leave the generated column stale")
        assert(out.filter(col("p_date") === lit("2030-06-01").cast("date"))
          .count() == 3L)
        // the definition itself survived the rewrite commit
        val s = TxnTable.snapshotSchema(spark, table,
          TxnTable.latestVersion(spark, table).get).get
        assert(TxnTable.generatedColumns(s).contains("p_date"))
      } finally spark.sql("DROP TABLE IF EXISTS gen_upd")
    }
  }

  test("merge fills an omitted generated column on upserted rows") {
    withZone { zone =>
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        TxnTable.withGeneratedColumn(seedRows(1L to 5L), "p_date",
          "CAST(ts AS DATE)"), table, statsCols = Seq("id"))
      // upsert frame carries the SOURCE but omits the generated column
      TxnTable.merge(seedRows(4L to 8L), table, "id")
      val out = TxnTable.read(spark, table)
      assert(out.count() == 8L)
      assert(out.filter(col("p_date").isNull ||
        col("p_date") =!= expr("CAST(ts AS DATE)")).count() == 0L)
    }
  }

  test("a CHECK constraint referencing the generated column sees the filled value") {
    withZone { zone =>
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        TxnTable.withGeneratedColumn(seedRows(1L to 5L), "p_date",
          "CAST(ts AS DATE)"), table)
      TxnTable.addCheck(spark, table, "date_floor", "p_date >= DATE'1970-01-01'")
      // frame OMITS p_date: the fill must run before the constraint gate
      TxnTable.commitAppend(seedRows(6L to 8L), table)
      assert(TxnTable.read(spark, table).count() == 8L)
    }
  }

  test("DROP/RENAME of a generation source column refuse; of the generated column pass") {
    withZone { zone =>
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        TxnTable.withGeneratedColumn(seedRows(1L to 5L), "p_date",
          "CAST(ts AS DATE)"), table)
      val e1 = intercept[IllegalArgumentException] {
        TxnTable.dropColumn(spark, table, "ts")
      }
      assert(e1.getMessage.contains("generated column p_date"))
      val e2 = intercept[IllegalArgumentException] {
        TxnTable.renameColumn(spark, table, "ts", "event_ts")
      }
      assert(e2.getMessage.contains("generated column p_date"))
      // renaming the generated column itself carries the definition
      TxnTable.renameColumn(spark, table, "p_date", "part_date")
      val s = TxnTable.snapshotSchema(spark, table,
        TxnTable.latestVersion(spark, table).get).get
      assert(TxnTable.generatedColumns(s) ==
        Map("part_date" -> "CAST(ts AS DATE)"))
      // dropping the generated column drops its definition with it
      TxnTable.dropColumn(spark, table, "part_date")
      val s2 = TxnTable.snapshotSchema(spark, table,
        TxnTable.latestVersion(spark, table).get).get
      assert(TxnTable.generatedColumns(s2).isEmpty)
      // ts is free to evolve now
      TxnTable.renameColumn(spark, table, "ts", "event_ts")
      assert(TxnTable.read(spark, table).columns.contains("event_ts"))
    }
  }

  test("a predicate on the generation SOURCE column prunes files") {
    withZone { zone =>
      val table = s"$zone/t"
      // 5 distinct days -> partitioned into >= 5 single-day file groups
      val df = TxnTable.withGeneratedColumn(
        seedRows(1L to 200L).repartition(4), "p_date", "CAST(ts AS DATE)")
      TxnTable.commitOverwrite(df, table, partitionCols = Seq("p_date"))
      val v = TxnTable.latestVersion(spark, table).get
      val files = TxnTable.snapshotFiles(spark, table, v)
      val stats = TxnTable.fileStats(spark, table, v)
      // every file carries ts stats (the auto-added generation source)
      assert(files.forall(f => stats.getOrElse(f, Nil).exists(_.col == "ts")))
      // a ts range covering ONE day must scan only that day's files
      val read = spark.read.format("graft").load(table)
        .filter(col("ts") < lit(new Timestamp(86400000L)))
      val scanned = org.apache.spark.sql.GraftBridge.dsv2ScannedFiles(read).get
      assert(scanned < files.size,
        s"ts predicate scanned $scanned of ${files.size} files - no pruning")
      assert(read.count() == (1L to 200L).count(_ % 5 == 0))
    }
  }
}
