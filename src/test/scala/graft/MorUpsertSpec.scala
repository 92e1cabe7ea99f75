package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.TxnTable

/** MERGE-ON-READ upserts: on a mergeOnRead table, SQL UPDATE and the
  * canonical MERGE upsert commit the changed/new rows plus an
  * equality-delete file of the superseded originals — no data file is
  * rewritten; write I/O is proportional to the changed rows. */
class MorUpsertSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark

  private var n = 0
  private def withZone(body: (String, String) => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_morup").toFile
    val name = { n += 1; s"morup_spec_$n" }
    val path = s"${root.getAbsolutePath}/t"
    try body(path, name)
    finally {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(root)
    }
  }

  private def files(table: String): Set[String] =
    TxnTable.morState(spark, table,
      TxnTable.latestVersion(spark, table).get).files.toSet
  private def dels(table: String) =
    TxnTable.morState(spark, table,
      TxnTable.latestVersion(spark, table).get).dels

  private def reg(tn: String, path: String): Unit =
    spark.sql(s"CREATE TABLE $tn USING graft OPTIONS (path '$path')")

  private def seed(table: String, tn: String): Unit = {
    import spark.implicits._
    val df = Seq.range(0L, 100L).map(k => (k, s"s$k", k % 5)).toDF("k", "s", "g")
      .repartitionByRange(4, $"k")
    df.write.format("graft").option("statsCols", "k,g")
      .option("mergeOnRead", "true").mode("overwrite").save(table)
    reg(tn, table)
  }

  test("SQL UPDATE appends updated rows + a delete file; originals untouched") {
    import spark.implicits._
    withZone { (table, tn) =>
      seed(table, tn)
      val before = files(table)
      spark.sql(s"UPDATE $tn SET s = 'upd' WHERE g = 2")
      val after = files(table)
      assert(before.subsetOf(after), "original data files must be untouched")
      assert((after -- before).nonEmpty, "updated rows land in appended files")
      assert(dels(table).size == 1 && dels(table).head.keyCols == Seq("g"))
      val df = spark.read.format("graft").load(table)
      assert(df.count() == 100L, "an update must not change the row count")
      assert(df.filter($"s" === "upd").count() == 20L)
      assert(df.filter($"g" === 2 && $"s" =!= "upd").count() == 0L)
      // unaffected slices still read their original values
      assert(df.filter($"g" === 1 && $"s".startsWith("s")).count() == 20L)
    }
  }

  test("no-match UPDATE is a provable no-op") {
    withZone { (table, tn) =>
      seed(table, tn)
      val v = TxnTable.latestVersion(spark, table).get
      spark.sql(s"UPDATE $tn SET s = 'x' WHERE k = -1")
      assert(TxnTable.latestVersion(spark, table).get == v)
      assert(dels(table).isEmpty)
    }
  }

  test("UPDATE that modifies its own key column moves the row exactly once") {
    import spark.implicits._
    withZone { (table, tn) =>
      seed(table, tn)
      spark.sql(s"UPDATE $tn SET k = k + 1000 WHERE k = 5")
      val df = spark.read.format("graft").load(table)
      assert(df.count() == 100L)
      assert(df.filter($"k" === 5).count() == 0L)
      assert(df.filter($"k" === 1005).select($"s").head().getString(0) == "s5")
    }
  }

  test("MERGE upsert: updates + inserts appended, matched keys tuple-deleted") {
    import spark.implicits._
    withZone { (table, tn) =>
      seed(table, tn)
      val before = files(table)
      Seq((10L, "m10"), (20L, "m20"), (500L, "new500"))
        .toDF("mk", "ms").createOrReplaceTempView("morup_src")
      spark.sql(
        s"""MERGE INTO $tn t USING morup_src src ON t.k = src.mk
           |WHEN MATCHED THEN UPDATE SET s = src.ms
           |WHEN NOT MATCHED THEN INSERT (k, s, g) VALUES (src.mk, src.ms, -1)
           |""".stripMargin)
      assert(before.subsetOf(files(table)), "merge-on-read MERGE must not rewrite files")
      assert(dels(table).size == 1 && dels(table).head.keyCols == Seq("k"))
      val df = spark.read.format("graft").load(table)
      assert(df.count() == 101L)
      assert(df.filter($"k" === 10).head().getString(1) == "m10")
      assert(df.filter($"k" === 20).head().getString(1) == "m20")
      assert(df.filter($"k" === 500).collect().map(r =>
        (r.getString(1), r.getLong(2))).toSeq == Seq(("new500", -1L)))
      assert(df.filter($"k" === 11).head().getString(1) == "s11",
        "unmatched rows keep their values")
    }
  }

  test("MERGE with DELETE action removes matched rows without touching files") {
    withZone { (table, tn) =>
      seed(table, tn)
      val before = files(table)
      import spark.implicits._
      Seq(1L, 2L, 3L).toDF("mk").createOrReplaceTempView("morup_del_src")
      spark.sql(
        s"""MERGE INTO $tn t USING morup_del_src src ON t.k = src.mk
           |WHEN MATCHED THEN DELETE""".stripMargin)
      assert(files(table) == before, "a delete-only merge appends nothing")
      assert(dels(table).size == 1)
      assert(spark.read.format("graft").load(table).count() == 97L)
    }
  }

  test("MERGE cardinality violation still raises on the merge-on-read path") {
    withZone { (table, tn) =>
      seed(table, tn)
      import spark.implicits._
      Seq((7L, "a"), (7L, "b")).toDF("mk", "ms")
        .createOrReplaceTempView("morup_dup_src")
      val e = intercept[Exception] {
        spark.sql(
          s"""MERGE INTO $tn t USING morup_dup_src src ON t.k = src.mk
             |WHEN MATCHED THEN UPDATE SET s = src.ms""".stripMargin)
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("cardinality")))
    }
  }

  test("conditional matched action falls back to copy-on-write, stays exact") {
    import spark.implicits._
    withZone { (table, tn) =>
      seed(table, tn)
      Seq((10L, "cond10"), (11L, "cond11"))
        .toDF("mk", "ms").createOrReplaceTempView("morup_cond_src")
      spark.sql(
        s"""MERGE INTO $tn t USING morup_cond_src src ON t.k = src.mk
           |WHEN MATCHED AND t.g = 0 THEN UPDATE SET s = src.ms
           |""".stripMargin)
      val df = spark.read.format("graft").load(table)
      assert(df.filter($"k" === 10).head().getString(1) == "cond10") // g=0
      assert(df.filter($"k" === 11).head().getString(1) == "s11")    // g=1: kept
      assert(df.count() == 100L)
    }
  }

  test("CDF records update pre/post images and merge inserts") {
    import spark.implicits._
    withZone { (table, tn) =>
      val df = Seq.range(0L, 20L).map(k => (k, s"v$k", k % 4)).toDF("k", "s", "g")
      df.write.format("graft").option("statsCols", "k")
        .option("mergeOnRead", "true").option("enableChangeFeed", "true")
        .mode("overwrite").save(table)
      reg(tn, table)
      spark.sql(s"UPDATE $tn SET s = 'u' WHERE g = 3")
      val feed = TxnTable.changeFeed(spark, table, sinceVersion = 1L)
        .select($"k", $"s", $"_change_type").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      val keys = Seq(3L, 7L, 11L, 15L, 19L)
      assert(feed == (keys.map(k => (k, s"v$k", "update_preimage")) ++
        keys.map(k => (k, "u", "update_postimage"))).toSet)
      // merge: one update + one insert, both observable in the feed
      val v2 = TxnTable.latestVersion(spark, table).get
      Seq((0L, "m0"), (100L, "m100")).toDF("mk", "ms")
        .createOrReplaceTempView("morup_cdf_src")
      spark.sql(
        s"""MERGE INTO $tn t USING morup_cdf_src src ON t.k = src.mk
           |WHEN MATCHED THEN UPDATE SET s = src.ms
           |WHEN NOT MATCHED THEN INSERT (k, s, g) VALUES (src.mk, src.ms, 9)
           |""".stripMargin)
      val feed2 = TxnTable.changeFeed(spark, table, sinceVersion = v2)
        .select($"k", $"s", $"_change_type").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(feed2 == Set((0L, "v0", "update_preimage"),
        (0L, "m0", "update_postimage"), (100L, "m100", "insert")))
    }
  }

  test("OPTIMIZE materializes upserts; values survive") {
    import spark.implicits._
    withZone { (table, tn) =>
      seed(table, tn)
      spark.sql(s"UPDATE $tn SET s = 'u1' WHERE g = 0")
      Seq((3L, "m3"), (777L, "new")).toDF("mk", "ms")
        .createOrReplaceTempView("morup_opt_src")
      spark.sql(
        s"""MERGE INTO $tn t USING morup_opt_src src ON t.k = src.mk
           |WHEN MATCHED THEN UPDATE SET s = src.ms
           |WHEN NOT MATCHED THEN INSERT (k, s, g) VALUES (src.mk, src.ms, -1)
           |""".stripMargin)
      val expect = spark.read.format("graft").load(table)
        .collect().map(_.toSeq).toSet
      spark.sql(s"OPTIMIZE '$table'")
      assert(dels(table).isEmpty, "OPTIMIZE must materialize the delete entries")
      val got = spark.read.format("graft").load(table)
        .collect().map(_.toSeq).toSet
      assert(got == expect)
      assert(got.size == 101)
      // materialized files carry no superseded rows
      val raw = spark.read.format("graft").option("ignoreDeletes", "true")
        .load(table)
      assert(raw.count() == 101L)
    }
  }

  test("update racing an append commits one data write and keeps both") {
    import spark.implicits._
    withZone { (table, tn) =>
      seed(table, tn)
      val writesBefore = TxnTable.dataWrites.get()
      // interleave: an append lands AFTER the update computes its rows
      // but BEFORE its CAS — simulated by committing the append first,
      // then the update (the rebase path is exercised by TxnSinkSpec;
      // here we pin the SEMANTICS: both survive, updated rows exact)
      Seq((5000L, "late", 7L)).toDF("k", "s", "g")
        .write.format("graft").mode("append").save(table)
      spark.sql(s"UPDATE $tn SET s = 'u' WHERE g = 4")
      val df = spark.read.format("graft").load(table)
      assert(df.count() == 101L)
      assert(df.filter($"s" === "late").count() == 1L)
      assert(df.filter($"g" === 4 && $"s" =!= "u" && $"s" =!= "late").count() == 0L)
      assert(TxnTable.dataWrites.get() - writesBefore >= 1L)
    }
  }

  test("upsert composes with an earlier merge-on-read delete") {
    import spark.implicits._
    withZone { (table, tn) =>
      seed(table, tn)
      spark.sql(s"DELETE FROM $tn WHERE g = 1")
      // the update's snapshot read is del-applied: g=1 rows are gone,
      // so they are neither updated nor re-recorded
      spark.sql(s"UPDATE $tn SET s = 'u' WHERE k < 10")
      val df = spark.read.format("graft").load(table)
      assert(df.count() == 80L)
      assert(df.filter($"g" === 1).count() == 0L)
      assert(df.filter($"s" === "u").count() == 8L) // k 0..9 minus k=1,6 (g=1)
      assert(dels(table).size == 2)
    }
  }
}
