package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.TxnTable

/** Snapshot TAGS: named pinned versions (`graft.tag.<name>` properties)
  * with three contracts — `tagAsOf` reads resolve by name through the
  * latest snapshot, VACUUM retains tagged history regardless of the
  * keep window, and SET/DROP TAG are ordinary CAS property commits with
  * SQL spellings. */
class TagSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark
  import spark.implicits._

  private def withZone(body: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_tags").toFile
    try body(s"${root.getAbsolutePath}/t")
    finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(root)
    }
  }

  private def seed(table: String, n: Long): Unit =
    Seq.range(0L, n).map(k => (k, k * 2L)).toDF("k", "v")
      .coalesce(1).write.format("graft").option("statsCols", "k")
      .option("mergeOnRead", "true")
      .mode(if (new java.io.File(table).exists) "append" else "overwrite")
      .save(table)

  test("tagAsOf reads the pinned version by name; re-tag moves; drop") {
    withZone { table =>
      seed(table, 10L)
      val v1 = TxnTable.latestVersion(spark, table).get
      TxnTable.setTag(spark, table, "raw")
      seed(table, 5L) // appends 0..4 again
      assert(TxnTable.tags(spark, table) == Map("raw" -> v1))
      val tagged = spark.read.format("graft")
        .option("tagAsOf", "raw").load(table)
      assert(tagged.count() == 10L)
      val pinned = spark.read.format("graft")
        .option("versionAsOf", v1.toString).load(table)
      assert(tagged.collect().toSet == pinned.collect().toSet)
      assert(spark.read.format("graft").load(table).count() == 15L)
      // re-tagging MOVES the name
      TxnTable.setTag(spark, table, "raw")
      assert(spark.read.format("graft")
        .option("tagAsOf", "raw").load(table).count() == 15L)
      TxnTable.deleteTag(spark, table, "raw")
      val e = intercept[IllegalStateException] {
        spark.read.format("graft").option("tagAsOf", "raw").load(table)
          .count()
      }
      assert(e.getMessage.contains("no tag"), e.getMessage)
      // unknown-version / bad-name refusals
      intercept[IllegalArgumentException] {
        TxnTable.setTag(spark, table, "future", Some(999L))
      }
      intercept[IllegalArgumentException] {
        TxnTable.setTag(spark, table, "bad name")
      }
    }
  }

  test("VACUUM KEEP 0 retains tagged history; dropping the tag releases it") {
    withZone { table =>
      seed(table, 20L)
      val v1 = TxnTable.latestVersion(spark, table).get
      TxnTable.setTag(spark, table, "train-v1", Some(v1))
      // churn: delete + full-rewrite OPTIMIZE (checkpoint manifest)
      TxnTable.deleteWherePos(spark, table, df => df("k") < 5L)
      spark.sql(s"OPTIMIZE '$table'")
      TxnTable.vacuum(spark, table, keep = 0, retainMs = 0L)
      // the tagged snapshot is fully readable after the vacuum
      val tagged = spark.read.format("graft")
        .option("tagAsOf", "train-v1").load(table)
      assert(tagged.count() == 20L,
        "tagged history must survive VACUUM KEEP 0")
      assert(spark.read.format("graft").load(table).count() == 15L)
      // drop the tag -> the pin releases and the old files reclaim
      TxnTable.deleteTag(spark, table, "train-v1")
      TxnTable.vacuum(spark, table, keep = 0, retainMs = 0L)
      val e = intercept[Exception] {
        spark.read.format("graft")
          .option("versionAsOf", v1.toString).load(table).count()
      }
      assert(e != null)
      assert(spark.read.format("graft").load(table).count() == 15L,
        "the live snapshot must be untouched by the release")
    }
  }

  test("SQL spellings: SET TAG [VERSION AS OF], DROP TAG, SHOW TBLPROPERTIES") {
    withZone { table =>
      seed(table, 8L)
      val v1 = TxnTable.latestVersion(spark, table).get
      seed(table, 4L)
      spark.sql(s"ALTER TABLE '$table' SET TAG 'rel.1' VERSION AS OF $v1")
      assert(spark.read.format("graft")
        .option("tagAsOf", "rel.1").load(table).count() == 8L)
      // bare SET TAG pins the LATEST version
      spark.sql(s"ALTER TABLE '$table' SET TAG latest_rel")
      assert(spark.read.format("graft")
        .option("tagAsOf", "latest_rel").load(table).count() == 12L)
      val props = spark.sql(s"SHOW TBLPROPERTIES '$table'")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("graft.tag.rel.1").contains(v1.toString), props)
      spark.sql(s"ALTER TABLE '$table' DROP TAG 'rel.1'")
      assert(TxnTable.tags(spark, table).keySet == Set("latest_rel"))
    }
  }

  test("tags are POLICY like constraints: they survive RESTORE and resolve") {
    withZone { table =>
      seed(table, 6L)
      val v1 = TxnTable.latestVersion(spark, table).get
      seed(table, 3L)
      val v2 = TxnTable.latestVersion(spark, table).get
      TxnTable.setTag(spark, table, "late", Some(v2))
      TxnTable.restore(spark, table, v1)
      // restore rolls CONTENT back but keeps the property set (like
      // CHECK constraints) — and the tagged manifest still exists, so
      // the tag keeps resolving to the pre-restore snapshot
      assert(spark.read.format("graft").load(table).count() == 6L)
      assert(TxnTable.tags(spark, table) == Map("late" -> v2))
      assert(spark.read.format("graft")
        .option("tagAsOf", "late").load(table).count() == 9L)
    }
  }
}
