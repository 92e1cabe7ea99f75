package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.TxnTable

/** Vintage-gate integrity for nested existence DEFAULTs. The read-time
  * fill must apply ONLY to files that physically predate the default's
  * declaration — three paths historically lost the add-version gate and
  * would overwrite post-declaration files' REAL values with the default:
  * (1) full manifests on non-MoR tables dropped `#addv` lines entirely
  * (compact/overwrite/restore after the declaration reset every file to
  * vintage 0); (2) the change feed planned its insert/delete legs with
  * no addv at all; (3) clones carried `sinceVersion` verbatim against a
  * reset history, so every cloned file read as pre-declaration. */
class NdefVintageSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark

  private def withZone(body: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_ndefv").toFile
    try body(root.getAbsolutePath)
    finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(root)
    }
  }

  import spark.implicits._

  /** v1: rows 1-2 predate the default (will read d = 7); then
    * `m.d INT DEFAULT 7` declared; v3: rows 3-4 carry EXPLICIT d. */
  private def seed(table: String): Unit = {
    Seq((1L, 10L), (2L, 20L)).toDF("id", "n")
      .select($"id", struct($"n").as("m")).coalesce(1)
      .write.format("graft").option("statsCols", "id")
      .mode("overwrite").save(table)
    TxnTable.addNestedColumnWithDefault(spark, table, "m.d",
      IntegerType, "7")
    TxnTable.commitAppend(
      Seq((3L, 30L, 42), (4L, 40L, 43)).toDF("id", "n", "d")
        .select($"id", struct($"n", $"d").as("m")).coalesce(1), table)
  }

  private def snapshot(table: String): Map[Long, Int] =
    spark.read.format("graft").load(table)
      .select($"id", $"m.d".as("d")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  private val expected = Map(1L -> 7, 2L -> 7, 3L -> 42, 4L -> 43)

  test("compact keeps the vintage gate (addv survives a full manifest)") {
    withZone { zone =>
      val table = s"$zone/t"
      seed(table)
      assert(snapshot(table) == expected)
      TxnTable.compact(spark, table, targetFiles = 1)
      // the compacted file physically carries d (fill materialized by
      // the rewrite); a lost gate would re-fill ALL rows with 7
      assert(snapshot(table) == expected,
        "compaction must not reset nested-default vintages")
      // a second declaration AFTER the compact: the compacted file is
      // post-vintage for d but pre-vintage for e
      TxnTable.addNestedColumnWithDefault(spark, table, "m.e",
        IntegerType, "5")
      TxnTable.commitAppend(
        Seq((5L, 50L, 44, 66)).toDF("id", "n", "d", "e")
          .select($"id", struct($"n", $"d", $"e").as("m")).coalesce(1),
        table)
      val got = spark.read.format("graft").load(table)
        .select($"id", $"m.d".as("d"), $"m.e".as("e")).collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
      assert(got == Map(1L -> (7, 5), 2L -> (7, 5), 3L -> (42, 5),
        4L -> (43, 5), 5L -> (44, 66)), got)
      // steady state after a second compact: every file postdates every
      // default, so the fill splice steps ASIDE and the read keeps the
      // pristine DSv2 relation (bare scan, no fill Project wrapper)
      TxnTable.compact(spark, table, targetFiles = 1)
      val bare = spark.read.format("graft").load(table)
      val plan = bare.queryExecution.executedPlan.toString
      assert(plan.contains("BatchScan") && !plan.contains("Project") &&
          !plan.contains("Union"),
        s"materialized table must read through the bare scan; plan:\n$plan")
      assert(bare.select($"m.e").collect().map(_.getInt(0)).sorted.toSeq
        == Seq(5, 5, 5, 5, 66))
    }
  }

  test("change feed reports post-declaration files' real values") {
    withZone { zone =>
      val table = s"$zone/t"
      seed(table)
      // v3's insert leg: files written AFTER the declaration carry
      // explicit values — the feed must not overwrite them with 7
      val ins = TxnTable.changeFeed(spark, table, sinceVersion = 2L)
        .select($"id", $"m.d".as("d"), $"_change_type").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(ins == Set((3L, 42, "insert"), (4L, 43, "insert")), ins)
      // pre-declaration files in the feed DO fill: replaying from v0
      // under the LATEST schema, the v1 insert rows surface d = 7
      val v1 = TxnTable.changeFeed(spark, table, 0L)
        .where($"_commit_version" === 1L)
        .select($"id", $"m.d".as("d")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(v1 == Map(1L -> 7, 2L -> 7), v1)
      // delete leg: an overwrite removes BOTH vintages — removed rows
      // must replay with their own vintage's values, not all-default.
      // The overwrite frame reuses the table's schema so the default
      // declaration (and its vintage gate) survives the new schema.
      import org.apache.spark.sql.Row
      val cur = spark.read.format("graft").load(table).schema
      spark.createDataFrame(
          java.util.Arrays.asList(Row(9L, Row(90L, 9))), cur)
        .coalesce(1)
        .write.format("graft").mode("overwrite").save(table)
      val v4 = TxnTable.latestVersion(spark, table).get
      val dels = TxnTable.changeFeed(spark, table, v4 - 1, v4)
        .where($"_change_type" === "delete")
        .select($"id", $"m.d".as("d")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(dels == expected,
        s"deleted rows must replay with vintage-correct values: $dels")
    }
  }

  test("clones re-base nested-default vintages onto fresh history") {
    withZone { zone =>
      val table = s"$zone/src"
      seed(table)
      // deep clone of a MIXED-vintage source: pre files still fill,
      // post files keep their explicit values
      TxnTable.cloneDeep(spark, table, s"$zone/deep")
      assert(snapshot(s"$zone/deep") == expected,
        "deep clone must not re-fill post-declaration files")
      TxnTable.cloneShallow(spark, table, s"$zone/shallow")
      assert(snapshot(s"$zone/shallow") == expected,
        "shallow clone must not re-fill post-declaration files")
      // the clone's own future appends stay post-vintage
      TxnTable.commitAppend(
        Seq((5L, 50L, 44)).toDF("id", "n", "d")
          .select($"id", struct($"n", $"d").as("m")).coalesce(1),
        s"$zone/deep")
      assert(snapshot(s"$zone/deep") == expected + (5L -> 44))
      // all-post source (compact first): nothing fills on the clone
      TxnTable.compact(spark, table, targetFiles = 1)
      TxnTable.cloneDeep(spark, table, s"$zone/deep2")
      assert(snapshot(s"$zone/deep2") == expected)
    }
  }

  test("clone refuses three nested-default vintage classes") {
    withZone { zone =>
      val table = s"$zone/src"
      seed(table)
      // second default at a later version with files in between →
      // three classes: {fills d+e}, {fills e}, {fills none}
      TxnTable.addNestedColumnWithDefault(spark, table, "m.e",
        IntegerType, "5")
      TxnTable.commitAppend(
        Seq((5L, 50L, 44, 66)).toDF("id", "n", "d", "e")
          .select($"id", struct($"n", $"d", $"e").as("m")).coalesce(1),
        table)
      val e = intercept[IllegalArgumentException] {
        TxnTable.cloneDeep(spark, table, s"$zone/deep")
      }
      assert(e.getMessage.contains("vintage classes"), e.getMessage)
      // OPTIMIZE (the message's escape hatch) collapses the classes —
      // the clone then succeeds and reads exactly like the source
      TxnTable.compact(spark, table, targetFiles = 1)
      TxnTable.cloneDeep(spark, table, s"$zone/deep")
      val got = spark.read.format("graft").load(s"$zone/deep")
        .select($"id", $"m.d".as("d"), $"m.e".as("e")).collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
      assert(got == Map(1L -> (7, 5), 2L -> (7, 5), 3L -> (42, 5),
        4L -> (43, 5), 5L -> (44, 66)), got)
    }
  }

  test("mixed-vintage reads keep the default's metadata in their schema") {
    // regression: fillNestedDefaults' withField used to rebuild the
    // struct type WITHOUT the nested field's metadata, so the DSv2
    // splice's Union surfaced a metadata-stripped schema whenever the
    // filled branch happened to sort first (branch order follows random
    // data-dir names — an INTERMITTENT strip), and an overwrite written
    // from such a read lost the default declaration permanently.
    // Several fresh tables cover both branch orders.
    (1 to 4).foreach { _ =>
      withZone { zone =>
        val table = s"$zone/t"
        seed(table)
        val m = spark.read.format("graft").load(table)
          .schema("m").dataType
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        val d = m.fields.find(_.name == "d").get
        assert(d.metadata.contains(TxnTable.NestedDefaultSinceKey) &&
          d.metadata.contains("EXISTS_DEFAULT"),
          s"read schema must keep the nested default declaration: " +
            s"${d.metadata.json}")
      }
    }
  }

  test("clone of a FILE-LESS table with a nested default") {
    withZone { zone =>
      val table = s"$zone/src"
      seed(table)
      // TRUNCATE-shape overwrite: zero rows, zero files, default kept
      import org.apache.spark.sql.Row
      val cur = spark.read.format("graft").load(table).schema
      spark.createDataFrame(
          java.util.Collections.emptyList[Row](), cur)
        .write.format("graft").mode("overwrite").save(table)
      TxnTable.cloneDeep(spark, table, s"$zone/deep")
      assert(spark.read.format("graft").load(s"$zone/deep").count() == 0L)
      // the clone's appends still fill at the write gate
      TxnTable.commitAppend(
        Seq((9L, 90L)).toDF("id", "n")
          .select($"id", struct($"n").as("m")).coalesce(1), s"$zone/deep")
      val got = spark.read.format("graft").load(s"$zone/deep")
        .select($"id", $"m.d".as("d")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == Map(9L -> 7), got)
    }
  }
}
