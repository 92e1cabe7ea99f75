package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.TxnTable

/** SHALLOW CLONE semantics beyond k124's end-to-end query: version-
  * pinned clones, the merge-on-read refusal, and the identifier-target
  * SQL spelling that registers a catalog table. */
class CloneSpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  private def withZone(f: String => Unit): Unit = {
    val zone = java.nio.file.Files.createTempDirectory("graft_clone").toFile
    try f(zone.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete(); ()
      }
      rm(zone)
    }
  }

  test("CREATE TABLE LIKE: structure only — schema, checks, props, spec") {
    withZone { zone =>
      import spark.implicits._
      val src = s"$zone/src"
      Seq.range(0L, 20L).map(k => (k, k * 1.0, k % 3))
        .toDF("id", "v", "g")
        .write.format("graft").option("statsCols", "id")
        .option("partitionBy", "g").mode("overwrite").save(src)
      TxnTable.addCheck(spark, src, "v_pos", "v >= 0")
      TxnTable.setProperties(spark, src, Map("team" -> "data"))
      TxnTable.setTag(spark, src, "rel1")
      val dst = s"$zone/empty_fork"
      spark.sql(s"CREATE TABLE '$dst' LIKE '$src'")
      // empty, same schema, constraints and props carried; the tag is
      // SOURCE-history policy and must not dangle on the fresh table
      assert(spark.read.format("graft").load(dst).count() == 0L)
      assert(TxnTable.snapshotSchema(spark, dst, 1L).get.fieldNames.toSeq
        == Seq("id", "v", "g"))
      assert(TxnTable.tableProperties(spark, dst) == Map("team" -> "data"))
      assert(TxnTable.tags(spark, dst).isEmpty)
      intercept[Exception] {
        Seq((1L, -5.0, 1L)).toDF("id", "v", "g")
          .write.format("graft").mode("append").save(dst)
      }
      // writes land under the carried PARTITION SPEC, and the source
      // is untouched
      Seq((1L, 5.0, 1L), (2L, 6.0, 2L)).toDF("id", "v", "g")
        .write.format("graft").mode("append").save(dst)
      assert(spark.read.format("graft").load(dst).count() == 2L)
      val parts = spark.sql(s"SHOW PARTITIONS '$dst'")
        .collect().map(_.getString(0)).toSet
      assert(parts.exists(_.contains("g=1")), parts)
      assert(spark.read.format("graft").load(src).count() == 20L)
    }
  }

  test("clone reads the source snapshot without copying data") {
    withZone { zone =>
      import spark.implicits._
      val src = s"$zone/src"
      TxnTable.commitOverwrite(
        Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v"),
        src, statsCols = Seq("id"))
      TxnTable.addCheck(spark, src, "v_pos", "v > 0") // policy travels
      TxnTable.cloneShallow(spark, src, s"$zone/fork")
      val fork = TxnTable.read(spark, s"$zone/fork")
      assert(fork.select(sum("v")).head().getDouble(0) == 60.0)
      // zero-copy: the fork dir holds one manifest + pointer, no parquet
      val local = new java.io.File(s"$zone/fork").listFiles().map(_.getName)
      assert(!local.exists(_.startsWith("w=")))
      // stats traveled: a range read on the clone still prunes
      assert(TxnTable.readRange(spark, s"$zone/fork", "id", 1.0, 1.0)
        ._1.count() == 1L)
      // constraints traveled and ENFORCE on the clone
      assert(intercept[IllegalArgumentException] {
        TxnTable.commitAppend(Seq((9L, -1.0)).toDF("id", "v"), s"$zone/fork")
      }.getMessage.contains("v_pos"))
    }
  }

  test("clone pins a time-traveled version") {
    withZone { zone =>
      import spark.implicits._
      val src = s"$zone/src"
      TxnTable.commitOverwrite(Seq((1L, 1.0)).toDF("id", "v"), src)
      TxnTable.commitAppend(Seq((2L, 2.0)).toDF("id", "v"), src)
      TxnTable.cloneShallow(spark, src, s"$zone/fork", version = Some(1L))
      assert(TxnTable.read(spark, s"$zone/fork").count() == 1L)
      assert(TxnTable.read(spark, src).count() == 2L)
    }
  }

  test("clone refuses a source with live merge-on-read deletes") {
    withZone { zone =>
      import spark.implicits._
      val src = s"$zone/src"
      TxnTable.commitOverwrite(
        Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"), src,
        statsCols = Seq("id"), mor = Some(true))
      TxnTable.deleteWhereMoR(spark, src, Seq("id"),
        df => df("id") === 1L)
      val e = intercept[IllegalArgumentException] {
        TxnTable.cloneShallow(spark, src, s"$zone/fork")
      }
      assert(e.getMessage.contains("OPTIMIZE"))
      // materializing the deletes unblocks the clone
      TxnTable.compactSmall(spark, src, smallBytes = 1L << 40)
      TxnTable.cloneShallow(spark, src, s"$zone/fork")
      assert(TxnTable.read(spark, s"$zone/fork").count() == 1L)
    }
  }

  test("SQL identifier clone registers a catalog graft table") {
    withZone { zone =>
      import spark.implicits._
      val src = s"$zone/src"
      TxnTable.commitOverwrite(
        Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"), src)
      spark.sql("DROP TABLE IF EXISTS clone_cat_t")
      spark.sql(s"CREATE TABLE clone_cat_t SHALLOW CLONE '$src'")
      try {
        assert(spark.table("clone_cat_t").count() == 2L)
        // it is a real graft table: DML and maintenance statements work
        spark.sql("DELETE FROM clone_cat_t WHERE id = 1")
        assert(spark.table("clone_cat_t").count() == 1L)
        assert(TxnTable.read(spark, src).count() == 2L) // source untouched
      } finally spark.sql("DROP TABLE clone_cat_t")
    }
  }

  test("DEEP CLONE materializes an independent full copy at a version") {
    withZone { zone =>
      import spark.implicits._
      val src = s"$zone/src"
      TxnTable.commitOverwrite(
        Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v"),
        src, statsCols = Seq("id"), bloomCols = Seq("id"))
      TxnTable.addCheck(spark, src, "v_pos", "v > 0")
      val v1 = TxnTable.latestVersion(spark, src).get
      TxnTable.commitAppend(Seq((4L, 40.0)).toDF("id", "v"), src)
      // pin the pre-append version: the clone sees 3 rows
      TxnTable.cloneDeep(spark, src, s"$zone/fork", Some(v1))
      val fork = s"$zone/fork"
      assert(TxnTable.read(spark, fork).select(sum("v")).head()
        .getDouble(0) == 60.0)
      // clone history starts fresh at v1
      assert(TxnTable.latestVersion(spark, fork).contains(1L))
      // MATERIALIZED: the fork holds its own parquet bytes
      assert(new java.io.File(fork).listFiles()
        .exists(f => f.isDirectory && f.getName.startsWith("w=")))
      // skipping metadata traveled verbatim: range read prunes, bloom
      // point lookup prunes
      val (rows, scanned, total) =
        TxnTable.readRange(spark, fork, "id", 1.0, 1.0)
      assert(rows.count() == 1L && scanned < total)
      // constraints travel and enforce
      assert(intercept[IllegalArgumentException] {
        TxnTable.commitAppend(Seq((9L, -1.0)).toDF("id", "v"), fork)
      }.getMessage.contains("v_pos"))
      // INDEPENDENT lifecycles: dropping the source leaves the clone
      // fully readable (the shallow clone's documented hazard, gone)
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete(); ()
      }
      rm(new java.io.File(src))
      assert(TxnTable.read(spark, fork).count() == 3L)
      // and the clone appends on its own from v1
      TxnTable.commitAppend(Seq((5L, 50.0)).toDF("id", "v"), fork)
      assert(TxnTable.read(spark, fork).count() == 4L)
    }
  }

  test("DEEP CLONE carries field-id mode: rename on the clone stays pure metadata") {
    withZone { zone =>
      import spark.implicits._
      import graft.io.FieldIds
      val src = s"$zone/src"
      TxnTable.commitOverwrite(
        TxnTable.withFieldIds(Seq((1, "x", 10L), (2, "y", 20L))
          .toDF("a", "b", "v")), src)
      val fork = s"$zone/fork"
      TxnTable.cloneDeep(spark, src, fork)
      // the clone's schema is id-stamped verbatim
      val s1 = TxnTable.snapshotSchema(spark, fork, 1L).get
      assert(FieldIds.hasIds(s1))
      // rename on the CLONE: no alias legs, copied files serve the new
      // name by id; the source is untouched
      TxnTable.renameColumn(spark, fork, "b", "label")
      assert(TxnTable.columnAliases(spark, fork).isEmpty)
      assert(TxnTable.read(spark, fork).orderBy("a")
        .select("a", "label").as[(Int, String)].collect().toSeq ==
        Seq((1, "x"), (2, "y")))
      assert(TxnTable.read(spark, src).columns.contains("b"))
      // appends into the clone keep stamping under the carried ids
      TxnTable.commitAppend(Seq((3, "z", 30L)).toDF("a", "label", "v"), fork)
      assert(TxnTable.read(spark, fork).orderBy("a")
        .select("a", "label", "v").as[(Int, String, Long)].collect().toSeq ==
        Seq((1, "x", 10L), (2, "y", 20L), (3, "z", 30L)))
    }
  }

  test("SQL DEEP CLONE spelling; refusal parity with shallow") {
    withZone { zone =>
      import spark.implicits._
      val src = s"$zone/src"
      TxnTable.commitOverwrite(
        Seq((1L, "a"), (2L, "b")).toDF("k", "s"), src)
      graft.functions.GraftExtensions.install(spark)
      spark.sql(s"CREATE TABLE '$zone/fork2' DEEP CLONE '$src'")
      assert(TxnTable.read(spark, s"$zone/fork2").count() == 2L)
      // live MoR deletes refuse (gates are source-history-relative)
      TxnTable.deleteWhereMoR(spark, src, Seq("k"), df => df("k") === 2L)
      val e = intercept[IllegalArgumentException] {
        TxnTable.cloneDeep(spark, src, s"$zone/fork3")
      }
      assert(e.getMessage.contains("OPTIMIZE"), e.getMessage)
    }
  }
}
