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
}
