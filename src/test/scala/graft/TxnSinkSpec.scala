package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.{Tables, TxnTable}

/** TxnTable commit-protocol contracts: atomic visibility, append commits,
  * time travel, orphan tolerance, reference-counted vacuum, compaction. */
class TxnSinkSpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  private def withZone(f: String => Unit): Unit = {
    val zone = java.nio.file.Files.createTempDirectory("graft_txnspec")
      .toFile
    try f(s"${zone.getAbsolutePath}/t")
    finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete(); ()
      }
      rm(zone)
    }
  }

  test("commit flips the visible snapshot; superseded versions stay intact") {
    import spark.implicits._
    withZone { table =>
      val cust = Tables.customer(spark, Spec.sf0001)
      assert(TxnTable.latestVersion(spark, table).isEmpty)
      val v1 = TxnTable.commitOverwrite(cust.filter($"c_custkey" <= 10), table)
      assert(v1 == 1L && TxnTable.latestVersion(spark, table).contains(1L))
      assert(TxnTable.read(spark, table).count() ==
        cust.filter($"c_custkey" <= 10).count())
      val v2 = TxnTable.commitOverwrite(cust, table)
      assert(v2 == 2L)
      assert(TxnTable.read(spark, table).count() == cust.count())
      // time travel: v1 still reads its original content
      assert(TxnTable.readVersion(spark, table, 1).count() ==
        cust.filter($"c_custkey" <= 10).count())
    }
  }

  test("append commits accumulate without rewriting prior data") {
    import spark.implicits._
    withZone { table =>
      val cust = Tables.customer(spark, Spec.sf0001)
        .select($"c_custkey", $"c_acctbal")
      val n = cust.count()
      TxnTable.commitAppend(cust.filter($"c_custkey" % 2 === 0), table)
      TxnTable.commitAppend(cust.filter($"c_custkey" % 2 === 1), table)
      assert(TxnTable.read(spark, table).count() == n)
      // v1 time travel shows only the first batch
      assert(TxnTable.readVersion(spark, table, 1).count() ==
        cust.filter($"c_custkey" % 2 === 0).count())
      // v2's manifest references v1's files — appends rewrote nothing
      val v1Files = new java.io.File(s"$table/v=1")
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(v1Files > 0)
    }
  }

  test("a writer dying before the pointer flip leaves readers untouched") {
    import spark.implicits._
    withZone { table =>
      val cust = Tables.customer(spark, Spec.sf0001)
      TxnTable.commitOverwrite(cust.filter($"c_custkey" <= 10), table)
      // simulate the crash: data for v=2 fully written, no manifest/commit
      cust.write.parquet(s"$table/v=2")
      assert(TxnTable.latestVersion(spark, table).contains(1L))
      assert(TxnTable.read(spark, table).count() ==
        cust.filter($"c_custkey" <= 10).count())
      // the orphan is invisible even to the version listing …
      assert(TxnTable.versions(spark, table) == Seq(1L))
      // … and the next committer takes the slot, clobbering the orphan
      val v = TxnTable.commitOverwrite(cust, table)
      assert(v == 2L)
      assert(TxnTable.read(spark, table).count() == cust.count())
    }
  }

  test("vacuum is reference-counted: append-shared files survive") {
    import spark.implicits._
    withZone { table =>
      val cust = Tables.customer(spark, Spec.sf0001)
        .select($"c_custkey", $"c_acctbal")
      TxnTable.commitAppend(cust.filter($"c_custkey" % 2 === 0), table)
      TxnTable.commitAppend(cust.filter($"c_custkey" % 2 === 1), table)
      // v2 (latest) references v1's files, so vacuum must NOT delete them
      TxnTable.vacuum(spark, table)
      assert(TxnTable.versions(spark, table) == Seq(2L))
      assert(TxnTable.read(spark, table).count() == cust.count())
      // overwrite commit orphans all earlier files; vacuum reclaims them
      TxnTable.commitOverwrite(cust.filter($"c_custkey" <= 5), table)
      TxnTable.vacuum(spark, table)
      assert(TxnTable.versions(spark, table) == Seq(3L))
      assert(!new java.io.File(s"$table/v=1").exists())
      assert(TxnTable.read(spark, table).count() ==
        cust.filter($"c_custkey" <= 5).count())
    }
  }

  test("compact rewrites the snapshot into fewer files without changing rows") {
    import spark.implicits._
    withZone { table =>
      val cust = Tables.customer(spark, Spec.sf0001)
      TxnTable.commitOverwrite(cust.repartition(8), table)
      val before = new java.io.File(s"$table/v=1")
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(before > 1)
      val v = TxnTable.compact(spark, table)
      assert(v == 2L && TxnTable.latestVersion(spark, table).contains(2L))
      val after = new java.io.File(s"$table/v=2")
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(after == 1)
      assert(TxnTable.read(spark, table).count() == cust.count())
      TxnTable.vacuum(spark, table)
      assert(TxnTable.versions(spark, table) == Seq(2L))
    }
  }
}
