package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.{Tables, TxnTable}

/** TxnTable commit-protocol contracts: atomic visibility, time travel,
  * orphan tolerance, vacuum retention. */
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

  test("a writer dying before the pointer flip leaves readers untouched") {
    import spark.implicits._
    withZone { table =>
      val cust = Tables.customer(spark, Spec.sf0001)
      TxnTable.commitOverwrite(cust.filter($"c_custkey" <= 10), table)
      // simulate the crash: snapshot dir v=2 fully written, no commit
      cust.write.parquet(s"$table/v=2")
      assert(TxnTable.latestVersion(spark, table).contains(1L))
      assert(TxnTable.read(spark, table).count() ==
        cust.filter($"c_custkey" <= 10).count())
      // the orphan is visible to maintenance, not to readers
      assert(TxnTable.versions(spark, table) == Seq(1L, 2L))
      // a later writer's commit simply takes the next slot after the
      // orphan is overwritten by its own full write
      TxnTable.commitPointer(spark, table, 2L)
      assert(TxnTable.read(spark, table).count() == cust.count())
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
      // old fragments reclaimed on demand
      TxnTable.vacuum(spark, table)
      assert(TxnTable.versions(spark, table) == Seq(2L))
    }
  }

  test("vacuum drops superseded snapshots and keeps the committed one") {
    import spark.implicits._
    withZone { table =>
      val cust = Tables.customer(spark, Spec.sf0001)
      (1 to 3).foreach(i =>
        TxnTable.commitOverwrite(cust.filter($"c_custkey" <= i * 10), table))
      assert(TxnTable.versions(spark, table) == Seq(1L, 2L, 3L))
      TxnTable.vacuum(spark, table)
      assert(TxnTable.versions(spark, table) == Seq(3L))
      assert(TxnTable.read(spark, table).count() ==
        cust.filter($"c_custkey" <= 30).count())
      // keep=1 retains one extra superseded version
      TxnTable.commitOverwrite(cust, table)
      TxnTable.vacuum(spark, table, keep = 1)
      assert(TxnTable.versions(spark, table) == Seq(3L, 4L))
    }
  }
}
