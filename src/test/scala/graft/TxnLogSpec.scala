package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.TxnTable

/** Commit-log point lookups must stay O(log history), never
  * O(directory): `versionAt` binary-searches the `#ts=` commit
  * timestamps recorded in the manifests, `versions` derives the
  * contiguous retained range from the pointer probe plus a floor
  * search. A years-old table with hundreds of thousands of commits
  * pays a handful of small reads per lookup, not a directory listing. */
class TxnLogSpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  private def withZone(f: String => Unit): Unit = {
    val zone = java.nio.file.Files.createTempDirectory("graft_txnlog").toFile
    try f(zone.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete(); ()
      }
      rm(zone)
    }
  }

  test("versionAt: recorded #ts binary search is correct and O(log commits)") {
    import spark.implicits._
    withZone { zone =>
      val table = s"$zone/t"
      val n = 24
      // one tiny commit per version, wall clock sampled AFTER each —
      // versionAt(tsAfter(v)) must return exactly v
      val tsAfter = (1 to n).map { i =>
        TxnTable.commitAppend(Seq((i.toLong, i)).toDF("id", "v"), table)
        Thread.sleep(3)
        System.currentTimeMillis()
      }
      (1 to n).foreach { v =>
        assert(TxnTable.versionAt(spark, table, tsAfter(v - 1)).contains(v.toLong),
          s"versionAt after commit $v")
      }
      // before the first commit: nothing to travel to
      assert(TxnTable.versionAt(spark, table, tsAfter.head - 3600000L).isEmpty)
      // bounded: a point lookup issues O(log n) manifest reads, not one
      // per commit (log2(24) ~ 5 #ts reads + the pointer hint)
      val before = TxnTable.metaReads.get()
      TxnTable.versionAt(spark, table, tsAfter(n / 2))
      val reads = TxnTable.metaReads.get() - before
      assert(reads <= 12, s"versionAt issued $reads meta reads for $n commits")
    }
  }

  test("versions: contiguous retained range from pointer + floor search") {
    import spark.implicits._
    withZone { zone =>
      val table = s"$zone/t"
      val n = 15
      (1 to n).foreach { i =>
        TxnTable.commitAppend(Seq((i.toLong, i)).toDF("id", "v"), table)
      }
      assert(TxnTable.versions(spark, table) == (1L to n.toLong))
      // vacuum drops a prefix (floor extends down to the retained
      // chain's checkpoint base); versions must report exactly the
      // manifests that still exist
      TxnTable.vacuum(spark, table, keep = 2)
      val reported = TxnTable.versions(spark, table)
      val onDisk = (1 to n).map(_.toLong).filter { v =>
        new java.io.File(f"$table/_v$v%05d.manifest").exists()
      }
      assert(reported == onDisk, s"versions $reported vs on-disk $onDisk")
      assert(reported.last == n.toLong)
      // history (one row per retained snapshot) still works off it
      assert(TxnTable.history(spark, table).count() == reported.size.toLong)
    }
  }
}
