package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.TxnTable

/** The exactly-once positional delete (`deleteFromPosIdempotent`) —
  * the tombstone-drain primitive p94 rides. The property that matters
  * is NOT "replay matches nothing" (plain deleteFromPos already has
  * that): it is that a crash-replayed batch arriving AFTER matching
  * rows were lawfully re-admitted is recognized by its txn MARKER and
  * skipped entirely, where re-matching would erase the re-admission.
  * The marker commits atomically with the deletion vector, and a
  * zero-match batch still commits a marker-only version for the same
  * reason. */
class TombstoneSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark
  import spark.implicits._

  private def withTable(f: String => Unit): Unit = {
    val root =
      java.nio.file.Files.createTempDirectory("graft_tomb").toFile
    try f(s"${root.getAbsolutePath}/t")
    finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete(); ()
      }
      rm(root)
    }
  }

  private def keysOf(ids: Long*) = ids.toDF("k")

  test("a replayed batch is marker-skipped, not re-matched — " +
      "re-admitted rows survive the replay") {
    withTable { t =>
      (0L until 10L).map(k => (k, k)).toDF("k", "v")
        .write.format("graft").option("statsCols", "k")
        .option("mergeOnRead", "true").mode("overwrite").save(t)
      val v1 = TxnTable.deleteFromPosIdempotent(spark, t,
        keysOf(1L, 2L), Seq("k"), "tomb", 0L)
      assert(spark.read.format("graft").load(t)
        .filter($"k".isin(1L, 2L)).count() == 0)
      assert(TxnTable.lastCommittedBatch(spark, t, "tomb").contains(0L))
      // lawful re-admission of a previously tombstoned row
      TxnTable.commitAppend(Seq((1L, 100L)).toDF("k", "v"), t)
      // crash-replay of the SAME batch: the marker must decide — a
      // re-match would erase the re-admitted k=1
      val vBefore = TxnTable.latestVersion(spark, t).get
      val vReplay = TxnTable.deleteFromPosIdempotent(spark, t,
        keysOf(1L, 2L), Seq("k"), "tomb", 0L)
      assert(vReplay == vBefore,
        "a replayed batch must be a no-op return, not a new commit")
      assert(TxnTable.latestVersion(spark, t).get == vBefore)
      assert(spark.read.format("graft").load(t)
        .filter($"k" === 1L).count() == 1,
        s"the replay erased the re-admitted row (committed at $v1)")
    }
  }

  test("a zero-match batch still commits its marker — a later " +
      "admission then a replay must not be erased") {
    withTable { t =>
      (0L until 5L).map(k => (k, k)).toDF("k", "v")
        .write.format("graft").option("statsCols", "k")
        .option("mergeOnRead", "true").mode("overwrite").save(t)
      val v0 = TxnTable.latestVersion(spark, t).get
      // k=99 is not in the table: plain deleteFromPos would no-op
      // WITHOUT a trace; the idempotent flavor must leave the marker
      val v1 = TxnTable.deleteFromPosIdempotent(spark, t,
        keysOf(99L), Seq("k"), "tomb0", 0L)
      assert(v1 == v0 + 1, "zero-match must commit a marker-only version")
      assert(TxnTable.lastCommittedBatch(spark, t, "tomb0").contains(0L))
      assert(spark.read.format("graft").load(t).count() == 5)
      TxnTable.commitAppend(Seq((99L, 99L)).toDF("k", "v"), t)
      TxnTable.deleteFromPosIdempotent(spark, t,
        keysOf(99L), Seq("k"), "tomb0", 0L)
      assert(spark.read.format("graft").load(t)
        .filter($"k" === 99L).count() == 1,
        "the zero-match replay re-matched a later admission")
    }
  }

  test("batch ids apply monotonically; an older replay after a newer " +
      "batch is skipped") {
    withTable { t =>
      (0L until 10L).map(k => (k, k)).toDF("k", "v")
        .write.format("graft").option("statsCols", "k")
        .option("mergeOnRead", "true").mode("overwrite").save(t)
      TxnTable.deleteFromPosIdempotent(spark, t,
        keysOf(1L), Seq("k"), "tomb", 0L)
      TxnTable.deleteFromPosIdempotent(spark, t,
        keysOf(2L), Seq("k"), "tomb", 1L)
      assert(TxnTable.lastCommittedBatch(spark, t, "tomb").contains(1L))
      TxnTable.commitAppend(Seq((1L, 100L)).toDF("k", "v"), t)
      // a straggler replay of batch 0 after batch 1 applied
      TxnTable.deleteFromPosIdempotent(spark, t,
        keysOf(1L), Seq("k"), "tomb", 0L)
      assert(spark.read.format("graft").load(t)
        .filter($"k" === 1L).count() == 1,
        "a straggler older-batch replay re-matched")
      assert(TxnTable.lastCommittedBatch(spark, t, "tomb").contains(1L),
        "an older replay must not regress the marker")
    }
  }
}
