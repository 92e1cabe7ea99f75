package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.TxnTable

/** Positional-sidecar auto-coalesce: repeated in-place dedups / vector
  * deletes accumulate overlapping sidecars, and every vector-NAMED
  * file's scan task re-reads ALL applicable sidecars — k named files ×
  * s live vectors small-object GETs per stage. When the live count
  * reaches `graft.txn.posCoalesceAt` they merge into ONE sidecar:
  * metadata plus a kilobyte write, zero data-file rewrite, reads
  * byte-identical before/after (ordinalsFor already dedups overlapping
  * coordinates, so the distinct union is the proven semantics). */
class PosCoalesceSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark
  import spark.implicits._

  private def withZone(body: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_posco").toFile
    try body(s"${root.getAbsolutePath}/t")
    finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(root)
    }
  }

  private def state(table: String) =
    TxnTable.morState(spark, table,
      TxnTable.latestVersion(spark, table).get)

  private def posDels(table: String) =
    state(table).dels.filter(_.keyCols == Seq(TxnTable.PosDelKey))

  private def seed(table: String): Unit =
    Seq.range(0L, 100L).map(k => (k, k * 2L))
      .toDF("k", "v").repartitionByRange(4, $"k")
      .write.format("graft").option("statsCols", "k")
      .option("mergeOnRead", "true").mode("overwrite").save(table)

  test("explicit coalesce: N overlapping vectors -> 1 sidecar, reads equal") {
    withZone { table =>
      spark.conf.set("graft.txn.posCoalesceAt", "0") // manual mode
      try {
        seed(table)
        // coordinates captured ONCE so later vectors can genuinely
        // OVERLAP earlier ones (the compute path never re-records an
        // already-deleted row; explicit deletePositions does)
        val coords = TxnTable.readWithRowIdentity(spark, table)
          .select($"k", col(TxnTable.PosFileCol), col(TxnTable.PosOrdCol))
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        def coordDf(ks: Set[Long]) =
          coords.filter(c => ks.contains(c._1)).toSeq
            .map(c => (c._2, c._3))
            .toDF(TxnTable.PosFileCol, TxnTable.PosOrdCol)
        TxnTable.deletePositions(spark, table, coordDf(Set(0L, 1L, 2L, 3L, 4L)))
        TxnTable.deletePositions(spark, table, coordDf(Set(7L, 8L)))
        TxnTable.deletePositions(spark, table, coordDf(Set(7L, 8L, 9L)))
        TxnTable.deletePositions(spark, table, coordDf(Set(0L, 37L, 74L)))
        TxnTable.deletePositions(spark, table, coordDf(Set(95L)))
        assert(posDels(table).size == 5)
        val filesBefore = state(table).files.toSet
        val before = spark.read.format("graft").load(table)
          .as[(Long, Long)].collect().toSet
        val preV = TxnTable.latestVersion(spark, table).get

        val v = TxnTable.coalescePosVectors(spark, table)
        assert(v == preV + 1)
        val after = posDels(table)
        assert(after.size == 1, s"expected ONE merged vector, got $after")
        assert(state(table).files.toSet == filesBefore,
          "coalesce must rewrite zero data files")
        // distinct union: {0..4, 7, 8, 9, 37, 74, 95} = 11 coordinates
        // (7, 8 recorded twice, 0 twice — dedup'd by the merge)
        assert(after.head.rows == 11L, after.head)
        val got = spark.read.format("graft").load(table)
          .as[(Long, Long)].collect().toSet
        assert(got == before, "reads must be identical before/after")
        assert(got.size == 89 && !got.exists(_._1 == 7L))
        // metadata-only COUNT stays exact through the merged vector
        assert(spark.read.format("graft").load(table).count() == 89L)
        // time travel BELOW the coalesce still reads the old vectors
        assert(spark.read.format("graft")
          .option("versionAsOf", preV.toString).load(table)
          .count() == 89L)
        assert(spark.read.format("graft")
          .option("versionAsOf", (preV - 4).toString).load(table)
          .count() == 95L)
        // idempotent: a second coalesce is a no-op at the same version
        assert(TxnTable.coalescePosVectors(spark, table) == v)
        // vacuum keeps the MERGED sidecar (it is referenced by the
        // retained snapshot like any delete file) and reclaims the five
        // superseded ones once their manifests drop
        val mergedFile = after.head.file
        TxnTable.vacuum(spark, table, keep = 0, retainMs = 0L)
        assert(new java.io.File(s"$table/$mergedFile").exists(),
          "vacuum must keep the live merged sidecar")
        assert(spark.read.format("graft").load(table).count() == 89L,
          "reads must survive vacuum after coalesce")
      } finally spark.conf.unset("graft.txn.posCoalesceAt")
    }
  }

  test("gate-dead vectors sweep out, even with fewer than 2 live ones") {
    withZone { table =>
      spark.conf.set("graft.txn.posCoalesceAt", "0")
      try {
        seed(table)
        TxnTable.deleteWherePos(spark, table, df => df("k") === 1L)
        // partial NON-checkpoint compaction rewrites every file the
        // vector names (the delete materializes into the replacements);
        // the delta manifest carries the entry forward — now gate-DEAD:
        // it names only rewritten-away files and, since add versions
        // only grow past its gate, can never apply again. Before the
        // sweep it would ride every future manifest forever.
        TxnTable.compactSmall(spark, table, smallBytes = Long.MaxValue,
          targetFiles = 2, checkpoint = false)
        val s = state(table)
        val pos = posDels(table)
        assert(pos.size == 1, pos)
        assert(!pos.exists(d => s.files.exists(f =>
            d.gates(f, s.addv.getOrElse(f, 0L)))),
          "setup: the carried vector must be gate-dead after the rewrite")
        val before = spark.read.format("graft").load(table)
          .as[(Long, Long)].collect().toSet
        assert(before.size == 99)
        val preV = TxnTable.latestVersion(spark, table).get
        // a pure sweep: no sidecar written, one full-manifest commit
        val v = TxnTable.coalescePosVectors(spark, table)
        assert(v == preV + 1)
        assert(posDels(table).isEmpty, s"dead vector must drop: ${posDels(table)}")
        val got = spark.read.format("graft").load(table)
          .as[(Long, Long)].collect().toSet
        assert(got == before, "reads identical across the sweep")
        // and the sweep is idempotent
        assert(TxnTable.coalescePosVectors(spark, table) == v)
        // a dead entry alongside live ones drops in the same MERGE commit
        TxnTable.deleteWherePos(spark, table, df => df("k") === 2L)
        TxnTable.deleteWherePos(spark, table, df => df("k") === 3L)
        TxnTable.compactSmall(spark, table, smallBytes = Long.MaxValue,
          targetFiles = 2, checkpoint = false) // both vectors now dead
        TxnTable.deleteWherePos(spark, table, df => df("k") === 4L)
        TxnTable.deleteWherePos(spark, table, df => df("k") === 5L)
        assert(posDels(table).size == 4) // 2 dead + 2 live
        TxnTable.coalescePosVectors(spark, table)
        val merged = posDels(table)
        assert(merged.size == 1 && merged.head.rows == 2L, merged)
        assert(spark.read.format("graft").load(table).count() == 95L)
      } finally spark.conf.unset("graft.txn.posCoalesceAt")
    }
  }

  test("the change feed classifies a coalesce commit as a no-change op") {
    withZone { table =>
      spark.conf.set("graft.txn.posCoalesceAt", "0")
      try {
        seed(table)
        TxnTable.deleteWherePos(spark, table, df => df("k") === 1L)
        TxnTable.deleteWherePos(spark, table, df => df("k") === 2L)
        val v = TxnTable.coalescePosVectors(spark, table)
        // the coalesce version contributes ZERO feed rows; the deletes
        // below it still replay positionally
        val feed = TxnTable.changeFeed(spark, table, 1L)
          .select($"k", $"_change_type", $"_commit_version").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
        assert(feed == Set((1L, "delete", v - 2), (2L, "delete", v - 1)),
          feed)
        assert(!feed.exists(_._3 == v))
      } finally spark.conf.unset("graft.txn.posCoalesceAt")
    }
  }

  test("pushed filters stay correct through the COLUMNAR vector path") {
    withZone { table =>
      spark.conf.set("graft.txn.posCoalesceAt", "0")
      try {
        seed(table)
        TxnTable.deleteWherePos(spark, table,
          df => df("k") >= 40L && df("k") < 60L)
        // range filter pushed into the vec-gated scan: row-index
        // generation must stay exact under row-group/page skipping
        val q = spark.read.format("graft").load(table)
          .where($"k" >= 30L && $"k" < 80L)
        assert(q.count() == 30L) // 30..39 ++ 60..79
        val got = q.select($"k").as[Long].collect().sorted.toSeq
        assert(got == ((30L until 40L) ++ (60L until 80L)).toSeq, got)
        q.collect()
        assert(q.queryExecution.executedPlan.toString
          .contains("ColumnarToRow"), "filtered vec scan stays columnar")
      } finally spark.conf.unset("graft.txn.posCoalesceAt")
    }
  }

  test("auto-coalesce fires when live vectors reach the threshold") {
    withZone { table =>
      spark.conf.set("graft.txn.posCoalesceAt", "3")
      try {
        seed(table)
        TxnTable.deleteWherePos(spark, table, df => df("k") === 1L)
        TxnTable.deleteWherePos(spark, table, df => df("k") === 2L)
        assert(posDels(table).size == 2, "below threshold: untouched")
        TxnTable.deleteWherePos(spark, table, df => df("k") === 3L)
        val d = posDels(table)
        assert(d.size == 1, s"threshold hit: auto-merged, got $d")
        assert(d.head.rows == 3L)
        assert(spark.read.format("graft").load(table).count() == 97L)
        // updates' vectors count too
        TxnTable.updateWherePos(spark, table,
          df => df("k") === 10L, Map("v" -> lit(1000L)))
        TxnTable.updateWherePos(spark, table,
          df => df("k") === 11L, Map("v" -> lit(1001L)))
        val d2 = posDels(table)
        assert(d2.size == 1, s"auto-merged again at 3, got $d2")
        assert(d2.head.rows == 5L)
        val m = spark.read.format("graft").load(table)
          .where($"k".isin(10L, 11L)).as[(Long, Long)].collect().toSet
        assert(m == Set((10L, 1000L), (11L, 1001L)), m)
        assert(spark.read.format("graft").load(table).count() == 97L)
      } finally spark.conf.unset("graft.txn.posCoalesceAt")
    }
  }
}
