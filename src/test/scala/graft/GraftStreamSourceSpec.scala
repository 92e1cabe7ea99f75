package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.io.{Tables, TxnTable}

/** DSv2 streaming source over the TxnTable commit log: versions are
  * offsets, microbatches read file deltas, checkpoints make restarts
  * exactly-once, and non-append history fails loudly. */
class GraftStreamSourceSpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  private def withZone(f: String => Unit): Unit = {
    val zone = java.nio.file.Files.createTempDirectory("graft_streamsrc").toFile
    try f(zone.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete(); ()
      }
      rm(zone)
    }
  }

  /** Drain the graft stream into an output TxnTable via foreachBatch +
    * idempotent commit, tagging rows with `drain`. Returns row count
    * committed by THIS drain. */
  private def drain(src: String, out: String, cp: String, id: Int): Long = {
    val before = TxnTable.latestVersion(spark, out)
      .map(v => TxnTable.read(spark, out).count()).getOrElse(0L)
    val q = spark.readStream.format("graft").load(src)
      .writeStream
      .option("checkpointLocation", cp)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          TxnTable.commitAppendIdempotent(
            batch.withColumn("drain", lit(id)), out, "stream-src-spec", batchId); ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    TxnTable.latestVersion(spark, out)
      .map(v => TxnTable.read(spark, out).count()).getOrElse(0L) - before
  }

  test("incremental drains: each run reads only the versions committed since") {
    import spark.implicits._
    withZone { zone =>
      val src = s"$zone/src"
      val out = s"$zone/out"
      val cp = s"$zone/cp"
      val docs = Tables.documents(spark, Spec.sf001).select($"doc_id", $"n_chars")
      val half1 = docs.filter($"doc_id" % 2 === 0)
      val half2 = docs.filter($"doc_id" % 2 === 1)
      TxnTable.commitOverwrite(half1, src)
      assert(drain(src, out, cp, 1) == half1.count())
      // nothing new: the checkpointed offset stops a re-run at zero rows
      assert(drain(src, out, cp, 2) == 0L)
      // append lands; the next run reads ONLY the delta
      TxnTable.commitAppend(half2, src)
      assert(drain(src, out, cp, 3) == half2.count())
      val byDrain = TxnTable.read(spark, out)
        .groupBy($"drain").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(byDrain == Map(1 -> half1.count(), 3 -> half2.count()))
    }
  }

  test("column pruning and filters flow into the streamed batches") {
    import spark.implicits._
    withZone { zone =>
      val src = s"$zone/src"
      val docs = Tables.documents(spark, Spec.sf001).select($"doc_id", $"n_chars")
      TxnTable.commitOverwrite(docs, src)
      val unique = s"streamsrc_${System.nanoTime()}"
      val q = spark.readStream.format("graft").load(src)
        .filter($"doc_id" < 100).select($"doc_id")
        .writeStream.format("memory").queryName(unique)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table(unique)
      assert(got.columns.toSeq == Seq("doc_id"))
      assert(got.count() == docs.filter($"doc_id" < 100).count())
    }
  }

  test("maxVersionsPerTrigger bounds each microbatch to N commits of backlog") {
    import spark.implicits._
    withZone { zone =>
      val src = s"$zone/src"
      // 3-commit backlog before the stream ever starts
      (1 to 3).foreach { i =>
        TxnTable.commitAppend(
          Seq.tabulate(10)(j => (i * 100L + j, i)).toDF("id", "commit_no"), src)
      }
      var batches = List.empty[Long]
      val q = spark.readStream.format("graft")
        .option("maxVersionsPerTrigger", "1").load(src)
        .writeStream
        .option("checkpointLocation", s"$zone/cp")
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            batches = batches :+ batch.count(); ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // the backlog drains as THREE bounded batches, not one big one
      assert(batches == List(10L, 10L, 10L),
        s"expected 3 batches of 10, got $batches")
    }
  }

  test("startingVersion / startingTimestamp pick up mid-history") {
    import spark.implicits._
    withZone { zone =>
      val src = s"$zone/src"
      (1 to 3).foreach { i =>
        TxnTable.commitAppend(
          Seq.tabulate(10)(j => (i * 100L + j, i)).toDF("id", "commit_no"), src)
      }
      def drain(opts: Map[String, String], cp: String): Long = {
        var n = 0L
        var r = spark.readStream.format("graft")
        opts.foreach { case (k, v) => r = r.option(k, v) }
        val q = r.load(src).writeStream
          .option("checkpointLocation", s"$zone/$cp")
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             _: Long) => n += batch.count(); ()
          }
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        n
      }
      // startingVersion is exclusive: skip the first two commits
      assert(drain(Map("startingVersion" -> "2"), "cp_v") == 10L)
      // startingTimestamp: at-or-after v3's recorded wall clock
      val log = TxnTable.commitLog(spark, src)
      val v2ts = log.find(_.version == 2L).get.tsMillis
      val v3ts = log.find(_.version == 3L).get.tsMillis
      if (v3ts > v2ts) // same-millisecond commits can't be split
        assert(drain(Map("startingTimestamp" -> v3ts.toString), "cp_t") == 10L)
    }
  }

  /** Same drain but with the skipChangeCommits escape hatch set. */
  private def drainSkip(src: String, out: String, cp: String, id: Int): Long = {
    val before = TxnTable.latestVersion(spark, out)
      .map(v => TxnTable.read(spark, out).count()).getOrElse(0L)
    val q = spark.readStream.format("graft")
      .option("skipChangeCommits", "true").load(src)
      .writeStream
      .option("checkpointLocation", cp)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          TxnTable.commitAppendIdempotent(
            batch.withColumn("drain", lit(id)), out, "stream-skip-spec", batchId); ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    TxnTable.latestVersion(spark, out)
      .map(v => TxnTable.read(spark, out).count()).getOrElse(0L) - before
  }

  test("skipChangeCommits streams past a compaction: rewrites skipped, appends flow") {
    import spark.implicits._
    withZone { zone =>
      val src = s"$zone/src"
      val out = s"$zone/out"
      val cp = s"$zone/cp"
      val docs = Tables.documents(spark, Spec.sf001).select($"doc_id", $"n_chars")
      val a = docs.filter($"doc_id" % 3 === 0)
      val b = docs.filter($"doc_id" % 3 === 1)
      val c = docs.filter($"doc_id" % 3 === 2)
      TxnTable.commitAppend(a, src)
      TxnTable.commitAppend(b, src)
      assert(drainSkip(src, out, cp, 1) == a.count() + b.count())
      // routine maintenance: pack both small files into one rewrite
      TxnTable.compactSmall(spark, src, smallBytes = 1L << 40)
      TxnTable.commitAppend(c, src)
      // the compaction commit is skipped ENTIRELY; only the append streams
      assert(drainSkip(src, out, cp, 2) == c.count())
      // exactly-once end to end: no row delivered twice
      val outDf = TxnTable.read(spark, out)
      assert(outDf.count() == docs.count())
      assert(outDf.select($"doc_id").distinct().count() == docs.count())
    }
  }

  test("skipChangeCommits classifies a full-manifest overwrite as a change commit") {
    import spark.implicits._
    withZone { zone =>
      val src = s"$zone/src"
      val out = s"$zone/out"
      val cp = s"$zone/cp"
      val docs = Tables.documents(spark, Spec.sf001).select($"doc_id", $"n_chars")
      TxnTable.commitAppend(docs.filter($"doc_id" < 100), src)
      assert(drainSkip(src, out, cp, 1) > 0L)
      // an overwrite writes a FULL manifest (no +/- lines): the skip
      // walk must still detect the removal by diffing snapshots and
      // skip it, then deliver the later pure append
      TxnTable.commitOverwrite(docs.filter($"doc_id" < 50), src)
      val late = docs.filter($"doc_id" >= 200 && $"doc_id" < 230)
      TxnTable.commitAppend(late, src)
      assert(drainSkip(src, out, cp, 2) == late.count())
    }
  }

  test("positional-vector commit in-stream: loud without skip, skipped with it") {
    import spark.implicits._
    withZone { zone =>
      val src = s"$zone/src"
      val docs = Tables.documents(spark, Spec.sf001)
        .select($"doc_id", $"n_chars")
      TxnTable.commitAppend(docs.filter($"doc_id" < 100), src)
      assert(drain(src, s"$zone/out1", s"$zone/cp1", 1) == 100L)
      // a positional delete removes ROWS without removing files — a
      // file-set diff would misread the range as pure addition, so the
      // default stream must refuse exactly like it does for rewrites
      TxnTable.deleteWherePos(spark, src, df => df("doc_id") < 10)
      val late = docs.filter($"doc_id" >= 200 && $"doc_id" < 230)
      TxnTable.commitAppend(late, src)
      val ex = intercept[Exception] { drain(src, s"$zone/out1", s"$zone/cp1", 2) }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).map(t => Option(t.getMessage).getOrElse(""))
        .exists(_.contains("merge-on-read deletes")), ex.getMessage)
      // with the escape hatch the delete commit is skipped entirely and
      // the later append flows
      assert(drainSkip(src, s"$zone/out2", s"$zone/cp2", 1) == 100L + late.count())
    }
  }

  test("non-append history between offsets fails loudly, not wrongly") {
    import spark.implicits._
    withZone { zone =>
      val src = s"$zone/src"
      val out = s"$zone/out"
      val cp = s"$zone/cp"
      val docs = Tables.documents(spark, Spec.sf001).select($"doc_id", $"n_chars")
      TxnTable.commitOverwrite(docs.filter($"doc_id" < 100), src)
      assert(drain(src, out, cp, 1) > 0L)
      // an overwrite rewrites history: the file-set delta is no longer
      // pure addition and the stream must refuse to misread it
      TxnTable.commitOverwrite(docs, src)
      val ex = intercept[Exception] {
        drain(src, out, cp, 2)
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).exists(_.getMessage != null) &&
        causes(ex).map(t => Option(t.getMessage).getOrElse(""))
          .exists(_.contains("not append-only")))
    }
  }
}
