package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.DedupOps
import graft.io.TxnTable

/** The incremental cross-batch dedup step (DedupOps.d47Ingest) on BOTH
  * of its probe spellings:
  *
  *   - broadcast probe (default): the batch's signatures broadcast into
  *     an inner join streaming the corpus-sized signature table out of
  *     its scan — zero Exchanges (REQUIREd inside the ingest);
  *   - bucketed-SPJ probe (batch too big to broadcast): the batch's
  *     signatures land in the same `bucket(16, h)` layout and the join
  *     runs storage-co-partitioned — zero Exchanges on either side
  *     without any broadcast (the k138 machinery).
  *
  * Both paths must delete exactly the cross-batch duplicates (docs
  * whose band key matches a strictly earlier doc) and never rewrite an
  * ingested data file. */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = Spec.spark
  import spark.implicits._

  private def docsOf(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "lang", "text")

  // fully-distinct texts (every token embeds the doc number, so no two
  // docs share a single 3-gram shingle — minhash bands can't collide)
  private def text(i: Long): String =
    (1 to 12).map(w => s"w${i}x$w").mkString(" ")

  private def runBoth(forceSpj: Boolean): Unit = {
    val zone = java.nio.file.Files
      .createTempDirectory("graft_incdedup").toFile.getAbsolutePath
    val confs =
      if (!forceSpj) Nil
      else Seq("graft.dedup.probeKeyLimit" -> "0",
        "graft.dedup.sigBroadcastLimit" -> "0")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val corpus = s"$zone/corpus"
      val sigs = s"$zone/sigs"
      // batch 1: docs 1..6, all unique
      val b1 = docsOf((1L to 6L).map(i => (i, "en", text(i))))
      DedupOps.d47Ingest(spark, corpus, sigs, b1, first = true,
        $"doc_id" <= 6L)
      // batch 2: docs 7..12 — 8 and 11 are EXACT copies of 2 and 4
      // (cross-batch dups), 9 and 10 are copies of each other
      // (in-batch dup: 10 loses), 7 and 12 unique
      val b2 = docsOf(Seq(
        (7L, "en", text(7)), (8L, "en", text(2)), (9L, "en", text(9)),
        (10L, "en", text(9)), (11L, "en", text(4)), (12L, "en", text(12))))
      val filesBefore = TxnTable.morState(spark, corpus,
        TxnTable.latestVersion(spark, corpus).get).files.toSet
      DedupOps.d47Ingest(spark, corpus, sigs, b2, first = false,
        $"doc_id" > 6L)
      if (forceSpj)
        // the SPJ path stages the batch's signatures as a bucketed
        // scratch table and must DELETE it once the probe materializes
        // — against a durable signature table it would otherwise leak
        // a full bucketed copy of every big batch
        assert(!new java.io.File(sigs + "_batch").exists(),
          "forced SPJ path must clean up its staged batch table")
      val filesAfter = TxnTable.morState(spark, corpus,
        TxnTable.latestVersion(spark, corpus).get).files.toSet
      assert(filesBefore.subsetOf(filesAfter),
        "incremental dedup must never rewrite an ingested file")
      val survivors = spark.read.format("graft").load(corpus)
        .select($"doc_id").as[Long].collect().toSeq.sorted
      assert(survivors == Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 9L, 12L),
        s"survivors: $survivors")
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(zone))
    }
  }

  test("broadcast probe path: cross-batch dups deleted, zero rewrites") {
    runBoth(forceSpj = false)
  }

  test("bucketed-SPJ probe path: same dedup without any broadcast") {
    runBoth(forceSpj = true)
  }

  test("a THROWING probe restores session confs and removes its scratch") {
    val zone = java.nio.file.Files
      .createTempDirectory("graft_incguard").toFile.getAbsolutePath
    val forced = Seq("graft.dedup.probeKeyLimit" -> "0",
      "graft.dedup.sigBroadcastLimit" -> "0")
    val prev = forced.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      forced.foreach { case (k, v) => spark.conf.set(k, v) }
      val corpus = s"$zone/corpus"
      val sigs = s"$zone/sigs"
      DedupOps.d47Ingest(spark, corpus, sigs,
        docsOf((1L to 6L).map(i => (i, "en", text(i)))),
        first = true, $"doc_id" <= 6L)
      val batch = (1L to 4L).map(i => (1, s"h$i")).toDF("b", "h")
      val bhjBefore = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
      // injected failure: an `out` column that exists on neither side
      // throws while the SPJ confs are flipped and the scratch staged
      intercept[Exception] {
        DedupOps.probePersisted(spark, sigs, batch,
          joinCols = Seq("b", "h"), out = Seq("no_such_column"),
          keyCol = "h", cat = "gtestspj")
      }
      assert(spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
        == bhjBefore, "autoBroadcastJoinThreshold must restore on throw")
      assert(spark.conf.getOption("spark.sql.catalog.gtestspj").isEmpty,
        "the probe's ad-hoc catalog registration must restore on throw")
      assert(!new java.io.File(sigs + "_batch").exists(),
        "the staged batch table must be removed on throw")
      // the session is still healthy: a correct probe right after works
      val (hits, _) = DedupOps.probePersisted(spark, sigs,
        spark.read.format("graft").load(sigs).limit(2),
        joinCols = Seq("b", "h"), out = Seq("doc_id"),
        keyCol = "h", cat = "gtestspj")
      assert(hits.count() == 2L)
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(zone))
    }
  }
}
