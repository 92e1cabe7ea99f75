package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.io.TxnTable

/** The commit fast path (driver-side parquet-footer stats,
  * TxnTable.footerStats) must be OBSERVATIONALLY IDENTICAL to the
  * distributed stats read-back it bypasses: same per-file min/max/null
  * stats (the metadata MIN/MAX pushdown reads them as exact values),
  * same row counts, same null-kind proofs. Each case commits the same
  * frame twice — fast path enabled vs disabled via
  * `graft.stats.footerFastPath` — and compares the manifests
  * stat-for-stat. */
class FooterStatsSpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  private def withZone(f: String => Unit): Unit = {
    val zone =
      java.nio.file.Files.createTempDirectory("graft_footer").toFile
    try f(zone.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete(); ()
      }
      rm(zone)
    }
  }

  /** Commit `df` twice (fast on / fast off) and return the two
    * manifests' (per-file sorted stats, row count) multisets, aligned
    * by part-file ordinal (same frame → same task layout → same file
    * ordering by name). Also returns the Spark job counts each commit
    * scheduled, to prove the fast path actually skipped a job. */
  private def both(zone: String, df: DataFrame, statsCols: Seq[String])
      : (Seq[(Seq[TxnTable.FileStat], Long)],
         Seq[(Seq[TxnTable.FileStat], Long)], Int, Int) = {
    // incremented from the listener-bus thread, reset/read from the
    // test thread — atomic, or the jFast < jSlow proof can go flaky
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    def run(table: String, knob: String): (Seq[(Seq[TxnTable.FileStat], Long)], Int) = {
      spark.conf.set("graft.stats.footerFastPath", knob)
      try {
        spark.sparkContext.addSparkListener(listener)
        jobs.set(0)
        val v = TxnTable.commitOverwrite(df, table, statsCols = statsCols)
        org.apache.spark.sql.GraftBridge.waitListenerBus(spark)
        val n = jobs.get()
        spark.sparkContext.removeSparkListener(listener)
        val stats = TxnTable.fileStats(spark, table, v)
        val rows = TxnTable.fileRows(spark, table, v)
        val keys = rows.keys.toSeq.sorted // part ordinal order
        (keys.map(k =>
          (stats.getOrElse(k, Nil).sortBy(_.col), rows(k))), n)
      } finally spark.conf.unset("graft.stats.footerFastPath")
    }
    val (fast, jFast) = run(s"$zone/fast", "true")
    val (slow, jSlow) = run(s"$zone/slow", "false")
    (fast, slow, jFast, jSlow)
  }

  test("footer stats equal the distributed read-back on integral/bool/" +
      "date columns with nulls, and skip the read-back job") {
    import spark.implicits._
    withZone { zone =>
      val df = spark.range(0, 1000, 1, 3).select(
        $"id",
        ($"id" % 127).cast("int").as("i"),
        when($"id" % 7 === 0, lit(null)).otherwise($"id" % 31)
          .cast("short").as("s"),
        ($"id" % 2 === 0).as("b"),
        when($"id" % 11 === 0, lit(null))
          .otherwise(date_add(lit("2021-03-01").cast("date"),
            ($"id" % 365).cast("int"))).as("d"),
        lit(null).cast("long").as("allnull"),
        concat(lit("txt"), $"id").as("t"))
      val (fast, slow, jFast, jSlow) =
        both(zone, df, Seq("id", "i", "s", "b", "d", "allnull"))
      assert(fast == slow, s"\nfast=$fast\nslow=$slow")
      // the proof the fast path ENGAGED: one job (the write) vs the
      // write plus the distributed stats pass
      assert(jFast < jSlow, s"fast=$jFast slow=$jSlow jobs")
      // and the stats are the real thing: min/max of `id` per 3-split
      // range partitions, all-null proof recorded
      assert(fast.flatMap(_._1).exists(s => s.col == "allnull" &&
        s.kind == "null"))
      assert(fast.map(_._2).sum == 1000L)
    }
  }

  test("ineligible stats columns (string, double-with-NaN, timestamp) " +
      "fall back to the distributed pass with identical results") {
    import spark.implicits._
    withZone { zone =>
      val df = spark.range(0, 200, 1, 2).select(
        $"id",
        concat(lit("k"), lpad($"id".cast("string"), 5, "0")).as("str"),
        when($"id" === 13, lit(Double.NaN))
          .otherwise($"id".cast("double") / 3.0).as("dbl"),
        timestamp_seconds($"id" * 1000).as("ts"))
      val (fast, slow, _, _) =
        both(zone, df, Seq("id", "str", "dbl", "ts"))
      assert(fast == slow, s"\nfast=$fast\nslow=$slow")
      // Spark ranks NaN above every double: the max stat must be NaN,
      // which parquet footers cannot represent — pinning WHY doubles
      // are ineligible for the footer path
      assert(fast.flatMap(_._1).exists(s =>
        s.col == "dbl" && s.maxV == "NaN"))
    }
  }

  test("columns differing only in case bind case-sensitively on the " +
      "fast path — V's footer stats can never serve as v's") {
    import spark.implicits._
    withZone { zone =>
      spark.conf.set("spark.sql.caseSensitive", "true")
      try {
        // V FIRST in schema order: a lowercase-folded find() would bind
        // V's chunk for the tracked column v and record disjoint-range
        // stats (100..110) as v's EXACT min/max — the fast/slow compare
        // catches exactly that
        val df = spark.range(0, 100, 1, 2).select(
          $"id",
          ($"id" % 11 + 100).cast("int").as("V"),
          ($"id" % 7).cast("int").as("v"))
        val (fast, slow, _, _) = both(zone, df, Seq("v"))
        assert(fast == slow, s"\nfast=$fast\nslow=$slow")
        assert(fast.flatMap(_._1).filter(_.col == "v")
            .forall(s => s.maxV.toDouble < 7.0),
          s"v's stats must come from v's chunk, not V's: $fast")
      } finally spark.conf.unset("spark.sql.caseSensitive")
    }
  }

  test("nested dotted stats columns ride the footer path with parity") {
    import spark.implicits._
    withZone { zone =>
      val df = spark.range(0, 300, 1, 2).select(
        $"id",
        struct(($"id" * 2).as("n"),
          when($"id" % 5 === 0, lit(null)).otherwise($"id" % 17)
            .cast("int").as("m")).as("meta"))
      val (fast, slow, jFast, jSlow) =
        both(zone, df, Seq("id", "meta.n", "meta.m"))
      assert(fast == slow, s"\nfast=$fast\nslow=$slow")
      assert(jFast < jSlow)
    }
  }

  test("empty frames and single-row commits agree") {
    import spark.implicits._
    withZone { zone =>
      val empty = spark.range(0).select($"id")
      val (f0, s0, _, _) = both(s"$zone/e", empty, Seq("id"))
      assert(f0 == s0)
      assert(f0.forall(_._2 == 0L))
      val one = spark.range(41, 42).select($"id")
      val (f1, s1, _, _) = both(s"$zone/o", one, Seq("id"))
      assert(f1 == s1)
      assert(f1.flatMap(_._1).exists(s =>
        s.col == "id" && s.minV == "41.0" && s.maxV == "41.0"))
    }
  }

  test("fast-path stats drive pruning and metadata aggregates exactly " +
      "like read-back stats") {
    import spark.implicits._
    withZone { zone =>
      val t = s"$zone/t"
      spark.range(0, 10000, 1, 8)
        .select($"id", ($"id" % 100).as("g"))
        .write.format("graft").option("statsCols", "id,g")
        .mode("overwrite").save(t)
      // point predicate prunes to the one 1250-row range split
      val hit = spark.read.format("graft").load(t).filter($"id" === 9999L)
      assert(hit.count() == 1L)
      val v = TxnTable.latestVersion(spark, t).get
      val stats = TxnTable.fileStats(spark, t, v)
      val files = TxnTable.snapshotFiles(spark, t, v)
      val bound = TxnTable.Bound("num", lo = 9999.0, hi = 9999.0)
      val kept = files.count(f => stats.getOrElse(f, Nil)
        .find(_.col == "id").forall(_.mayOverlap(bound)))
      assert(kept < files.size && kept >= 1,
        s"stats must prune: kept $kept of ${files.size}")
      // metadata-only MIN/MAX folds from the footer-derived stats
      val agg = spark.read.format("graft").load(t)
        .agg(min($"id"), max($"id")).collect()(0)
      assert(agg.getLong(0) == 0L && agg.getLong(1) == 9999L)
    }
  }
}
