package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.TxnTable

/** BASENAME-COLLISION regression: one partitioned write task emits the
  * SAME `part-00000-<uuid>` file name into EVERY partition dir
  * (coalesce(1) guarantees it), so any path machinery that matches
  * scan-emitted absolute paths back to snapshot files by basename
  * silently resolves to the wrong file. Found by the partitioned
  * DmlFuzzSpec as duplicate keys after a merge: the touched-file set
  * collapsed to one file per basename, the equality delete skipped the
  * others, and the old copies survived next to the merged ones. Every
  * rewrite-shaped op over a partitioned table goes through here. */
class PartitionedRewriteSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark
  import spark.implicits._

  private def withZone(body: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_prw").toFile
    try body(s"${root.getAbsolutePath}/t")
    finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(root.getAbsolutePath))
    }
  }

  /** 40 rows over 4 partitions written by ONE task: identical basenames
    * in all 4 partition dirs. */
  private def seed(table: String, mor: Boolean): Unit =
    (0L until 40L).map(k => (k, k)).toDF("k", "v")
      .withColumn("g", pmod($"k", lit(4L))).coalesce(1)
      .write.format("graft").option("statsCols", "k")
      .option("mergeOnRead", mor.toString).option("partitionBy", "g")
      .mode("overwrite").save(table)

  private def state(table: String) = TxnTable.morState(spark, table,
    TxnTable.latestVersion(spark, table).get)

  test("merge supersedes across partitions with colliding basenames") {
    withZone { table =>
      seed(table, mor = true)
      // keys in THREE different partitions — the touched set must hold
      // three distinct files that share one basename
      val up = Seq((5L, 500L), (6L, 600L), (7L, 700L), (41L, 4100L))
        .toDF("k", "v").withColumn("g", pmod($"k", lit(4L)))
      TxnTable.merge(up, table, "k")
      val got = spark.read.format("graft").load(table)
        .select($"k", $"v").as[(Long, Long)].collect().toSeq
      assert(got.size == 41, s"40 rows + 1 insert, got ${got.size}")
      assert(got.map(_._1).distinct.size == got.size,
        s"duplicate keys: ${got.groupBy(_._1).filter(_._2.size > 1)}")
      val m = got.toMap
      assert(m(5L) == 500L && m(6L) == 600L && m(7L) == 700L &&
        m(41L) == 4100L)
    }
  }

  test("SQL UPDATE / DELETE rewrites hit the right files across partitions") {
    withZone { table =>
      seed(table, mor = false)
      spark.sql(s"CREATE TABLE prw_upd USING graft OPTIONS (path '$table')")
      try {
        // copy-on-write rewrites: the removed-file translation must be
        // path-exact or a whole partition's rows duplicate/vanish
        spark.sql("UPDATE prw_upd SET v = v + 1000 WHERE k % 4 IN (1, 2)")
        val got = spark.read.format("graft").load(table)
          .select($"k", $"v").as[(Long, Long)].collect().toSeq
        assert(got.size == 40 && got.map(_._1).distinct.size == 40,
          s"row set corrupted: n=${got.size}")
        assert(got.forall { case (k, v) =>
          v == (if (k % 4 == 1 || k % 4 == 2) k + 1000 else k) }, got.sorted)
        spark.sql("DELETE FROM prw_upd WHERE k % 4 = 3 AND k < 20")
        val left = spark.read.format("graft").load(table)
          .select($"k").as[Long].collect().toSeq
        assert(left.size == 35 && left.distinct.size == 35, left.sorted)
        assert(!left.exists(k => k % 4 == 3 && k < 20))
      } finally spark.sql("DROP TABLE IF EXISTS prw_upd")
    }
  }

  test("SQL MERGE rewrite on a partitioned target stays exact") {
    withZone { table =>
      seed(table, mor = false)
      spark.sql(s"CREATE TABLE prw_mrg USING graft OPTIONS (path '$table')")
      (Seq((9L, 900L), (10L, 901L), (50L, 902L)))
        .toDF("k", "nv").createOrReplaceTempView("prw_src")
      try {
        spark.sql(
          """MERGE INTO prw_mrg t USING prw_src s ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET v = s.nv
            |WHEN NOT MATCHED THEN INSERT (k, v, g) VALUES (s.k, s.nv, s.k % 4)
            |""".stripMargin)
        val got = spark.read.format("graft").load(table)
          .select($"k", $"v").as[(Long, Long)].collect().toSeq
        assert(got.size == 41 && got.map(_._1).distinct.size == 41,
          s"row set corrupted: ${got.groupBy(_._1).filter(_._2.size > 1)}")
        val m = got.toMap
        assert(m(9L) == 900L && m(10L) == 901L && m(50L) == 902L)
      } finally spark.sql("DROP TABLE IF EXISTS prw_mrg")
    }
  }

  test("rewrites stay exact when partition values need URI escaping") {
    withZone { table =>
      // a SPACE stays literal in the on-disk dir name while
      // input_file_name() URL-encodes it (`a b` vs `a%20b`), and a
      // literal `%` Hive-escapes on disk (`50%25`) while the scan URI
      // encodes once more — both sides must normalize through one
      // decoder or every merge/rewrite throws 'scanned file not in
      // snapshot' (the fail-closed regression relOfAbs guards)
      val gOf = when(pmod($"k", lit(2L)) === 0L, lit("a b"))
        .otherwise(lit("50%"))
      (0L until 20L).map(k => (k, k)).toDF("k", "v")
        .withColumn("g", gOf).coalesce(1)
        .write.format("graft").option("statsCols", "k")
        .option("mergeOnRead", "true").option("partitionBy", "g")
        .mode("overwrite").save(table)
      val up = Seq((3L, 300L), (4L, 400L), (21L, 2100L)).toDF("k", "v")
        .withColumn("g", gOf)
      TxnTable.merge(up, table, "k")
      val got = spark.read.format("graft").load(table)
        .select($"k", $"v").as[(Long, Long)].collect().toSeq
      assert(got.size == 21 && got.map(_._1).distinct.size == 21,
        s"row set corrupted: n=${got.size}")
      val m = got.toMap
      assert(m(3L) == 300L && m(4L) == 400L && m(21L) == 2100L)
      // copy-on-write rewrite path (UPDATE translates scanned paths too)
      spark.sql(s"CREATE TABLE prw_esc USING graft OPTIONS (path '$table')")
      try {
        spark.sql("UPDATE prw_esc SET v = v + 1000 WHERE k IN (5, 6)")
        val m2 = spark.read.format("graft").load(table)
          .select($"k", $"v").as[(Long, Long)].collect().toMap
        assert(m2(5L) == 1005L && m2(6L) == 1006L && m2(7L) == 7L)
      } finally spark.sql("DROP TABLE IF EXISTS prw_esc")
    }
  }

  test("vacuum's bloom sweep never reaps a live sibling's sidecar") {
    withZone { table =>
      // blooms on k, partitioned write with colliding basenames, then a
      // rewrite that dooms SOME partitions' files — the surviving
      // partitions' blooms (same basenames) must stay
      (0L until 40L).map(k => (k, k)).toDF("k", "v")
        .withColumn("g", pmod($"k", lit(4L))).coalesce(1)
        .write.format("graft").option("statsCols", "k")
        .option("bloomCols", "k").option("partitionBy", "g")
        .mode("overwrite").save(table)
      val before = state(table).files
      val bloomOf = (f: String) => s"$table/$f.bloom.k"
      assert(before.forall(f => new java.io.File(bloomOf(f)).exists()),
        "setup: every seeded file must carry a k bloom")
      spark.sql(s"CREATE TABLE prw_blm USING graft OPTIONS (path '$table')")
      try spark.sql("UPDATE prw_blm SET v = v + 1 WHERE k % 4 = 0")
      finally spark.sql("DROP TABLE IF EXISTS prw_blm")
      TxnTable.vacuum(spark, table, keep = 0, retainMs = 0L)
      // files carried BY REFERENCE through the rewrite share their
      // basename with the doomed partition's file — their blooms must
      // survive the sweep
      val carried = state(table).files.toSet.intersect(before.toSet)
      assert(carried.nonEmpty, "setup: some partitions must carry")
      carried.foreach(f => assert(new java.io.File(bloomOf(f)).exists(),
        s"live bloom sidecar reaped by basename collision: ${bloomOf(f)}"))
      // and the blooms still prune (sanity read)
      assert(spark.read.format("graft").load(table)
        .filter($"k" === 13L).count() == 1L)
    }
  }
}
