package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.{Bloom, Tables, TxnTable}

/** Bloom-sidecar equality skipping: never-false-negative bitset math,
  * point-lookup pruning where min/max stats can't prune, GDPR point
  * delete with NULL retention and by-reference carry, DSv2 `===`
  * pruning, merge/vacuum lifecycle of the sidecars. */
class BloomSkipSpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  private def withZone(f: String => Unit): Unit = {
    val zone = java.nio.file.Files.createTempDirectory("graft_bloomspec").toFile
    try f(s"${zone.getAbsolutePath}/t")
    finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete(); ()
      }
      rm(zone)
    }
  }

  test("bitset math: no false negatives, bounded false positives") {
    val bits = 4096
    val hashes = 7
    val bytes = new Array[Byte](bits / 8)
    val rnd = new scala.util.Random(42)
    val present = Seq.fill(200)(rnd.nextLong())
    present.foreach(h => Bloom.add(bytes, bits, hashes, h))
    // the correctness contract: every inserted hash probes positive
    assert(present.forall(h => Bloom.mightContain(bytes, bits, hashes, h)))
    // quality, not correctness: absent hashes mostly probe negative
    val absent = Seq.fill(2000)(rnd.nextLong()).filterNot(present.toSet)
    val fp = absent.count(h => Bloom.mightContain(bytes, bits, hashes, h))
    assert(fp < absent.size / 10, s"false-positive rate implausible: $fp/${absent.size}")
  }

  test("readEquals prunes via bloom where min/max stats cannot") {
    import spark.implicits._
    withZone { table =>
      val docs = Tables.documents(spark, Spec.sf001)
        .select($"doc_id", $"n_chars")
      // hash partitioning: every file spans ~the full key range, so
      // min/max stats keep all files — only the bloom can prune
      TxnTable.commitOverwrite(docs.repartition(8, $"doc_id"), table,
        statsCols = Seq("doc_id"), bloomCols = Seq("doc_id"))
      val target = 250L
      val (rows, scanned, total) = TxnTable.readEquals(spark, table, "doc_id", target)
      assert(total == 8)
      assert(scanned < total, s"bloom pruned nothing: $scanned of $total")
      val expected = docs.filter($"doc_id" === target).count()
      assert(rows.count() == expected && expected == 1L)
      // a key that does not exist prunes everything (whp) and returns 0
      val (miss, missScanned, _) = TxnTable.readEquals(spark, table, "doc_id", 999999L)
      assert(miss.count() == 0L)
      assert(missScanned == 0, s"absent key still scanned $missScanned files")
    }
  }

  test("deleteEquals: surgical rewrite, NULLs retained, misses are metadata-only") {
    import spark.implicits._
    withZone { table =>
      val docs = Tables.documents(spark, Spec.sf001)
        .select(
          when($"doc_id" % 10 === 0, lit(null)).otherwise($"doc_id")
            .cast("long").as("k"),
          $"n_chars")
      TxnTable.commitOverwrite(docs.repartition(6, $"n_chars"), table,
        statsCols = Seq("k"), bloomCols = Seq("k"))
      val before = TxnTable.snapshotFiles(spark, table, 1L).toSet
      val nullsBefore = TxnTable.read(spark, table).filter($"k".isNull).count()
      assert(nullsBefore > 0)
      val v = TxnTable.deleteEquals(spark, table, "k", 251L)
      val after = TxnTable.snapshotFiles(spark, table, v).toSet
      // the key lives in one file: everything else carries by reference
      assert(before.intersect(after).size >= before.size - 2,
        s"point delete rewrote ${before.size - before.intersect(after).size} files")
      assert(TxnTable.read(spark, table).filter($"k" === 251L).count() == 0L)
      assert(TxnTable.read(spark, table).filter($"k".isNull).count() == nullsBefore,
        "DELETE must retain NULL-keyed rows")
      // deleting an absent key touches nothing: pure metadata no-op
      val v2 = TxnTable.deleteEquals(spark, table, "k", 999999L)
      assert(TxnTable.snapshotFiles(spark, table, v2).toSet == after,
        "absent-key delete must not rewrite any file")
    }
  }

  test("DSv2 equality filter prunes files through the bloom") {
    import spark.implicits._
    withZone { table =>
      val docs = Tables.documents(spark, Spec.sf001)
        .select($"doc_id", $"n_chars")
      TxnTable.commitOverwrite(docs.repartition(8, $"doc_id"), table,
        statsCols = Seq("doc_id"), bloomCols = Seq("doc_id"))
      val pruned = spark.read.format("graft").load(table)
        .filter($"doc_id" === 250L)
      val scanned = org.apache.spark.sql.GraftBridge.dsv2ScannedFiles(pruned)
        .getOrElse(fail("no DSv2 scan in plan"))
      assert(scanned < 8, s"DSv2 bloom skipping failed: scanned $scanned of 8")
      assert(pruned.count() == 1L)
      // IN-list: union of points — each value probes; all rows survive
      val inq = spark.read.format("graft").load(table)
        .filter($"doc_id".isin(10L, 250L, 400L))
      assert(inq.count() == 3L)
    }
  }

  test("merge rewrite preserves bloom coverage; vacuum reaps sidecars") {
    import spark.implicits._
    withZone { table =>
      val docs = Tables.documents(spark, Spec.sf001)
        .select($"doc_id", $"n_chars")
      TxnTable.commitOverwrite(docs.repartition(4, $"doc_id"), table,
        statsCols = Seq("doc_id"), bloomCols = Seq("doc_id"))
      val up = Seq((250L, 77L)).toDF("doc_id", "n_chars")
      TxnTable.merge(up, table, "doc_id")
      // the rewritten file must carry a fresh bloom: a point lookup on
      // the merged key still prunes and still finds the updated row
      val (rows, scanned, total) = TxnTable.readEquals(spark, table, "doc_id", 250L)
      assert(scanned < total)
      assert(rows.select($"n_chars").as[Long].head() == 77L)
      // vacuum: superseded files AND their sidecars are reclaimed. The
      // merge commit is a DELTA manifest, so first roll the log up with
      // a full overwrite — vacuum retains a delta's checkpoint base by
      // design (the chain is unreadable without it).
      TxnTable.commitOverwrite(docs.repartition(3, $"doc_id"), table,
        statsCols = Seq("doc_id"), bloomCols = Seq("doc_id"))
      TxnTable.vacuum(spark, table)
      def bloomCount: Int = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        // endsWith, not contains: Hadoop's local FS shadows every
        // sidecar with a `.<name>.crc` checksum twin
        walk(new java.io.File(table)).count(_.getName.endsWith(".bloom.doc_id"))
      }
      val live = TxnTable.snapshotFiles(spark, table,
        TxnTable.latestVersion(spark, table).get).size
      assert(bloomCount == live,
        s"expected exactly $live live sidecars after vacuum, found $bloomCount")
    }
  }
}
