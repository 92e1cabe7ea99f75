package graft

import org.scalatest.funsuite.AnyFunSuite

/** d52: incremental connected-components cluster maintenance. The core
  * property: after ANY sequence of ingests — random membership, random
  * order, smaller ids arriving late — the maintained (doc_id, label)
  * map equals the one-shot global contraction over the full corpus.
  * Min-labels make the batch contraction order-free: contracting a
  * component to its label loses nothing because the label IS its min,
  * and a late-arriving smaller id propagates through the retroactive
  * relabel leg. The reference here is the engine's own single-ingest
  * path (first=true over the whole corpus) — a different code path
  * (one big starContraction, no probes, no merges) whose agreement
  * with the multi-ingest run is exactly the maintenance contract. */
class IncrementalClustersSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark
  import spark.implicits._

  private def withZone(body: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_d52s").toFile
    try body(root.getAbsolutePath)
    finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(root.getAbsolutePath))
    }
  }

  private def labelsOf(table: String): Map[Long, Long] =
    spark.read.format("graft").load(table)
      .select($"doc_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("relabel-on-delete: erasure keeps the min-label invariant in " +
      "one positional commit and composes with later ingests") {
    import org.apache.spark.sql.functions.col
    withZone { zone =>
      val labels = s"$zone/labels"
      val sigs = s"$zone/sigs"
      val tA = "aaa bbb ccc ddd eee fff"
      val tB = "ggg hhh iii jjj kkk lll"
      val tC = "mmm nnn ooo ppp qqq rrr"
      val docs = Seq((10L, tA), (11L, tA), (12L, tA),
        (20L, tB), (21L, tB), (30L, tC), (31L, tC))
      graft.dedup.DedupOps.d52Ingest(spark, labels, sigs,
        docs.toDF("doc_id", "text"), first = true)
      assert(labelsOf(labels) == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
        20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
      val io = graft.io.TxnTable
      val v0 = io.latestVersion(spark, labels).get
      val before = io.morState(spark, labels, v0).files.toSet
      // one erasure batch: a component's MIN (10), a non-min (21),
      // and a whole component (30, 31)
      graft.dedup.DedupOps.d52Delete(spark, labels, sigs,
        Seq(10L, 21L, 30L, 31L))
      // min-died component relabels to its surviving min; the non-min
      // deletion leaves its component's label alone; the fully-erased
      // component vanishes; nothing deleted survives
      assert(labelsOf(labels) ==
        Map(11L -> 11L, 12L -> 11L, 20L -> 20L))
      // ONE commit, positional — zero data-file rewrites
      val v1 = io.latestVersion(spark, labels).get
      assert(v1 == v0 + 1L, "the erasure must cost exactly one version")
      val after = io.morState(spark, labels, v1)
      assert(before.subsetOf(after.files.toSet),
        "relabel-on-delete must be positional, never a rewrite")
      assert(after.dels.exists(_.keyCols == io.PosDelKeyCols))
      // composition: a later ingest joins survivors under the NEW
      // label, and a doc matching ONLY erased content is not
      // resurrected (its band signatures are gone too)
      graft.dedup.DedupOps.d52Ingest(spark, labels, sigs,
        Seq((40L, tA), (50L, tC)).toDF("doc_id", "text"), first = false)
      assert(labelsOf(labels) ==
        Map(11L -> 11L, 12L -> 11L, 20L -> 20L, 40L -> 11L),
        "40 must join the relabeled component; 50 must not resurrect " +
          "the erased one")
      // the sig table serves no dead doc ids
      assert(spark.read.format("graft").load(sigs)
        .filter(col("doc_id").isin(10L, 21L, 30L, 31L)).count() == 0L)
    }
  }

  test("random splits and arrival orders equal the one-shot global map") {
    val rnd = new scala.util.Random(1717)
    (1 to 3).foreach { trial =>
      withZone { zone =>
        // exact-dup groups off 8 base texts + concat bridges between
        // random bases (band collisions across groups)
        val bases = (0 until 8).map(_ =>
          Seq.fill(6)(('a' + rnd.nextInt(4)).toChar.toString *
            (1 + rnd.nextInt(2))).mkString(" "))
        var id = 0L
        val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
        (0 until 24).foreach { _ =>
          docs += ((id, bases(rnd.nextInt(8)))); id += 1
        }
        (0 until 4).foreach { _ =>
          docs += ((id,
            bases(rnd.nextInt(8)) + " " + bases(rnd.nextInt(8)))); id += 1
        }
        // arbitrary membership AND order: shuffle, then cut into 3
        val shuffled = rnd.shuffle(docs.toSeq)
        val c1 = 1 + rnd.nextInt(shuffled.size - 2)
        val c2 = c1 + 1 + rnd.nextInt(shuffled.size - c1 - 1)
        val batches = Seq(shuffled.take(c1), shuffled.slice(c1, c2),
          shuffled.drop(c2)).filter(_.nonEmpty)
        batches.zipWithIndex.foreach { case (b, i) =>
          graft.dedup.DedupOps.d52Ingest(spark, s"$zone/labels",
            s"$zone/sigs", b.toDF("doc_id", "text"), first = i == 0)
        }
        graft.dedup.DedupOps.d52Ingest(spark, s"$zone/labels_g",
          s"$zone/sigs_g", docs.toSeq.toDF("doc_id", "text"), first = true)
        val got = labelsOf(s"$zone/labels")
        val want = labelsOf(s"$zone/labels_g")
        assert(got == want,
          s"trial $trial: incremental diverged from global\n got=" +
            s"${got.toSeq.sorted}\nwant=${want.toSeq.sorted}")
      }
    }
  }
}
