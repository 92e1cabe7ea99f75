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
