package graft

import org.scalatest.funsuite.AnyFunSuite

/** m70: incremental perceptual image dedup. Property: for ANY id-ordered
  * batch split, the maintained corpus equals the global pairwise rule —
  * an image is a dup iff SOME earlier image shares a 16-bit band AND
  * sits within Hamming 16. The spec drives m70Ingest with SYNTHETIC
  * fingerprints (the ingest consumes (img_id, fp) — the codec pipeline
  * is m68's, already oracle-gated), engineered so all three collision
  * classes occur: exact dups, near dups (low-bit flips — band 4 moves,
  * bands 1-3 hold), and band-collides-but-Hamming-rejects pairs (high
  * bits shared, 20+ low bits flipped) — the class that would silently
  * vanish if the verify step ever degraded into "collision = dup". */
class IncrementalImageDedupSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark
  import spark.implicits._

  private def withZone(body: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_m70s").toFile
    try body(root.getAbsolutePath)
    finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(root.getAbsolutePath))
    }
  }

  private def bands(fp: Long): Seq[Long] =
    (0 until 4).map(i => (fp >> (48 - 16 * i)) & 0xffffL)

  // the global pairwise rule, brute-forced in-JVM
  private def reference(fps: Seq[(Long, Long)]): Set[Long] = {
    val sorted = fps.sortBy(_._1)
    val dups = for {
      j <- sorted.indices
      i <- 0 until j
      if bands(sorted(i)._2).zip(bands(sorted(j)._2)).exists(p => p._1 == p._2)
      if java.lang.Long.bitCount(sorted(i)._2 ^ sorted(j)._2) <= 16
    } yield sorted(j)._1
    sorted.map(_._1).toSet -- dups.toSet
  }

  private def survivors(corpus: String): Set[Long] =
    spark.read.format("graft").load(corpus)
      .select($"img_id").collect().map(_.getLong(0)).toSet

  test("random id-ordered splits equal the global pairwise rule") {
    val rnd = new scala.util.Random(2929)
    (1 to 3).foreach { trial =>
      withZone { zone =>
        var id = 0L
        val fps = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        (0 until 20).foreach { _ =>
          val base = rnd.nextLong()
          fps += ((id, base)); id += 1
          rnd.nextInt(3) match {
            case 0 => // exact dup
              fps += ((id, base)); id += 1
            case 1 => // near dup: <= 8 low-bit flips (band 4 only)
              fps += ((id, base ^ (rnd.nextLong() & 0xffL))); id += 1
            case _ => // band collision that Hamming REJECTS:
              // bands 1-3 shared, 20 low+mid bits flipped
              fps += ((id, base ^ 0x000000000fffffL)); id += 1
          }
        }
        val all = fps.toSeq
        val c1 = 1 + rnd.nextInt(all.size - 2)
        val c2 = c1 + 1 + rnd.nextInt(all.size - c1 - 1)
        val batches = Seq(all.take(c1), all.slice(c1, c2), all.drop(c2))
          .filter(_.nonEmpty)
        batches.zipWithIndex.foreach { case (b, i) =>
          graft.multimodal.MultimodalOps.m70Ingest(spark,
            s"$zone/corpus", s"$zone/sigs", b.toDF("img_id", "fp"),
            first = i == 0,
            org.apache.spark.sql.functions.col("img_id")
              .between(b.map(_._1).min, b.map(_._1).max))
        }
        val got = survivors(s"$zone/corpus")
        val want = reference(all)
        assert(got == want,
          s"trial $trial: incremental diverged\n got=${got.toSeq.sorted}" +
            s"\nwant=${want.toSeq.sorted}")
        // the Hamming-reject class must actually occur (non-vacuous)
        val rejects = for {
          j <- all.indices; i <- 0 until j
          if bands(all(i)._2).zip(bands(all(j)._2)).exists(p => p._1 == p._2)
          if java.lang.Long.bitCount(all(i)._2 ^ all(j)._2) > 16
        } yield ()
        assert(rejects.nonEmpty,
          s"trial $trial: no band-collide-Hamming-reject pair engineered")
      }
    }
  }
}
