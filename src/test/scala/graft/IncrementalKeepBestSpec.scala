package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.TxnTable

/** d51: incremental keep-best dedup with cross-batch champion
  * DISPLACEMENT. One representative per normalized fingerprint
  * (lower-cased, whitespace-collapsed md5), best = longest raw text
  * then lowest doc_id. Unlike keep-first, a later batch can carry a
  * better copy — the committed champion must be positionally deleted
  * and replaced, with zero file rewrites. The champion is an argmax
  * (associative, commutative), so the final state must equal the
  * global d41 rule under ANY batch split or arrival order — checked
  * against an in-JVM reference on engineered and random corpora. */
class IncrementalKeepBestSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark
  import spark.implicits._

  private def withZone(body: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_d51s").toFile
    try body(root.getAbsolutePath)
    finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(root.getAbsolutePath))
    }
  }

  private def norm(t: String): String =
    t.trim.replaceAll("\\s+", " ").toLowerCase

  // in-JVM reference of the global keep-best rule: (doc_id, n_chars)
  // champion per normalized-text group
  private def reference(docs: Seq[(Long, String)]): Map[Long, Long] =
    docs.groupBy(d => norm(d._2)).values.map { g =>
      val best = g.minBy { case (id, t) => (-t.length.toLong, id) }
      best._1 -> best._2.length.toLong
    }.toMap

  private def champions(corpus: String): Map[Long, Long] =
    spark.read.format("graft").load(corpus)
      .select($"doc_id", $"n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a better copy arriving later DISPLACES the committed champion") {
    withZone { zone =>
      val corpus = s"$zone/champs"
      val b1 = Seq((1L, "hello world"), (2L, "x y"))
      val b2 = Seq((3L, "Hello   World"), (4L, "z"))  // 3 beats 1 (longer)
      val b3 = Seq((5L, "hello  world"))              // loses to 3
      graft.dedup.DedupOps.d51Ingest(spark, corpus,
        b1.toDF("doc_id", "text"), first = true)
      val before = TxnTable.morState(spark, corpus,
        TxnTable.latestVersion(spark, corpus).get).files.toSet
      val vBefore = TxnTable.latestVersion(spark, corpus).get
      graft.dedup.DedupOps.d51Ingest(spark, corpus,
        b2.toDF("doc_id", "text"), first = false)
      // displacement + replacement is ONE MoR commit: two commits would
      // expose a snapshot with NO champion for the displaced
      // fingerprint, and a crash between them would drop it permanently
      assert(TxnTable.latestVersion(spark, corpus).get == vBefore + 1L,
        "a displacing ingest must publish exactly one commit")
      graft.dedup.DedupOps.d51Ingest(spark, corpus,
        b3.toDF("doc_id", "text"), first = false)
      val after = TxnTable.morState(spark, corpus,
        TxnTable.latestVersion(spark, corpus).get)
      assert(before.subsetOf(after.files.toSet),
        "displacement must never rewrite a committed file")
      assert(after.dels.exists(_.keyCols == Seq(TxnTable.PosDelKey)),
        "the displaced champion must go by positional vector")
      val got = champions(corpus)
      assert(got == reference(b1 ++ b2 ++ b3), got)
      assert(got.contains(3L) && !got.contains(1L) && !got.contains(5L))
    }
  }

  test("in-batch duplicates reduce before the probe; ties keep lowest id") {
    withZone { zone =>
      val corpus = s"$zone/champs"
      // 11 and 12 tie on length within one batch -> 11 wins; a later
      // equal-length copy (13) must NOT displace 11
      val b1 = Seq((11L, "same  text"), (12L, "Same  Text"), (10L, "a b"))
      val b2 = Seq((13L, "sAme  texT"))
      graft.dedup.DedupOps.d51Ingest(spark, corpus,
        b1.toDF("doc_id", "text"), first = true)
      graft.dedup.DedupOps.d51Ingest(spark, corpus,
        b2.toDF("doc_id", "text"), first = false)
      val got = champions(corpus)
      assert(got == reference(b1 ++ b2), got)
      assert(got.contains(11L))
    }
  }

  test("forced SPJ probe: displacement works over a VECTOR-GATED corpus") {
    // the third ingest probes a corpus that already carries live
    // positional vectors from ingest 2's displacement — the
    // storage-co-partitioned probe spelling must hold its zero-shuffle
    // contract through the vector-gated read path too
    val forced = Seq("graft.dedup.probeKeyLimit" -> "0",
      "graft.dedup.sigBroadcastLimit" -> "0")
    val prev = forced.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      forced.foreach { case (k, v) => spark.conf.set(k, v) }
      withZone { zone =>
        val corpus = s"$zone/champs"
        val b1 = Seq((1L, "alpha beta"), (2L, "x y"))
        val b2 = Seq((3L, "Alpha   Beta"), (4L, "z"))   // displaces 1
        val b3 = Seq((5L, "ALPHA    BETA q"), (6L, "x  y")) // 6 displaces 2
        graft.dedup.DedupOps.d51Ingest(spark, corpus,
          b1.toDF("doc_id", "text"), first = true)
        graft.dedup.DedupOps.d51Ingest(spark, corpus,
          b2.toDF("doc_id", "text"), first = false)
        graft.dedup.DedupOps.d51Ingest(spark, corpus,
          b3.toDF("doc_id", "text"), first = false)
        val got = champions(corpus)
        assert(got == reference(b1 ++ b2 ++ b3), got)
      }
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("property: equals the global rule under random cuts AND order") {
    val rnd = new scala.util.Random(4242)
    (1 to 5).foreach { trial =>
      withZone { zone =>
        val corpus = s"$zone/champs"
        // engineered variant groups: per base text, several docs that
        // differ only in case/extra spaces (same fingerprint, varying
        // raw length) plus singletons
        val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
        var id = 0L
        (1 to 6).foreach { g =>
          val base = Seq.fill(2 + rnd.nextInt(3))(
            ('a' + rnd.nextInt(3)).toChar.toString * (1 + rnd.nextInt(3)))
            .mkString(" ")
          (0 until 1 + rnd.nextInt(4)).foreach { _ =>
            id += 1
            val pad = " " * rnd.nextInt(3)
            val t = if (rnd.nextBoolean()) base.toUpperCase else base
            docs += ((id, t.replace(" ", " " + pad)))
          }
        }
        // random arrival ORDER (keep-best is order-free), random cuts
        val shuffled = rnd.shuffle(docs.toSeq)
        val (c1, c2) = (1 + rnd.nextInt(shuffled.size - 1),
          1 + rnd.nextInt(shuffled.size))
        val batches = Seq(
          shuffled.take(c1),
          shuffled.slice(c1, math.max(c1 + 1, c2)),
          shuffled.drop(math.max(c1 + 1, c2))).filter(_.nonEmpty)
        batches.zipWithIndex.foreach { case (b, i) =>
          graft.dedup.DedupOps.d51Ingest(spark, corpus,
            b.toDF("doc_id", "text"), first = i == 0)
        }
        val got = champions(corpus)
        val want = reference(docs.toSeq)
        assert(got == want,
          s"trial $trial:\n got=$got\nwant=$want\ndocs=$docs")
      }
    }
  }
}
