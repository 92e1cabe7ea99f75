package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.TxnTable

/** d49: incremental (batched, persisted-shingle-table) span dedup must
  * equal the GLOBAL d48 rule on the same corpus — batches arrive in
  * doc_id order, so a shingle's corpus-first occurrence lives in the
  * earliest batch containing it, where it is also the in-batch min.
  * Checked against d48's spanDedup transform (itself brute-force
  * property-gated in SpanDedupSpec) on random collision-heavy corpora
  * split at random batch boundaries, plus the zero-rewrite contract. */
class IncrementalSpanDedupSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark
  import spark.implicits._

  private def withZone(body: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_d49s").toFile
    try body(root.getAbsolutePath)
    finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(root)
    }
  }

  private def collectOut(df: org.apache.spark.sql.DataFrame) =
    df.select($"doc_id", $"n_words", $"n_removed", $"cleaned")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq

  test("batched ingests equal the global d48 rule (random corpora)") {
    val rnd = new scala.util.Random(77)
    val vocab = Vector("a", "b", "c", "d")
    (1 to 6).foreach { trial =>
      withZone { zone =>
        val n = 6 + rnd.nextInt(8)
        val docs = (1L to n.toLong).map { i =>
          // long enough to shingle, tiny vocab → heavy collisions
          (i, Seq.fill(8 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size)))
            .mkString(" "))
        }
        val df = docs.toDF("doc_id", "text")
        // random batch boundaries in doc_id order
        val c1 = 1 + rnd.nextInt(n - 2)
        val c2 = c1 + 1 + rnd.nextInt(n - c1 - 1)
        val (corpus, grams) = (s"$zone/clean", s"$zone/grams")
        graft.dedup.DedupOps.d49Ingest(spark, corpus, grams,
          df.filter($"doc_id" <= c1), first = true)
        val before = TxnTable.morState(spark, corpus,
          TxnTable.latestVersion(spark, corpus).get).files.toSet
        graft.dedup.DedupOps.d49Ingest(spark, corpus, grams,
          df.filter($"doc_id" > c1 && $"doc_id" <= c2), first = false)
        graft.dedup.DedupOps.d49Ingest(spark, corpus, grams,
          df.filter($"doc_id" > c2), first = false)
        val after = TxnTable.morState(spark, corpus,
          TxnTable.latestVersion(spark, corpus).get).files.toSet
        assert(before.subsetOf(after), "committed corpus files rewritten")
        val got = collectOut(spark.read.format("graft").load(corpus))
        val want = collectOut(graft.dedup.DedupOps.spanDedup(spark, df))
        assert(got == want,
          s"trial $trial (cuts $c1/$c2):\n got=$got\nwant=$want\ndocs=$docs")
      }
    }
  }

  test("a duplicate arriving in a LATER batch loses; the original survives") {
    withZone { zone =>
      val run = "x1 x2 x3 x4 x5 x6 x7 x8"
      val docs = Seq(
        (1L, s"$run tail1 t2 t3"),
        (2L, s"head1 h2 h3 $run"), // same 8-word run, later batch
        (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9")).toDF("doc_id", "text")
      val (corpus, grams) = (s"$zone/clean", s"$zone/grams")
      graft.dedup.DedupOps.d49Ingest(spark, corpus, grams,
        docs.filter($"doc_id" === 1L), first = true)
      graft.dedup.DedupOps.d49Ingest(spark, corpus, grams,
        docs.filter($"doc_id" > 1L), first = false)
      val out = collectOut(spark.read.format("graft").load(corpus))
      assert(out(0) == ((1L, 11L, 0L, s"$run tail1 t2 t3")),
        s"original must survive untouched: ${out(0)}")
      assert(out(1) == ((2L, 11L, 8L, "head1 h2 h3")), out(1))
      assert(out(2)._3 == 0L)
    }
  }
}
