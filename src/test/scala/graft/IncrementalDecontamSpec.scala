package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.TxnTable

/** d53: incremental decontamination. The core property: after ANY
  * interleaving of corpus-batch arrivals and eval-suite arrivals, the
  * maintained clean corpus equals the one-shot rule "train docs sharing
  * no word-5-gram with the UNION of eval suites" — because per-doc
  * contamination is monotone in the eval-gram set. The reference is the
  * engine's own single-shot path (one eval ingest of A∪B, one corpus
  * ingest of the full train set), a different code path with no deltas,
  * no probes and no positional deletes. Contamination is ENGINEERED
  * (train docs embed eval grams verbatim) so both the at-ingest filter
  * and the retroactive purge leg are provably exercised. */
class IncrementalDecontamSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark
  import spark.implicits._

  private def withZone(body: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_d53s").toFile
    try body(root.getAbsolutePath)
    finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(root.getAbsolutePath))
    }
  }

  private def stateOf(table: String): Map[Long, Long] =
    spark.read.format("graft").load(table)
      .select($"doc_id", $"n_grams").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("random batch splits + a late eval suite equal the one-shot rule") {
    val rnd = new scala.util.Random(4242)
    (1 to 3).foreach { trial =>
      withZone { zone =>
        val evalA = Seq(
          (1000L, "qa qb qc qd qe qf"),
          (1001L, "qg qh qi qj qk"))
        val evalB = Seq(
          (2000L, "ra rb rc rd re rf"),
          (2001L, "rg rh ri rj rk"))
        // train docs: 8 clean (unique words), 4 contaminated by A
        // (filtered at their own ingest), 4 contaminated by B (purged
        // retroactively if ingested before B, filtered if after)
        var id = 0L
        val train = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
        (0 until 8).foreach { i =>
          train += ((id, (0 until 7).map(j => s"w${i}_$j").mkString(" ")))
          id += 1
        }
        (0 until 4).foreach { i =>
          train += ((id, s"ca$i qa qb qc qd qe cz$i")); id += 1
        }
        (0 until 4).foreach { i =>
          train += ((id, s"cb$i ra rb rc rd re cz$i")); id += 1
        }
        val shuffled = rnd.shuffle(train.toSeq)
        val c1 = 1 + rnd.nextInt(shuffled.size - 2)
        val c2 = c1 + 1 + rnd.nextInt(shuffled.size - c1 - 1)
        val (corpus, evalT) = (s"$zone/corpus", s"$zone/evalg")
        graft.dedup.DedupOps.d53EvalIngest(spark, evalT, None,
          evalA.toDF("doc_id", "text"), first = true)
        graft.dedup.DedupOps.d53Ingest(spark, corpus, evalT,
          shuffled.take(c1).toDF("doc_id", "text"), first = true)
        graft.dedup.DedupOps.d53Ingest(spark, corpus, evalT,
          shuffled.slice(c1, c2).toDF("doc_id", "text"), first = false)
        val before = TxnTable.morState(spark, corpus,
          TxnTable.latestVersion(spark, corpus).get).files.toSet
        val hadB = shuffled.take(c2).exists(_._2.contains(" ra "))
        val purged = graft.dedup.DedupOps.d53EvalIngest(spark, evalT,
          Some(corpus), evalB.toDF("doc_id", "text"), first = false)
        assert((purged > 0L) == hadB,
          s"trial $trial: purge must fire iff a B-contaminated doc " +
            s"was already ingested (purged=$purged hadB=$hadB)")
        graft.dedup.DedupOps.d53Ingest(spark, corpus, evalT,
          shuffled.drop(c2).toDF("doc_id", "text"), first = false)
        val after = TxnTable.morState(spark, corpus,
          TxnTable.latestVersion(spark, corpus).get)
        assert(before.subsetOf(after.files.toSet),
          "retroactive purge must be positional, never a rewrite")
        if (purged > 0L)
          assert(after.dels.exists(_.keyCols == TxnTable.PosDelKeyCols),
            "a non-empty purge must land as a positional vector")
        // one-shot reference: suite A∪B first, whole train in one ingest
        graft.dedup.DedupOps.d53EvalIngest(spark, s"$zone/evalg_g", None,
          (evalA ++ evalB).toDF("doc_id", "text"), first = true)
        graft.dedup.DedupOps.d53Ingest(spark, s"$zone/corpus_g",
          s"$zone/evalg_g", train.toSeq.toDF("doc_id", "text"),
          first = true)
        val got = stateOf(corpus)
        val want = stateOf(s"$zone/corpus_g")
        assert(got == want,
          s"trial $trial: incremental diverged from one-shot\n got=" +
            s"${got.toSeq.sorted}\nwant=${want.toSeq.sorted}")
        // and the rule itself: exactly the 8 clean docs survive
        assert(want.keySet == (0L until 8L).toSet)
      }
    }
  }
}
