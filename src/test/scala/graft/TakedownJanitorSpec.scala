package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Tables, TxnTable}

/** CRASH-INJECTION for the multi-table takedown janitor — the DmlFuzz
  * discipline applied to the lifecycle composition. p92's contract:
  * transactions are PER-TABLE, so a crash mid-takedown can leave an
  * index not yet erased; the remedy is that each leg is IDEMPOTENT
  * (re-running the positional delete over the masked read matches
  * nothing), so the takedown driver re-runs its WHOLE batch until
  * every table confirms. This spec pins the claim: fail between the
  * corpus delete and the index deletes, re-run the whole batch,
  * REQUIRE final state equals an uninterrupted run on a twin — then
  * compose a LATER ingest on top and require the twins stay equal. */
class TakedownJanitorSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark

  private def withZone(body: String => Unit): Unit = {
    val root =
      java.nio.file.Files.createTempDirectory("graft_janitor").toFile
    try body(root.getAbsolutePath)
    finally Tables.deleteTree(root)
  }

  /** corpus + postings + IVF, the p92/p93 trio, in `zone/name_*`. */
  private def build(zone: String, name: String,
                    cents: Array[Array[Double]])
      : (String, String, String) = {
    import spark.implicits._
    val (corpus, postings, ivf) =
      (s"$zone/${name}_corpus", s"$zone/${name}_postings",
        s"$zone/${name}_ivf")
    val docs = Tables.documents(spark, Spec.sf0001)
      .select($"doc_id", $"text")
    TxnTable.commitOverwrite(docs, corpus, statsCols = Seq("doc_id"),
      mor = Some(true))
    docs.select($"doc_id", explode(split(lower($"text"), " ")).as("term"))
      .filter(length($"term") > 0)
      .groupBy($"term", $"doc_id").agg(count(lit(1)).as("tf"))
      .write.format("graft").option("statsCols", "term")
      .option("mergeOnRead", "true").mode("overwrite").save(postings)
    Tables.embeddings(spark, Spec.sf0001)
      .join(docs.select($"doc_id".as("vec_id")), Seq("vec_id"),
        "left_semi")
      .select($"vec_id", $"embedding",
        element_at(
          graft.sim.Similarity.nearestCells("embedding", cents, 1), 1)
          .cast("bigint").cast("string").as("cell"))
      .write.format("graft").option("statsCols", "vec_id")
      .option("mergeOnRead", "true").mode("overwrite").save(ivf)
    (corpus, postings, ivf)
  }

  /** The takedown batch as ordered legs — corpus first, then each
    * index, exactly p92's shape. */
  private def legs(t: (String, String, String), erase: DataFrame)
      : Seq[() => Unit] = Seq(
    () => { TxnTable.deleteFromPos(spark, t._1, erase, Seq("doc_id")); () },
    () => { TxnTable.deleteFromPos(spark, t._2, erase, Seq("doc_id")); () },
    () => { TxnTable.deleteFromPos(spark, t._3,
      erase.select(col("doc_id").as("vec_id")), Seq("vec_id")); () })

  private def runBatch(ls: Seq[() => Unit],
                       crashAfter: Int = Int.MaxValue): Unit =
    ls.zipWithIndex.foreach { case (leg, i) =>
      if (i >= crashAfter)
        throw new RuntimeException("injected janitor crash")
      leg()
    }

  private def sameContent(a: String, b: String, cols: Seq[String])
      : Boolean = {
    val l = spark.read.format("graft").load(a)
      .select(cols.map(col): _*)
    val r = spark.read.format("graft").load(b)
      .select(cols.map(col): _*)
    // count gate: except has set semantics, the count makes the
    // equality multiset-exact (a double-applied append must fail)
    l.count() == r.count() &&
      l.except(r).isEmpty && r.except(l).isEmpty
  }

  test("a crash between the corpus delete and the index deletes " +
      "converges on whole-batch re-run; a later ingest composes") {
    withZone { zone =>
      import spark.implicits._
      val cents = graft.sim.SimilarityOps.centroids(spark, Spec.sf0001)
      val crashed = build(zone, "crash", cents)
      val clean = build(zone, "clean", cents)
      // the erasure batch, derived from the immutable source so it is
      // identical across twins and across the crash/retry boundary
      val erase = Tables.documents(spark, Spec.sf0001)
        .filter($"doc_id" % 6 === 0).select($"doc_id").localCheckpoint()
      require(erase.limit(1).count() > 0)
      // uninterrupted twin
      runBatch(legs(clean, erase))
      // crash AFTER the corpus leg, BEFORE any index leg
      intercept[RuntimeException] {
        runBatch(legs(crashed, erase), crashAfter = 1)
      }
      // the crash is OBSERVABLE: the corpus erased but the postings
      // index still serves the taken-down docs — exactly the
      // inconsistency window the docstring admits
      assert(spark.read.format("graft").load(crashed._1)
        .filter($"doc_id" % 6 === 0).count() == 0L)
      assert(spark.read.format("graft").load(crashed._2)
        .filter($"doc_id" % 6 === 0).count() > 0L,
        "the injected crash left no divergence — the test is vacuous")
      // the janitor re-runs the WHOLE batch (leg 1 replays onto an
      // already-erased corpus and must match nothing, not fail)
      runBatch(legs(crashed, erase))
      assert(sameContent(crashed._1, clean._1, Seq("doc_id", "text")),
        "corpus diverged from the uninterrupted run")
      assert(sameContent(crashed._2, clean._2,
        Seq("term", "doc_id", "tf")),
        "postings diverged from the uninterrupted run")
      assert(sameContent(crashed._3, clean._3, Seq("vec_id", "cell")),
        "IVF diverged from the uninterrupted run")
      // a LATER ingest composes on the converged state: both twins
      // take the same fresh batch and stay equal, erased docs stay gone
      val off = 1000000L
      val fresh = Tables.documents(spark, Spec.sf0001)
        .filter($"doc_id" % 5 === 1)
        .select(($"doc_id" + off).as("doc_id"), $"text")
      val freshVecs = Tables.embeddings(spark, Spec.sf0001)
        .filter($"vec_id" % 5 === 1)
        .select(($"vec_id" + off).as("vec_id"), $"embedding",
          element_at(
            graft.sim.Similarity.nearestCells("embedding", cents, 1), 1)
            .cast("bigint").cast("string").as("cell"))
      Seq(crashed, clean).foreach { t =>
        TxnTable.commitAppend(fresh, t._1)
        fresh.select($"doc_id",
            explode(split(lower($"text"), " ")).as("term"))
          .filter(length($"term") > 0)
          .groupBy($"term", $"doc_id").agg(count(lit(1)).as("tf"))
          .write.format("graft").mode("append").save(t._2)
        freshVecs.write.format("graft").mode("append").save(t._3)
      }
      assert(sameContent(crashed._1, clean._1, Seq("doc_id", "text")))
      assert(sameContent(crashed._2, clean._2,
        Seq("term", "doc_id", "tf")))
      assert(sameContent(crashed._3, clean._3, Seq("vec_id", "cell")))
      assert(spark.read.format("graft").load(crashed._2)
        .filter($"doc_id" % 6 === 0 && $"doc_id" < off).count() == 0L,
        "an erased doc resurfaced after the later ingest")
    }
  }
}
