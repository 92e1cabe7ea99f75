package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._

import graft.io.TxnTable

/** Randomized CONCURRENT-INGEST fuzz over the d47 incremental-dedup
  * protocol: N threads each run one full d47Ingest (corpus append →
  * signature probe → loser delete → signature append → re-probe) at
  * the same corpus/signature pair with no coordination beyond a start
  * barrier. This is the one concurrency hazard the DML fuzz family
  * cannot cover: the probe-then-commit window is SEMANTIC — the racing
  * writers' files are disjoint, so the manifest CAS happily
  * interleaves the commits, yet each probe judged a snapshot missing
  * the other batch's signatures, and without recovery both sides of a
  * cross-batch dup pair admit.
  *
  * The serializability oracle, in the DmlFuzz discipline: the
  * signature table's manifest CAS linearizes the ingests — the version
  * at which each batch's signature append landed IS its place in the
  * serial order. The checker recovers that order from the signature
  * history (each append version's file delta carries exactly one
  * batch's doc ids), replays the SAME batches serially in that order
  * through the SAME d47Ingest on twin tables, and REQUIREs the raced
  * corpus and signature states equal the twins' — "final state equals
  * SOME serial order of the batches", with the CAS pinning which one.
  *
  * Dup engineering: every doc draws its text from a small seeded pool
  * of content classes (identical text ⇒ identical minhash bands), so
  * cross-batch dup pairs exist by construction and the stale-probe
  * hazard is live in every scenario. A vacuity guard REQUIREs the
  * re-probe recovery actually fired (DedupOps.reprobeWindows advanced)
  * — the race was observed, not merely survived.
  *
  * Contract under test: probePersisted's "re-probe on CAS loss"
  * (dedup/DedupOps.scala) — d47Ingest pins the version its probe
  * judged, lands its signature append via commitAppend (which returns
  * the landed version), and re-judges its batch against exactly the
  * foreign appends in (probed, landed), positionally deleting the
  * late losers. */
class IngestFuzzSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark
  import spark.implicits._

  // content classes: distinct word streams so different classes never
  // share a minhash band, long enough (>= 10 tokens) for 3-gram
  // shingles; identical within a class by construction
  private def classText(c: Int): String =
    (0 until 16).map(w => s"class$c word${(c * 31 + w * 7) % 97} tok$w")
      .mkString(" ")

  private def batchDf(batch: Int, docs: Seq[(Long, Int)]) = {
    val rows = docs.map { case (id, cls) =>
      (batch * 1000L + id, classText(cls))
    }
    rows.toDF("doc_id", "text")
  }

  private def batchPred(batch: Int) = {
    val lo = batch * 1000L
    col("doc_id") >= lo && col("doc_id") < lo + 1000L
  }

  private def snap(table: String, cols: Seq[String]): Seq[Seq[String]] =
    spark.read.format("graft").load(table)
      .select(cols.map(col): _*)
      .collect().map(r => cols.indices.map(i => String.valueOf(r.get(i))))
      .toSeq.sortBy(_.mkString("|"))

  test("racing d47 ingests equal the serial replay in signature-" +
      "landed order (seeded)") {
    val racers = 3
    val docsPerBatch = 12
    val classes = 8 // < racers × docsPerBatch ⇒ dups guaranteed
    // dev knob: GRAFT_INGESTFUZZ_EXTRA widens the sweep for bug hunts
    val scenarios = 4 + sys.env.get("GRAFT_INGESTFUZZ_EXTRA")
      .map(_.toInt).getOrElse(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(racers)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val windowsBefore = graft.dedup.DedupOps.reprobeWindows.get()
    try (1 to scenarios).foreach { seed =>
      val root =
        java.nio.file.Files.createTempDirectory("graft_ingestfuzz").toFile
      try {
        val rnd = new scala.util.Random(seed)
        // batch 0 seeds the tables serially (first = true); batches
        // 1..racers race. Class assignment is seeded-random, so every
        // scenario carries a different cross-batch dup topology.
        val batches = (0 to racers).map { b =>
          b -> (0 until docsPerBatch)
            .map(i => (i.toLong, rnd.nextInt(classes)))
        }.toMap
        val corpus = s"${root.getAbsolutePath}/corpus"
        val sigs = s"${root.getAbsolutePath}/sigs"
        graft.dedup.DedupOps.d47Ingest(spark, corpus, sigs,
          batchDf(0, batches(0)), first = true, batchPred(0))
        val vSeed = TxnTable.latestVersion(spark, sigs).get
        // start barrier: all racers probe the SAME pre-race snapshot,
        // maximizing the stale-probe overlap the spec exists to pin
        val gate = new java.util.concurrent.CountDownLatch(racers)
        val futures = (1 to racers).map { b =>
          Future {
            // each racer gets its own session (per-session SQL conf),
            // the shape of independent ingest jobs sharing one cluster
            val s = spark.newSession()
            gate.countDown(); gate.await()
            graft.dedup.DedupOps.d47Ingest(s, corpus, sigs,
              batchDf(b, batches(b)), first = false, batchPred(b))
          }
        }
        Await.result(Future.sequence(futures), 10.minutes)
        // recover the serialization order the signature CAS
        // established: each post-seed version's file delta carries
        // exactly one batch's signatures
        val vLast = TxnTable.latestVersion(spark, sigs).get
        val landedOrder = (vSeed + 1 to vLast).map { v =>
          val ids = TxnTable.readChangesBetween(spark, sigs, v - 1, v)
            .select($"doc_id").distinct().as[Long].collect()
          assert(ids.nonEmpty, s"seed $seed: empty sig commit at $v")
          val bs = ids.map(id => (id / 1000L).toInt).distinct
          assert(bs.length == 1,
            s"seed $seed: sig version $v mixes batches ${bs.toSeq}")
          bs.head
        }
        assert(landedOrder.sorted == (1 to racers),
          s"seed $seed: landed order $landedOrder is not a " +
            "permutation of the racers")
        // serial replay of the SAME batches in landed order on twins
        val corpus2 = s"${root.getAbsolutePath}/corpus2"
        val sigs2 = s"${root.getAbsolutePath}/sigs2"
        graft.dedup.DedupOps.d47Ingest(spark, corpus2, sigs2,
          batchDf(0, batches(0)), first = true, batchPred(0))
        landedOrder.foreach { b =>
          graft.dedup.DedupOps.d47Ingest(spark, corpus2, sigs2,
            batchDf(b, batches(b)), first = false, batchPred(b))
        }
        val gotC = snap(corpus, Seq("doc_id", "text"))
        val wantC = snap(corpus2, Seq("doc_id", "text"))
        assert(gotC == wantC,
          s"seed $seed (landed $landedOrder): raced corpus != serial " +
            s"replay — got ${gotC.size} rows " +
            s"[${gotC.map(_.head).mkString(",")}], want ${wantC.size} " +
            s"[${wantC.map(_.head).mkString(",")}]")
        val gotS = snap(sigs, Seq("doc_id", "b", "h"))
        val wantS = snap(sigs2, Seq("doc_id", "b", "h"))
        assert(gotS == wantS,
          s"seed $seed: raced signature state != serial replay " +
            s"(${gotS.size} vs ${wantS.size} rows)")
      } finally {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(root)
      }
    } finally pool.shutdown()
    // vacuity guard: the recovery path must have RUN — a fuzz whose
    // racers never overlapped would pass the equality trivially
    assert(graft.dedup.DedupOps.reprobeWindows.get() > windowsBefore,
      "no racer ever observed a foreign window — the race never " +
        "happened and the spec checked nothing")
  }

  // span-dedup flavor: the stale probe doesn't just admit a row, it
  // writes WRONG CLEANED TEXT — the recovery must REPLACE the
  // affected corpus rows (replacePositions), not merely delete
  private def spanBatchDf(batch: Int, docs: Seq[(Long, Option[Int])]) = {
    val rows = docs.map { case (i, cls) =>
      val id = batch * 1000L + i
      val words = (0 until 20).map(w => s"w${id}x$w")
      val text = cls match {
        case Some(c) =>
          (words.take(5) ++ (0 until 10).map(j => s"run${c}tok$j") ++
            words.drop(15)).mkString(" ")
        case None => words.mkString(" ")
      }
      (id, text)
    }
    rows.toDF("doc_id", "text")
  }

  test("racing d49 span-dedup ingests equal the serial replay — " +
      "cleaned text included (seeded)") {
    val racers = 3
    val docsPerBatch = 10
    val runs = 6 // shared-span classes; < racers × docs ⇒ overlap
    val scenarios = 3 + sys.env.get("GRAFT_INGESTFUZZ_EXTRA")
      .map(_.toInt).getOrElse(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(racers)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val windowsBefore = graft.dedup.DedupOps.reprobeWindows.get()
    try (1 to scenarios).foreach { seed =>
      val root = java.nio.file.Files
        .createTempDirectory("graft_ingestfuzz49").toFile
      try {
        val rnd = new scala.util.Random(7000 + seed)
        // ~2/3 of docs carry a shared 10-word run (3 overlapping
        // 8-gram shingles) drawn from a small pool — cross-batch span
        // dups by construction
        val batches = (0 to racers).map { b =>
          b -> (0 until docsPerBatch).map(i => (i.toLong,
            if (rnd.nextInt(3) < 2) Some(rnd.nextInt(runs)) else None))
        }.toMap
        val corpus = s"${root.getAbsolutePath}/clean"
        val grams = s"${root.getAbsolutePath}/grams"
        graft.dedup.DedupOps.d49Ingest(spark, corpus, grams,
          spanBatchDf(0, batches(0)), first = true)
        val vSeed = TxnTable.latestVersion(spark, grams).get
        val gate = new java.util.concurrent.CountDownLatch(racers)
        val futures = (1 to racers).map { b =>
          Future {
            val s = spark.newSession()
            gate.countDown(); gate.await()
            graft.dedup.DedupOps.d49Ingest(s, corpus, grams,
              spanBatchDf(b, batches(b)), first = false)
          }
        }
        Await.result(Future.sequence(futures), 10.minutes)
        val vLast = TxnTable.latestVersion(spark, grams).get
        val landedOrder = (vSeed + 1 to vLast).map { v =>
          val ids = TxnTable.readChangesBetween(spark, grams, v - 1, v)
            .select($"doc_id").distinct().as[Long].collect()
          assert(ids.nonEmpty, s"seed $seed: empty gram commit at $v")
          val bs = ids.map(id => (id / 1000L).toInt).distinct
          assert(bs.length == 1,
            s"seed $seed: gram version $v mixes batches ${bs.toSeq}")
          bs.head
        }
        assert(landedOrder.sorted == (1 to racers),
          s"seed $seed: landed order $landedOrder is not a " +
            "permutation of the racers")
        val corpus2 = s"${root.getAbsolutePath}/clean2"
        val grams2 = s"${root.getAbsolutePath}/grams2"
        graft.dedup.DedupOps.d49Ingest(spark, corpus2, grams2,
          spanBatchDf(0, batches(0)), first = true)
        landedOrder.foreach { b =>
          graft.dedup.DedupOps.d49Ingest(spark, corpus2, grams2,
            spanBatchDf(b, batches(b)), first = false)
        }
        val cols = Seq("doc_id", "n_words", "n_removed", "cleaned")
        val gotC = snap(corpus, cols)
        val wantC = snap(corpus2, cols)
        assert(gotC == wantC,
          s"seed $seed (landed $landedOrder): raced cleaned corpus != " +
            s"serial replay (${gotC.size} vs ${wantC.size} rows; " +
            s"first diff: ${gotC.zip(wantC).find(p => p._1 != p._2)})")
        val gotG = snap(grams, Seq("doc_id", "pos", "h"))
        val wantG = snap(grams2, Seq("doc_id", "pos", "h"))
        assert(gotG == wantG,
          s"seed $seed: raced gram state != serial replay " +
            s"(${gotG.size} vs ${wantG.size} rows)")
      } finally {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(root)
      }
    } finally pool.shutdown()
    assert(graft.dedup.DedupOps.reprobeWindows.get() > windowsBefore,
      "no d49 racer ever observed a foreign window — the race never " +
        "happened and the spec checked nothing")
  }

  // media flavor (m70): the keep rule is EARLIER-ID, not
  // earlier-arrival — ids interleave ACROSS the racing batches, so a
  // foreign batch that landed first can hold both smaller ids (this
  // batch's docs must late-lose to them) and larger ids (which
  // legitimately survive, exactly as they would arriving first
  // serially); the serial replay in landed order pins both directions
  test("racing m70 media ingests with interleaved ids equal the " +
      "serial replay (seeded)") {
    val racers = 3
    val stride = racers + 1 // batch b owns ids ≡ b (mod stride)
    val docsPerBatch = 10
    val classes = 6
    val scenarios = 3 + sys.env.get("GRAFT_INGESTFUZZ_EXTRA")
      .map(_.toInt).getOrElse(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(racers)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val windowsBefore = graft.dedup.DedupOps.reprobeWindows.get()
    def fpOf(cls: Int): Long = // distinct beyond any 16-bit Hamming band
      0x9E3779B97F4A7C15L * (cls + 1) ^ (cls.toLong << 37)
    def mediaBatch(b: Int, docs: Seq[(Int, Int)]) =
      docs.map { case (i, cls) => (i.toLong * stride + b, fpOf(cls)) }
        .toDF("img_id", "fp")
    try (1 to scenarios).foreach { seed =>
      val root = java.nio.file.Files
        .createTempDirectory("graft_ingestfuzz70").toFile
      try {
        val rnd = new scala.util.Random(9000 + seed)
        val batches = (0 to racers).map { b =>
          b -> (0 until docsPerBatch).map(i => (i, rnd.nextInt(classes)))
        }.toMap
        val corpus = s"${root.getAbsolutePath}/imgs"
        val sigs = s"${root.getAbsolutePath}/isigs"
        graft.multimodal.MultimodalOps.m70Ingest(spark, corpus, sigs,
          mediaBatch(0, batches(0)), first = true,
          pmod(col("img_id"), lit(stride)) === 0)
        val vSeed = TxnTable.latestVersion(spark, sigs).get
        val gate = new java.util.concurrent.CountDownLatch(racers)
        val futures = (1 to racers).map { b =>
          Future {
            val s = spark.newSession()
            gate.countDown(); gate.await()
            graft.multimodal.MultimodalOps.m70Ingest(s, corpus, sigs,
              mediaBatch(b, batches(b)), first = false,
              pmod(col("img_id"), lit(stride)) === b)
          }
        }
        Await.result(Future.sequence(futures), 10.minutes)
        val vLast = TxnTable.latestVersion(spark, sigs).get
        val landedOrder = (vSeed + 1 to vLast).map { v =>
          val ids = TxnTable.readChangesBetween(spark, sigs, v - 1, v)
            .select($"pid").distinct().as[Long].collect()
          assert(ids.nonEmpty, s"seed $seed: empty sig commit at $v")
          val bs = ids.map(id => (id % stride).toInt).distinct
          assert(bs.length == 1,
            s"seed $seed: sig version $v mixes batches ${bs.toSeq}")
          bs.head
        }
        assert(landedOrder.sorted == (1 to racers),
          s"seed $seed: landed order $landedOrder is not a " +
            "permutation of the racers")
        val corpus2 = s"${root.getAbsolutePath}/imgs2"
        val sigs2 = s"${root.getAbsolutePath}/isigs2"
        graft.multimodal.MultimodalOps.m70Ingest(spark, corpus2, sigs2,
          mediaBatch(0, batches(0)), first = true,
          pmod(col("img_id"), lit(stride)) === 0)
        landedOrder.foreach { b =>
          graft.multimodal.MultimodalOps.m70Ingest(spark, corpus2, sigs2,
            mediaBatch(b, batches(b)), first = false,
            pmod(col("img_id"), lit(stride)) === b)
        }
        val gotC = snap(corpus, Seq("img_id", "fp"))
        val wantC = snap(corpus2, Seq("img_id", "fp"))
        assert(gotC == wantC,
          s"seed $seed (landed $landedOrder): raced media corpus != " +
            s"serial replay — got ${gotC.size} " +
            s"[${gotC.map(_.head).mkString(",")}], want ${wantC.size} " +
            s"[${wantC.map(_.head).mkString(",")}]")
        val gotS = snap(sigs, Seq("bk", "pid", "pfp"))
        val wantS = snap(sigs2, Seq("bk", "pid", "pfp"))
        assert(gotS == wantS,
          s"seed $seed: raced media sig state != serial replay " +
            s"(${gotS.size} vs ${wantS.size} rows)")
      } finally {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(root)
      }
    } finally pool.shutdown()
    assert(graft.dedup.DedupOps.reprobeWindows.get() > windowsBefore,
      "no m70 racer ever observed a foreign window — the race never " +
        "happened and the spec checked nothing")
  }

  // video flavor (m75): the set-Jaccard judge (shared ≥ 2 +
  // integer-exact 2·shared ≥ n+pn−shared) re-applied over the foreign
  // window, with the per-clip set size riding the foreign rows — the
  // one adopter whose judge aggregates instead of filtering
  test("racing m75 video ingests with interleaved ids equal the " +
      "serial replay (seeded)") {
    val racers = 3
    val stride = racers + 1
    val clipsPerBatch = 8
    val classes = 5
    val scenarios = 3 + sys.env.get("GRAFT_INGESTFUZZ_EXTRA")
      .map(_.toInt).getOrElse(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(racers)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val windowsBefore = graft.dedup.DedupOps.reprobeWindows.get()
    // same class ⇒ identical 3-keyframe set (shared 3, Jaccard 1);
    // different classes share nothing
    def videoBatch(b: Int, clips: Seq[(Int, Int)]) =
      clips.flatMap { case (i, cls) =>
        (0 until 3).map(j => (i.toLong * stride + b, cls * 1000L + j))
      }.toDF("clip_id", "fp")
    try (1 to scenarios).foreach { seed =>
      val root = java.nio.file.Files
        .createTempDirectory("graft_ingestfuzz75").toFile
      try {
        val rnd = new scala.util.Random(11000 + seed)
        val batches = (0 to racers).map { b =>
          b -> (0 until clipsPerBatch).map(i => (i, rnd.nextInt(classes)))
        }.toMap
        val corpus = s"${root.getAbsolutePath}/vclips"
        val sigs = s"${root.getAbsolutePath}/vsigs"
        graft.multimodal.MultimodalOps.m75Ingest(spark, corpus, sigs,
          videoBatch(0, batches(0)), first = true,
          pmod(col("clip_id"), lit(stride)) === 0)
        val vSeed = TxnTable.latestVersion(spark, sigs).get
        val gate = new java.util.concurrent.CountDownLatch(racers)
        val futures = (1 to racers).map { b =>
          Future {
            val s = spark.newSession()
            gate.countDown(); gate.await()
            graft.multimodal.MultimodalOps.m75Ingest(s, corpus, sigs,
              videoBatch(b, batches(b)), first = false,
              pmod(col("clip_id"), lit(stride)) === b)
          }
        }
        Await.result(Future.sequence(futures), 10.minutes)
        val vLast = TxnTable.latestVersion(spark, sigs).get
        val landedOrder = (vSeed + 1 to vLast).map { v =>
          val ids = TxnTable.readChangesBetween(spark, sigs, v - 1, v)
            .select($"pid").distinct().as[Long].collect()
          assert(ids.nonEmpty, s"seed $seed: empty sig commit at $v")
          val bs = ids.map(id => (id % stride).toInt).distinct
          assert(bs.length == 1,
            s"seed $seed: sig version $v mixes batches ${bs.toSeq}")
          bs.head
        }
        assert(landedOrder.sorted == (1 to racers),
          s"seed $seed: landed order $landedOrder is not a " +
            "permutation of the racers")
        val corpus2 = s"${root.getAbsolutePath}/vclips2"
        val sigs2 = s"${root.getAbsolutePath}/vsigs2"
        graft.multimodal.MultimodalOps.m75Ingest(spark, corpus2, sigs2,
          videoBatch(0, batches(0)), first = true,
          pmod(col("clip_id"), lit(stride)) === 0)
        landedOrder.foreach { b =>
          graft.multimodal.MultimodalOps.m75Ingest(spark, corpus2, sigs2,
            videoBatch(b, batches(b)), first = false,
            pmod(col("clip_id"), lit(stride)) === b)
        }
        val gotC = snap(corpus, Seq("clip_id", "n"))
        val wantC = snap(corpus2, Seq("clip_id", "n"))
        assert(gotC == wantC,
          s"seed $seed (landed $landedOrder): raced video corpus != " +
            s"serial replay — got ${gotC.size} " +
            s"[${gotC.map(_.head).mkString(",")}], want ${wantC.size} " +
            s"[${wantC.map(_.head).mkString(",")}]")
        val gotS = snap(sigs, Seq("fp", "pid", "pn"))
        val wantS = snap(sigs2, Seq("fp", "pid", "pn"))
        assert(gotS == wantS,
          s"seed $seed: raced video sig state != serial replay " +
            s"(${gotS.size} vs ${wantS.size} rows)")
      } finally {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(root)
      }
    } finally pool.shutdown()
    assert(graft.dedup.DedupOps.reprobeWindows.get() > windowsBefore,
      "no m75 racer ever observed a foreign window — the race never " +
        "happened and the spec checked nothing")
  }
}
