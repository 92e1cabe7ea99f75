package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._

import graft.io.TxnTable

/** Randomized CONCURRENT fuzz over the write-audit-publish surface:
  * stager/publisher threads, ordinary appenders, an optimizer, and a
  * vacuumer fire at one table with no coordination. Invariants:
  *
  *   1. EXACTLY-ONCE LEDGER — the final table equals init + every
  *      ordinary append + every PUBLISHED stage exactly once, and no
  *      aborted stage's rows, regardless of interleaving (publish is
  *      a CAS competitor like any commit; its idempotent marker kills
  *      double-appends).
  *   2. AUDIT ISOLATION — between stage and publish, the stager's own
  *      audit sees its full batch while the live table never does.
  *   3. PIN UNDER CHURN — racing compact + vacuum never reap a
  *      pending stage's files (publish after the churn still lands
  *      the full batch).
  *   4. CLEAN EXIT — after the run every stage is published or
  *      aborted, no staged manifest survives, and a final VACUUM
  *      leaves the ledger intact. */
class WapFuzzSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark
  import spark.implicits._

  test("stage/publish/abort race appends, OPTIMIZE and VACUUM safely") {
    // dev knob: GRAFT_WAPFUZZ_EXTRA=8 widens the seed sweep for long
    // bug-hunting sessions without slowing the default suite
    val extra = sys.env.get("GRAFT_WAPFUZZ_EXTRA").map(_.toInt).getOrElse(0)
    (1 to (2 + extra)).foreach { seed =>
      val root = java.nio.file.Files.createTempDirectory("graft_wapfuzz").toFile
      val table = s"${root.getAbsolutePath}/t"
      try {
        val init = (0L until 20L).map(k => (k, k))
        init.toDF("k", "v").coalesce(2)
          .write.format("graft").option("statsCols", "k")
          .mode("overwrite").save(table)
        val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(pool)
        val landed =
          new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
        val appenders = (0 until 2).map { tid =>
          Future {
            val rnd = new scala.util.Random(seed * 100 + tid)
            (0 until 4).foreach { i =>
              val base = 1000000L * (tid + 1) + 1000L * i
              val rows = (0L until 3L).map(j => (base + j, base + j))
              TxnTable.commitAppend(rows.toDF("k", "v"), table)
              rows.foreach(landed.add)
              Thread.sleep(rnd.nextInt(20).toLong)
            }
          }
        }
        val stagers = (0 until 2).map { tid =>
          Future {
            val rnd = new scala.util.Random(seed * 100 + 10 + tid)
            (0 until 3).foreach { i =>
              val base = 10000000L * (tid + 1) + 1000L * i
              val rows = (0L until 4L).map(j => (base + j, base + j))
              // stager 0 exercises BATCH-SHAPED ids (the per-prefix
              // high-water marker path; ordinals strictly increase,
              // pairs take 2i/2i+1); stager 1 keeps random ids
              val sid = if (tid == 0) Some(s"fz${seed}q$tid-b${2 * i}")
                        else None
              val id = TxnTable.stageAppend(rows.toDF("k", "v"), table,
                statsCols = Seq("k"), stageId = sid)
              // audit isolation: the stage's own audit sees the batch,
              // the live table sees none of it
              assert(TxnTable.readStaged(spark, table, id)
                .filter($"k" >= base && $"k" < base + 4L).count() == 4L)
              assert(TxnTable.read(spark, table)
                .filter($"k" >= base && $"k" < base + 4L).count() == 0L)
              Thread.sleep(rnd.nextInt(25).toLong)
              var second: Option[String] = None
              try rnd.nextInt(3) match {
                case 0 => // single publish
                  TxnTable.publishStage(spark, table, id)
                  rows.foreach(landed.add)
                case 1 => // atomic PAIR promotion under the same races
                  val base2 = base + 100L
                  val rows2 =
                    (0L until 3L).map(j => (base2 + j, base2 + j))
                  val id2 = TxnTable.stageAppend(rows2.toDF("k", "v"),
                    table, statsCols = Seq("k"),
                    stageId = sid.map(_ => s"fz${seed}q$tid-b${2 * i + 1}"))
                  second = Some(id2)
                  TxnTable.publishStages(spark, table, Seq(id, id2))
                  rows.foreach(landed.add); rows2.foreach(landed.add)
                case _ =>
                  TxnTable.abortStage(spark, table, id)
              } catch {
                // a MISCONFIGURED retention sweep (threshold below the
                // audit latency — the documented retainMs-≥-latency
                // rule violated) may eat an in-flight stage: the
                // resolve throws, and the ledger must show NONE of its
                // rows — exactly-once degrades to exactly-zero, never
                // to a partial batch. Best-effort abort releases the
                // pair's surviving member
                case _: IllegalStateException | _: IllegalArgumentException =>
                  (Seq(id) ++ second).foreach { s =>
                    try TxnTable.abortStage(spark, table, s)
                    catch {
                      case scala.util.control.NonFatal(_) => ()
                    }
                  }
              }
            }
          }
        }
        // an ABANDONED audit: staged once, never resolved — the
        // retention sweep (raced below) must be what reaps it
        val abandoned = TxnTable.stageAppend(
          Seq((77777777L, 77777777L)).toDF("k", "v"), table,
          stageId = Some(s"fz${seed}abandoned"))
        val sweeper = Future {
          val rnd = new scala.util.Random(seed * 100 + 11)
          (0 until 4).foreach { _ =>
            Thread.sleep(60L + rnd.nextInt(40).toLong)
            // threshold far below the stagers' audit latency envelope:
            // most passes reap nothing, a stalled run exercises the
            // eaten-audit path the stagers tolerate above
            TxnTable.abortStagesOlderThan(spark, table, 200L)
            ()
          }
        }
        val optimizer = Future {
          val rnd = new scala.util.Random(seed * 100 + 7)
          (0 until 3).foreach { _ =>
            TxnTable.compact(spark, table, targetFiles = 2)
            Thread.sleep(rnd.nextInt(30).toLong)
          }
        }
        val vacuumer = Future {
          val rnd = new scala.util.Random(seed * 100 + 8)
          (0 until 4).foreach { _ =>
            // retainMs > run length: young in-flight writer dirs are
            // age-protected; pending stages are pinned by their staged
            // manifests regardless (the surface under test)
            TxnTable.vacuum(spark, table, keep = 0, retainMs = 120000L)
            Thread.sleep(rnd.nextInt(25).toLong)
          }
        }
        // the WAP/tag/retention TRIPLE POINT: a tagger pins versions
        // (some of them staged-then-published snapshots) and drops
        // earlier pins, racing the stagers, publishers, OPTIMIZE and
        // VACUUM — every surviving tag must still read its pinned
        // snapshot bit-for-bit after the final KEEP-0 vacuum
        val tags =
          new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
        val tagger = Future {
          val rnd = new scala.util.Random(seed * 100 + 9)
          (0 until 5).foreach { i =>
            val name = s"fz${seed}tag$i"
            val v = TxnTable.latestVersion(spark, table).get
            TxnTable.setTag(spark, table, name, Some(v))
            val n = spark.read.format("graft")
              .option("versionAsOf", v.toString).load(table).count()
            tags.add((name, n))
            if (i >= 2 && rnd.nextBoolean())
              Option(tags.poll()).foreach { case (old, _) =>
                TxnTable.deleteTag(spark, table, old) }
            Thread.sleep(rnd.nextInt(25).toLong)
          }
        }
        (appenders ++ stagers :+ optimizer :+ vacuumer :+ tagger
            :+ sweeper)
          .foreach(Await.result(_, 120.seconds))
        pool.shutdown()
        // the abandoned audit ages past the threshold for certain now;
        // some sweep — mid-run or this deterministic final one — must
        // have reaped it (and its row must never reach the ledger)
        Thread.sleep(210L)
        TxnTable.abortStagesOlderThan(spark, table, 200L)
        assert(!TxnTable.stagedIds(spark, table).contains(abandoned),
          s"seed $seed: the abandoned stage survived the sweep")
        // ambiguous batch-shaped leftovers (a skipped ordinal whose
        // pair publish was eaten by the sweep) are policy-exempt by
        // design — they take the documented operator remedy
        TxnTable.stagedIds(spark, table).foreach { sid =>
          try TxnTable.abortStage(spark, table, sid)
          catch { case scala.util.control.NonFatal(_) => () }
        }
        // clean exit: nothing staged survives the run
        assert(TxnTable.stagedIds(spark, table).isEmpty,
          s"seed $seed left staged manifests behind")
        // the exactly-once ledger, before and after a final vacuum
        def content(): Seq[(Long, Long)] =
          spark.read.format("graft").load(table)
            .as[(Long, Long)].collect().toSeq.sorted
        val want =
          (init ++ landed.toArray(Array.empty[(Long, Long)])).sorted
        assert(content() == want,
          s"seed $seed: ledger mismatch (${content().size} vs ${want.size})")
        TxnTable.vacuum(spark, table, keep = 0)
        assert(content() == want,
          s"seed $seed: final vacuum changed the ledger")
        // surviving tags read their pinned snapshot even below the
        // KEEP-0 retention floor (the k162/k163 pin, under fuzz churn)
        tags.toArray(Array.empty[(String, Long)]).foreach {
          case (name, n) =>
            val got = spark.read.format("graft")
              .option("tagAsOf", name).load(table).count()
            assert(got == n,
              s"seed $seed: tag $name read $got rows, pinned $n")
        }
      } finally {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(root)
      }
    }
  }
}
