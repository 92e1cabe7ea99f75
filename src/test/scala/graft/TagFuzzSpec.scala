package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._

import graft.io.TxnTable

/** Randomized CONCURRENT fuzz over the snapshot-tag surface: appender,
  * optimizer, vacuum, and tagger threads fire at one table with no
  * coordination. The invariants machine-check what TagSpec only
  * samples:
  *
  *   1. PIN STABILITY — once a tag survives its first post-set read,
  *      every later read of it succeeds and returns the SAME content
  *      until the owner drops it, no matter how many appends,
  *      OPTIMIZEs, and `VACUUM KEEP 0`s land in between. (setTag
  *      itself may refuse or dangle inside the documented near-zero
  *      setTag/vacuum window — the tagger then RE-TAGS, the documented
  *      user recovery; what must never happen is a verified pin going
  *      bad later, because every vacuum re-reads the tag map before
  *      reaping.)
  *   2. DATA INTEGRITY — tags and maintenance never change data: the
  *      final table equals init + every append, exactly once.
  *   3. RETENTION RELEASE — after dropping every surviving tag, one
  *      `VACUUM KEEP 0` leaves nothing reclaimable (dry run empty) and
  *      no below-floor manifest on disk: dropped-tag history must not
  *      outlive its pin.
  */
class TagFuzzSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark
  import spark.implicits._

  private def taggedCount(table: String, name: String): Long =
    spark.read.format("graft").option("tagAsOf", name).load(table).count()

  test("tags pin through racing append/OPTIMIZE/VACUUM; drops release") {
    // dev knob: GRAFT_TAGFUZZ_EXTRA widens the sweep for bug hunts
    val extra = sys.env.get("GRAFT_TAGFUZZ_EXTRA").map(_.toInt).getOrElse(0)
    (1 to (3 + extra)).foreach { seed =>
      val root = java.nio.file.Files.createTempDirectory("graft_tagfuzz").toFile
      val table = s"${root.getAbsolutePath}/t"
      try {
        val init = (0L until 20L).map(k => (k, k))
        init.toDF("k", "v").coalesce(2)
          .write.format("graft").option("statsCols", "k")
          .mode("overwrite").save(table)
        val pool = java.util.concurrent.Executors.newFixedThreadPool(5)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(pool)
        val appended =
          new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
        val appenders = (0 until 2).map { tid =>
          Future {
            val rnd = new scala.util.Random(seed * 100 + tid)
            (0 until 5).foreach { i =>
              val base = 1000000L * (tid + 1) + 1000L * i
              val rows = (0L until 3L).map(j => (base + j, base + j))
              TxnTable.commitAppend(rows.toDF("k", "v"), table)
              rows.foreach(appended.add)
              Thread.sleep(rnd.nextInt(20).toLong)
            }
          }
        }
        val optimizer = Future {
          val rnd = new scala.util.Random(seed * 100 + 7)
          (0 until 4).foreach { _ =>
            TxnTable.compact(spark, table, targetFiles = 2)
            Thread.sleep(rnd.nextInt(30).toLong)
          }
        }
        val vacuumer = Future {
          val rnd = new scala.util.Random(seed * 100 + 8)
          (0 until 6).foreach { _ =>
            // retainMs > run length: racing vacuums may reap MANIFESTS
            // below the floor (the tag-pin surface under test) but must
            // never touch young data dirs — retainMs=0 disables the age
            // gate and would reap an in-flight writer's uncommitted
            // files, which is documented-unsafe under concurrent writes
            // (the Delta "never vacuum below your job latency" rule)
            TxnTable.vacuum(spark, table, keep = 0, retainMs = 120000L)
            Thread.sleep(rnd.nextInt(25).toLong)
          }
        }
        val taggers = (0 until 2).map { tid =>
          Future {
            val rnd = new scala.util.Random(seed * 100 + 20 + tid)
            (0 until 3).foreach { i =>
              val name = s"t${tid}_$i"
              // SET with verification-retry: setTag may refuse (its
              // target vacuumed between probe and commit) or dangle
              // inside the near-zero race window — re-tagging a live
              // version is the documented recovery; both surface as
              // the read throwing here, never silently
              var pinned = -1L
              var tries = 0
              while (pinned < 0L && tries < 8) {
                tries += 1
                try {
                  // half the tags pin an OLDER retained version (the
                  // chainReadable + rescue-set surface); setTag may
                  // refuse if a racing vacuum reaps it first — retry
                  val v: Option[Long] =
                    if (rnd.nextBoolean()) None
                    else {
                      val vs = TxnTable.versions(spark, table)
                      Some(vs(rnd.nextInt(vs.size)))
                    }
                  TxnTable.setTag(spark, table, name, v)
                  pinned = taggedCount(table, name)
                } catch { case scala.util.control.NonFatal(_) => () }
              }
              assert(pinned >= 0L,
                s"seed $seed: tag $name never verified in $tries tries")
              // PIN STABILITY: a verified tag must read back the same
              // content forever after, racing vacuums notwithstanding
              (0 until 3).foreach { _ =>
                Thread.sleep(rnd.nextInt(25).toLong)
                val c = taggedCount(table, name)
                assert(c == pinned,
                  s"seed $seed: tag $name drifted: $pinned -> $c")
              }
              if (rnd.nextBoolean()) TxnTable.deleteTag(spark, table, name)
            }
          }
        }
        Await.result(
          Future.sequence(appenders ++ taggers :+ optimizer :+ vacuumer),
          10.minutes)
        pool.shutdown()
        // DATA INTEGRITY: the final state is init + every append
        val got = spark.read.format("graft").load(table)
          .select($"k", $"v").as[(Long, Long)].collect().toSeq
        val want = (init ++ appended.toArray(Array.empty[(Long, Long)])).sorted
        assert(got.sorted == want,
          s"seed $seed: final rows diverge (got ${got.size}, want ${want.size})")
        // surviving tags still read
        val survivors = TxnTable.tags(spark, table)
        survivors.keys.foreach(n => taggedCount(table, n))
        // RETENTION RELEASE: drop every tag; one vacuum must reclaim
        // ALL below-floor history — dry run empty, no stray manifest
        survivors.keys.foreach(n => TxnTable.deleteTag(spark, table, n))
        TxnTable.vacuum(spark, table, keep = 0, retainMs = 0L)
        val leftover = TxnTable.vacuumDryRun(spark, table, keep = 0)
        assert(leftover.isEmpty,
          s"seed $seed: dropped-tag history survived retention: $leftover")
        val retained = TxnTable.versions(spark, table)
        val onDisk = new java.io.File(table).listFiles()
          .map(_.getName).filter(n => n.startsWith("_v") && n.endsWith(".manifest"))
          .map(_.stripPrefix("_v").stripSuffix(".manifest").toLong).sorted.toSeq
        assert(onDisk == retained.sorted,
          s"seed $seed: manifests on disk $onDisk != retained $retained")
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
