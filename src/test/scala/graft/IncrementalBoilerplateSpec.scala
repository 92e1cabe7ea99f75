package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.TxnTable

/** d50: incremental C4 boilerplate purge with RETROACTIVE re-cleaning.
  * The global rule (a stride-3 passage in >= 3 distinct docs drops
  * everywhere, first occurrence included) is order-free, but batched
  * ingestion sees counts grow over time — documents committed before a
  * passage crossed the threshold must be re-cleaned when it does.
  * Checked against an in-JVM reference of the global rule on corpora
  * engineered to cross thresholds across batch boundaries, plus random
  * collision-heavy corpora with random cuts, plus the zero-rewrite
  * contract (retro fixes are positional updates). */
class IncrementalBoilerplateSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark
  import spark.implicits._

  private def withZone(body: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_d50s").toFile
    try body(root.getAbsolutePath)
    finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(root)
    }
  }

  // in-JVM reference of the global d45/d50 rule
  private def reference(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, String)] = {
    def passages(t: String): Seq[String] =
      t.split(" ", -1).grouped(3).map(_.mkString(" ")).toSeq
    val ndocs = docs.flatMap { case (id, t) =>
      passages(t).distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    docs.map { case (id, t) =>
      val ps = passages(t)
      val kept = ps.filter(p => ndocs(p) < 3)
      id -> ((ps.size.toLong, kept.size.toLong, kept.mkString(" ")))
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], cuts: (Long, Long),
                  zone: String): Map[Long, (Long, Long, String)] = {
    val df = docs.toDF("doc_id", "text")
    val (corpus, occs) = (s"$zone/clean", s"$zone/occs")
    graft.dedup.DedupOps.d50Ingest(spark, corpus, occs,
      df.filter($"doc_id" <= cuts._1), first = true)
    val before = TxnTable.morState(spark, corpus,
      TxnTable.latestVersion(spark, corpus).get).files.toSet
    graft.dedup.DedupOps.d50Ingest(spark, corpus, occs,
      df.filter($"doc_id" > cuts._1 && $"doc_id" <= cuts._2), first = false)
    graft.dedup.DedupOps.d50Ingest(spark, corpus, occs,
      df.filter($"doc_id" > cuts._2), first = false)
    val after = TxnTable.morState(spark, corpus,
      TxnTable.latestVersion(spark, corpus).get).files.toSet
    assert(before.subsetOf(after),
      "retro re-cleaning must never rewrite a committed file")
    spark.read.format("graft").load(corpus)
      .select($"doc_id", $"n_passages", $"n_kept", $"cleaned")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
  }

  test("a passage crossing the threshold in batch 3 purges batches 1-2") {
    withZone { zone =>
      val boiler = "c1 c2 c3" // one stride-3 passage
      val docs = Seq(
        (1L, s"$boiler a1 a2 a3"),       // batch 1: count 1 — kept
        (2L, s"b1 b2 b3 $boiler"),       // batch 2: count 2 — kept
        (3L, s"$boiler d1 d2 d3"),       // batch 3: count 3 — CROSSES
        (4L, "e1 e2 e3 e4 e5 e6"))       // batch 3: untouched
      val got = run(docs, (1L, 2L), zone)
      assert(got == reference(docs), got)
      // the retroactive fact, stated explicitly: docs 1 and 2 lost the
      // passage they were committed WITH
      assert(got(1L) == ((2L, 1L, "a1 a2 a3")), got(1L))
      assert(got(2L) == ((2L, 1L, "b1 b2 b3")), got(2L))
      assert(got(3L) == ((2L, 1L, "d1 d2 d3")), got(3L))
      assert(got(4L)._2 == 2L)
    }
  }

  test("already-hot passages clean incoming batches; no double retro") {
    withZone { zone =>
      val boiler = "c1 c2 c3"
      val docs = Seq(
        (1L, s"$boiler x1 x2 x3"), (2L, s"$boiler y1 y2 y3"),
        (3L, s"$boiler z1 z2 z3"), // hot by end of batch 2
        (4L, s"$boiler w1 w2 w3"), // batch 3: arrives already-hot
        (5L, "u1 u2 u3"))
      val got = run(docs, (2L, 3L), zone)
      assert(got == reference(docs), got)
      assert(got(4L) == ((2L, 1L, "w1 w2 w3")), got(4L))
    }
  }

  /** The largest literal fan-out any expression of an optimized plan
    * carries: In-list length, InSet size, or array-literal element
    * count (typedLit). The retroactive leg must keep its affected-doc
    * selection and hot-set subtraction as FRAMES — a driver-collected
    * spelling shows up here as a crossings-sized literal. */
  private def maxLiteralFanout(
      qe: org.apache.spark.sql.execution.QueryExecution): Int = {
    import org.apache.spark.sql.catalyst.expressions.{In, InSet, Literal}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.ArrayType
    val sizes = qe.optimizedPlan.flatMap { n =>
      n.expressions.flatMap(_.collect {
        case i: In => i.list.size
        case s: InSet => s.hset.size
        case l: Literal
            if l.dataType.isInstanceOf[ArrayType] && l.value != null =>
          l.value.asInstanceOf[ArrayData].numElements()
      })
    }
    if (sizes.isEmpty) 0 else sizes.max
  }

  test("a 1000-crossing ingest stays literal-free in every plan") {
    withZone { zone =>
      val n = 1000
      // shared passage j appears in docs j (batch 1), n+j (batch 2),
      // and 2n+j (batch 3): every one of the n passages crosses the
      // >= 3 threshold IN THE SAME third ingest, so the retroactive
      // leg must re-clean 2n prior documents at once
      def doc(id: Long, j: Int): (Long, String) =
        (id, s"c${j}a c${j}b c${j}c u${id}a u${id}b u${id}c")
      val b1 = (1 to n).map(j => doc(j.toLong, j))
      val b2 = (1 to n).map(j => doc((n + j).toLong, j))
      val b3 = (1 to n).map(j => doc((2 * n + j).toLong, j))
      val (corpus, occs) = (s"$zone/clean", s"$zone/occs")
      graft.dedup.DedupOps.d50Ingest(spark, corpus, occs,
        b1.toDF("doc_id", "text"), first = true)
      graft.dedup.DedupOps.d50Ingest(spark, corpus, occs,
        b2.toDF("doc_id", "text"), first = false)
      val plans = new java.util.concurrent.ConcurrentLinkedQueue[
        org.apache.spark.sql.execution.QueryExecution]()
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = { plans.add(qe); () }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      try graft.dedup.DedupOps.d50Ingest(spark, corpus, occs,
        b3.toDF("doc_id", "text"), first = false)
      finally {
        // listener events deliver asynchronously — drain before reading
        org.apache.spark.sql.GraftBridge.waitListenerBus(spark)
        spark.listenerManager.unregister(listener)
      }
      val captured = plans.toArray(
        Array.empty[org.apache.spark.sql.execution.QueryExecution])
      assert(captured.nonEmpty, "the listener saw no executed queries")
      val fan = captured.map(maxLiteralFanout).max
      assert(fan < 600,
        s"an ingest-3 plan carried a $fan-element literal list — the " +
          "retroactive leg must stay frame-joined, not driver-collected")
      // and the retroactive result still equals the global rule
      val got = spark.read.format("graft").load(corpus)
        .select($"doc_id", $"n_passages", $"n_kept", $"cleaned")
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      val want = reference(b1 ++ b2 ++ b3)
      assert(got.size == want.size)
      // spot-check the crossing semantics + full equality
      assert(got(1L) == ((2L, 1L, "u1a u1b u1c")), got(1L))
      assert(got((n + 1).toLong)._2 == 1L)
      assert(got == want)
    }
  }

  test("property: matches the global rule on random corpora, random cuts") {
    val rnd = new scala.util.Random(99)
    val vocab = Vector("a", "b", "c")
    (1 to 5).foreach { trial =>
      withZone { zone =>
        val n = 8 + rnd.nextInt(7)
        val docs = (1L to n.toLong).map { i =>
          (i, Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
            .mkString(" "))
        }
        val c1 = 1L + rnd.nextInt(n - 2)
        val c2 = c1 + 1L + rnd.nextInt(n - c1.toInt - 1)
        val got = run(docs, (c1, c2), zone)
        val want = reference(docs)
        assert(got == want,
          s"trial $trial (cuts $c1/$c2):\n got=$got\nwant=$want\ndocs=$docs")
      }
    }
  }
}
