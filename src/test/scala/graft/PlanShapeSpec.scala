package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.{Tables, TxnTable}

/** Plan-shape regression guards for the headline bench queries — cheap
  * insurance that AQE tuning or a refactor can't silently reintroduce a
  * shuffle the 100 TB story depends on. Assertions run on the REGISTERED
  * query functions (the exact plans Verify/Bench execute), at the
  * logical/physical level before execution. */
class PlanShapeSpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  private def planOf(name: String): String =
    Registry.queries(name)(spark, Spec.sf0001)
      .queryExecution.executedPlan.toString

  private def scanCount(name: String): Int =
    Registry.queries(name)(spark, Spec.sf0001)
      .queryExecution.optimizedPlan.collectLeaves().size

  test("q02 maxscale: exactly 2 scans (one data pass + one stats pass)") {
    // the flagship shape: ONE global aggregate crossJoined into the
    // projection — not the reference's 11-scans-per-action
    assert(scanCount("q02_maxscale_features") == 2,
      s"q02 must read the wallet data exactly twice, got " +
        s"${scanCount("q02_maxscale_features")} scans")
  }

  test("q04/q05 joins broadcast the dimension side (no SortMergeJoin)") {
    Seq("q04_star_join_agg", "q05_multiway_join").foreach { q =>
      val plan = planOf(q)
      assert(!plan.contains("SortMergeJoin"),
        s"$q must broadcast its dimension joins; plan:\n$plan")
      assert(plan.contains("BroadcastHashJoin"),
        s"$q expected broadcast hash joins; plan:\n$plan")
    }
  }

  test("a50 bucketed join plans with zero Exchange even when broadcast is off") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Registry.queries("a50_bucketed_join")(spark, Spec.sf0001)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"a50's bucketed join must not shuffle; plan:\n$plan")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
  }

  test("t48 token-budget: corpus windows per (source, bucket), offsets broadcast") {
    import org.apache.spark.sql.catalyst.plans.logical
    val df = Registry.queries("t48_token_budget")(spark, Spec.sf0001)
    // the CORPUS window (ordered by doc_id — the one that touches every
    // row) must key on (source, bucket); the offsets window (ordered by
    // bucket) runs over the tiny per-bucket counts frame and may key on
    // source alone by design
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: logical.Window =>
        (w.partitionSpec.map(_.toString), w.orderSpec.map(_.child.toString)) }
    val corpus = windows.filter(_._2.exists(_.contains("doc_id")))
    assert(corpus.nonEmpty, "expected the doc_id-ordered corpus window")
    assert(corpus.forall { case (keys, _) =>
        keys.exists(_.contains("source")) && keys.exists(_.contains("bucket")) },
      s"the corpus window must key on (source, bucket); got: " +
        corpus.map(_._1.mkString("+")).mkString(" | "))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket offsets must broadcast back onto the corpus side:\n$plan")
  }

  test("t49 unigram scoring: no cartesian product, one-row total broadcast") {
    val df = Registry.queries("t49_unigram_logprob")(spark, Spec.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // the token⋈vocab join must be an equi-join (hash or broadcast —
    // AQE picks); the corpus-total crossJoin is a one-row broadcast
    assert(!plan.contains("CartesianProduct"),
      s"t49 must never plan a cartesian product; plan:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"t49's scalar total must broadcast; plan:\n$plan")
  }

  test("m68 phash near-dup: candidates come from band keys, never a cross join") {
    // the LSH contract: the image self-join must be an EQUI-join on
    // (band_idx, band_value) — a cartesian/NLJ here is quadratic in
    // images and the whole point of banding is to avoid it
    val df = Registry.queries("m68_phash_neardup")(spark, Spec.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"m68 must join on LSH band keys only, nothing pairwise; plan:\n$plan")
  }

  test("m72 video near-dup: candidates come from fingerprint keys, " +
      "never clip×clip") {
    // the keyframe-fingerprint contract: the clip self-join must be an
    // EQUI-join on fp — a cartesian/NLJ is quadratic in clips and the
    // whole point of fingerprint keys is to avoid it. Pin the LAZY
    // frame (the registered query collects internally for its recall
    // REQUIREs, whose plan is just a LocalTableScan)
    val df = graft.multimodal.MultimodalOps.m72Frame(spark, Spec.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"m72 must join on fingerprint keys only, nothing pairwise; " +
        s"plan:\n$plan")
  }

  test("d48 span dedup: keyed shuffles only, nothing pairwise") {
    // corpus-wide substring dedup must cost keyed exchanges (shingle
    // window, doc_id rebuild/join) — never a pairwise join: duplicate
    // text 10^6 copies deep is one window partition, not 10^12 pairs
    val df = Registry.queries("d48_span_dedup")(spark, Spec.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"d48 must stay keyed, nothing pairwise; plan:\n$plan")
    val keyed = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(keyed <= 5,
      s"d48 expected at most 5 keyed exchanges (shingle min-agg + flag " +
        s"join, covered groupBy, rebuild join sides), got $keyed; " +
        s"plan:\n$plan")
    // the keep-first must be aggregation + join, never a corpus window
    // (a hot boilerplate shingle would pin one reducer)
    assert(!plan.contains("RunningWindowFunction") &&
      !plan.contains("Window "),
      s"d48 keep-first must not use a window; plan:\n$plan")
  }

  test("keep-first/keep-best dedup plans a min-agg, never a window") {
    // the skew contract of the r14 respell: a mass-duplicated
    // fingerprint/passage must partial-aggregate map-side, not pin a
    // window reducer (d33 keeps its window deliberately — its OUTPUT is
    // the per-occurrence rank)
    Seq("d34_dedup_exact", "d41_dedup_keep_best", "d43_passage_dedup",
      "p90_training_pipeline").foreach { q =>
      val plan = planOf(q)
      assert(!plan.contains("Window"),
        s"$q must keep-first via min-agg, not a window; plan:\n$plan")
    }
  }

  test("d45 boilerplate purge: the hot-passage set broadcasts") {
    val df = Registry.queries("d45_boilerplate_purge")(spark, Spec.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"d45's hot set must broadcast into the purge join; plan:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"d45 must never plan a cartesian product; plan:\n$plan")
  }

  test("t53 mixture sample: quotas broadcast, one corpus window shuffle") {
    // the quota math collapses to #sources rows and must ride back on
    // broadcasts; the only corpus-sized exchange is the source-keyed
    // selection window (+ the reporting agg/sort downstream of it)
    val df = Registry.queries("t53_mixture_sample")(spark, Spec.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"),
      s"t53's quota joins must broadcast; plan:\n$plan")
  }

  test("t55 BM25 / e62 RRF: top-k is TakeOrdered, windows only above limits") {
    import org.apache.spark.sql.catalyst.plans.logical
    Seq("t55_bm25_rank", "e62_hybrid_rrf").foreach { q =>
      val df = Registry.queries(q)(spark, Spec.sf0001)
      // ranking must be a per-partition partial top-k merge, never a
      // corpus-wide Sort — the shape the 100 TB story depends on
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"),
        s"$q's top-k must plan as TakeOrderedAndProject; plan:\n$plan")
      // any window (the rank stamp) must sit ABOVE a limit: it runs on
      // the ≤20-row result frame, never over the corpus
      val windows = df.queryExecution.optimizedPlan.collect {
        case w: logical.Window => w }
      assert(windows.forall(_.child.collectFirst {
          case l: logical.GlobalLimit => l }.nonEmpty),
        s"$q has a window not fed by a limit — a corpus-wide rank")
    }
  }

  test("a57 funnel: conditional-min aggregate, no window over events") {
    import org.apache.spark.sql.catalyst.plans.logical
    val df = Registry.queries("a57_funnel_steps")(spark, Spec.sf0001)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: logical.Window => w }
    assert(windows.isEmpty,
      "the funnel must be aggregate-shaped, not a window over the event stream")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_min") || plan.contains("HashAggregate"),
      s"expected map-side-combinable aggregation; plan:\n$plan")
  }

  test("merge-on-read read subtracts deletes via a BROADCAST anti-join") {
    val zone = java.nio.file.Files.createTempDirectory("graft_planshape").toString
    try {
      import spark.implicits._
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        Seq.range(0L, 200L).map(k => (k, k * 1.0)).toDF("k", "v"),
        table, statsCols = Seq("k"))
      TxnTable.deleteWhereMoR(spark, table, Seq("k"), df => df("k") < 10L)
      val plan = TxnTable.read(spark, table).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
        s"MoR subtraction must be a broadcast anti-join; plan:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"MoR subtraction must not shuffle the data side; plan:\n$plan")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(zone))
    }
  }

  test("positional deletes subtract INSIDE the scan: no join, no union") {
    val zone = java.nio.file.Files.createTempDirectory("graft_planshape").toString
    try {
      import spark.implicits._
      val table = s"$zone/t"
      Seq.range(0L, 200L).map(k => (k, k * 1.0)).toDF("k", "v")
        .write.format("graft").option("statsCols", "k")
        .option("mergeOnRead", "true").mode("overwrite").save(table)
      TxnTable.deleteWherePos(spark, table, df => df("k") < 10L)
      val q = spark.read.format("graft").load(table)
      assert(q.count() == 190L)
      val plan = q.queryExecution.executedPlan.toString
      // the vector applies in the partition readers (GraftVecBatch):
      // the plan is ONE bare scan — no anti-join, no splice union, no
      // exchange of any kind
      assert(!plan.contains("Join") && !plan.contains("Union") &&
          !plan.contains("Exchange"),
        s"positional subtraction must stay inside the scan; plan:\n$plan")
      assert(plan.contains("BatchScan"),
        s"expected the bare DSv2 scan; plan:\n$plan")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(zone))
    }
  }

  test("a live positional vector keeps the whole scan COLUMNAR") {
    val zone = java.nio.file.Files.createTempDirectory("graft_planshape").toString
    try {
      import spark.implicits._
      val table = s"$zone/t"
      // two vintages × two files each: the vector will name files of
      // the FIRST batch only, so the second batch's files are clean —
      // those must keep the vectorized fast path too (the r14 weak:
      // one named file used to flip ALL partitions row-based).
      // Struct + array columns exercise the remap wrapper's child and
      // array paths under the nested vectorized reader.
      def frame(lo: Long, hi: Long) =
        spark.range(lo, hi).select($"id".as("k"), ($"id" * 1.0).as("v"),
          concat(lit("s"), $"id").as("s"),
          struct(($"id" % 7).as("a"), concat(lit("t"), $"id").as("b"))
            .as("m"),
          array($"id", $"id" + 1L).as("xs"))
      frame(0L, 100L).repartition(2)
        .write.format("graft").option("statsCols", "k")
        .option("mergeOnRead", "true").mode("overwrite").save(table)
      frame(100L, 200L).repartition(2)
        .write.format("graft").mode("append").save(table)
      TxnTable.deleteWherePos(spark, table, df => df("k") < 10L)
      val q = spark.read.format("graft").load(table)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("ColumnarToRow"),
        s"vector-gated scan must stay columnar (vectorized reader); " +
          s"plan:\n$plan")
      assert(!plan.contains("Join") && !plan.contains("Union"),
        s"subtraction must stay inside the scan; plan:\n$plan")
      // values through the remap wrapper, both vintages, all types
      assert(q.count() == 190L)
      val got = q.select($"k", $"v", $"s", $"m.a", $"m.b",
          element_at($"xs", 2)).where($"k".isin(10L, 150L))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
          r.getLong(3), r.getString(4), r.getLong(5))).toSet
      assert(got == Set((10L, 10.0, "s10", 3L, "t10", 11L),
        (150L, 150.0, "s150", 3L, "t150", 151L)), got)
      assert(q.agg(sum($"k")).as[Long].head ==
        (0L until 200L).filter(_ >= 10L).sum)
      // a SECOND vector deleting one file's every remaining row
      // exercises the fully-deleted-batch skip
      TxnTable.deletePositions(spark, table,
        TxnTable.readWithRowIdentity(spark, table)
          .where($"k" >= 10L && $"k" < 100L)
          .select(col(TxnTable.PosFileCol), col(TxnTable.PosOrdCol)))
      val q2 = spark.read.format("graft").load(table)
      assert(q2.count() == 100L)
      assert(q2.queryExecution.executedPlan.toString
        .contains("ColumnarToRow"), "still columnar under two vectors")
      // row-based fallback still correct when vectorization is off
      spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
      try assert(spark.read.format("graft").load(table).count() == 100L)
      finally
        spark.conf.set("spark.sql.parquet.enableVectorizedReader", "true")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(zone))
    }
  }
}
