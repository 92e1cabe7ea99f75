package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Storage-partitioned joins: two graft tables identity-partitioned on
  * the same key must join (and pre-aggregate) with ZERO shuffle on
  * either side — the scan reports KeyGroupedPartitioning and the
  * planner matches it against the join keys. */
class SpjSpec extends AnyFunSuite {
  lazy val spark = Spec.spark
  import spark.implicits._

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_spj").toFile
    d.deleteOnExit(); d.toString
  }

  private def withSpjConfs[A](body: => A): A = {
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      // join keys ⊇ partition keys (the common fact-join shape) needs
      // the exact-co-partition requirement relaxed — Iceberg's SPJ
      // recipe sets the same three confs
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Final (AQE-resolved) physical plan of an executed frame. */
  private def finalPlan(df: org.apache.spark.sql.DataFrame) = {
    df.collect() // AQE finalizes the plan only on execution
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
  }

  /** Count shuffles INCLUDING those hidden inside AQE query-stage and
    * reused-exchange leaf nodes (collect alone stops at leaves). */
  private def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int =
    p.collect {
      case _: ShuffleExchangeExec => 1
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        shuffles(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        shuffles(r.child)
    }.sum

  test("same-key join of two partitioned graft tables plans zero shuffles") {
    val zone = tmp()
    val left = s"$zone/events_a"
    val right = s"$zone/events_b"
    val ev = graft.io.Tables.events(spark, Spec.sf0001)
      .select($"event_id", $"event_type", $"value")
    ev.write.format("graft").mode("overwrite").partitionBy("event_type").save(left)
    ev.withColumn("value2", $"value" * 2).drop("value")
      .write.format("graft").mode("overwrite").partitionBy("event_type").save(right)
    withSpjConfs {
      val l = spark.read.format("graft").load(left)
      val r = spark.read.format("graft").load(right)
      val joined = l.join(r, Seq("event_type", "event_id"))
        .select($"event_type", $"event_id", ($"value" + $"value2").as("v3"))
      val plan = finalPlan(joined)
      assert(shuffles(plan) == 0, s"expected shuffle-free SPJ plan:\n$plan")
      // values: 1:1 join, v3 = 3 * value
      val n = graft.io.Tables.events(spark, Spec.sf0001).count()
      assert(joined.count() == n)
      val bad = joined
        .join(ev, Seq("event_id"))
        .filter(abs($"v3" - $"value" * 3) > 1e-9)
      assert(bad.isEmpty)
    }
  }

  test("live positional vectors keep the keyed join shuffle-free AND exact") {
    val zone = tmp()
    val left = s"$zone/va"
    val right = s"$zone/vb"
    val ev = graft.io.Tables.events(spark, Spec.sf0001)
      .select($"event_id", $"event_type", $"value")
    ev.write.format("graft").option("mergeOnRead", "true")
      .mode("overwrite").partitionBy("event_type").save(left)
    ev.withColumn("value2", $"value" * 2).drop("value")
      .write.format("graft").mode("overwrite").partitionBy("event_type").save(right)
    // vector-gate SOME of the left side's files: delete a sliver of
    // rows positionally (zero rewrite), leaving live vectors on the
    // keyed table — the group's delegate must become a GraftVecBatch
    // WITHOUT degrading the scan's KeyGroupedPartitioning report
    graft.io.TxnTable.deleteWherePos(spark, left,
      df => df("event_id") % 101 === 0)
    val st = graft.io.TxnTable.morState(spark, left,
      graft.io.TxnTable.latestVersion(spark, left).get)
    assert(st.dels.nonEmpty, "setup: the left side must carry a vector")
    withSpjConfs {
      val l = spark.read.format("graft").load(left)
      val r = spark.read.format("graft").load(right)
      val joined = l.join(r, Seq("event_type", "event_id"))
        .select($"event_type", $"event_id", ($"value" + $"value2").as("v3"))
      val plan = finalPlan(joined)
      assert(shuffles(plan) == 0,
        s"vectors must not cost the SPJ its zero-shuffle plan:\n$plan")
      val want = ev.filter($"event_id" % 101 =!= 0).count()
      assert(joined.count() == want,
        "the subtraction must apply inside the keyed scan")
    }
  }

  test("group-by on the partition key of the join output stays shuffle-free") {
    val zone = tmp()
    val left = s"$zone/l"
    val right = s"$zone/r"
    val ev = graft.io.Tables.events(spark, Spec.sf0001)
      .select($"event_id", $"event_type", $"value")
    ev.write.format("graft").mode("overwrite").partitionBy("event_type").save(left)
    ev.withColumnRenamed("value", "value2")
      .write.format("graft").mode("overwrite").partitionBy("event_type").save(right)
    withSpjConfs {
      val l = spark.read.format("graft").load(left)
      val r = spark.read.format("graft").load(right)
      // count(value) (not count(*)) so the aggregate reads a data column
      // and cannot collapse to the metadata-only pushdown
      val agg = l.join(r, Seq("event_type", "event_id"))
        .groupBy($"event_type")
        .agg(count($"value").as("n"))
      val plan = finalPlan(agg)
      assert(shuffles(plan) == 0,
        s"join + partition-key aggregate must reuse the reported partitioning:\n$plan")
    }
  }

  test("unpartitioned and transform-partitioned tables refuse the keyed report") {
    val zone = tmp()
    val flat = s"$zone/flat"
    graft.io.Tables.events(spark, Spec.sf0001)
      .select($"event_id", $"event_type", $"value")
      .write.format("graft").mode("overwrite").save(flat)
    withSpjConfs {
      val l = spark.read.format("graft").load(flat)
      val j = l.as("a").join(l.as("b"), Seq("event_type", "event_id"))
      // still correct, just shuffled like any ordinary join
      assert(shuffles(finalPlan(j)) > 0)
      assert(j.count() == graft.io.Tables.events(spark, Spec.sf0001).count())
    }
    val byDay = s"$zone/by_day"
    graft.io.TxnTable.commitAppend(
      graft.io.Tables.events(spark, Spec.sf0001)
        .select($"event_id", $"ts", $"event_type", $"value"),
      byDay, partitionCols = Seq("days(ts)"))
    withSpjConfs {
      val l = spark.read.format("graft").load(byDay)
      val j = l.as("a").join(l.as("b"), Seq("ts", "event_id"))
      assert(shuffles(finalPlan(j)) > 0) // days() transform: no identity proof
      assert(j.count() == graft.io.Tables.events(spark, Spec.sf0001).count())
    }
  }

  test("runtime dim pruning composes with the keyed join") {
    val zone = tmp()
    val left = s"$zone/l"
    val right = s"$zone/r"
    val ev = graft.io.Tables.events(spark, Spec.sf0001)
      .select($"event_id", $"event_type", $"value")
    ev.write.format("graft").mode("overwrite").partitionBy("event_type").save(left)
    ev.withColumnRenamed("value", "value2")
      .write.format("graft").mode("overwrite").partitionBy("event_type").save(right)
    // file-backed dim keeping 2 of the event types (LocalRelation
    // filters constant-fold away and DPP sees nothing)
    val dimPath = s"$zone/dim"
    graft.io.Tables.events(spark, Spec.sf0001)
      .select($"event_type").distinct()
      .withColumn("keep", $"event_type".isin("view", "click"))
      .write.parquet(dimPath)
    withSpjConfs {
      val l = spark.read.format("graft").load(left)
      val r = spark.read.format("graft").load(right)
      val dim = spark.read.parquet(dimPath).filter($"keep" === true)
        .select($"event_type".as("det"))
      // dim broadcast-joins l (firing a runtime In-filter into l's
      // KEYED scan), then the keyed l-r join runs on the survivors
      val j = l.join(broadcast(dim), $"event_type" === $"det")
        .drop("det")
        .join(r, Seq("event_type", "event_id"))
        .groupBy($"event_type")
        .agg(count($"value").cast("bigint").as("n"))
      val rows = j.orderBy($"event_type").collect()
      val expect = graft.io.Tables.events(spark, Spec.sf0001)
        .filter($"event_type".isin("view", "click"))
        .groupBy($"event_type").agg(count(lit(1)).cast("bigint").as("n"))
        .orderBy($"event_type").collect()
      assert(rows.toSeq == expect.toSeq,
        "values must survive DPP over a keyed batch")
    }
  }

  test("with v2 bucketing disabled the report is ignored, results unchanged") {
    val zone = tmp()
    val t = s"$zone/t"
    graft.io.Tables.events(spark, Spec.sf0001)
      .select($"event_id", $"event_type", $"value")
      .write.format("graft").mode("overwrite").partitionBy("event_type").save(t)
    val l = spark.read.format("graft").load(t)
    val j = l.as("a").join(l.as("b"), Seq("event_type", "event_id"))
    assert(j.count() == graft.io.Tables.events(spark, Spec.sf0001).count())
  }
}
