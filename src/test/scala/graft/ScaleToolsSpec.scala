package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.{Bucketing, Tables}
import graft.ops.Skew

/** Scale tooling contracts: bucketed joins plan without exchanges, and
  * salted joins are row-identical to plain joins. */
class ScaleToolsSpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  test("bucketed join on the bucket key plans with NO Exchange") {
    val o = Tables.orders(spark, Spec.sf0001)
    val c = Tables.customer(spark, Spec.sf0001)
      .withColumnRenamed("c_custkey", "o_custkey")
    // broadcast would preempt the bucketed SortMergeJoin on these tiny
    // tables — disable it so the test exercises the at-scale plan shape
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(o, "orders_b", "o_custkey", 4)
      Bucketing.writeBucketed(c, "cust_b", "o_custkey", 4)
      val plan = Bucketing.bucketedJoin(spark, "orders_b", "cust_b", "o_custkey")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free plan, got:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed scan not used:\n$plan")
      // contrast: the same join on unbucketed scans DOES shuffle
      val unbucketed = o.join(c, "o_custkey").queryExecution.executedPlan.toString
      assert(unbucketed.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
  }

  test("salted join result is identical to the plain join") {
    val o = Tables.orders(spark, Spec.sf0001)
    val c = Tables.customer(spark, Spec.sf0001)
      .withColumnRenamed("c_custkey", "o_custkey")
    val joined = o.join(c, "o_custkey")
    val cols = joined.columns.map(col).toIndexedSeq
    val plain = joined.orderBy(col("o_orderkey")).collect()
    val salted = Skew.saltedJoin(o, c, "o_custkey", 8)
      .select(cols: _*).orderBy(col("o_orderkey")).collect()
    assert(salted.length == plain.length)
    assert(salted.sameElements(plain))
  }

  test("t47 sequence-pack window is keyed by (lang, bucket), not lang alone") {
    import org.apache.spark.sql.catalyst.plans.logical
    val docs = Tables.documents(spark, Spec.sf0001)
      .select(col("doc_id"), col("lang"),
        size(graft.text.TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
    val packed = graft.text.Text2Ops.sequencePack(docs, bucketSize = 100L, budget = 512.0)
    // assert on the optimized logical plan — AQE hides the WindowExec
    // behind AdaptiveSparkPlanExec until execution
    val windows = packed.queryExecution.optimizedPlan.collect { case w: logical.Window => w }
    assert(windows.nonEmpty, "expected a WindowExec in the sequence-pack plan")
    val keys = windows.head.partitionSpec.map(_.toString)
    assert(keys.length == 2 && keys.exists(_.contains("lang")) &&
      keys.exists(_.contains("bucket")),
      s"window must partition by (lang, bucket); got: ${keys.mkString(", ")}")
    // the bucketed key must actually split a language across partitions:
    // more distinct (lang, bucket) groups than langs
    val groups = packed.select(col("lang"), col("bucket")).distinct().count()
    val langs = docs.select(col("lang")).distinct().count()
    assert(groups > langs, s"bucketing added no parallelism: $groups groups vs $langs langs")
  }
}
