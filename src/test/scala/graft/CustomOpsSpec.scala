package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.{AsOf, TopK}

/** Adversarial edge cases for the custom physical operators — the code
  * most likely to harbor subtle bugs (hand-written merge/heap logic). */
class CustomOpsSpec extends AnyFunSuite {

  lazy val spark = Spec.spark
  import spark.implicits._

  test("TopKPerKey: k >= group size returns whole group; k=1 returns max") {
    val df = Seq((1L, 10.0), (1L, 30.0), (1L, 20.0), (2L, 5.0))
      .toDF("k", "v").withColumn("id", monotonically_increasing_id())
    val all = TopK.perKey(df, Seq("k"), Seq("v" -> false, "id" -> true), 10)
      .select("k", "v").orderBy("k", "v").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(all.toSeq == Seq((1L, 10.0), (1L, 20.0), (1L, 30.0), (2L, 5.0)))
    val top1 = TopK.perKey(df, Seq("k"), Seq("v" -> false, "id" -> true), 1)
      .select("k", "v").orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top1.toSeq == Seq((1L, 30.0), (2L, 5.0)))
  }

  test("TopKPerKey: exact ties kept deterministically by tie-break column") {
    val df = Seq((1L, 7.0, 101L), (1L, 7.0, 100L), (1L, 7.0, 102L))
      .toDF("k", "v", "id")
    val got = TopK.perKey(df, Seq("k"), Seq("v" -> false, "id" -> true), 2)
      .select("id").orderBy("id").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(100L, 101L)) // lowest ids win the tie
  }

  test("TopKPerKey: multi-column keys") {
    val df = Seq(("a", 1L, 1.0), ("a", 1L, 2.0), ("a", 2L, 3.0), ("b", 1L, 4.0))
      .toDF("k1", "k2", "v").withColumn("id", monotonically_increasing_id())
    val got = TopK.perKey(df, Seq("k1", "k2"), Seq("v" -> false, "id" -> true), 1)
      .select("k1", "k2", "v").orderBy("k1", "k2").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("a", 1L, 2.0), ("a", 2L, 3.0), ("b", 1L, 4.0)))
  }

  test("TopKPerKey: empty input yields empty output") {
    val df = Seq.empty[(Long, Double)].toDF("k", "v")
    assert(TopK.perKey(df, Seq("k"), Seq("v" -> true), 3).count() == 0)
  }

  test("AsOfJoin: no-match rows are null; equal time matches; ties pick last") {
    val left = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 150L, 12L), (3L, 50L, 13L))
      .toDF("uid", "t", "lid")
    val right = Seq(
      (1L, 100L, 20L), // equal to left t=100 → must match (<=)
      (1L, 180L, 21L), (1L, 180L, 22L), // tie at 180 → id 22 wins
      (2L, 149L, 23L))
      .toDF("r_uid", "r_t", "rid")
    val got = AsOf.join(left, right, "uid", "r_uid", "t", "r_t", Seq("rid"))
      .select("lid", "rid").orderBy("lid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(got.toSeq == Seq(
      (10L, 20L),  // t=100 matches r_t=100 exactly
      (11L, 22L),  // t=200: latest is the 180 pair, tie-break → rid 22
      (12L, 23L),  // t=150 >= 149
      (13L, -1L))) // uid 3 has no right rows → null
  }

  test("AsOfJoin: right rows strictly after every left row never match") {
    val left = Seq((1L, 10L, 1L)).toDF("uid", "t", "lid")
    val right = Seq((1L, 11L, 9L)).toDF("r_uid", "r_t", "rid")
    val got = AsOf.join(left, right, "uid", "r_uid", "t", "r_t", Seq("rid"))
      .select("rid").collect()
    assert(got.length == 1 && got(0).isNullAt(0))
  }

  test("AsOfJoin: string keys take the interpreted fallback, same semantics") {
    val left = Seq(("a", 100L, 10L), ("b", 100L, 11L)).toDF("uid", "t", "lid")
    val right = Seq(("a", 90L, 20L), ("c", 80L, 21L)).toDF("r_uid", "r_t", "rid")
    val got = AsOf.join(left, right, "uid", "r_uid", "t", "r_t", Seq("rid"))
      .select("lid", "rid").orderBy("lid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(got.toSeq == Seq((10L, 20L), (11L, -1L)))
  }

  test("TopKPerKey plans a partial pass below the exchange") {
    val df = Seq((1L, 1L), (1L, 2L), (2L, 3L)).toDF("k", "v")
    val plan = TopK.perKey(df, Seq("k"), Seq("v" -> false), k = 1)
      .queryExecution.executedPlan.toString
    // physical nodes print without the Exec suffix
    val execs = "TopKPerKey \\[".r.findAllIn(plan).length
    assert(execs == 2, s"expected partial+final TopKPerKeyExec:\n$plan")
    assert(plan.contains("Exchange"), s"expected a hash exchange between passes:\n$plan")
    // and the result is still exact
    val got = TopK.perKey(df, Seq("k"), Seq("v" -> false), k = 1)
      .orderBy("k").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 3L)))
  }

  test("TopKPerKey: partial pass over row budget degrades to pass-through, final stays exact") {
    // budget of 4 rows with k=3 caps the partial pass at ONE admitted key
    // per map task — every other key's rows are shuffled unfiltered and
    // the final pass must still produce the exact per-key top-k
    val df = spark.range(0, 1000)
      .selectExpr("id % 50 AS k", "id AS v")
    val expected = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"k").orderBy($"v".desc)
      df.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
        .select($"k", $"v").orderBy($"k", $"v").collect()
    }
    spark.conf.set("graft.topk.partialBudgetRows", "4")
    try {
      val got = TopK.perKey(df, Seq("k"), Seq("v" -> false), k = 3)
        .select($"k", $"v").orderBy($"k", $"v").collect()
      assert(got.length == expected.length && got.sameElements(expected))
    } finally spark.conf.unset("graft.topk.partialBudgetRows")
  }
}
