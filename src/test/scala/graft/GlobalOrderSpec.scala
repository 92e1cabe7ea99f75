package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables
import graft.ops.GlobalOrder

/** GlobalOrder contracts: identical answers to the global-window
  * spellings, produced WITHOUT a single-partition exchange. */
class GlobalOrderSpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  test("globalRowNumber equals ROW_NUMBER() OVER a total order") {
    import spark.implicits._
    val ev = Tables.events(spark, Spec.sf0001).select($"event_id", $"user_id")
    val got = GlobalOrder
      .globalRowNumber(ev, Seq($"event_id"), "row_id", numPartitions = 7)
      .orderBy($"row_id").collect()
    val want = ev
      .withColumn("row_id", row_number().over(Window.orderBy($"event_id")).cast("long"))
      .select($"row_id", $"event_id", $"user_id")
      .orderBy($"row_id").collect()
    assert(got.length == want.length && got.length > 0)
    assert(got.sameElements(want))
  }

  test("ids are contiguous from 1 and partition count is respected") {
    import spark.implicits._
    val ev = Tables.events(spark, Spec.sf0001).select($"event_id")
    val (ranked, n) =
      GlobalOrder.withGlobalRank(ev, Seq($"event_id"), numPartitions = 5)
    assert(n == ev.count())
    val ids = ranked.select($"rn").as[Long].collect().sorted
    assert(ids.head == 1L && ids.last == n && ids.length == n)
    assert(ranked.rdd.getNumPartitions == 5)
  }

  test("the sort stage plans as a range exchange, never SinglePartition") {
    import spark.implicits._
    val ev = Tables.events(spark, Spec.sf0001).select($"event_id")
    // the only exchange GlobalOrder ever issues: range repartition + local
    // sort — the distributed shape. The window spelling it replaces plans
    // an Exchange SinglePartition instead (asserted as contrast below).
    val sortedPlan = ev
      .repartitionByRange(7, $"event_id")
      .sortWithinPartitions($"event_id")
      .queryExecution.executedPlan.toString
    assert(sortedPlan.contains("rangepartitioning"), sortedPlan)
    assert(!sortedPlan.contains("SinglePartition"), sortedPlan)
    val windowPlan = ev
      .withColumn("rn", row_number().over(Window.orderBy($"event_id")))
      .queryExecution.executedPlan.toString
    assert(windowPlan.contains("SinglePartition"), windowPlan)
  }

  test("the numbering pass stays on InternalRow — no Row round-trip") {
    import spark.implicits._
    val ev = Tables.events(spark, Spec.sf0001).select($"event_id")
    val (ranked, _) =
      GlobalOrder.withGlobalRank(ev, Seq($"event_id"), numPartitions = 5)
    // the old `.rdd`/`createDataFrame` spelling decoded every row to an
    // external Row and re-encoded it, which plans DeserializeToObject /
    // SerializeFromObject around the hop; the InternalRow path plans
    // neither — the numbered RDD scans directly
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject"), plan)
    assert(!plan.contains("SerializeFromObject"), plan)
    assert(!plan.contains("createexternalrow"), plan)
  }
}
