package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.GraftExtensions
import graft.io.Tables

/** RewriteTopKWindow must fire on the projected-away rank pattern and
  * must NOT fire when the rank column survives. */
class PlanRewriteSpec extends AnyFunSuite {

  lazy val spark = Spec.spark
  import spark.implicits._

  private def windowTopK(keepRank: Boolean) = {
    GraftExtensions.install(spark)
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    val base = Tables.orders(spark, Spec.sf0001)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
    if (keepRank) base else base.drop("rn")
  }

  test("rank-dropped window top-k is rewritten to TopKPerKeyExec") {
    val plan = windowTopK(keepRank = false).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"rule did not fire:\n$plan")
    // neither the Window exec nor Spark's own WindowGroupLimit remains
    assert(!plan.contains("Window"), s"window machinery still present:\n$plan")
  }

  test("rank-kept window top-k is left untouched") {
    val plan = windowTopK(keepRank = true).queryExecution.executedPlan.toString
    assert(plan.contains("Window") && !plan.contains("TopKPerKey"), plan)
  }

  test("rewritten plan returns the same rows as the window plan") {
    val rewritten = windowTopK(keepRank = false)
      .orderBy($"o_custkey", $"o_totalprice".desc, $"o_orderkey").collect()
    val window = windowTopK(keepRank = true).drop("rn")
      .orderBy($"o_custkey", $"o_totalprice".desc, $"o_orderkey").collect()
    // note: keepRank=true plan keeps Window (asserted above), so this
    // compares the two different physical strategies row-for-row
    assert(rewritten.sameElements(window))
  }
}
