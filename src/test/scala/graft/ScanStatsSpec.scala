package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** GraftScan reports exact manifest row counts (SupportsReportStatistics):
  * without it a DSv2 relation sizes at spark.sql.defaultSizeInBytes =
  * Long.MaxValue and a small graft dim would never auto-broadcast. */
class ScanStatsSpec extends AnyFunSuite {
  lazy val spark = Spec.spark
  import spark.implicits._

  test("small graft dim auto-broadcasts with no hint") {
    val zone = java.nio.file.Files.createTempDirectory("graft_stats").toString
    val fact = s"$zone/fact"
    val dim = s"$zone/dim"
    graft.io.Tables.orders(spark, Spec.sf0001)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .write.format("graft").mode("overwrite").save(fact)
    graft.io.Tables.customer(spark, Spec.sf0001)
      .select($"c_custkey", $"c_mktsegment").limit(50)
      .write.format("graft").mode("overwrite").save(dim)
    val j = spark.read.format("graft").load(fact)
      .join(spark.read.format("graft").load(dim),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"50-row graft dim must auto-broadcast:\n$plan")
    // and the logical stats carry the exact row count
    val rel = spark.read.format("graft").load(dim)
    val stats = rel.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.exists(_.toLong == 50L) ||
      stats.sizeInBytes < BigInt(Long.MaxValue) / 4,
      s"expected manifest-derived stats, got $stats")
  }
}
