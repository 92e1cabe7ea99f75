package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q => RQ}
import graft.io.Tables

/** Queries exercising graft's custom whole-operators. */
object PlanOps {

  // ---------------------------------------------------------------- c60
  /** Top-3 orders per customer through the native TopKPerKey operator
    * (bounded heaps, no per-group sort). The oracle states the same
    * semantics in the classic ROW_NUMBER form — so the driver proves the
    * custom physical operator is semantically identical to the window
    * plan it replaces. */
  private def c60(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    TopK.perKey(o, Seq("o_custkey"),
        Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 3)
      .orderBy($"o_custkey", $"o_totalprice".desc, $"o_orderkey")
  }
  private val c60Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin

  val all: Seq[RQ] = Seq(
    RQ("c60_topk_custom_operator", c60, Some(c60Sql), bench = true))
}
