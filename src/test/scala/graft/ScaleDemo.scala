package graft

import org.apache.spark.sql.SparkSession
import graft.io.{Bucketing, Tables}
import graft.ops.Skew

/** Demonstrates the scale tooling through the public API: bucketed
  * exchange-free joins and salted skew joins. Prints the physical plans
  * and row-count equivalence so the behavior is observable from the CLI.
  * Usage: runMain graft.ScaleDemo [sfDir] */
object ScaleDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-scale-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ to show bucketing
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir).withColumnRenamed("c_custkey", "o_custkey")

    println("== bucketed join ==")
    Bucketing.writeBucketed(o, "orders_b", "o_custkey", 4)
    Bucketing.writeBucketed(c, "cust_b", "o_custkey", 4)
    val bucketed = Bucketing.bucketedJoin(spark, "orders_b", "cust_b", "o_custkey")
    val plan = bucketed.queryExecution.executedPlan.toString
    println(s"exchange-free: ${!plan.contains("Exchange")}, bucketed scan: ${plan.contains("Bucketed: true")}")
    println(s"unbucketed join shuffles: ${o.join(c, "o_custkey").queryExecution.executedPlan.toString.contains("Exchange")}")

    println("== custom TopKPerKey operator ==")
    val topkPlan = graft.plans.TopK.perKey(
      o.select("o_custkey", "o_orderkey", "o_totalprice"), Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
      .queryExecution.executedPlan.toString
    println(s"plans TopKPerKey: ${topkPlan.contains("TopKPerKey")}, exchanges: ${topkPlan.sliding(8).count(_ == "Exchange")}")
    val prePart = o.select("o_custkey", "o_orderkey", "o_totalprice")
      .repartition(org.apache.spark.sql.functions.col("o_custkey"))
    val prePlan = graft.plans.TopK.perKey(prePart, Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
      .queryExecution.executedPlan.toString
    println(s"pre-partitioned input adds no extra exchange: ${prePlan.sliding(8).count(_ == "Exchange") == 1}")
    try graft.plans.TopK.perKey(o, Seq("no_such_col"), Seq("o_orderkey" -> true), 3)
    catch { case e: IllegalArgumentException => println(s"bad column -> ${e.getMessage.take(60)}") }

    println("== salted join ==")
    val plain = o.join(c, "o_custkey").count()
    val salted = Skew.saltedJoin(o, c, "o_custkey", 8).count()
    println(s"plain=$plain salted=$salted equal=${plain == salted}")
    spark.stop()
  }
}
