package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Runtime file pruning (dynamic partition pruning for the graft DSv2
  * source): a broadcast dim filter's values reach the fact scan as
  * runtime In-filters, which re-prune the chosen files against manifest
  * stats before any data is read. */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = Spec.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_rtf").toString

  /** The GraftScan instances inside an executed plan (AQE-resolved). */
  private def graftScans(df: org.apache.spark.sql.DataFrame): Seq[graft.io.GraftScanFiles] = {
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[graft.io.GraftScanFiles] =
      p.flatMap {
        case b: BatchScanExec => b.scan match {
          case g: graft.io.GraftScanFiles => Seq(g)
          case _ => Nil
        }
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
        case _ => Nil
      }
    walk(df.queryExecution.executedPlan)
  }

  test("broadcast dim filter prunes fact files at runtime") {
    val zone = tmp()
    val fact = s"$zone/orders"
    graft.io.Tables.orders(spark, Spec.sf0001)
      .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
      .write.format("graft").mode("overwrite")
      .partitionBy("o_orderpriority").save(fact)
    val total = graft.io.TxnTable.snapshotFiles(
      spark, fact, graft.io.TxnTable.latestVersion(spark, fact).get).size
    assert(total >= 5, s"expected one file group per priority, got $total")

    // parquet-backed dim: a LocalRelation's filter constant-folds away
    // and DPP then sees no selective predicate on the filtering side
    val dimPath = s"$zone/dim"
    Seq(("1-URGENT", "keep"), ("5-LOW", "keep"),
      ("2-HIGH", "drop"), ("3-MEDIUM", "drop"), ("4-NOT SPECIFIED", "drop"))
      .toDF("prio", "tag").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = spark.read.format("graft").load(fact)
      .join(broadcast(dim.filter($"tag" === "keep")),
        $"o_orderpriority" === $"prio")
      .agg(count(lit(1)).cast("bigint").as("n"),
        graft.ops.Num.dsum($"o_totalprice").as("sum_price"))
    val scans = graftScans(joined)
    assert(scans.nonEmpty, "expected a graft BatchScan in the plan")
    val scanned = scans.map(_.scannedFileCount).min
    assert(scanned < total,
      s"runtime filter should prune files: scanned $scanned of $total")

    // values survive the pruning: compare against the unpruned compute
    val expect = graft.io.Tables.orders(spark, Spec.sf0001)
      .filter($"o_orderpriority".isin("1-URGENT", "5-LOW"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        graft.ops.Num.dsum($"o_totalprice").as("sum_price"))
    assert(joined.collect().toSeq == expect.collect().toSeq)
  }

  test("without a selective dim filter the scan reads everything") {
    val zone = tmp()
    val fact = s"$zone/orders"
    graft.io.Tables.orders(spark, Spec.sf0001)
      .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
      .write.format("graft").mode("overwrite")
      .partitionBy("o_orderpriority").save(fact)
    val total = graft.io.TxnTable.snapshotFiles(
      spark, fact, graft.io.TxnTable.latestVersion(spark, fact).get).size
    val dimPath = s"$zone/dim"
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      .toDF("prio").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = spark.read.format("graft").load(fact)
      .join(broadcast(dim), $"o_orderpriority" === $"prio")
      .agg(count(lit(1)).cast("bigint").as("n"))
    val scans = graftScans(joined)
    assert(scans.nonEmpty && scans.map(_.scannedFileCount).min == total)
  }
}
