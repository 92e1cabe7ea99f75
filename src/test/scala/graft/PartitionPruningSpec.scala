package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Hive-style partitioned sinks + partition pruning: a filter on the
  * partition column must prune directories at planning time (the scan
  * never touches non-matching files) — the mechanism that turns a 100 TB
  * table scan into a single-partition read. */
class PartitionPruningSpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  test("filter on partition column prunes to that partition's files only") {
    val base = java.nio.file.Files.createTempDirectory("graft-part").toString
    val ev = Tables.events(spark, Spec.sf0001)
    Tables.writeParquet(ev, s"$base/events", partitionBy = Seq("event_type"))

    val purchases = spark.read.parquet(s"$base/events")
      .filter(col("event_type") === "purchase")

    // the filter lands in PartitionFilters (directory pruning at
    // planning), NOT in PushedFilters (row-level filtering at scan) —
    // note: df.inputFiles can't show this; it lists the pre-pruning index
    val scan = purchases.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("Scan parquet")).getOrElse("")
    assert(scan.contains("PartitionFilters") &&
      "event_type#\\d+ = purchase".r.findFirstIn(scan).isDefined,
      s"no partition filter in scan: $scan")
    val pushedSection = scan.split("PushedFilters").last
    assert(!pushedSection.split("ReadSchema").head.contains("event_type"),
      s"event_type leaked into data filters: $scan")

    val expected = ev.filter(col("event_type") === "purchase").count()
    assert(purchases.count() == expected)
  }
}
