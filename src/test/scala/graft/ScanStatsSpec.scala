package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** GraftScan reports exact manifest row counts (SupportsReportStatistics):
  * without it a DSv2 relation sizes at spark.sql.defaultSizeInBytes =
  * Long.MaxValue and a small graft dim would never auto-broadcast. */
class ScanStatsSpec extends AnyFunSuite {
  lazy val spark = Spec.spark
  import spark.implicits._

  test("document-sized string stats cap out of the manifest, conservatively") {
    import graft.io.TxnTable
    val zone = java.nio.file.Files.createTempDirectory("graft_strcap").toString
    val t = s"$zone/txt"
    val long = "x" * 5000
    // file 1: document-sized texts; file 2: a short one
    Seq((1L, long + "a"), (2L, long + "b")).toDF("id", "text")
      .coalesce(1).write.format("graft")
      .option("statsCols", "id,text").mode("overwrite").save(t)
    Seq((3L, "short")).toDF("id", "text")
      .coalesce(1).write.format("graft")
      .option("statsCols", "id,text").mode("append").save(t)
    // the manifests carry id stats and the SHORT text's stats, but no
    // document-sized min/max — that would bloat every file line at
    // corpus scale (10^6 files x multi-KB strings)
    val manifestText = new java.io.File(t).listFiles()
      .filter(_.getName.endsWith(".manifest")).sortBy(_.getName)
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath),
        "UTF-8")).mkString("\n")
    assert(!manifestText.contains("x" * 50), "capped text stat leaked")
    assert(manifestText.contains("short"), "bounded text stat must record")
    // id stats still prune
    val (rr, scanned, total) = TxnTable.readRange(spark, t, "id", 3L, 3L)
    assert(rr.count() == 1L && scanned < total)
    // blooms are the right tool for long-string equality: hash-based
    // sidecars carry no value bytes, so they keep pruning where the
    // capped stats cannot
    val tb = s"$zone/txtbloom"
    Seq((1L, long + "a"), (2L, long + "b")).toDF("id", "text")
      .coalesce(1).write.format("graft")
      .option("bloomCols", "text").mode("overwrite").save(tb)
    Seq((3L, long + "c")).toDF("id", "text")
      .coalesce(1).write.format("graft")
      .option("bloomCols", "text").mode("append").save(tb)
    val (hit, bScanned, bTotal) =
      TxnTable.readEquals(spark, tb, "text", long + "c")
    assert(hit.count() == 1L && bTotal == 2)
    assert(bScanned < bTotal,
      s"bloom must prune long-string equality: $bScanned of $bTotal")
    // absent stat is conservative: the un-statted file still scans
    val r = spark.read.format("graft").load(t)
    assert(r.filter($"text" === "short").count() == 1L)
    assert(r.filter($"text" === long + "a").count() == 1L)
    assert(r.count() == 3L)
    // and the manifest stays kilobyte-scale despite 10KB of text values
    val msize = new java.io.File(t).listFiles()
      .filter(_.getName.endsWith(".manifest")).map(_.length()).sum
    assert(msize < 4096, s"manifest bloated to $msize bytes")
  }

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
