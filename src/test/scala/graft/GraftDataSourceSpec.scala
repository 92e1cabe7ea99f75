package graft

import org.apache.spark.sql.GraftBridge
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Tables, TxnTable}

/** DSv2 `format("graft")` read path: plain reads and SQL get
  * manifest-stats file skipping without touching TxnTable's APIs. */
class GraftDataSourceSpec extends AnyFunSuite {

  private lazy val spark = Spec.spark
  import spark.implicits._

  private def withZone(f: String => Unit): Unit = {
    val zone = java.nio.file.Files.createTempDirectory("graft_dsv2").toFile
    try f(s"${zone.getAbsolutePath}/t")
    finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete(); ()
      }
      rm(zone)
    }
  }

  test("unfiltered DSv2 read equals TxnTable.read; filters prune files but not rows") {
    withZone { table =>
      val cust = Tables.customer(spark, Spec.sf0001)
        .select($"c_custkey", $"c_acctbal")
      TxnTable.commitOverwrite(
        cust.repartitionByRange(6, $"c_custkey").sortWithinPartitions($"c_custkey"),
        table, statsCols = Seq("c_custkey"))
      val ds = spark.read.format("graft").load(table)
      assert(ds.count() == cust.count())
      assert(GraftBridge.dsv2ScannedFiles(ds).contains(6))
      // a narrow range must scan a strict subset of files AND return
      // exactly the rows a raw filter would
      val narrow = ds.filter($"c_custkey".between(10, 20))
      val scanned = GraftBridge.dsv2ScannedFiles(narrow).get
      assert(scanned > 0 && scanned < 6, s"scanned $scanned of 6")
      assert(narrow.count() == cust.filter($"c_custkey".between(10, 20)).count())
      // disjoint range: zero files planned, zero rows. NOTE the typed
      // literal — a double literal would wrap the long column in a cast,
      // which blocks Spark's source-filter translation (and pruning)
      val none = ds.filter($"c_custkey" > 1000000000L)
      assert(GraftBridge.dsv2ScannedFiles(none).contains(0) && none.isEmpty)
    }
  }

  test("SQL over a temp view prunes too, and column pruning reaches the scan") {
    withZone { table =>
      val cust = Tables.customer(spark, Spec.sf0001)
        .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
      TxnTable.commitOverwrite(
        cust.repartitionByRange(6, $"c_custkey").sortWithinPartitions($"c_custkey"),
        table, statsCols = Seq("c_custkey"))
      spark.read.format("graft").load(table).createOrReplaceTempView("dsv2_t")
      try {
        val q = spark.sql(
          "SELECT SUM(c_acctbal) AS s FROM dsv2_t WHERE c_custkey <= 30")
        assert(GraftBridge.dsv2ScannedFiles(q).exists(n => n > 0 && n < 6))
        val expect = cust.filter($"c_custkey" <= 30)
          .agg(org.apache.spark.sql.functions.sum($"c_acctbal")).head().getDouble(0)
        assert(math.abs(q.head().getDouble(0) - expect) < 1e-6)
        // only the two referenced columns survive pruning into the scan
        val scanDesc = q.queryExecution.executedPlan.toString()
        assert(!scanDesc.contains("c_mktsegment"),
          "unreferenced column leaked into the DSv2 scan")
      } finally spark.catalog.dropTempView("dsv2_t")
    }
  }

  test("typed pushdown: string and timestamp filters prune via DSv2 too") {
    withZone { table =>
      val orders = Tables.orders(spark, Spec.sf0001)
        .select($"o_orderkey", $"o_orderdate", $"o_orderpriority", $"o_totalprice")
      TxnTable.commitOverwrite(
        orders.repartitionByRange(6, $"o_orderpriority", $"o_orderdate")
          .sortWithinPartitions($"o_orderpriority", $"o_orderdate"),
        table, statsCols = Seq("o_orderpriority", "o_orderdate"))
      val ds = spark.read.format("graft").load(table)
      // string equality: lexicographic stats prune
      val urgent = ds.filter($"o_orderpriority" === "1-URGENT")
      val sScan = GraftBridge.dsv2ScannedFiles(urgent).get
      assert(sScan > 0 && sScan < 6, s"string pruning: $sScan of 6")
      assert(urgent.count() ==
        orders.filter($"o_orderpriority" === "1-URGENT").count())
      // timestamp range: epoch-normalized stats prune (typed literal so
      // the filter translates without a cast on the column)
      val cutoff = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
      val late = ds.filter($"o_orderpriority" === "5-LOW" &&
        $"o_orderdate" >= cutoff)
      assert(GraftBridge.dsv2ScannedFiles(late).exists(n => n < 6))
      assert(late.count() == orders.filter($"o_orderpriority" === "5-LOW" &&
        $"o_orderdate" >= cutoff).count())
    }
  }

  test("skipping stays sound with NULLs and statless files; versionAsOf pins") {
    withZone { table =>
      // file 1: keys 1..5 + NULLs (has stats); file 2: no stats at all
      TxnTable.commitOverwrite(
        Seq[(Option[Long], Double)](
          (Some(1L), 1.0), (Some(5L), 2.0), (None, 3.0))
          .toDF("k", "v").coalesce(1),
        table, statsCols = Seq("k"))
      TxnTable.commitAppend(
        Seq[(Option[Long], Double)]((Some(100L), 4.0)).toDF("k", "v").coalesce(1),
        table) // no statsCols: conservative scans
      val ds = spark.read.format("graft").load(table)
      // statless file must always be scanned: k=100 found
      assert(ds.filter($"k" === 100L).count() == 1)
      // range predicate never matches NULL rows, so stats-skipping the
      // NULL-bearing file for k>10 is sound — and row results correct
      assert(ds.filter($"k" > 10L).count() == 1)
      assert(ds.filter($"k".isNull).count() == 1) // IsNull extracts no bounds
      // versionAsOf: the first snapshot has no k=100
      val v1 = spark.read.format("graft").option("versionAsOf", "1").load(table)
      assert(v1.count() == 3 && v1.filter($"k" === 100L).isEmpty)
    }
  }
}
