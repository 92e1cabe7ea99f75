package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.TxnTable

/** ANALYZE TABLE + column statistics through the DSv2 scan: NDV from
  * the advisory `_ndv` sidecar and null counts from the skipping stats
  * reach the cost-based optimizer's attribute statistics. */
class GraftCboSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark

  private def withZone(body: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_cbo").toFile
    try body(s"${root.getAbsolutePath}/t")
    finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(root)
    }
  }

  private def seed(table: String): Unit = {
    import spark.implicits._
    Seq.range(0L, 1000L).map(k => (k, (k % 25).toString, k % 10))
      .toDF("k", "seg", "g")
      .repartitionByRange(4, $"k")
      .write.format("graft").option("statsCols", "k,g")
      .mode("overwrite").save(table)
  }

  test("analyzeTable persists NDV within HLL tolerance of exact") {
    withZone { table =>
      seed(table)
      val ndv = TxnTable.analyzeTable(spark, table)
      assert(ndv.keySet == Set("k", "seg", "g"))
      // HLL++ at default precision is within ~5% at these cardinalities
      assert(math.abs(ndv("k") - 1000L) <= 50L, s"k ndv=${ndv("k")}")
      assert(math.abs(ndv("seg") - 25L) <= 2L, s"seg ndv=${ndv("seg")}")
      assert(math.abs(ndv("g") - 10L) <= 1L, s"g ndv=${ndv("g")}")
      val v = TxnTable.latestVersion(spark, table).get
      assert(TxnTable.ndvStats(spark, table, v) == ndv)
    }
  }

  test("SQL ANALYZE TABLE spelling routes to the sidecar for graft tables") {
    withZone { table =>
      seed(table)
      spark.sql(s"CREATE TABLE cbo_sql_t USING graft OPTIONS (path '$table')")
      try {
        spark.sql("ANALYZE TABLE cbo_sql_t COMPUTE STATISTICS FOR COLUMNS seg, g")
        val v = TxnTable.latestVersion(spark, table).get
        val ndv = TxnTable.ndvStats(spark, table, v)
        assert(ndv.keySet == Set("seg", "g"))
        // FOR ALL COLUMNS recomputes the full set
        spark.sql("ANALYZE TABLE cbo_sql_t COMPUTE STATISTICS FOR ALL COLUMNS")
        assert(TxnTable.ndvStats(spark, table, v).keySet == Set("k", "seg", "g"))
      } finally spark.sql("DROP TABLE cbo_sql_t")
    }
  }

  test("scan reports distinct and null counts into optimizer stats") {
    withZone { table =>
      seed(table)
      TxnTable.analyzeTable(spark, table)
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try {
        val df = spark.read.format("graft").load(table).filter(col("g") >= 0)
        val stats = df.queryExecution.optimizedPlan.collectFirst {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            r.stats
        }.getOrElse(fail("no DSv2 scan relation in the optimized plan"))
        assert(stats.rowCount.contains(BigInt(1000)))
        val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
        assert(byName.contains("g"), s"attributeStats: ${byName.keySet}")
        val g = byName("g")
        assert(g.distinctCount.exists(d => (d - BigInt(10)).abs <= 1),
          s"g distinctCount=${g.distinctCount}")
        assert(g.nullCount.contains(BigInt(0)), s"g nullCount=${g.nullCount}")
      } finally spark.conf.set("spark.sql.cbo.enabled", "false")
    }
  }

  test("folded min/max reach the CBO and shrink range-filter estimates") {
    withZone { table =>
      seed(table)
      TxnTable.analyzeTable(spark, table)
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try {
        val base = spark.read.format("graft").load(table)
        val scanStats = base.queryExecution.optimizedPlan.collectFirst {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            r.stats
        }.get
        val k = scanStats.attributeStats.collectFirst {
          case (a, s) if a.name == "k" => s
        }.get
        assert(k.min.contains(0L) && k.max.contains(999L),
          s"k bounds: min=${k.min} max=${k.max}")
        // the estimator now prices `k < 100` at ~10% of the table,
        // not the no-stats default
        val filtered = spark.read.format("graft").load(table)
          .filter(col("k") < 100L)
        val est = filtered.queryExecution.optimizedPlan.stats.rowCount
        assert(est.exists(r => r >= BigInt(50) && r <= BigInt(200)),
          s"range-filter estimate should be ~100 of 1000 rows, got $est")
      } finally spark.conf.set("spark.sql.cbo.enabled", "false")
    }
  }

  test("time travel below the analyzed version must not see future NDV") {
    withZone { table =>
      import spark.implicits._
      seed(table) // v1
      Seq((5000L, "x", 99L)).toDF("k", "seg", "g")
        .write.format("graft").mode("append").save(table) // v2
      TxnTable.analyzeTable(spark, table) // analyzed at v2
      val v = TxnTable.latestVersion(spark, table).get
      assert(TxnTable.ndvStats(spark, table, v).nonEmpty)
      assert(TxnTable.ndvStats(spark, table, v - 1).isEmpty,
        "a pinned read below the analyzed snapshot sees no NDV")
    }
  }

  test("equi-height histogram tightens a skewed range estimate") {
    withZone { table =>
      import spark.implicits._
      // 900 rows bunched in v ∈ [1, 9], 100 rows spread over
      // [100, 1090] — the shape where assuming uniformity over
      // [min, max] overestimates `v > 500` by ~10×. The high values
      // INTERLEAVE across the k-ranged files so per-file [min, max]
      // spans them all and file pruning cannot shrink the scan — the
      // estimate difference is purely the histogram's.
      val rows = (0L until 1000L).map(k =>
        (k, if (k % 10L == 0L) 100L + (k / 10L) * 10L else k % 10L))
      rows.toDF("k", "v").repartitionByRange(4, $"k")
        .write.format("graft").option("statsCols", "k,v")
        .mode("overwrite").save(table)
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try {
        def estimate(): BigInt = {
          val df = spark.read.format("graft").load(table)
            .filter($"v" > lit(500L))
          df.queryExecution.optimizedPlan.collect {
            case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
              f.stats.rowCount
          }.flatten.headOption.getOrElse(
            fail("no Filter estimate in the optimized plan"))
        }
        // no histogram yet: NDV+min/max only → uniform-range guess
        TxnTable.analyzeTable(spark, table, Seq("k"))
        spark.conf.set("graft.cbo.histogramBins", "0") // ndv only for v
        TxnTable.analyzeTable(spark, table, Seq("v"))
        val uniform = estimate()
        assert(uniform > BigInt(300),
          s"uniform assumption should grossly overestimate; got $uniform")
        // with the histogram the estimate collapses to ~the true 59
        spark.conf.set("graft.cbo.histogramBins", "16")
        TxnTable.analyzeTable(spark, table, Seq("v"))
        val v = TxnTable.latestVersion(spark, table).get
        assert(TxnTable.histStats(spark, table, v).contains("v"),
          "histogram must persist in the sidecar")
        val hist = estimate()
        assert(hist < uniform / 3,
          s"histogram must tighten the skewed estimate: " +
            s"uniform=$uniform hist=$hist")
        assert(hist <= BigInt(200),
          s"histogram estimate should approach the true 59 rows; got $hist")
      } finally {
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.unset("graft.cbo.histogramBins")
      }
    }
  }

  test("the sidecar survives VACUUM and is advisory on corruption") {
    withZone { table =>
      seed(table)
      TxnTable.analyzeTable(spark, table)
      TxnTable.compact(spark, table, targetFiles = 1)
      TxnTable.vacuum(spark, table, retainMs = 0L)
      val v = TxnTable.latestVersion(spark, table).get
      assert(TxnTable.ndvStats(spark, table, v).nonEmpty,
        "VACUUM must not reclaim the _ndv sidecar")
      // corruption degrades to no stats, never an error
      val p = java.nio.file.Paths.get(table, "_ndv")
      java.nio.file.Files.writeString(p, "garbage\nmore|garbage|x\n")
      assert(TxnTable.ndvStats(spark, table, v).isEmpty)
    }
  }
}
