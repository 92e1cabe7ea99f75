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
