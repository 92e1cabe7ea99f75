package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{GraftScanFiles, Tables, TxnTable}

/** DSv2 WRITE path (`df.write.format("graft")`) and METADATA-ONLY
  * aggregate pushdown (COUNT/MIN/MAX answered from the manifest with
  * zero data files read). */
class GraftWriteAggSpec extends AnyFunSuite {

  private lazy val spark = Spec.spark
  import spark.implicits._

  private def withZone(f: String => Unit): Unit = {
    val zone = java.nio.file.Files.createTempDirectory("graft_wagg").toFile
    try f(s"${zone.getAbsolutePath}/t")
    finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete(); ()
      }
      rm(zone)
    }
  }

  /** The DSv2 scan the aggregate planned, if any — a zero-file
    * GraftScanFiles proves the metadata-only path. */
  private def aggScanFiles(df: DataFrame): Option[Int] =
    df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan
    }.collect { case g: GraftScanFiles => g.scannedFileCount }

  test("ambiguous positional write fails loudly; synthetic INSERT names align") {
    import spark.implicits._
    withZone { table =>
      Seq((1L, 10.0)).toDF("k", "bal")
        .write.format("graft").mode("overwrite").save(table)
      // a frame with real-but-renamed columns is ambiguous (rename+cast
      // could silently mis-map a reordered frame): refuse with a
      // by-name instruction instead of guessing positional intent
      val e = intercept[Exception] {
        Seq((2L, 20.0)).toDF("key", "balance")
          .write.format("graft").mode("append").save(table)
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("positional mapping")))
      // renamed-to-match works by name; synthetic col1/col2 (the SQL
      // INSERT VALUES shape) aligns positionally — covered by the DDL
      // test below
      Seq((2L, 20.0)).toDF("k", "bal")
        .write.format("graft").mode("append").save(table)
      assert(TxnTable.read(spark, table).count() == 2)
    }
  }

  test("DSv2 write: overwrite creates, append adds, txn replay is a no-op") {
    withZone { table =>
      val cust = Tables.customer(spark, Spec.sf0001)
        .select($"c_custkey", $"c_acctbal")
      cust.write.format("graft").mode("overwrite").save(table)
      assert(TxnTable.latestVersion(spark, table).contains(1L))
      assert(TxnTable.read(spark, table).count() == cust.count())

      val extra = Seq((9000001L, 1.5), (9000002L, 2.5)).toDF("c_custkey", "c_acctbal")
      extra.write.format("graft").mode("append")
        .option("txnAppId", "spec").option("txnVersion", "7").save(table)
      val v = TxnTable.latestVersion(spark, table).get
      assert(TxnTable.read(spark, table).count() == cust.count() + 2)
      // replay of the same (appId, version): no new commit, no new rows
      extra.write.format("graft").mode("append")
        .option("txnAppId", "spec").option("txnVersion", "7").save(table)
      assert(TxnTable.latestVersion(spark, table).contains(v))
      assert(TxnTable.read(spark, table).count() == cust.count() + 2)
      // overwrite replaces everything
      extra.write.format("graft").mode("overwrite").save(table)
      assert(TxnTable.read(spark, table).count() == 2)
    }
  }

  test("DSv2 write: statsCols option lands skipping metadata; evolved append widens the log schema") {
    withZone { table =>
      val cust = Tables.customer(spark, Spec.sf0001)
        .select($"c_custkey", $"c_acctbal")
      cust.repartitionByRange(6, $"c_custkey").sortWithinPartitions($"c_custkey")
        .write.format("graft").mode("overwrite")
        .option("statsCols", "c_custkey").save(table)
      val narrow = spark.read.format("graft").load(table)
        .filter($"c_custkey".between(10, 20))
      val scanned = org.apache.spark.sql.GraftBridge.dsv2ScannedFiles(narrow).get
      assert(scanned > 0 && scanned < 6, s"scanned $scanned of 6")
      // a frame with an extra column appends and evolves the schema
      Seq((9000001L, 9.9, "gold")).toDF("c_custkey", "c_acctbal", "c_tier")
        .write.format("graft").mode("append").save(table)
      val back = TxnTable.read(spark, table)
      assert(back.columns.toSeq == Seq("c_custkey", "c_acctbal", "c_tier"))
      assert(back.filter($"c_tier".isNull).count() == cust.count())
      assert(back.filter($"c_tier" === "gold").count() == 1)
    }
  }

  test("metadata-only aggregate: count/min/max match a full scan and read zero files") {
    withZone { table =>
      val orders = Tables.orders(spark, Spec.sf0001)
        .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      TxnTable.commitOverwrite(
        orders.repartitionByRange(8, $"o_orderkey").sortWithinPartitions($"o_orderkey"),
        table, statsCols = Seq("o_orderkey", "o_orderdate", "o_orderpriority"))
      val ds = spark.read.format("graft").load(table)
      val agg = ds.agg(
        count(lit(1)).as("n"), count($"o_orderdate").as("nd"),
        min($"o_orderkey").as("mnk"), max($"o_orderkey").as("mxk"),
        min($"o_orderpriority").as("mnp"), max($"o_orderpriority").as("mxp"),
        min($"o_orderdate").as("mnd"), max($"o_orderdate").as("mxd"))
      assert(aggScanFiles(agg).contains(0),
        s"expected metadata-only scan, plan:\n${agg.queryExecution.optimizedPlan}")
      val expected = orders.agg(
        count(lit(1)), count($"o_orderdate"),
        min($"o_orderkey"), max($"o_orderkey"),
        min($"o_orderpriority"), max($"o_orderpriority"),
        min($"o_orderdate"), max($"o_orderdate")).head()
      assert(agg.head() == Row(expected.toSeq: _*))
    }
  }

  test("aggregate pushdown refuses when not provable; filtered aggregates scan normally") {
    withZone { table =>
      val cust = Tables.customer(spark, Spec.sf0001)
        .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
      // c_mktsegment has NO stats -> min/max over it must fall back
      TxnTable.commitOverwrite(cust, table, statsCols = Seq("c_custkey"))
      val ds = spark.read.format("graft").load(table)
      val statless = ds.agg(min($"c_mktsegment").as("m"))
      assert(!aggScanFiles(statless).contains(0))
      assert(statless.head().getString(0) ==
        cust.agg(min($"c_mktsegment")).head().getString(0))
      // a WHERE keeps the ordinary skipping scan (filters stay residual)
      val filtered = ds.filter($"c_custkey" > 100).agg(count(lit(1)).as("n"))
      assert(!aggScanFiles(filtered).contains(0))
      assert(filtered.head().getLong(0) ==
        cust.filter($"c_custkey" > 100).count())
      // count(col) over a column with NULLs spread across files is exact
      val withNulls = cust.select(
        $"c_custkey",
        when($"c_custkey" % 7 === 0, lit(null)).otherwise($"c_acctbal")
          .as("bal"))
      val t2 = s"$table-nulls"
      TxnTable.commitOverwrite(
        withNulls.repartitionByRange(4, $"c_custkey"), t2,
        statsCols = Seq("c_custkey", "bal"))
      val agg2 = spark.read.format("graft").load(t2)
        .agg(count($"bal").as("nb"), count(lit(1)).as("n"))
      assert(aggScanFiles(agg2).contains(0))
      assert(agg2.head() == Row(
        withNulls.agg(count($"bal")).head().getLong(0),
        withNulls.count()))
    }
  }

  test("grouped metadata aggregate: partitioned ingest answers GROUP BY from the manifest") {
    withZone { table =>
      val cust = Tables.customer(spark, Spec.sf0001)
        .select($"c_mktsegment", $"c_custkey", $"c_acctbal")
      val segs = cust.select($"c_mktsegment").distinct().as[String].collect().sorted
      segs.foreach { s =>
        cust.filter($"c_mktsegment" === s)
          .write.format("graft").mode("append")
          .option("statsCols", "c_custkey,c_mktsegment").save(table)
      }
      val agg = spark.read.format("graft").load(table)
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"), min($"c_custkey").as("mn"),
          max($"c_custkey").as("mx"))
        .orderBy($"c_mktsegment")
      assert(aggScanFiles(agg).contains(0),
        s"expected metadata-only plan:\n${agg.queryExecution.optimizedPlan}")
      val expected = cust.groupBy($"c_mktsegment")
        .agg(count(lit(1)), min($"c_custkey"), max($"c_custkey"))
        .orderBy($"c_mktsegment").collect().toSeq
      assert(agg.collect().toSeq == expected)
      // a layout where files span several groups must fall back to a scan
      val t2 = s"$table-mixed"
      TxnTable.commitOverwrite(cust, t2,
        statsCols = Seq("c_custkey", "c_mktsegment"))
      val agg2 = spark.read.format("graft").load(t2)
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy($"c_mktsegment")
      assert(!aggScanFiles(agg2).contains(0))
      assert(agg2.collect().toSeq ==
        cust.groupBy($"c_mktsegment").agg(count(lit(1)))
          .orderBy($"c_mktsegment").collect().toSeq)
    }
  }

  test("native streaming sink: writeStream.format(\"graft\") commits per batch, replay-safe") {
    withZone { table =>
      val root = new java.io.File(table).getParentFile
      val landing = s"${root.getAbsolutePath}/landing"
      val checkpoint = s"${root.getAbsolutePath}/ckpt"
      val cust = Tables.customer(spark, Spec.sf0001)
        .select($"c_custkey", $"c_acctbal")
      cust.coalesce(1).write.parquet(landing)
      def run(): Unit = {
        val q = spark.readStream
          .schema(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("c_custkey",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("c_acctbal",
              org.apache.spark.sql.types.DoubleType))))
          .parquet(landing)
          .writeStream.format("graft")
          .option("checkpointLocation", checkpoint)
          .option("statsCols", "c_custkey")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start(table)
        q.awaitTermination()
      }
      run()
      assert(TxnTable.latestVersion(spark, table).contains(1L))
      assert(TxnTable.read(spark, table).count() == cust.count())
      run() // restart with no new data: zero new commits
      assert(TxnTable.latestVersion(spark, table).contains(1L))
      assert(TxnTable.read(spark, table).count() == cust.count())
      // stats landed through the streaming path too
      val narrow = spark.read.format("graft").load(table)
        .filter($"c_custkey" === 1L)
      assert(narrow.count() == cust.filter($"c_custkey" === 1L).count())
    }
  }

  test("null-aware skipping: IS NULL / IS NOT NULL / ranges prune from null counts") {
    withZone { table =>
      val cust = Tables.customer(spark, Spec.sf0001)
        .select($"c_custkey", $"c_acctbal")
      // file 1: no nulls; file 2: the same keys offset, ALL-NULL balances
      TxnTable.commitOverwrite(cust.coalesce(1), table,
        statsCols = Seq("c_acctbal"))
      TxnTable.commitAppend(
        cust.select(($"c_custkey" + 1000000L).as("c_custkey"),
          lit(null).cast("double").as("c_acctbal")).coalesce(1),
        table, statsCols = Seq("c_acctbal"))
      val ds = spark.read.format("graft").load(table)
      val n = cust.count()
      val isNull = ds.filter($"c_acctbal".isNull)
      assert(org.apache.spark.sql.GraftBridge.dsv2ScannedFiles(isNull).contains(1),
        "IS NULL must skip the zero-null file")
      assert(isNull.count() == n)
      val notNull = ds.filter($"c_acctbal".isNotNull)
      assert(org.apache.spark.sql.GraftBridge.dsv2ScannedFiles(notNull).contains(1),
        "IS NOT NULL must skip the proven all-null file")
      assert(notNull.count() == n)
      // a value range can never match an all-null file either
      val ranged = ds.filter($"c_acctbal" > 0.0)
      assert(org.apache.spark.sql.GraftBridge.dsv2ScannedFiles(ranged).contains(1),
        "a range must skip the all-null file")
      assert(ranged.count() == cust.filter($"c_acctbal" > 0.0).count())
      // metadata-only COUNT over the mix stays exact
      val agg = ds.agg(count($"c_acctbal").as("nb"), count(lit(1)).as("nn"))
      assert(aggScanFiles(agg).contains(0))
      assert(agg.head() == Row(
        cust.filter($"c_acctbal".isNotNull).count(), 2 * n))
    }
  }

  test("compositional pruning: OR of ranges and LIKE prefixes skip files") {
    withZone { table =>
      val cust = Tables.customer(spark, Spec.sf0001)
        .select($"c_custkey", $"c_mktsegment", $"c_acctbal")
      TxnTable.commitOverwrite(
        cust.repartitionByRange(6, $"c_custkey").sortWithinPartitions($"c_custkey"),
        table, statsCols = Seq("c_custkey"))
      val ds = spark.read.format("graft").load(table)
      // OR of two edge ranges skips the middle of the key space
      val orQ = ds.filter($"c_custkey" < 10L || $"c_custkey" > 280L)
      val orScanned = org.apache.spark.sql.GraftBridge.dsv2ScannedFiles(orQ).get
      assert(orScanned > 0 && orScanned < 6, s"OR pruning scanned $orScanned of 6")
      assert(orQ.count() ==
        cust.filter($"c_custkey" < 10 || $"c_custkey" > 280).count())
      // per-segment ingest: LIKE 'prefix%' prunes on string stats
      val t2 = s"$table-seg"
      val segs = cust.select($"c_mktsegment").distinct().as[String].collect().sorted
      segs.foreach { s =>
        cust.filter($"c_mktsegment" === s)
          .write.format("graft").mode("append")
          .option("statsCols", "c_mktsegment").save(t2)
      }
      val ds2 = spark.read.format("graft").load(t2)
      val pfx = segs.head.take(3)
      val like = ds2.filter($"c_mktsegment".startsWith(pfx))
      assert(org.apache.spark.sql.GraftBridge.dsv2ScannedFiles(like).contains(1),
        s"prefix '$pfx' must prune to the one matching segment file")
      assert(like.count() == cust.filter($"c_mktsegment".startsWith(pfx)).count())
      val none = ds2.filter($"c_mktsegment".startsWith("ZZZZ"))
      assert(org.apache.spark.sql.GraftBridge.dsv2ScannedFiles(none).contains(0))
      assert(none.count() == 0)
    }
  }

  test("timestampAsOf pins the snapshot committed at or before the wall clock") {
    withZone { table =>
      val cust = Tables.customer(spark, Spec.sf0001)
        .select($"c_custkey", $"c_acctbal")
      TxnTable.commitOverwrite(cust, table)
      Thread.sleep(60)
      val between = System.currentTimeMillis()
      Thread.sleep(60)
      TxnTable.commitAppend(
        Seq((9000001L, 1.0)).toDF("c_custkey", "c_acctbal"), table)
      val pinned = spark.read.format("graft")
        .option("timestampAsOf", between.toString).load(table)
      assert(pinned.count() == cust.count()) // v1, not the appended v2
      assert(spark.read.format("graft").load(table).count() == cust.count() + 1)
      // a timestamp before the first commit is an error
      val err = intercept[Exception] {
        spark.read.format("graft").option("timestampAsOf", "1000").load(table)
      }
      assert(err.getMessage.contains("no version committed"))
      // versionAsOf + timestampAsOf together are rejected
      val both = intercept[Exception] {
        spark.read.format("graft").option("versionAsOf", "1")
          .option("timestampAsOf", between.toString).load(table)
      }
      assert(both.getMessage.contains("mutually exclusive"))
    }
  }

  test("SQL DDL surface: CREATE TABLE USING graft, INSERT INTO, SELECT") {
    withZone { table =>
      val cust = Tables.customer(spark, Spec.sf0001)
        .select($"c_custkey", $"c_acctbal")
      cust.write.format("graft").mode("overwrite").save(table)
      spark.sql(
        s"CREATE TABLE graft_ddl_t USING graft OPTIONS (path '$table')")
      try {
        assert(spark.sql("SELECT count(*) FROM graft_ddl_t").head().getLong(0)
          == cust.count())
        spark.sql("INSERT INTO graft_ddl_t VALUES (9000001, 42.0)")
        assert(spark.sql("SELECT count(*) FROM graft_ddl_t").head().getLong(0)
          == cust.count() + 1)
        assert(TxnTable.read(spark, table)
          .filter($"c_custkey" === 9000001L).count() == 1)
        // SQL point delete routes through the bloom/stats-gated primitive
        spark.sql("DELETE FROM graft_ddl_t WHERE c_custkey = 9000001")
        assert(TxnTable.read(spark, table)
          .filter($"c_custkey" === 9000001L).count() == 0)
        // SQL closed-range delete routes through the metadata-gated range
        val inRange = cust.filter($"c_custkey".between(1, 50)).count()
        spark.sql("DELETE FROM graft_ddl_t WHERE c_custkey BETWEEN 1 AND 50")
        assert(spark.sql("SELECT count(*) FROM graft_ddl_t").head().getLong(0)
          == cust.count() - inRange)
        // TRUNCATE is one empty overwrite commit; history stays readable
        val preTruncate = TxnTable.latestVersion(spark, table).get
        spark.sql("TRUNCATE TABLE graft_ddl_t")
        assert(spark.sql("SELECT count(*) FROM graft_ddl_t").head().getLong(0) == 0)
        assert(TxnTable.readVersion(spark, table, preTruncate).count() ==
          cust.count() - inRange)
      } finally spark.sql("DROP TABLE graft_ddl_t")
    }
  }

  test("per-file row counts survive append, delete, merge, and restore") {
    withZone { table =>
      val cust = Tables.customer(spark, Spec.sf0001)
        .select($"c_custkey".as("k"), $"c_acctbal".as("bal"))
      TxnTable.commitOverwrite(
        cust.repartitionByRange(4, $"k"), table, statsCols = Seq("k"))
      def rowsAgree(): Unit = {
        val v = TxnTable.latestVersion(spark, table).get
        val byMeta = TxnTable.fileRows(spark, table, v)
        val files = TxnTable.snapshotFiles(spark, table, v)
        assert(files.forall(byMeta.contains), "every live file has a count")
        assert(byMeta.view.filterKeys(files.toSet).values.sum ==
          TxnTable.read(spark, table).count())
      }
      rowsAgree()
      TxnTable.commitAppend(
        Seq((9000001L, 5.0)).toDF("k", "bal"), table, statsCols = Seq("k"))
      rowsAgree()
      TxnTable.deleteRange(spark, table, "k", lo = 100, hi = 300)
      rowsAgree()
      TxnTable.merge(
        Seq((42L, 0.0), (9000002L, 7.0)).toDF("k", "bal"), table, "k")
      rowsAgree()
      val before = TxnTable.latestVersion(spark, table).get
      TxnTable.restore(spark, table, 2L)
      rowsAgree()
    }
  }
}
