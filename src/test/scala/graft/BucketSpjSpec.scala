package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** bucket(n, col) partitioning + storage-partitioned joins through the
  * catalog: hash-bucketed tables on a HIGH-cardinality key join with
  * zero shuffles — the transform resolves through the catalog's
  * FunctionCatalog (GraftBucketFunction) so Spark can compare the two
  * sides' clustering. */
class BucketSpjSpec extends AnyFunSuite {
  lazy val spark = Spec.spark
  import spark.implicits._

  private def withSpjConfs[A](body: => A): A = {
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int =
    p.collect {
      case _: ShuffleExchangeExec => 1
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        shuffles(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        shuffles(r.child)
    }.sum

  private def finalPlan(df: org.apache.spark.sql.DataFrame) = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
  }

  test("bucketed tables join shuffle-free through the catalog") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bspj").toString
    spark.conf.set("spark.sql.catalog.gbspj", "graft.io.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.gbspj.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS gbspj.db")
      spark.sql(
        """CREATE TABLE gbspj.db.l (user_id BIGINT, v DOUBLE)
          |USING graft PARTITIONED BY (bucket(8, user_id))""".stripMargin)
      spark.sql(
        """CREATE TABLE gbspj.db.r (user_id BIGINT, w DOUBLE)
          |USING graft PARTITIONED BY (bucket(8, user_id))""".stripMargin)
      graft.io.Tables.events(spark, Spec.sf0001)
        .select($"user_id", $"value".as("v"))
        .createOrReplaceTempView("bspj_src")
      spark.sql("INSERT INTO gbspj.db.l SELECT user_id, v FROM bspj_src")
      spark.sql(
        "INSERT INTO gbspj.db.r SELECT user_id, v * 2 AS w FROM bspj_src")

      // every file must land in exactly one bucket dir
      val lPath = s"$wh/db/l"
      val files = graft.io.TxnTable.snapshotFiles(
        spark, lPath, graft.io.TxnTable.latestVersion(spark, lPath).get)
      assert(files.nonEmpty &&
        files.forall(_.contains("__gp_bucket_8_user_id=")),
        s"files not bucket-partitioned: ${files.take(3)}")

      withSpjConfs {
        val j = spark.sql(
          """SELECT l.user_id, COUNT(*) AS n
            |FROM gbspj.db.l l JOIN gbspj.db.r r ON l.user_id = r.user_id
            |GROUP BY l.user_id""".stripMargin)
        val plan = finalPlan(j)
        assert(shuffles(plan) == 0,
          s"bucketed SPJ must plan zero shuffles:\n$plan")
        // correctness: per-user count = (events of user)^2
        val perUser = graft.io.Tables.events(spark, Spec.sf0001)
          .groupBy($"user_id").agg(count(lit(1)).as("c"))
          .select($"user_id", ($"c" * $"c").as("n"))
        assert(j.orderBy($"user_id").collect().toSeq ==
          perUser.orderBy($"user_id").collect().toSeq)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS gbspj.db.l")
      spark.sql("DROP TABLE IF EXISTS gbspj.db.r")
      spark.conf.unset("spark.sql.catalog.gbspj")
      spark.conf.unset("spark.sql.catalog.gbspj.warehouse")
    }
  }

  test("point lookup on a bucketed column prunes to one bucket's files") {
    val zone = java.nio.file.Files.createTempDirectory("graft_bprune").toString
    val t = s"$zone/t"
    graft.io.TxnTable.commitAppend(
      graft.io.Tables.events(spark, Spec.sf0001)
        .select($"user_id", $"event_id", $"value"),
      t, partitionCols = Seq("bucket(8,user_id)"))
    val total = graft.io.TxnTable.snapshotFiles(
      spark, t, graft.io.TxnTable.latestVersion(spark, t).get).size
    // sf0.001 has few distinct users — an empty bucket lands no file
    assert(total >= 4, s"expected several bucket file groups, got $total")
    val probe = spark.read.format("graft").load(t)
      .filter($"user_id" === 7L)
    val scanned = org.apache.spark.sql.GraftBridge.dsv2ScannedFiles(probe).get
    assert(scanned < total && scanned >= 1,
      s"bucket pruning should keep ~1/8 of files: $scanned of $total")
    // values unchanged vs the raw table
    val expect = graft.io.Tables.events(spark, Spec.sf0001)
      .filter($"user_id" === 7L).count()
    assert(probe.count() == expect && expect > 0)
    // IN across two buckets keeps both, still < total
    val probe2 = spark.read.format("graft").load(t)
      .filter($"user_id".isin(7L, 11L))
    val scanned2 = org.apache.spark.sql.GraftBridge.dsv2ScannedFiles(probe2).get
    assert(scanned2 < total)
    val expect2 = graft.io.Tables.events(spark, Spec.sf0001)
      .filter($"user_id".isin(7L, 11L)).count()
    assert(probe2.count() == expect2)
  }

  test("readEquals and deleteEquals on a bucketed key touch one bucket") {
    val zone = java.nio.file.Files.createTempDirectory("graft_bdml").toString
    val t = s"$zone/t"
    graft.io.TxnTable.commitAppend(
      graft.io.Tables.events(spark, Spec.sf0001)
        .select($"user_id", $"event_id", $"value"),
      t, partitionCols = Seq("bucket(8,user_id)"))
    val v0 = graft.io.TxnTable.latestVersion(spark, t).get
    val before = graft.io.TxnTable.snapshotFiles(spark, t, v0)
    val (rows, scanned, total) =
      graft.io.TxnTable.readEquals(spark, t, "user_id", 7L)
    assert(scanned < total, s"readEquals scanned $scanned of $total")
    val expect = graft.io.Tables.events(spark, Spec.sf0001)
      .filter($"user_id" === 7L).count()
    assert(rows.count() == expect && expect > 0)
    graft.io.TxnTable.deleteEquals(spark, t, "user_id", 7L)
    val after = graft.io.TxnTable.snapshotFiles(
      spark, t, graft.io.TxnTable.latestVersion(spark, t).get)
    // every file OUTSIDE the key's bucket carries by path identity: the
    // rewritten (dropped) files must all come from ONE bucket dir
    val seg = "__gp_bucket_8_user_id="
    def bid(f: String): Option[Int] = f.split('/').collectFirst {
      case s if s.startsWith(seg) => s.substring(seg.length).toInt
    }
    val rewritten = before.filterNot(after.contains)
    assert(rewritten.nonEmpty && rewritten.flatMap(bid).distinct.size == 1,
      s"delete must rewrite only the key's bucket, touched: $rewritten")
    assert(spark.read.format("graft").load(t)
      .filter($"user_id" === 7L).count() == 0)
  }

  test("compaction preserves the bucket layout and the keyed join plan") {
    val zone = java.nio.file.Files.createTempDirectory("graft_bcomp").toString
    val t = s"$zone/t"
    val ev = graft.io.Tables.events(spark, Spec.sf0001)
      .select($"user_id", $"event_id", $"value")
    graft.io.TxnTable.commitAppend(ev.filter($"event_id" % 2 === 0), t,
      partitionCols = Seq("bucket(8,user_id)"))
    graft.io.TxnTable.commitAppend(ev.filter($"event_id" % 2 === 1), t)
    graft.io.TxnTable.compact(spark, t)
    val files = graft.io.TxnTable.snapshotFiles(
      spark, t, graft.io.TxnTable.latestVersion(spark, t).get)
    assert(files.nonEmpty &&
      files.forall(_.contains("__gp_bucket_8_user_id=")),
      s"compaction must re-bucket: ${files.take(3)}")
    // bucket-transform clustering resolves only through a catalog's
    // FunctionCatalog — point one at the zone and join through it
    spark.conf.set("spark.sql.catalog.gbcomp", "graft.io.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.gbcomp.warehouse", zone)
    try withSpjConfs {
      val j = spark.sql(
        """SELECT a.user_id, a.event_id FROM gbcomp.t a
          |JOIN gbcomp.t b ON a.user_id = b.user_id
          |  AND a.event_id = b.event_id""".stripMargin)
      assert(shuffles(finalPlan(j)) == 0,
        "compacted bucketed table must still join shuffle-free")
      assert(j.count() == ev.count())
    } finally {
      spark.conf.unset("spark.sql.catalog.gbcomp")
      spark.conf.unset("spark.sql.catalog.gbcomp.warehouse")
    }
  }

  test("mismatched bucket counts refuse co-partitioning but stay correct") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bspj2").toString
    spark.conf.set("spark.sql.catalog.gbspj2", "graft.io.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.gbspj2.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS gbspj2.db")
      spark.sql(
        """CREATE TABLE gbspj2.db.a (user_id BIGINT, v DOUBLE)
          |USING graft PARTITIONED BY (bucket(8, user_id))""".stripMargin)
      spark.sql(
        """CREATE TABLE gbspj2.db.b (user_id BIGINT, w DOUBLE)
          |USING graft PARTITIONED BY (bucket(4, user_id))""".stripMargin)
      graft.io.Tables.events(spark, Spec.sf0001)
        .select($"user_id", $"value".as("v")).limit(500)
        .createOrReplaceTempView("bspj2_src")
      spark.sql("INSERT INTO gbspj2.db.a SELECT user_id, v FROM bspj2_src")
      spark.sql("INSERT INTO gbspj2.db.b SELECT user_id, v FROM bspj2_src")
      withSpjConfs {
        val j = spark.sql(
          """SELECT COUNT(*) AS n FROM gbspj2.db.a a
            |JOIN gbspj2.db.b b ON a.user_id = b.user_id""".stripMargin)
        assert(shuffles(finalPlan(j)) > 0) // 8 vs 4 buckets: must shuffle
        val n = j.collect()(0).getLong(0)
        val perUser = graft.io.Tables.events(spark, Spec.sf0001)
          .select($"user_id", $"value").limit(500)
          .groupBy($"user_id").agg(count(lit(1)).as("c"))
        val expect = perUser.select(sum($"c" * $"c")).collect()(0).getLong(0)
        assert(n == expect)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS gbspj2.db.a")
      spark.sql("DROP TABLE IF EXISTS gbspj2.db.b")
      spark.conf.unset("spark.sql.catalog.gbspj2")
      spark.conf.unset("spark.sql.catalog.gbspj2.warehouse")
    }
  }
}
