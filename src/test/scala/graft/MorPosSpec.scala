package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.TxnTable

/** POSITIONAL deletion vectors: a delete commits (file, row-ordinal)
  * coordinates instead of key tuples — removing exact physical rows
  * (including SOME of several identical ones), version-gated and
  * materialized by OPTIMIZE exactly like the equality flavor. */
class MorPosSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark

  private var n = 0
  private def withZone(body: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_pos").toFile
    try body(s"${root.getAbsolutePath}/t")
    finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(root)
    }
  }

  private def state(table: String) =
    TxnTable.morState(spark, table,
      TxnTable.latestVersion(spark, table).get)

  private def seed(table: String): Unit = {
    import spark.implicits._
    // duplicate rows on purpose: k repeats across two batches
    val df = Seq.range(0L, 50L).map(k => (k, s"s${k % 10}", k % 5))
      .toDF("k", "s", "g").repartitionByRange(4, $"k")
    df.write.format("graft").option("statsCols", "k,g")
      .option("mergeOnRead", "true").mode("overwrite").save(table)
  }

  test("deleteWherePos removes exactly the matched rows, zero data rewrite") {
    withZone { table =>
      seed(table)
      val before = state(table).files.toSet
      val v = TxnTable.deleteWherePos(spark, table, df => df("g") === 2)
      assert(state(table).files.toSet == before, "no data file rewritten")
      val d = state(table).dels
      assert(d.size == 1 && d.head.keyCols == Seq(TxnTable.PosDelKey))
      assert(d.head.rows == 10)
      val left = spark.read.format("graft").load(table)
      assert(left.count() == 40L)
      assert(left.filter(col("g") === 2).count() == 0L)
      // time travel below the delete still sees the rows
      val past = spark.read.format("graft")
        .option("versionAsOf", (v - 1).toString).load(table)
      assert(past.count() == 50L)
    }
  }

  test("keep-first dedup in place: only rank>1 duplicates of identical rows go") {
    withZone { table =>
      import spark.implicits._
      // five identical (v=1) rows and five distinct others
      val df = (Seq.fill(5)((1L, "dup")) ++ Seq.range(10L, 15L).map(k => (k, s"u$k")))
        .toDF("v", "s").repartition(3)
      df.write.format("graft").option("mergeOnRead", "true")
        .mode("overwrite").save(table)
      val rows = TxnTable.readWithRowIdentity(spark, table)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"v", $"s")
        .orderBy(col(TxnTable.PosFileCol), col(TxnTable.PosOrdCol))
      val losers = rows.withColumn("rn", row_number().over(w))
        .filter($"rn" > 1)
      TxnTable.deletePositions(spark, table, losers)
      val left = spark.read.format("graft").load(table)
      assert(left.count() == 6L, "one survivor per distinct row")
      assert(left.filter($"v" === 1L).count() == 1L)
      // equality deletes could NOT express this: all five v=1 rows are
      // byte-identical; the positional vector names one survivor
    }
  }

  test("version gate: rows appended after the delete survive matching coords") {
    withZone { table =>
      import spark.implicits._
      seed(table)
      TxnTable.deleteWherePos(spark, table, df => df("g") === 0)
      // re-insert rows that would have matched — new files, exempt
      Seq((1000L, "s0", 0L)).toDF("k", "s", "g")
        .write.format("graft").mode("append").save(table)
      val left = spark.read.format("graft").load(table)
      assert(left.filter($"g" === 0).count() == 1L)
      assert(left.count() == 41L)
    }
  }

  test("coordinates naming unknown files are a CONFLICT, not a silent no-op") {
    withZone { table =>
      import spark.implicits._
      seed(table)
      // a file absent from the manifest means a rewrite landed after
      // the identity read — dropping the entry would lose the delete
      val bogus = Seq(("w=nope/part-0.parquet", 3L), ("zzz", 99L))
        .toDF(TxnTable.PosFileCol, TxnTable.PosOrdCol)
      val v0 = TxnTable.latestVersion(spark, table).get
      val e = intercept[java.util.ConcurrentModificationException] {
        TxnTable.deletePositions(spark, table, bogus)
      }
      assert(e.getMessage.contains("w=nope/part-0.parquet"))
      assert(TxnTable.latestVersion(spark, table).get == v0,
        "refused delete must not commit")
      // explicit opt-out: stale entries drop, known-file semantics keep
      val v = TxnTable.deletePositions(spark, table, bogus,
        requirePresent = false)
      assert(v == v0, "all-stale delete must no-op under the opt-out")
      assert(spark.read.format("graft").load(table).count() == 50L)
    }
  }

  test("a live vector keeps un-named files on the stats-pruned fast path") {
    withZone { table =>
      import spark.implicits._
      // three appends → three disjoint-range files, stats on k
      Seq.tabulate(3) { b =>
        Seq.range(b * 100L, b * 100L + 100L).map(k => (k, k * 2.0))
          .toDF("k", "v").coalesce(1)
      }.foreach(_.write.format("graft").option("statsCols", "k")
        .option("mergeOnRead", "true")
        .mode(if (new java.io.File(table).exists) "append" else "overwrite")
        .save(table))
      val st0 = state(table)
      assert(st0.files.size == 3)
      TxnTable.deleteWherePos(spark, table, df => df("k") < 10L)
      val d = state(table).dels
      assert(d.size == 1 && d.head.named.size == 1,
        s"the vector touches one file and must record it; got ${d.head.named}")
      // a predicate selecting only the THIRD file's range: the two
      // un-named files ride the DSv2 scan, whose manifest stats must
      // prune down to one file — a live vector elsewhere in the table
      // must not degrade this read to a full file sweep
      val q = spark.read.format("graft").load(table).filter($"k" >= 250L)
      assert(q.count() == 50L)
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[Int] =
        p.flatMap {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            b.scan match {
              case g: graft.io.GraftScanFiles => Seq(g.scannedFileCount)
              case _ => Nil
            }
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(s.plan)
          case _ => Nil
        }
      val scans = walk(q.queryExecution.executedPlan)
      assert(scans.nonEmpty && scans.min == 1,
        s"expected the un-named files' DSv2 scan pruned to 1 file; " +
          s"scan file counts: $scans\n${q.queryExecution.executedPlan}")
      // the vector applies IN-SCAN (GraftVecBatch): no v1 splice branch
      // exists anymore — the whole table is ONE DSv2 relation
      def v1Files(p: org.apache.spark.sql.execution.SparkPlan): Seq[Long] =
        p.flatMap {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.output.exists(_.name == "k") =>
            Seq(f.metrics("numFiles").value)
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            v1Files(a.executedPlan)
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            v1Files(s.plan)
          case _ => Nil
        }
      assert(v1Files(q.queryExecution.executedPlan).isEmpty,
        "positional vectors must apply inside the DSv2 scan, not a " +
          "spliced v1 branch")
      // and the subtraction itself still holds on the named file
      assert(spark.read.format("graft").load(table).count() == 290L)
      // THE fast-path payoff: a metadata-only COUNT(*) survives the
      // live vector — answered from manifest row counts minus the
      // vector's per-file deleted counts, ZERO files opened
      val cnt = spark.read.format("graft").load(table)
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)))
      assert(cnt.head().getLong(0) == 290L)
      val aggScans = cnt.queryExecution.executedPlan.flatMap {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan match {
            case g: graft.io.GraftScanFiles => Seq(g.scannedFileCount)
            case _ => Nil
          }
        case _ => Nil
      }
      assert(aggScans.forall(_ == 0),
        s"metadata-only COUNT must open zero files under a live " +
          s"vector; scanned: $aggScans\n${cnt.queryExecution.executedPlan}")
      // exact scan statistics deduct the vector too (broadcast sizing)
      val rel = spark.read.format("graft").load(table)
      assert(rel.queryExecution.optimizedPlan.stats.rowCount
          .exists(_.toLong == 290L),
        s"scan statistics must deduct deleted rows: " +
          s"${rel.queryExecution.optimizedPlan.stats}")
    }
  }

  test("deleteMode=positional routes SQL DELETE — subqueries included — to vectors") {
    withZone { table =>
      import spark.implicits._
      seed(table)
      spark.sql(s"CREATE TABLE pos_mode_t USING graft OPTIONS (path '$table')")
      try {
        spark.sql(
          "ALTER TABLE pos_mode_t SET TBLPROPERTIES ('graft.deleteMode' = 'positional')")
        val before = state(table).files.toSet
        // a subquery predicate — the shape the EQUALITY flavor must
        // refuse (tuples would not determine membership) and copy-on-
        // write would rewrite files for; positional mode commits the
        // matched coordinates instead
        Seq(1L, 3L).toDF("gg").createOrReplaceTempView("pos_mode_del_keys")
        spark.sql(
          "DELETE FROM pos_mode_t WHERE g IN (SELECT gg FROM pos_mode_del_keys)")
        val st = state(table)
        assert(st.files.toSet == before,
          "positional mode must not rewrite any data file")
        assert(st.dels.nonEmpty &&
          st.dels.forall(_.keyCols == Seq(TxnTable.PosDelKey)),
          s"expected a positional vector, got ${st.dels.map(_.keyCols)}")
        assert(spark.sql("SELECT count(*) FROM pos_mode_t").head().getLong(0)
          == 30L)
        assert(spark.sql(
          "SELECT count(*) FROM pos_mode_t WHERE g IN (1, 3)")
          .head().getLong(0) == 0L)
        // the metadata-deletable shape (point predicate) ALSO routes to
        // a vector: the mode's contract is zero data-file rewrites
        spark.sql("DELETE FROM pos_mode_t WHERE g = 0")
        val st2 = state(table)
        assert(st2.files.toSet == before,
          "point deletes must not trigger the boundary rewrite either")
        assert(spark.sql("SELECT count(*) FROM pos_mode_t").head().getLong(0)
          == 20L)
        // dropping the property restores the default routing
        spark.sql("ALTER TABLE pos_mode_t UNSET TBLPROPERTIES ('graft.deleteMode')")
      } finally spark.sql("DROP TABLE pos_mode_t")
    }
  }

  test("updateMode=positional routes SQL UPDATE through vectors, subqueries too") {
    withZone { table =>
      import spark.implicits._
      seed(table)
      spark.sql(s"CREATE TABLE pos_umode_t USING graft OPTIONS (path '$table')")
      try {
        spark.sql("ALTER TABLE pos_umode_t SET TBLPROPERTIES " +
          "('graft.updateMode' = 'positional')")
        val before = state(table).files.toSet
        Seq(2L, 4L).toDF("gg").createOrReplaceTempView("pos_umode_keys")
        // subquery WHERE + self-referencing SET — the shapes the
        // equality flavor refuses; positional mode stays exact
        spark.sql(
          """UPDATE pos_umode_t SET k = k + 1000
            |WHERE g IN (SELECT gg FROM pos_umode_keys)""".stripMargin)
        val st = state(table)
        assert(st.files.toSet.intersect(before) == before,
          "positional update must append, never rewrite")
        assert(st.dels.nonEmpty &&
          st.dels.forall(_.keyCols == Seq(TxnTable.PosDelKey)))
        val got = spark.sql("SELECT count(*) FROM pos_umode_t").head().getLong(0)
        assert(got == 50L, s"row count preserved, got $got")
        assert(spark.sql(
          "SELECT count(*) FROM pos_umode_t WHERE k >= 1000").head().getLong(0)
          == 20L, "exactly the matched rows carry the update")
        assert(spark.sql(
          "SELECT count(*) FROM pos_umode_t WHERE g IN (2, 4) AND k < 1000")
          .head().getLong(0) == 0L)
      } finally spark.sql("DROP TABLE pos_umode_t")
    }
  }

  test("OPTIMIZE materializes positional deletes; vector dies with its files") {
    withZone { table =>
      seed(table)
      TxnTable.deleteWherePos(spark, table, df => df("k") < 10)
      assert(state(table).dels.nonEmpty)
      TxnTable.compact(spark, table, targetFiles = 1)
      val st = state(table)
      // liveness rule: no surviving file predates the gate → entry dropped
      assert(st.dels.isEmpty, "materialized vector must leave the manifest")
      assert(spark.read.format("graft").load(table).count() == 40L)
    }
  }

  test("positional and equality deletes compose on one table") {
    withZone { table =>
      seed(table)
      TxnTable.deleteWhereMoR(spark, table, Seq("g"), df => df("g") === 4)
      TxnTable.deleteWherePos(spark, table, df => df("k") === 0L)
      val left = spark.read.format("graft").load(table)
      assert(left.count() == 39L)
      assert(left.filter(col("g") === 4).count() == 0L)
      assert(left.filter(col("k") === 0L).count() == 0L)
      val kinds = state(table).dels.map(_.keyCols).toSet
      assert(kinds == Set(Seq("g"), Seq(TxnTable.PosDelKey)))
    }
  }

  test("change feed records the positionally deleted rows") {
    withZone { table =>
      import spark.implicits._
      seed(table)
      // turn CDF on via an append with the option
      Seq((999L, "x", 9L)).toDF("k", "s", "g").write.format("graft")
        .option("enableChangeFeed", "true").mode("append").save(table)
      val since = TxnTable.latestVersion(spark, table).get
      TxnTable.deleteWherePos(spark, table, df => df("k") === 7L)
      val feed = TxnTable.changeFeed(spark, table, since, -1)
      val del = feed.filter(col(TxnTable.ChangeTypeCol) === "delete")
      assert(del.count() == 1L)
      assert(del.select("k").as[Long].head() == 7L)
    }
  }

  test("updateWherePos: changed rows append, originals supersede by coordinate") {
    withZone { table =>
      import spark.implicits._
      seed(table)
      val before = state(table).files.toSet
      TxnTable.updateWherePos(spark, table,
        df => df("g") === 2, Map("s" -> lit("UPDATED")))
      val st = state(table)
      assert(before.subsetOf(st.files.toSet), "original files carry")
      assert(st.files.size > before.size, "updated rows land as new files")
      assert(st.dels.exists(_.keyCols == Seq(TxnTable.PosDelKey)))
      val now = spark.read.format("graft").load(table)
      assert(now.count() == 50L, "update must not change cardinality")
      assert(now.filter($"s" === "UPDATED").count() == 10L)
      assert(now.filter($"g" === 2 && $"s" =!= "UPDATED").count() == 0L)
    }
  }

  test("updateFromPos: per-row values ride the frame, no literals") {
    withZone { table =>
      import spark.implicits._
      seed(table)
      val before = state(table).files.toSet
      // per-key assignments from a FRAME: k -> s"u<k>", g -> k % 3;
      // key 999 matches nothing and must be ignored
      val updates = Seq((3L, "u3", 0), (17L, "u17", 2), (999L, "zz", 1))
        .toDF("k", "s", "g")
      TxnTable.updateFromPos(spark, table, updates, Seq("k"))
      val st = state(table)
      assert(before.subsetOf(st.files.toSet), "original files carry")
      assert(st.dels.exists(d =>
        d.keyCols == Seq(TxnTable.PosDelKey) && d.rows == 2L))
      val now = spark.read.format("graft").load(table)
      assert(now.count() == 50L, "update must not change cardinality")
      val got = now.filter($"k".isin(3L, 17L))
        .select($"k", $"s", $"g").as[(Long, String, Long)].collect().toSet
      assert(got == Set((3L, "u3", 0L), (17L, "u17", 2L)), got)
      assert(now.filter($"s" === "zz").count() == 0L,
        "an update row matching nothing is ignored")
      // a duplicate key tuple is REFUSED, not silently fanned out
      val dup = Seq((5L, "a", 0), (5L, "b", 0)).toDF("k", "s", "g")
      val e = intercept[IllegalArgumentException] {
        TxnTable.updateFromPos(spark, table, dup, Seq("k"))
      }
      assert(e.getMessage.contains("duplicate"), e.getMessage)
      assert(spark.read.format("graft").load(table).count() == 50L)
    }
  }

  /** Largest literal fan-out in an optimized plan (In list / InSet /
    * array literal) — the IncrementalBoilerplateSpec d50 gauge,
    * extended here to the takedown-shaped erasure legs. */
  private def maxLiteralFanout(
      qe: org.apache.spark.sql.execution.QueryExecution): Int = {
    import org.apache.spark.sql.catalyst.expressions.{In, InSet, Literal}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.ArrayType
    val sizes = qe.optimizedPlan.flatMap { n =>
      n.expressions.flatMap(_.collect {
        case i: In => i.list.size
        case s: InSet => s.hset.size
        case l: Literal
            if l.dataType.isInstanceOf[ArrayType] && l.value != null =>
          l.value.asInstanceOf[ArrayData].numElements()
      })
    }
    if (sizes.isEmpty) 0 else sizes.max
  }

  test("deleteFromPos: a 1000-id takedown batch stays literal-free") {
    withZone { table =>
      import spark.implicits._
      val df = spark.range(0L, 4000L).select(
        $"id".as("k"), concat(lit("s"), $"id" % 10).as("s"),
        ($"id" % 5).as("g")).repartitionByRange(4, $"k")
      df.write.format("graft").option("statsCols", "k,g")
        .option("mergeOnRead", "true").mode("overwrite").save(table)
      val before = state(table).files.toSet
      // the erasure batch as a FRAME — ids 0,4,8,… plus some misses
      val keys = spark.range(0L, 1100L).select(($"id" * 4L).as("k"))
      val plans = new java.util.concurrent.ConcurrentLinkedQueue[
        org.apache.spark.sql.execution.QueryExecution]()
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = { plans.add(qe); () }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      try TxnTable.deleteFromPos(spark, table, keys, Seq("k"))
      finally {
        org.apache.spark.sql.GraftBridge.waitListenerBus(spark)
        spark.listenerManager.unregister(listener)
      }
      val captured = plans.toArray(
        Array.empty[org.apache.spark.sql.execution.QueryExecution])
      assert(captured.nonEmpty, "the listener saw no executed queries")
      val fan = captured.map(maxLiteralFanout).max
      assert(fan < 600,
        s"a takedown plan carried a $fan-element literal list — the " +
          "erasure selection must stay frame-joined, not isin-collected")
      val st = state(table)
      assert(before.subsetOf(st.files.toSet),
        "a takedown is deletion vectors, not a rewrite")
      val now = spark.read.format("graft").load(table)
      assert(now.count() == 3000L)
      assert(now.filter($"k" % 4 === 0).count() == 0L)
      // idempotent-janitor shape: the SAME batch re-runs and matches
      // nothing — no error, no cardinality change
      TxnTable.deleteFromPos(spark, table, keys, Seq("k"))
      assert(spark.read.format("graft").load(table).count() == 3000L)
    }
  }

  test("updateWherePos can target SOME of byte-identical duplicates") {
    withZone { table =>
      import spark.implicits._
      Seq.fill(5)((1L, "dup")).toDF("v", "s").coalesce(1)
        .write.format("graft").option("mergeOnRead", "true")
        .mode("overwrite").save(table)
      // row identity in the predicate: update the first two copies only
      TxnTable.updateWherePos(spark, table,
        df => df(TxnTable.PosOrdCol) < 2L, Map("s" -> lit("first-two")))
      val now = spark.read.format("graft").load(table)
      assert(now.filter($"s" === "first-two").count() == 2L)
      assert(now.filter($"s" === "dup").count() == 3L)
    }
  }

  test("updateWherePos records pre/postimage in the change feed") {
    withZone { table =>
      import spark.implicits._
      seed(table)
      Seq((999L, "x", 9L)).toDF("k", "s", "g").write.format("graft")
        .option("enableChangeFeed", "true").mode("append").save(table)
      val since = TxnTable.latestVersion(spark, table).get
      TxnTable.updateWherePos(spark, table,
        df => df("k") === 3L, Map("s" -> lit("u3")))
      val feed = TxnTable.changeFeed(spark, table, since, -1)
      val types = feed.groupBy(col(TxnTable.ChangeTypeCol)).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(types == Map("update_preimage" -> 1L, "update_postimage" -> 1L))
    }
  }

  test("positional commits replay through the change feed WITHOUT CDF") {
    withZone { table =>
      import spark.implicits._
      seed(table) // CDF never enabled
      val v0 = TxnTable.latestVersion(spark, table).get
      TxnTable.deleteWherePos(spark, table, df => df("g") === 1)
      val feed = TxnTable.changeFeed(spark, table, v0, -1)
      val dels = feed.filter(col(TxnTable.ChangeTypeCol) === "delete")
      assert(dels.count() == 10L)
      assert(dels.select("g").distinct().as[Long].collect().toSeq == Seq(1L))
      // positional update: preimage reconstructs, postimage = new files
      val v1 = TxnTable.latestVersion(spark, table).get
      TxnTable.updateWherePos(spark, table,
        df => df("k") === 5L, Map("s" -> lit("lazy")))
      val feed2 = TxnTable.changeFeed(spark, table, v1, -1)
      val byType = feed2.groupBy(col(TxnTable.ChangeTypeCol)).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byType == Map(
        "update_preimage" -> 1L, "update_postimage" -> 1L))
      assert(feed2.filter(col(TxnTable.ChangeTypeCol) === "update_preimage")
        .select("s").as[String].head() == "s5")
      // the DSv2 readChangeFeed path cannot express the replay join —
      // it must refuse LOUDLY, never silently omit the deletes
      val dsv2 = intercept[Exception] {
        spark.read.format("graft").option("readChangeFeed", "true")
          .option("startingVersion", v0.toString).load(table).collect()
      }
      assert(dsv2.getMessage.contains("positional-delete commit"),
        s"got: ${dsv2.getMessage}")
      // equality deletes stay unreconstructible — the contract holds
      val v2 = TxnTable.latestVersion(spark, table).get
      TxnTable.deleteWhereMoR(spark, table, Seq("g"), df => df("g") === 3)
      val e = intercept[IllegalStateException] {
        TxnTable.changeFeed(spark, table, v2, -1).collect()
      }
      assert(e.getMessage.contains("no change data"))
    }
  }

  test("REORG PURGE rewrites only the files a positional vector names") {
    withZone { table =>
      import spark.implicits._
      seed(table) // 4 range-partitioned files over k = 0..49
      // the vector names rows in the FIRST range file only
      TxnTable.deleteWherePos(spark, table, df => df("k") < 5)
      val before = state(table).files
      val v = TxnTable.reorgPurge(spark, table)
      val st = state(table)
      assert(st.dels.isEmpty, "purge must materialize the vector away")
      val carried = before.toSet.intersect(st.files.toSet)
      assert(carried.size == before.size - 1,
        s"exactly one affected file rewrites; carried=${carried.size} " +
          s"of ${before.size}")
      val left = spark.read.format("graft").load(table)
      assert(left.count() == 45L)
      assert(left.filter($"k" < 5).count() == 0L)
      // idempotent: a second purge is a provable no-op
      assert(TxnTable.reorgPurge(spark, table) == v)
    }
  }

  test("vacuum keeps a live vector's sidecar, reclaims it after REORG PURGE") {
    withZone { table =>
      import spark.implicits._
      seed(table)
      TxnTable.deleteWherePos(spark, table, df => df("g") === 2)
      val live = state(table).dels.map(_.file)
      assert(live.nonEmpty)
      // full-history vacuum: the sidecar is snapshot state exactly like
      // a data file — reclaiming it would resurrect the deleted rows
      TxnTable.vacuum(spark, table, keep = 0)
      live.foreach(f => assert(new java.io.File(s"$table/$f").exists(),
        s"vacuum must not reclaim live vector sidecar $f"))
      assert(spark.read.format("graft").load(table)
        .filter($"g" === 2).count() == 0L)
      // PURGE materializes the vector into rewritten files; only then
      // does the sidecar become garbage
      TxnTable.reorgPurge(spark, table)
      TxnTable.vacuum(spark, table, keep = 0)
      live.foreach(f => assert(!new java.io.File(s"$table/$f").exists(),
        s"materialized vector sidecar $f must vacuum away"))
      assert(spark.read.format("graft").load(table).count() == 40L)
    }
  }

  test("SQL REORG TABLE ... APPLY (PURGE) routes to the purge") {
    withZone { table =>
      seed(table)
      TxnTable.deleteWherePos(spark, table, df => df("g") === 0)
      spark.sql(s"CREATE TABLE pos_reorg_t USING graft OPTIONS (path '$table')")
      try {
        spark.sql("REORG TABLE pos_reorg_t APPLY (PURGE)")
        assert(state(table).dels.isEmpty)
        assert(spark.sql("SELECT count(*) FROM pos_reorg_t")
          .head().getLong(0) == 40L)
      } finally spark.sql("DROP TABLE pos_reorg_t")
    }
  }

  test("positional delete racing appends: CAS rebase keeps both outcomes") {
    withZone { table =>
      import spark.implicits._
      seed(table)
      val ex = java.util.concurrent.Executors.newFixedThreadPool(4)
      try {
        val appends = (1 to 6).map { i =>
          ex.submit(new Runnable {
            override def run(): Unit =
              Seq((1000L + i, s"app$i", 999L)).toDF("k", "s", "g")
                .coalesce(1).write.format("graft").mode("append").save(table)
          })
        }
        val del = ex.submit(new Runnable {
          override def run(): Unit = {
            TxnTable.deleteWherePos(spark, table, df => df("g") === 2)
            ()
          }
        })
        (appends :+ del).foreach(_.get())
      } finally ex.shutdown()
      val now = spark.read.format("graft").load(table)
      // all six appends land; the delete removes exactly its 10 rows
      // (g=999 appends never match the predicate, so the outcome is
      // deterministic whatever interleaving the CAS saw)
      assert(now.count() == 46L, s"got ${now.count()}")
      assert(now.filter($"g" === 2).count() == 0L)
      assert(now.filter($"g" === 999L).count() == 6L)
    }
  }

  test("two concurrent positional deletes both land; both vectors apply") {
    withZone { table =>
      import spark.implicits._
      seed(table)
      val ex = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val a = ex.submit(new Runnable {
          override def run(): Unit = {
            TxnTable.deleteWherePos(spark, table, df => df("g") === 1); ()
          }
        })
        val b = ex.submit(new Runnable {
          override def run(): Unit = {
            TxnTable.deleteWherePos(spark, table, df => df("g") === 2); ()
          }
        })
        a.get(); b.get()
      } finally ex.shutdown()
      val now = spark.read.format("graft").load(table)
      assert(now.count() == 30L)
      assert(now.filter($"g" === 1 || $"g" === 2).count() == 0L)
      assert(state(table).dels.size == 2,
        "both vectors must survive the race (CAS rebase, not clobber)")
    }
  }

  test("identity read round-trips relative paths on a partitioned table") {
    withZone { table =>
      import spark.implicits._
      Seq.range(0L, 20L).map(k => (k, k % 2))
        .toDF("k", "p").write.format("graft")
        .option("partitionBy", "p").option("mergeOnRead", "true")
        .mode("overwrite").save(table)
      val rows = TxnTable.readWithRowIdentity(spark, table)
      assert(rows.count() == 20L)
      assert(rows.filter(col(TxnTable.PosFileCol).isNull).count() == 0L)
      // every identity is unique
      assert(rows.select(TxnTable.PosFileCol, TxnTable.PosOrdCol)
        .distinct().count() == 20L)
      TxnTable.deleteWherePos(spark, table, df => df("k") < 5)
      assert(spark.read.format("graft").load(table).count() == 15L)
    }
  }
}
