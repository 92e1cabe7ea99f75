package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.TxnTable

/** IDENTITY columns (Delta's GENERATED ALWAYS AS IDENTITY — k133):
  * declaration + high-water mark live as field metadata in the
  * snapshot schema (Delta's delta.identity.highWaterMark design), so
  * the hwm commits atomically with the rows that consumed it; appends
  * get fresh values above the hwm assigned at commit with no global
  * sort; supplying the column refuses; racing appends never hand out
  * the same value. */
class IdentityColsSpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  private def withZone(f: String => Unit): Unit = {
    val zone = java.nio.file.Files.createTempDirectory("graft_ident").toFile
    try f(zone.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete(); ()
      }
      rm(zone)
    }
  }

  private def rows(tags: Seq[String]) = {
    import spark.implicits._
    tags.map(t => (t, t.length.toDouble)).toDF("tag", "v").repartition(3)
  }

  test("creation assigns start/step and appends continue above the hwm") {
    withZone { zone =>
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        TxnTable.withIdentityColumn(rows(Seq("a", "b", "c", "d", "e")),
          "id", start = 100L, step = 10L),
        table)
      val v1 = TxnTable.latestVersion(spark, table).get
      val d1 = TxnTable.identityColumn(
        TxnTable.snapshotSchema(spark, table, v1).get).get
      assert(d1 == TxnTable.IdentityDef("id", 100L, 10L, Some(140L)))
      val ids1 = TxnTable.read(spark, table)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids1 == Seq(100L, 110L, 120L, 130L, 140L))
      // append WITHOUT the column: values continue above the hwm
      TxnTable.commitAppend(rows(Seq("f", "g", "h")), table)
      val v2 = TxnTable.latestVersion(spark, table).get
      val d2 = TxnTable.identityColumn(
        TxnTable.snapshotSchema(spark, table, v2).get).get
      assert(d2.hwm.contains(170L))
      val ids2 = TxnTable.read(spark, table)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids2 == (0 to 7).map(i => 100L + 10L * i))
    }
  }

  test("an append supplying the identity column refuses (ALWAYS semantics)") {
    withZone { zone =>
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        TxnTable.withIdentityColumn(rows(Seq("a", "b")), "id"), table)
      val v = TxnTable.latestVersion(spark, table).get
      val e = intercept[IllegalArgumentException] {
        TxnTable.commitAppend(
          rows(Seq("x")).withColumn("id", lit(999L)), table)
      }
      assert(e.getMessage.contains("GENERATED ALWAYS"))
      assert(TxnTable.latestVersion(spark, table).get == v)
    }
  }

  test("racing identity appends never hand out the same value") {
    withZone { zone =>
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        TxnTable.withIdentityColumn(rows(Seq("seed")), "id"), table)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val writers = (1 to 4).map { w =>
        Future {
          TxnTable.commitAppend(rows(Seq(s"w$w-1", s"w$w-2", s"w$w-3")), table)
        }
      }
      Await.result(Future.sequence(writers), 120.seconds)
      val out = TxnTable.read(spark, table)
      assert(out.count() == 13L)
      val ids = out.select("id").collect().map(_.getLong(0)).toSeq
      assert(ids.distinct.size == 13, s"duplicate identity values: $ids")
      assert(ids.sorted == (1L to 13L),
        s"expected 1..13 with no gaps from clean retries, got ${ids.sorted}")
      val hwm = TxnTable.identityColumn(
        TxnTable.snapshotSchema(spark, table,
          TxnTable.latestVersion(spark, table).get).get).get.hwm
      assert(hwm.contains(13L))
    }
  }

  test("hwm stays monotonic across an overwrite (ids are never reused)") {
    withZone { zone =>
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        TxnTable.withIdentityColumn(rows(Seq("a", "b", "c")), "id"), table)
      // replacement frame re-declares the identity column from scratch;
      // the commit must keep the PRIOR hwm (3), not reset to the
      // frame's (2), so later appends can't collide with retained ids
      TxnTable.commitOverwrite(
        TxnTable.withIdentityColumn(rows(Seq("x", "y")), "id"), table)
      val hwm = TxnTable.identityColumn(
        TxnTable.snapshotSchema(spark, table,
          TxnTable.latestVersion(spark, table).get).get).get.hwm
      assert(hwm.contains(3L))
      TxnTable.commitAppend(rows(Seq("z")), table)
      val ids = TxnTable.read(spark, table)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 4L), s"append must start above the prior hwm: $ids")
    }
  }

  test("merge inherits matched ids and mints for inserts; UPDATE passes") {
    withZone { zone =>
      val table = s"$zone/t"
      import spark.implicits._
      TxnTable.commitOverwrite(
        TxnTable.withIdentityColumn(rows(Seq("a", "b", "c")), "id"), table,
        statsCols = Seq("tag"))
      // upsert: 'a' matches (keeps id 1), 'zz' inserts (mints above the
      // hwm 3); the frame itself can never SUPPLY the column
      TxnTable.merge(rows(Seq("a", "zz")), table, "tag")
      val got = TxnTable.read(spark, table)
        .select("tag", "id").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got("a") == 1L, s"matched row must keep its id: $got")
      assert(got("zz") == 4L, s"insert must mint hwm+step: $got")
      assert(got.values.toSeq.distinct.size == got.size, s"ids unique: $got")
      val hwmAfter = TxnTable.identityColumn(
        TxnTable.snapshotSchema(spark, table,
          TxnTable.latestVersion(spark, table).get).get).get
      assert(hwmAfter.hwm.contains(4L),
        s"the merge's commit must advance the hwm: $hwmAfter")
      assert(hwmAfter.start == 1L && hwmAfter.step == 1L,
        "the declaration survives the schema merge")
      // a later APPEND continues above the merge-minted values
      TxnTable.commitAppend(rows(Seq("w")), table)
      assert(TxnTable.read(spark, table).filter($"tag" === "w")
        .select("id").head().getLong(0) == 5L)
      val eSup = intercept[IllegalArgumentException] {
        TxnTable.merge(rows(Seq("q")).withColumn("id", lit(99L)),
          table, "tag")
      }
      assert(eSup.getMessage.contains("IDENTITY"))
      // replaceWhere likewise
      val e2 = intercept[IllegalArgumentException] {
        TxnTable.replaceValues(rows(Seq("a")), table, "tag", Seq("a"))
      }
      assert(e2.getMessage.contains("IDENTITY"))
      // SQL UPDATE carries assigned ids through the rewrite — allowed
      spark.sql(s"CREATE TABLE ident_upd USING graft OPTIONS (path '$table')")
      try {
        spark.sql("UPDATE ident_upd SET v = 99.0 WHERE tag = 'a'")
        val out = TxnTable.read(spark, table)
        assert(out.filter($"tag" === "a").select("v")
          .collect().map(_.getDouble(0)).toSeq == Seq(99.0))
        assert(out.select("id").collect().map(_.getLong(0)).sorted.toSeq
          == Seq(1L, 2L, 3L, 4L, 5L))
      } finally spark.sql("DROP TABLE IF EXISTS ident_upd")
    }
  }

  test("a merge racing an append never reuses identity values") {
    withZone { zone =>
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        TxnTable.withIdentityColumn(rows(Seq("a", "b")), "id"), table,
        statsCols = Seq("tag"))
      // the merge mints from its pinned snapshot's hwm; if the append
      // lands first and advances it, the merge's CAS MUST lose and
      // recompute from the fresh snapshot (identity merges never
      // fast-rebase) — two winners from the same hwm would collide
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      import scala.concurrent.{ExecutionContext, Future, Await}
      import scala.concurrent.duration._
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val fA = Future { TxnTable.merge(rows(Seq("m1", "m2")), table, "tag") }
      val fB = Future { TxnTable.commitAppend(rows(Seq("p1", "p2")), table) }
      try { Await.result(fA, 120.seconds); Await.result(fB, 120.seconds) }
      finally pool.shutdown()
      val ids = TxnTable.read(spark, table)
        .select("id").collect().map(_.getLong(0)).toSeq
      assert(ids.size == 6 && ids.distinct.size == 6,
        s"every row keeps a unique id across the race: ${ids.sorted}")
      val d = TxnTable.identityColumn(
        TxnTable.snapshotSchema(spark, table,
          TxnTable.latestVersion(spark, table).get).get).get
      assert(d.hwm.contains(ids.max),
        s"the surviving hwm covers every assigned value: $d vs ${ids.max}")
    }
  }

  test("idempotent replay does not advance the hwm; DETAIL reports the declaration") {
    withZone { zone =>
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        TxnTable.withIdentityColumn(rows(Seq("a", "b")), "id"), table)
      val v1 = TxnTable.commitAppendIdempotent(rows(Seq("c", "d")), table, "app", 1L)
      val v2 = TxnTable.commitAppendIdempotent(rows(Seq("c", "d")), table, "app", 1L)
      assert(v1 == v2)
      val d = TxnTable.identityColumn(
        TxnTable.snapshotSchema(spark, table, v2).get).get
      assert(d.hwm.contains(4L), s"replay must not advance the hwm: $d")
      assert(TxnTable.read(spark, table)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq == (1L to 4L))
      val det = spark.sql(s"DESCRIBE DETAIL '$table'").head()
      assert(det.getAs[String]("identity_column") == "id START 1 STEP 1 HWM 4")
    }
  }

  test("SQL MERGE INTO: matched rows inherit, inserts mint above the hwm") {
    import spark.implicits._
    withZone { zone =>
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        TxnTable.withIdentityColumn(rows(Seq("a", "b", "c")), "id"), table,
        statsCols = Seq("tag"))
      Seq(("a", 100.0), ("x", 1.0), ("y", 2.0)).toDF("tag", "v")
        .createOrReplaceTempView("ident_mrg_src")
      spark.sql(s"CREATE TABLE ident_mrg USING graft OPTIONS (path '$table')")
      try {
        spark.sql(
          """MERGE INTO ident_mrg t USING ident_mrg_src s ON t.tag = s.tag
            |WHEN MATCHED THEN UPDATE SET v = s.v
            |WHEN NOT MATCHED THEN INSERT (tag, v) VALUES (s.tag, s.v)
            |""".stripMargin)
        val out = TxnTable.read(spark, table)
          .select("id", "tag", "v").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        // a/b/c keep 1..3 (a updated in place), x/y mint 4..5
        val byTag = out.map(r => r._2 -> r._1).toMap
        assert(out.map(_._1).sorted.toSeq == (1L to 5L),
          s"ids must stay gapless across the merge: ${out.toSeq}")
        assert(Seq("a", "b", "c").flatMap(byTag.get).forall(_ <= 3L),
          s"matched/carried rows must inherit their ids: ${out.toSeq}")
        assert(out.collectFirst { case (_, "a", v) => v }.contains(100.0))
        val d = TxnTable.identityColumn(
          TxnTable.snapshotSchema(spark, table,
            TxnTable.latestVersion(spark, table).get).get).get
        assert(d.hwm.contains(5L), s"merge must advance the hwm: $d")
        // ALWAYS: the statement can never assign the identity column
        val e = intercept[Exception] {
          spark.sql(
            """MERGE INTO ident_mrg t USING ident_mrg_src s ON t.tag = s.tag
              |WHEN MATCHED THEN UPDATE SET id = 99
              |""".stripMargin)
        }
        assert(e.getMessage.contains("GENERATED ALWAYS"), e.getMessage)
      } finally spark.sql("DROP TABLE IF EXISTS ident_mrg")
    }
  }

  test("SQL MERGE INTO on a merge-on-read table mints without rewriting files") {
    import spark.implicits._
    withZone { zone =>
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        TxnTable.withIdentityColumn(rows(Seq("a", "b")), "id"), table,
        statsCols = Seq("tag"), mor = Some(true))
      val before = TxnTable.morState(spark, table,
        TxnTable.latestVersion(spark, table).get).files.toSet
      Seq(("a", 50.0), ("z", 9.0)).toDF("tag", "v")
        .createOrReplaceTempView("ident_mor_src")
      spark.sql(s"CREATE TABLE ident_mor USING graft OPTIONS (path '$table')")
      try {
        spark.sql(
          """MERGE INTO ident_mor t USING ident_mor_src s ON t.tag = s.tag
            |WHEN MATCHED THEN UPDATE SET v = s.v
            |WHEN NOT MATCHED THEN INSERT (tag, v) VALUES (s.tag, s.v)
            |""".stripMargin)
        val after = TxnTable.morState(spark, table,
          TxnTable.latestVersion(spark, table).get).files.toSet
        assert(before.subsetOf(after),
          "merge-on-read MERGE must not rewrite existing data files")
        val out = TxnTable.read(spark, table)
          .select("id", "tag", "v").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        assert(out.map(_._1).sorted.toSeq == (1L to 3L), s"${out.toSeq}")
        assert(out.collectFirst { case (_, "a", v) => v }.contains(50.0))
        assert(out.collectFirst { case (i, "z", _) => i }.contains(3L),
          s"the insert must mint above the pinned hwm: ${out.toSeq}")
        val d = TxnTable.identityColumn(
          TxnTable.snapshotSchema(spark, table,
            TxnTable.latestVersion(spark, table).get).get).get
        assert(d.hwm.contains(3L), s"$d")
      } finally spark.sql("DROP TABLE IF EXISTS ident_mor")
    }
  }

  test("SQL MERGE racing an append never reuses identity values") {
    import spark.implicits._
    withZone { zone =>
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        TxnTable.withIdentityColumn(rows(Seq("a", "b")), "id"), table,
        statsCols = Seq("tag"))
      Seq(("a", 1.0), ("n1", 2.0), ("n2", 3.0)).toDF("tag", "v")
        .createOrReplaceTempView("ident_race_src")
      spark.sql(s"CREATE TABLE ident_race USING graft OPTIONS (path '$table')")
      // the merge mints from its pinned snapshot's hwm; if the append
      // lands first and advances it, the merge's CAS MUST lose and
      // recompute (identity merges never fast-rebase) — two winners
      // minting from the same hwm would collide
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      import scala.concurrent.{ExecutionContext, Future, Await}
      import scala.concurrent.duration._
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try {
        val fA = Future {
          spark.sql(
            """MERGE INTO ident_race t USING ident_race_src s ON t.tag = s.tag
              |WHEN MATCHED THEN UPDATE SET v = s.v
              |WHEN NOT MATCHED THEN INSERT (tag, v) VALUES (s.tag, s.v)
              |""".stripMargin)
        }
        val fB = Future { TxnTable.commitAppend(rows(Seq("p1", "p2")), table) }
        try { Await.result(fA, 120.seconds); Await.result(fB, 120.seconds) }
        finally pool.shutdown()
        val ids = TxnTable.read(spark, table)
          .select("id").collect().map(_.getLong(0)).toSeq
        assert(ids.size == 6 && ids.distinct.size == 6,
          s"every row keeps a unique id across the race: ${ids.sorted}")
        val d = TxnTable.identityColumn(
          TxnTable.snapshotSchema(spark, table,
            TxnTable.latestVersion(spark, table).get).get).get
        assert(d.hwm.contains(ids.max),
          s"the surviving hwm covers every assigned value: $d vs ${ids.max}")
      } finally spark.sql("DROP TABLE IF EXISTS ident_race")
    }
  }

  test("SQL MERGE under CDF: insert change rows carry the minted ids") {
    import spark.implicits._
    withZone { zone =>
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        TxnTable.withIdentityColumn(rows(Seq("a", "b")), "id"), table,
        statsCols = Seq("tag"), cdf = Some(true))
      Seq(("a", 5.0), ("w", 6.0)).toDF("tag", "v")
        .createOrReplaceTempView("ident_cdf_src")
      spark.sql(s"CREATE TABLE ident_cdf USING graft OPTIONS (path '$table')")
      try {
        spark.sql(
          """MERGE INTO ident_cdf t USING ident_cdf_src s ON t.tag = s.tag
            |WHEN MATCHED THEN UPDATE SET v = s.v
            |WHEN NOT MATCHED THEN INSERT (tag, v) VALUES (s.tag, s.v)
            |""".stripMargin)
        val v = TxnTable.latestVersion(spark, table).get
        // half-open (start, end] window: exactly the merge's commit
        val changes = spark.read.format("graft")
          .option("readChangeFeed", "true")
          .option("startingVersion", (v - 1L).toString)
          .option("endingVersion", v.toString).load(table)
        val insId = changes
          .filter($"_change_type" === "insert" && $"tag" === "w")
          .select("id").collect().map(_.getLong(0)).toSeq
        val tblId = TxnTable.read(spark, table).filter($"tag" === "w")
          .select("id").collect().map(_.getLong(0)).toSeq
        assert(insId == tblId && insId.size == 1,
          s"the CDC frame must observe the same minting: $insId vs $tblId")
      } finally spark.sql("DROP TABLE IF EXISTS ident_cdf")
    }
  }

  test("replaceWhere's refusal recipe is executable: delete the scope, then append") {
    import spark.implicits._
    withZone { zone =>
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        TxnTable.withIdentityColumn(rows(Seq("a", "b", "c")), "id"), table,
        statsCols = Seq("tag"))
      // replaceWhere refuses (correct: a scoped overwrite lands new rows
      // outside the minting path) and its message names the recipe
      val e = intercept[IllegalArgumentException] {
        TxnTable.replaceValues(rows(Seq("a")), table, "tag", Seq("a"))
      }
      assert(e.getMessage.contains("DELETE") && e.getMessage.contains("APPEND"),
        s"the refusal must carry the executable recipe: ${e.getMessage}")
      // the recipe itself: DELETE the scope, then APPEND the replacements
      spark.sql(s"CREATE TABLE ident_rw USING graft OPTIONS (path '$table')")
      try {
        spark.sql("DELETE FROM ident_rw WHERE tag = 'a'")
        TxnTable.commitAppend(
          Seq(("a", 42.0)).toDF("tag", "v").coalesce(1), table)
        val out = TxnTable.read(spark, table)
          .select("id", "tag", "v").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
        // b/c keep their ids; the replacement row minted ABOVE the hwm —
        // the retained id 1 is never reused
        assert(out.map(_._2) == Set("a", "b", "c"))
        assert(out.collectFirst { case (i, "a", v) => (i, v) }.contains((4L, 42.0)),
          s"the re-appended scope must mint fresh (never reuse id 1): $out")
        val d = TxnTable.identityColumn(
          TxnTable.snapshotSchema(spark, table,
            TxnTable.latestVersion(spark, table).get).get).get
        assert(d.hwm.contains(4L), s"$d")
      } finally spark.sql("DROP TABLE IF EXISTS ident_rw")
    }
  }

  test("compaction carries assigned ids untouched") {
    withZone { zone =>
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        TxnTable.withIdentityColumn(rows(Seq("a", "b", "c")), "id"), table)
      TxnTable.commitAppend(rows(Seq("d", "e")), table)
      val before = TxnTable.read(spark, table)
        .select("id", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      TxnTable.compactSmall(spark, table, smallBytes = 32L << 20)
      val after = TxnTable.read(spark, table)
        .select("id", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(after == before)
      val d = TxnTable.identityColumn(
        TxnTable.snapshotSchema(spark, table,
          TxnTable.latestVersion(spark, table).get).get)
      assert(d.exists(_.hwm.contains(5L)))
    }
  }
}
