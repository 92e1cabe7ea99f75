package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.TxnTable

/** NESTED schema evolution: ADD / DROP / widen a field INSIDE a struct
  * column, pure metadata at any table size. Spark's parquet by-name
  * clipping does the read-side work (a file lacking a nested field
  * surfaces it as NULL), so the manifest schema is the only thing that
  * changes — same contract as the top-level ALTERs. */
class NestedEvolSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark

  private def withZone(body: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_nested").toFile
    try body(s"${root.getAbsolutePath}/t")
    finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(root)
    }
  }

  test("nested ADD is metadata-only; old files read NULL, appends fill") {
    withZone { table =>
      import spark.implicits._
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "tag", "x")
        .select($"id", struct($"tag", $"x").as("meta")).coalesce(1)
        .write.format("graft").option("statsCols", "id")
        .mode("overwrite").save(table)
      val v0 = TxnTable.latestVersion(spark, table).get
      val before = TxnTable.snapshotFiles(spark, table, v0).toSet

      spark.sql(s"CREATE TABLE graft_nested_t USING graft OPTIONS (path '$table')")
      try {
        spark.sql("ALTER TABLE graft_nested_t ADD COLUMNS (meta.score BIGINT)")
        assert(TxnTable.snapshotFiles(spark, table,
          TxnTable.latestVersion(spark, table).get).toSet == before,
          "nested ADD must write zero data files")
        val df0 = spark.read.format("graft").load(table)
        assert(df0.schema("meta").dataType.asInstanceOf[StructType]
          .fieldNames.toSeq == Seq("tag", "x", "score"))
        assert(df0.select($"meta.score").collect().forall(_.isNullAt(0)),
          "pre-evolution rows surface the nested field as NULL")

        Seq((3L, "c", 30, 7L)).toDF("id", "tag", "x", "score")
          .select($"id", struct($"tag", $"x", $"score").as("meta"))
          .write.format("graft").mode("append").save(table)
        val got = spark.read.format("graft").load(table)
          .select($"id", $"meta.score".as("s")).collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
          .toMap
        assert(got == Map(1L -> -1L, 2L -> -1L, 3L -> 7L), s"got $got")
      } finally spark.sql("DROP TABLE graft_nested_t")
    }
  }

  test("nested widen, nested drop, resurrection refuse") {
    withZone { table =>
      import spark.implicits._
      Seq((1L, 5, "k1"), (2L, 6, "k2")).toDF("id", "n", "s")
        .select($"id", struct($"n", $"s").as("m")).coalesce(1)
        .write.format("graft").option("statsCols", "id")
        .mode("overwrite").save(table)

      // widen m.n INT → BIGINT: in-scan parquet promotion, zero rewrite
      val files = TxnTable.snapshotFiles(spark, table,
        TxnTable.latestVersion(spark, table).get).toSet
      TxnTable.alterColumnType(spark, table, "m.n", LongType)
      assert(TxnTable.snapshotFiles(spark, table,
        TxnTable.latestVersion(spark, table).get).toSet == files)
      val df = spark.read.format("graft").load(table)
      assert(df.schema("m").dataType.asInstanceOf[StructType]("n")
        .dataType == LongType)
      assert(df.select($"m.n").as[Long].collect().toSet == Set(5L, 6L))
      // narrowing refuses
      intercept[IllegalArgumentException] {
        TxnTable.alterColumnType(spark, table, "m.n", IntegerType)
      }

      // drop m.s; the dotted path retires so a re-add can't resurrect
      TxnTable.dropNestedColumn(spark, table, "m.s")
      val after = spark.read.format("graft").load(table)
      assert(after.schema("m").dataType.asInstanceOf[StructType]
        .fieldNames.toSeq == Seq("n"))
      assert(after.select($"m.n").as[Long].collect().toSet == Set(5L, 6L))
      val e = intercept[IllegalArgumentException] {
        TxnTable.addNestedColumn(spark, table, "m.s", StringType)
      }
      assert(e.getMessage.contains("resurrect"), e.getMessage)
      // a DIFFERENT nested name is fine
      TxnTable.addNestedColumn(spark, table, "m.s2", StringType)
      // the last field of a struct refuses to drop
      TxnTable.dropNestedColumn(spark, table, "m.s2")
      intercept[IllegalArgumentException] {
        TxnTable.dropNestedColumn(spark, table, "m.n")
      }
    }
  }

  test("SQL spellings: nested widen and nested drop") {
    withZone { table =>
      import spark.implicits._
      Seq((1L, 5, "a"), (2L, 6, "b")).toDF("id", "n", "s")
        .select($"id", struct($"n", $"s").as("m")).coalesce(1)
        .write.format("graft").option("statsCols", "id")
        .mode("overwrite").save(table)
      spark.sql(s"CREATE TABLE graft_nsql_t USING graft OPTIONS (path '$table')")
      try {
        spark.sql("ALTER TABLE graft_nsql_t ALTER COLUMN m.n TYPE BIGINT")
        val widened = spark.sql("SELECT m.n AS n FROM graft_nsql_t ORDER BY n")
        assert(widened.schema("n").dataType == LongType)
        assert(widened.as[Long].collect().toSeq == Seq(5L, 6L))
        spark.sql("ALTER TABLE graft_nsql_t DROP COLUMN m.s")
        assert(spark.table("graft_nsql_t").schema("m")
          .dataType.asInstanceOf[StructType].fieldNames.toSeq == Seq("n"))
        // nested ADD with DEFAULT: pure metadata — old rows surface the
        // default (read-time vintage fill), writes omitting it fill at
        // the append gate, explicit values are respected
        spark.sql("ALTER TABLE graft_nsql_t ADD COLUMNS (m.d INT DEFAULT 7)")
        assert(spark.sql("SELECT m.d FROM graft_nsql_t").collect()
          .forall(_.getInt(0) == 7))
        // an INSERT omitting d inside the struct fills the default;
        // one supplying it keeps its value
        TxnTable.commitAppend(
          Seq((3L, 9L)).toDF("id", "n")
            .select($"id", struct($"n").as("m")), table)
        TxnTable.commitAppend(
          Seq((4L, 10L, 42)).toDF("id", "n", "d")
            .select($"id", struct($"n", $"d").as("m")), table)
        val ds = spark.sql(
          "SELECT id, m.d AS d FROM graft_nsql_t ORDER BY id")
          .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
        assert(ds == Seq((1L, 7), (2L, 7), (3L, 7), (4L, 42)), ds)
        // future-only SET DEFAULT: existing rows keep reading 7
        spark.sql(
          "ALTER TABLE graft_nsql_t ALTER COLUMN m.d SET DEFAULT 99")
        TxnTable.commitAppend(
          Seq((5L, 11L)).toDF("id", "n")
            .select($"id", struct($"n").as("m")), table)
        val d5 = spark.sql(
          "SELECT m.d FROM graft_nsql_t WHERE id IN (1, 5) ORDER BY id")
          .collect().map(_.getInt(0)).toSeq
        assert(d5 == Seq(7, 99), d5)
        // nested RENAME refuses with the supported alternative
        val e2 = intercept[Exception] {
          spark.sql("ALTER TABLE graft_nsql_t RENAME COLUMN m.n TO m.x")
        }
        assert(e2.getMessage.contains("field-ID"), e2.getMessage)
      } finally spark.sql("DROP TABLE graft_nsql_t")
    }
  }

  test("merge evolves a nested schema through the recursive struct merge") {
    withZone { table =>
      import spark.implicits._
      Seq((1L, 10), (2L, 20)).toDF("k", "x")
        .select($"k", struct($"x").as("m")).coalesce(1)
        .write.format("graft").option("statsCols", "k")
        .mode("overwrite").save(table)
      // the updates frame's struct carries an EXTRA nested field: the
      // commit's recursive StructType.merge widens the schema, matched
      // rows replace, unmatched insert, old rows surface NULL
      val updates = Seq((2L, 21, "u"), (3L, 30, "i")).toDF("k", "x", "tag")
        .select($"k", struct($"x", $"tag").as("m"))
      TxnTable.merge(updates, table, "k")
      val got = spark.read.format("graft").load(table)
        .select($"k", $"m.x".as("x"), $"m.tag".as("tag"))
        .collect().map(r => (r.getLong(0), r.getInt(1),
          if (r.isNullAt(2)) "-" else r.getString(2))).toSet
      assert(got == Set((1L, 10, "-"), (2L, 21, "u"), (3L, 30, "i")),
        s"got $got")
    }
  }

  test("dropping a struct a CHECK reads into refuses (prefix match)") {
    withZone { table =>
      import spark.implicits._
      Seq((1L, 5, "a")).toDF("id", "n", "s")
        .select($"id", struct($"n", $"s").as("m")).coalesce(1)
        .write.format("graft").option("statsCols", "id")
        .mode("overwrite").save(table)
      TxnTable.addCheck(spark, table, "m_n_pos", "m.n > 0")
      // the whole struct refuses while the check reads m.n …
      val e1 = intercept[IllegalArgumentException] {
        TxnTable.dropColumn(spark, table, "m")
      }
      assert(e1.getMessage.contains("m_n_pos"), e1.getMessage)
      // … and so does the nested field itself
      val e2 = intercept[IllegalArgumentException] {
        TxnTable.dropNestedColumn(spark, table, "m.n")
      }
      assert(e2.getMessage.contains("m_n_pos"), e2.getMessage)
      TxnTable.dropCheck(spark, table, "m_n_pos")
      TxnTable.dropNestedColumn(spark, table, "m.n")
      assert(spark.read.format("graft").load(table)
        .select($"m.s").as[String].collect().toSeq == Seq("a"))
    }
  }
}
