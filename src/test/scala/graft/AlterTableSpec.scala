package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.io.TxnTable

/** ALTER TABLE schema evolution, CHECK constraints, and COPY INTO —
  * the manifest-level semantics behind k120-k122 (FormatOps), tested
  * at the API level plus the SQL-statement edges the queries don't
  * cover (non-graft passthrough, drop refusals, constraint/column
  * interlocks). */
class AlterTableSpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  private def withZone(f: String => Unit): Unit = {
    val zone = java.nio.file.Files.createTempDirectory("graft_alter").toFile
    try f(zone.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete(); ()
      }
      rm(zone)
    }
  }

  private def seed(table: String): Unit = {
    import spark.implicits._
    TxnTable.commitOverwrite(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
        .toDF("id", "tag", "v").repartition(2),
      table, statsCols = Seq("id"))
  }

  test("addColumns is metadata-only and NULL-backfills old files") {
    withZone { zone =>
      val table = s"$zone/t"
      seed(table)
      val filesBefore = TxnTable.snapshotFiles(spark, table, 1L)
      TxnTable.addColumns(spark, table,
        StructType(Seq(StructField("extra", DoubleType))))
      assert(TxnTable.snapshotFiles(spark, table, 2L) == filesBefore)
      val df = TxnTable.read(spark, table)
      assert(df.columns.toSeq == Seq("id", "tag", "v", "extra"))
      assert(df.filter(col("extra").isNotNull).isEmpty)
      // appends may now carry the column; old rows still read NULL
      import spark.implicits._
      TxnTable.commitAppend(
        Seq((4L, "d", 40.0, 7.5)).toDF("id", "tag", "v", "extra"), table)
      val out = TxnTable.read(spark, table)
        .select("id", "extra").collect().map(r =>
          r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      assert(out == Map(1L -> None, 2L -> None, 3L -> None, 4L -> Some(7.5)))
    }
  }

  test("ADD COLUMN ... DEFAULT is metadata-only; old rows read the default") {
    withZone { zone =>
      import spark.implicits._
      val table = s"$zone/t"
      seed(table)
      val filesBefore = TxnTable.snapshotFiles(spark, table, 1L)
      TxnTable.addColumnWithDefault(spark, table, "tier",
        org.apache.spark.sql.types.StringType, "'bronze'")
      // pure metadata: no data file read or written
      assert(TxnTable.snapshotFiles(spark, table, 2L) == filesBefore)
      // existing rows surface the default (SQL standard / DuckDB
      // semantics), filled by Spark's own parquet reader from the
      // EXISTS_DEFAULT metadata — both the library and DSv2 paths
      assert(TxnTable.read(spark, table).filter(col("tier") === "bronze")
        .count() == 3L)
      assert(spark.read.format("graft").load(table)
        .filter(col("tier") === "bronze").count() == 3L)
      // an append omitting the column gets the CURRENT default filled;
      // one supplying it (even NULL) keeps its value
      TxnTable.commitAppend(Seq((4L, "d", 40.0)).toDF("id", "tag", "v"), table)
      TxnTable.commitAppend(
        Seq((5L, "e", 50.0, "gold"), (6L, "f", 60.0, null))
          .toDF("id", "tag", "v", "tier"), table)
      val got = TxnTable.read(spark, table).select("id", "tier").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got == Map(1L -> Some("bronze"), 2L -> Some("bronze"),
        3L -> Some("bronze"), 4L -> Some("bronze"), 5L -> Some("gold"),
        6L -> None), s"got $got")
      // SQL spelling, with an expression default over a numeric type
      spark.sql(s"CREATE TABLE alter_dflt_t USING graft OPTIONS (path '$table')")
      try {
        spark.sql(
          "ALTER TABLE alter_dflt_t ADD COLUMN score DOUBLE DEFAULT 1.5 * 2")
        val sc = spark.sql(
          "SELECT count(*) FROM alter_dflt_t WHERE score = 3.0")
          .head().getLong(0)
        assert(sc == 6L, "all pre-existing rows must read the folded default")
        // INSERT omitting the defaulted columns fills them
        spark.sql("INSERT INTO alter_dflt_t (id, tag, v) VALUES (7, 'g', 70.0)")
        val row = spark.sql(
          "SELECT tier, score FROM alter_dflt_t WHERE id = 7").head()
        assert(row.getString(0) == "bronze" && row.getDouble(1) == 3.0)
      } finally spark.sql("DROP TABLE alter_dflt_t")
      // a malformed default fails the ALTER, not a later read
      intercept[Exception] {
        TxnTable.addColumnWithDefault(spark, table, "bad",
          org.apache.spark.sql.types.LongType, "no_such_col + 1")
      }
    }
  }

  test("ALTER COLUMN SET/DROP DEFAULT changes future inserts only") {
    withZone { zone =>
      import spark.implicits._
      val table = s"$zone/t"
      seed(table)
      TxnTable.addColumnWithDefault(spark, table, "tier",
        org.apache.spark.sql.types.StringType, "'bronze'")
      spark.sql(s"CREATE TABLE alter_sd_t USING graft OPTIONS (path '$table')")
      try {
        spark.sql("ALTER TABLE alter_sd_t ALTER COLUMN tier SET DEFAULT 'silver'")
        // SQL-standard: rows already on disk keep reading the ORIGINAL
        // existence default; only new inserts see the new one
        assert(spark.sql(
          "SELECT count(*) FROM alter_sd_t WHERE tier = 'bronze'")
          .head().getLong(0) == 3L)
        spark.sql("INSERT INTO alter_sd_t (id, tag, v) VALUES (4, 'd', 40.0)")
        assert(spark.sql(
          "SELECT tier FROM alter_sd_t WHERE id = 4").head().getString(0)
          == "silver")
        spark.sql("ALTER TABLE alter_sd_t ALTER COLUMN tier DROP DEFAULT")
        spark.sql("INSERT INTO alter_sd_t (id, tag, v) VALUES (5, 'e', 50.0)")
        assert(spark.sql("SELECT tier FROM alter_sd_t WHERE id = 5")
          .head().isNullAt(0), "after DROP DEFAULT an omitted column is NULL")
        // and the old rows STILL read their original default
        assert(spark.sql(
          "SELECT count(*) FROM alter_sd_t WHERE tier = 'bronze'")
          .head().getLong(0) == 3L)
        // UPDATE ... SET c = DEFAULT resolves through the same metadata
        spark.sql("ALTER TABLE alter_sd_t ALTER COLUMN tier SET DEFAULT 'gold'")
        spark.sql("UPDATE alter_sd_t SET tier = DEFAULT WHERE id = 1")
        assert(spark.sql("SELECT tier FROM alter_sd_t WHERE id = 1")
          .head().getString(0) == "gold")
        // a malformed default refuses at ALTER time
        intercept[Exception] {
          spark.sql(
            "ALTER TABLE alter_sd_t ALTER COLUMN tier SET DEFAULT no_col + 1")
        }
      } finally spark.sql("DROP TABLE alter_sd_t")
    }
  }

  test("ALTER COLUMN TYPE widens as pure metadata; old files promote in-scan") {
    withZone { zone =>
      import spark.implicits._
      val table = s"$zone/t"
      // int + float columns, written as their narrow physical types
      TxnTable.commitOverwrite(
        Seq((1, 1.5f), (2, 2.5f), (3, 3.5f)).toDF("k", "f").coalesce(1),
        table, statsCols = Seq("k"))
      val filesBefore = TxnTable.snapshotFiles(spark, table, 1L)
      spark.sql(s"CREATE TABLE alter_wide_t USING graft OPTIONS (path '$table')")
      try {
        spark.sql("ALTER TABLE alter_wide_t ALTER COLUMN k TYPE BIGINT")
        spark.sql("ALTER TABLE alter_wide_t ALTER COLUMN f TYPE DOUBLE")
        assert(TxnTable.snapshotFiles(spark, table,
          TxnTable.latestVersion(spark, table).get) == filesBefore,
          "widening must not touch any data file")
        val df = spark.read.format("graft").load(table)
        assert(df.schema("k").dataType ==
          org.apache.spark.sql.types.LongType)
        assert(df.schema("f").dataType ==
          org.apache.spark.sql.types.DoubleType)
        // old int32/float pages promote inside the scan, on both paths
        assert(df.orderBy("k").collect().map(_.getLong(0)).toSeq ==
          Seq(1L, 2L, 3L))
        assert(TxnTable.read(spark, table).agg(
          org.apache.spark.sql.functions.sum($"f")).head().getDouble(0)
          == 7.5d)
        // appends may now exceed the old type's range
        spark.sql(
          s"INSERT INTO alter_wide_t VALUES (${Int.MaxValue.toLong + 10L}, 9.0)")
        assert(spark.sql(
          s"SELECT count(*) FROM alter_wide_t WHERE k > ${Int.MaxValue}")
          .head().getLong(0) == 1L)
        // stats skipping on the widened column still prunes correctly
        assert(spark.sql("SELECT count(*) FROM alter_wide_t WHERE k <= 3")
          .head().getLong(0) == 3L)
        // narrowing and cross-kind changes refuse
        intercept[Exception] {
          spark.sql("ALTER TABLE alter_wide_t ALTER COLUMN k TYPE INT")
        }
        intercept[Exception] {
          spark.sql("ALTER TABLE alter_wide_t ALTER COLUMN f TYPE STRING")
        }
      } finally spark.sql("DROP TABLE alter_wide_t")
    }
  }

  test("widening a DEFAULT column keeps both defaults readable") {
    withZone { zone =>
      import spark.implicits._
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        Seq((1L, "a")).toDF("id", "tag").coalesce(1), table)
      // an INT column with an int-typed default, then widened to BIGINT:
      // the EXISTS_DEFAULT literal was analyzed against INT — the wider
      // read schema must still coerce it, for old files AND new fills
      TxnTable.addColumnWithDefault(spark, table, "n",
        org.apache.spark.sql.types.IntegerType, "7")
      TxnTable.alterColumnType(spark, table, "n",
        org.apache.spark.sql.types.LongType)
      val df = TxnTable.read(spark, table)
      assert(df.schema("n").dataType == org.apache.spark.sql.types.LongType)
      assert(df.select("n").head().getLong(0) == 7L,
        "pre-column rows surface the existence default through the " +
          "widened type")
      TxnTable.commitAppend(Seq((2L, "b")).toDF("id", "tag"), table)
      val got = TxnTable.read(spark, table).select("id", "n").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 7L, 2L -> 7L), s"got $got")
    }
  }

  test("widening composes with live deletes of both flavors") {
    withZone { zone =>
      import spark.implicits._
      val table = s"$zone/t"
      Seq.range(0, 40).map(i => (i, i % 4)).toDF("k", "g")
        .repartitionByRange(2, $"k")
        .write.format("graft").option("statsCols", "k")
        .option("mergeOnRead", "true").mode("overwrite").save(table)
      // one vector (coordinates — type-free) and one equality delete
      // (int-typed key tuples) live BEFORE the widen
      TxnTable.deleteWherePos(spark, table, df => df("k") < 4)
      TxnTable.deleteWhereMoR(spark, table, Seq("g"), df => df("g") === 3)
      TxnTable.alterColumnType(spark, table, "k",
        org.apache.spark.sql.types.LongType)
      TxnTable.alterColumnType(spark, table, "g",
        org.apache.spark.sql.types.LongType)
      // the eq sidecar's int32 tuples promote inside its own read and
      // still subtract against the widened data column exactly
      val left = spark.read.format("graft").load(table)
      assert(left.schema("k").dataType == org.apache.spark.sql.types.LongType)
      assert(left.count() == 27L, // 40 - 4 (k<4) - 9 (g==3, k>=4)
        s"both delete flavors must keep applying; got ${left.count()}")
      assert(left.filter($"g" === 3L).count() == 0L)
      assert(left.filter($"k" < 4L).count() == 0L)
      // and the library path agrees
      assert(TxnTable.read(spark, table).count() == 27L)
    }
  }

  test("widening drops the column's blooms and refuses bucket columns") {
    withZone { zone =>
      import spark.implicits._
      val table = s"$zone/t"
      Seq.range(0, 100).map(i => (i, i.toLong % 8L)).toDF("k", "g")
        .coalesce(1).write.format("graft")
        .option("statsCols", "k").option("bloomCols", "k")
        .mode("overwrite").save(table)
      assert(TxnTable.morState(spark, table, 1L) != null)
      TxnTable.alterColumnType(spark, table, "k",
        org.apache.spark.sql.types.LongType)
      // results stay exact: a long-typed probe would hash differently
      // than the int-built bloom bits, so the sidecar entry must be gone
      val left = spark.read.format("graft").load(table)
        .filter(org.apache.spark.sql.functions.col("k") === 42L)
      assert(left.count() == 1L)
      // bucket partition columns refuse: path bucket ids hashed the
      // old type
      val t2 = s"$zone/t2"
      TxnTable.commitOverwrite(
        Seq.range(0, 50).map(i => (i, s"s$i")).toDF("k", "s"),
        t2, partitionCols = Seq("bucket(4,k)"))
      assert(TxnTable.partitionColumns(spark, t2) == Seq("bucket(4,k)"),
        "the refusal test needs a genuinely bucketed table")
      intercept[Exception] {
        TxnTable.alterColumnType(spark, t2, "k",
          org.apache.spark.sql.types.LongType)
      }
    }
  }

  test("dropColumn removes the field, its stats, and retires the name") {
    withZone { zone =>
      val table = s"$zone/t"
      seed(table)
      TxnTable.dropColumn(spark, table, "tag")
      assert(TxnTable.read(spark, table).columns.toSeq == Seq("id", "v"))
      // the stats for the dropped column leave the manifest
      val stats = TxnTable.fileStats(spark, table,
        TxnTable.latestVersion(spark, table).get)
      assert(!stats.values.flatten.exists(_.col == "tag"))
      // re-adding the dropped name must be refused (stale resurrection)
      val e = intercept[IllegalArgumentException] {
        TxnTable.addColumns(spark, table,
          StructType(Seq(StructField("tag", StringType))))
      }
      assert(e.getMessage.contains("previously dropped"))
      // a DIFFERENT name is fine
      TxnTable.addColumns(spark, table,
        StructType(Seq(StructField("tag2", StringType))))
      assert(TxnTable.read(spark, table).columns.contains("tag2"))
    }
  }

  test("dropColumn refuses partition columns and the last column") {
    withZone { zone =>
      import spark.implicits._
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        Seq((1L, "x")).toDF("id", "p"), table, partitionCols = Seq("p"))
      assert(intercept[IllegalArgumentException] {
        TxnTable.dropColumn(spark, table, "p")
      }.getMessage.contains("partition column"))
      TxnTable.dropColumn(spark, table, "id")
      // p is now the only column left
      assert(intercept[IllegalArgumentException] {
        TxnTable.dropColumn(spark, table, "p")
      }.getMessage.contains("only column"))
    }
  }

  test("renameColumn is METADATA-ONLY: zero data I/O, old files resolve") {
    withZone { zone =>
      import spark.implicits._
      val table = s"$zone/t"
      // multi-file seed so the zero-rewrite claim is non-trivial
      TxnTable.commitOverwrite(
        Seq((1L, "x", 1.0), (2L, "y", 2.0)).toDF("id", "p", "v")
          .repartition(2),
        table, statsCols = Seq("id"), partitionCols = Seq("p"))
      val v0 = TxnTable.latestVersion(spark, table).get
      val files0 = TxnTable.snapshotFiles(spark, table, v0)
      val writes0 = TxnTable.dataWrites.get()
      TxnTable.renameColumn(spark, table, "id", "row_id")
      // NO read amplification: the commit wrote zero data files and
      // every old file carries by path identity
      assert(TxnTable.dataWrites.get() == writes0,
        "rename must not write data files")
      val v = TxnTable.latestVersion(spark, table).get
      assert(v == v0 + 1)
      assert(TxnTable.snapshotFiles(spark, table, v) == files0,
        "rename must carry every file by identity")
      // …and the OLD files' bytes resolve under the NEW name
      val df = TxnTable.read(spark, table)
      assert(df.columns.toSeq.sorted == Seq("p", "row_id", "v"))
      assert(df.select(sum("row_id")).head().getLong(0) == 3L)
      // skipping survives: the stats entries renamed with the column
      val stats = TxnTable.fileStats(spark, table, v)
      assert(stats.values.flatten.exists(_.col == "row_id"))
      assert(!stats.values.flatten.exists(_.col == "id"))
      assert(TxnTable.partitionColumns(spark, table) == Seq("p"))
      // renaming the partition column translates the recorded spec
      TxnTable.renameColumn(spark, table, "p", "part")
      assert(TxnTable.partitionColumns(spark, table) == Seq("part"))
      assert(TxnTable.read(spark, table)
        .filter(col("part") === "x").count() == 1L)
      // chained rename: a->b->c coalesces through BOTH prior names
      TxnTable.renameColumn(spark, table, "row_id", "rid")
      assert(TxnTable.read(spark, table)
        .select(sum("rid")).head().getLong(0) == 3L)
      // appends after the rename write the NEW physical name; the mixed
      // snapshot still reads as one logical column
      TxnTable.commitAppend(
        Seq((5L, "z", 9.9)).toDF("rid", "part", "v"), table)
      assert(TxnTable.read(spark, table)
        .select(sum("rid")).head().getLong(0) == 8L)
      // re-adding a prior physical name is refused (bytes would
      // resurrect); stats-driven range read works under the new name
      assert(intercept[IllegalArgumentException] {
        TxnTable.addColumns(spark, table, org.apache.spark.sql.types.StructType(
          Seq(org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType))))
      }.getMessage.contains("previously dropped"))
      val (rows, _, _) = TxnTable.readRangeOn(spark, table, "rid", 1, 2)
      assert(rows.count() == 2L)
    }
  }

  test("rename via SQL: DSv2 SELECT coalesces old physical names") {
    withZone { zone =>
      import spark.implicits._
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"), table,
        statsCols = Seq("id"))
      spark.sql(s"ALTER TABLE '$table' RENAME COLUMN id TO row_id")
      val got = spark.read.format("graft").load(table)
        .select(sum(col("row_id"))).head().getLong(0)
      assert(got == 3L)
      // filters on the renamed column still answer correctly
      assert(spark.read.format("graft").load(table)
        .filter(col("row_id") === 2L).select(col("v")).head().getDouble(0) == 20.0)
      // DML AFTER the rename: the rewrite reads old-name bytes through
      // the coalesce and writes replacements under the NEW name
      spark.sql(s"CREATE TABLE alter_ren_t USING graft OPTIONS (path '$table')")
      try {
        spark.sql("UPDATE alter_ren_t SET v = v + 1.0 WHERE row_id = 1")
        val rows = spark.sql(
          "SELECT row_id, v FROM alter_ren_t ORDER BY row_id")
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        assert(rows == Seq((1L, 11.0), (2L, 20.0)))
      } finally spark.sql("DROP TABLE alter_ren_t")
    }
  }

  test("merge-on-read delete AFTER a rename: both read rewrites compose") {
    withZone { zone =>
      import spark.implicits._
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v")
          .repartition(2),
        table, statsCols = Seq("id"))
      TxnTable.renameColumn(spark, table, "v", "val")
      // the delete keys on the CURRENT schema; old data files still
      // carry the old physical name
      TxnTable.deleteWhereMoR(spark, table, Seq("id"), df => df("id") === 2L)
      // TxnTable read path: alias coalesce + delete anti-join
      val got = TxnTable.read(spark, table)
        .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(got.toSeq == Seq((1L, 10.0), (3L, 30.0)))
      // DSv2 path: GraftApplyDeletes and GraftResolveRenames both
      // rewrite the same relation
      val sql = spark.read.format("graft").load(table)
        .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(sql.toSeq == Seq((1L, 10.0), (3L, 30.0)))
    }
  }

  test("CHECK constraints gate append, merge, and survive restore") {
    withZone { zone =>
      import spark.implicits._
      val table = s"$zone/t"
      seed(table)
      TxnTable.addCheck(spark, table, "v_pos", "v > 0")
      // append of a violating row throws and lands nothing
      val n0 = TxnTable.read(spark, table).count()
      val e = intercept[IllegalArgumentException] {
        TxnTable.commitAppend(
          Seq((9L, "z", -1.0)).toDF("id", "tag", "v"), table)
      }
      assert(e.getMessage.contains("v_pos"))
      assert(TxnTable.read(spark, table).count() == n0)
      // NULL passes a plain check (SQL semantics)…
      TxnTable.commitAppend(
        Seq((10L, "n", Option.empty[Double])).toDF("id", "tag", "v"), table)
      // …until an explicit NOT NULL check is added — which must refuse
      // to even attach while a violating row is committed
      assert(intercept[IllegalArgumentException] {
        TxnTable.addCheck(spark, table, "v_nn", "v IS NOT NULL")
      }.getMessage.contains("v_nn"))
      // merge-path enforcement
      assert(intercept[IllegalArgumentException] {
        TxnTable.merge(Seq((1L, "a", -5.0)).toDF("id", "tag", "v"),
          table, "id")
      }.getMessage.contains("v_pos"))
      // restore keeps the constraint set
      val vNow = TxnTable.latestVersion(spark, table).get
      TxnTable.restore(spark, table, 1L)
      assert(TxnTable.checkConstraints(spark, table).contains("v_pos"))
      TxnTable.restore(spark, table, vNow)
      TxnTable.dropCheck(spark, table, "v_pos")
      TxnTable.commitAppend(
        Seq((11L, "ok", -2.0)).toDF("id", "tag", "v"), table)
      assert(TxnTable.checkConstraints(spark, table).isEmpty)
    }
  }

  test("addCheck validates existing rows and unknown columns") {
    withZone { zone =>
      val table = s"$zone/t"
      seed(table)
      assert(intercept[IllegalArgumentException] {
        TxnTable.addCheck(spark, table, "too_strict", "v > 25.0")
      }.getMessage.contains("too_strict"))
      assert(intercept[IllegalArgumentException] {
        TxnTable.addCheck(spark, table, "ghost", "nope > 0")
      }.getMessage.contains("unknown column"))
      // constraint blocks dropping its input column
      TxnTable.addCheck(spark, table, "v_pos", "v > 0")
      assert(intercept[IllegalArgumentException] {
        TxnTable.dropColumn(spark, table, "v")
      }.getMessage.contains("v_pos"))
    }
  }

  test("copyInto ingests each source file exactly once") {
    withZone { zone =>
      import spark.implicits._
      val table = s"$zone/t"
      val landing = s"$zone/landing"
      def drop(name: String, rows: Seq[(Long, Double)]): Unit =
        graft.io.Tables.writeSingleFile(
          rows.toDF("id", "v"), s"$landing/$name")
      drop("a.parquet", Seq((1L, 1.0), (2L, 2.0)))
      drop("b.parquet", Seq((3L, 3.0)))
      val (v1, in1) = TxnTable.copyInto(spark, table, landing,
        pattern = "*.parquet", statsCols = Seq("id"))
      assert(in1.size == 2 && TxnTable.read(spark, table).count() == 3L)
      // replay: nothing new
      val (v2, in2) = TxnTable.copyInto(spark, table, landing,
        pattern = "*.parquet")
      assert(v2 == v1 && in2.isEmpty)
      assert(TxnTable.read(spark, table).count() == 3L)
      // late arrival: only the new file
      drop("c.parquet", Seq((4L, 4.0)))
      val (_, in3) = TxnTable.copyInto(spark, table, landing,
        pattern = "*.parquet")
      assert(in3.size == 1)
      assert(TxnTable.read(spark, table)
        .select(sum("id")).head().getLong(0) == 10L)
    }
  }

  test("SQL ALTER TABLE on a non-graft table falls through to Spark") {
    // a plain parquet-backed catalog table must hit Spark's own grammar
    // (which supports ADD COLUMNS for v1 tables) — not the graft path
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS alter_plain_t")
    Seq((1, "a")).toDF("i", "s").write.saveAsTable("alter_plain_t")
    try {
      spark.sql("ALTER TABLE alter_plain_t ADD COLUMNS (j INT)")
      assert(spark.table("alter_plain_t").columns.toSeq == Seq("i", "s", "j"))
    } finally spark.sql("DROP TABLE alter_plain_t")
  }
}
