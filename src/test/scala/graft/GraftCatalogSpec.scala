package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.TxnTable

/** The DSv2 TableCatalog front door (graft.io.GraftTableCatalog):
  * multi-part names, CREATE TABLE with the SQL spellings for GENERATED
  * ALWAYS AS (expr) and GENERATED ALWAYS AS IDENTITY flowing through
  * Spark 4's connector Column API into graft's schema-metadata keys,
  * INSERT INTO auto-fill, ALTER routed to the metadata-only evolution
  * primitives, and namespace management. */
class GraftCatalogSpec extends AnyFunSuite {

  lazy val spark = {
    val s = Spec.spark
    if (s.conf.getOption("spark.sql.catalog.gcat").isEmpty) {
      s.conf.set("spark.sql.catalog.gcat", "graft.io.GraftTableCatalog")
      s.conf.set("spark.sql.catalog.gcat.warehouse",
        java.nio.file.Files.createTempDirectory("graft_cat").toString)
    }
    s
  }

  private def wh: String = spark.conf.get("spark.sql.catalog.gcat.warehouse")

  test("CREATE TABLE with generated + identity columns; INSERT fills both") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    spark.sql(
      """CREATE TABLE gcat.db.ev (
        |  id     BIGINT GENERATED ALWAYS AS IDENTITY,
        |  ts     TIMESTAMP_NTZ,
        |  p_date DATE   GENERATED ALWAYS AS (CAST(ts AS DATE)),
        |  v      DOUBLE)
        |USING graft""".stripMargin)
    try {
      val path = s"$wh/db/ev"
      val schema = TxnTable.snapshotSchema(spark, path,
        TxnTable.latestVersion(spark, path).get).get
      assert(TxnTable.generatedColumns(schema) ==
        Map("p_date" -> "CAST(ts AS DATE)"))
      assert(TxnTable.identityColumn(schema).map(d => (d.col, d.start, d.step))
        .contains(("id", 1L, 1L)))
      // by-name INSERT omitting both managed columns: commit fills them
      spark.sql(
        """INSERT INTO gcat.db.ev (ts, v) VALUES
          |  (TIMESTAMP_NTZ'2024-03-01 10:00:00', 1.5),
          |  (TIMESTAMP_NTZ'2024-03-02 11:00:00', 2.5)""".stripMargin)
      val out = spark.sql("SELECT * FROM gcat.db.ev ORDER BY id")
      assert(out.columns.toSeq ==
        Seq("id", "ts", "p_date", "v"))
      val rows = out.collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
      assert(rows.map(_.getDate(2).toString).toSeq ==
        Seq("2024-03-01", "2024-03-02"))
      // a second INSERT continues above the hwm
      spark.sql(
        "INSERT INTO gcat.db.ev (ts, v) VALUES (TIMESTAMP_NTZ'2024-03-03 09:00:00', 3.5)")
      assert(spark.sql("SELECT max(id) FROM gcat.db.ev").head().getLong(0) == 3L)
    } finally spark.sql("DROP TABLE IF EXISTS gcat.db.ev")
  }

  test("PARTITIONED BY a generated column through the catalog") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    spark.sql(
      """CREATE TABLE gcat.db.part (
        |  ts     TIMESTAMP_NTZ,
        |  p_date DATE GENERATED ALWAYS AS (CAST(ts AS DATE)),
        |  v      DOUBLE)
        |USING graft PARTITIONED BY (p_date)""".stripMargin)
    try {
      val path = s"$wh/db/part"
      assert(TxnTable.partitionColumns(spark, path) == Seq("p_date"))
      spark.sql(
        """INSERT INTO gcat.db.part (ts, v) VALUES
          |  (TIMESTAMP_NTZ'2024-03-01 10:00:00', 1.0),
          |  (TIMESTAMP_NTZ'2024-03-01 12:00:00', 2.0),
          |  (TIMESTAMP_NTZ'2024-03-02 10:00:00', 3.0)""".stripMargin)
      val v = TxnTable.latestVersion(spark, path).get
      val files = TxnTable.snapshotFiles(spark, path, v)
      val stats = TxnTable.fileStats(spark, path, v)
      // partitioned layout: every file single-valued on p_date
      assert(files.nonEmpty && files.forall(f =>
        stats.getOrElse(f, Nil).exists(s =>
          s.col == "p_date" && s.minV == s.maxV)))
      assert(spark.sql("SELECT count(*) FROM gcat.db.part WHERE p_date = DATE'2024-03-01'")
        .head().getLong(0) == 2L)
    } finally spark.sql("DROP TABLE IF EXISTS gcat.db.part")
  }

  test("ALTER TABLE through the catalog routes to metadata-only evolution") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    spark.sql(
      "CREATE TABLE gcat.db.alt (k BIGINT, s STRING) USING graft")
    try {
      val path = s"$wh/db/alt"
      spark.sql("INSERT INTO gcat.db.alt VALUES (1, 'a'), (2, 'b')")
      val filesBefore = TxnTable.snapshotFiles(spark, path,
        TxnTable.latestVersion(spark, path).get).toSet
      spark.sql("ALTER TABLE gcat.db.alt ADD COLUMNS (note STRING)")
      spark.sql("ALTER TABLE gcat.db.alt RENAME COLUMN s TO tag")
      val filesAfter = TxnTable.snapshotFiles(spark, path,
        TxnTable.latestVersion(spark, path).get).toSet
      assert(filesAfter == filesBefore, "evolution must be metadata-only")
      val out = spark.sql("SELECT k, tag, note FROM gcat.db.alt ORDER BY k")
      assert(out.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "a"), (2L, "b")))
    } finally spark.sql("DROP TABLE IF EXISTS gcat.db.alt")
  }

  test("SHOW TABLES, table existence, and DROP through the catalog") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns2")
    spark.sql("CREATE TABLE gcat.ns2.t1 (k BIGINT) USING graft")
    try {
      val listed = spark.sql("SHOW TABLES IN gcat.ns2")
        .select("tableName").collect().map(_.getString(0)).toSeq
      assert(listed.contains("t1"))
      spark.sql("DROP TABLE gcat.ns2.t1")
      assert(spark.sql("SHOW TABLES IN gcat.ns2").count() == 0L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS gcat.ns2.t1")
      spark.sql("DROP NAMESPACE IF EXISTS gcat.ns2")
    }
  }

  test("time travel and CTAS through the catalog") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    spark.sql("CREATE TABLE gcat.db.tt (k BIGINT, s STRING) USING graft")
    try {
      spark.sql("INSERT INTO gcat.db.tt VALUES (1, 'a')")
      spark.sql("INSERT INTO gcat.db.tt VALUES (2, 'b')")
      // v1 = empty create, v2 = first insert, v3 = second
      assert(spark.sql("SELECT count(*) FROM gcat.db.tt VERSION AS OF 2")
        .head().getLong(0) == 1L)
      assert(spark.sql("SELECT count(*) FROM gcat.db.tt").head().getLong(0) == 2L)
      val lastTs = java.time.Instant.now().toString.stripSuffix("Z")
      assert(spark.sql(
        s"SELECT count(*) FROM gcat.db.tt TIMESTAMP AS OF '$lastTs'")
        .head().getLong(0) == 2L)
      // TAG time travel through the catalog's loadTable(ident, version):
      // a non-numeric version resolves through the tag map
      spark.sql("ALTER TABLE gcat.db.tt SET TAG 'first' VERSION AS OF 2")
      assert(spark.sql(
          "SELECT count(*) FROM gcat.db.tt VERSION AS OF 'first'")
        .head().getLong(0) == 1L)
      val miss = intercept[Exception] {
        spark.sql("SELECT * FROM gcat.db.tt VERSION AS OF 'nope'").collect()
      }
      // either resolution path (hint-rule reader option / catalog
      // loadTable) must refuse an unknown tag loudly, by name
      assert(miss.getMessage.contains("no tag 'nope'") ||
        miss.getMessage.contains("neither a numeric version nor a tag"),
        miss.getMessage)
      // CTAS through the catalog (non-atomic create + write path)
      spark.sql(
        "CREATE TABLE gcat.db.tt2 USING graft AS SELECT k, s FROM gcat.db.tt")
      try assert(spark.sql("SELECT count(*) FROM gcat.db.tt2")
        .head().getLong(0) == 2L)
      finally spark.sql("DROP TABLE IF EXISTS gcat.db.tt2")
    } finally spark.sql("DROP TABLE IF EXISTS gcat.db.tt")
  }

  test("CREATE OR REPLACE TABLE: atomic swap, old snapshots travel") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    spark.sql("DROP TABLE IF EXISTS gcat.db.cor")
    try {
      // CREATE OR REPLACE on a nonexistent table = CREATE (CTAS form)
      Seq((1L, "a"), (2L, "b")).toDF("k", "s").createOrReplaceTempView("cor_src")
      spark.sql(
        "CREATE OR REPLACE TABLE gcat.db.cor USING graft AS SELECT * FROM cor_src")
      assert(spark.table("gcat.db.cor").count() == 2L)
      val path = s"$wh/db/cor"
      val v1 = TxnTable.latestVersion(spark, path).get
      // the daily full re-publish: REPLACE with different rows — ONE
      // atomic manifest swap, not drop+create (the lineage continues)
      Seq((10L, "x"), (20L, "y"), (30L, "z")).toDF("k", "s")
        .createOrReplaceTempView("cor_src2")
      spark.sql(
        "CREATE OR REPLACE TABLE gcat.db.cor USING graft AS SELECT * FROM cor_src2")
      val v2 = TxnTable.latestVersion(spark, path).get
      assert(v2 > v1, "replace must extend the lineage, not restart it")
      assert(spark.table("gcat.db.cor").count() == 3L)
      // readers pinned BELOW the replace still see the old table
      assert(spark.sql(
        s"SELECT count(*) FROM gcat.db.cor VERSION AS OF $v1")
        .head().getLong(0) == 2L)
      // declaration-only REPLACE: new schema, empty rows, still a swap
      spark.sql(
        "CREATE OR REPLACE TABLE gcat.db.cor (a BIGINT, note STRING) USING graft")
      assert(spark.table("gcat.db.cor").columns.toSeq == Seq("a", "note"))
      assert(spark.table("gcat.db.cor").count() == 0L)
      assert(TxnTable.latestVersion(spark, path).get > v2)
      // plain REPLACE TABLE (no OR) refuses when the table is gone
      spark.sql("DROP TABLE gcat.db.cor")
      intercept[Exception] {
        spark.sql("REPLACE TABLE gcat.db.cor (a BIGINT) USING graft")
      }
    } finally spark.sql("DROP TABLE IF EXISTS gcat.db.cor")
  }

  test("CREATE TABLE with DEFAULT columns through the catalog") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    spark.sql("DROP TABLE IF EXISTS gcat.db.dflt")
    try {
      spark.sql(
        """CREATE TABLE gcat.db.dflt (
          |  k    BIGINT,
          |  tier STRING DEFAULT 'bronze',
          |  n    INT    DEFAULT 1 + 2)
          |USING graft""".stripMargin)
      spark.sql("INSERT INTO gcat.db.dflt (k) VALUES (1)")
      spark.sql("INSERT INTO gcat.db.dflt VALUES (2, 'gold', DEFAULT)")
      val got = spark.table("gcat.db.dflt").orderBy("k").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
      assert(got == Seq((1L, "bronze", 3), (2L, "gold", 3)), s"got $got")
    } finally spark.sql("DROP TABLE IF EXISTS gcat.db.dflt")
  }

  test("DML and maintenance statements work on catalog names") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    spark.sql("CREATE TABLE gcat.db.dml (k BIGINT, v DOUBLE) USING graft")
    try {
      spark.sql("INSERT INTO gcat.db.dml VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
      // SQL UPDATE lowers through the same GraftTable-relation rewrite
      spark.sql("UPDATE gcat.db.dml SET v = v * 10 WHERE k = 2")
      assert(spark.sql("SELECT v FROM gcat.db.dml WHERE k = 2")
        .head().getDouble(0) == 20.0)
      // MERGE INTO a catalog name
      spark.sql(
        """MERGE INTO gcat.db.dml t USING (SELECT 3L AS k, 99.0 AS v) s
          |ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
      assert(spark.sql("SELECT v FROM gcat.db.dml WHERE k = 3")
        .head().getDouble(0) == 99.0)
      // maintenance statements resolve the catalog name to the table dir
      val hist = spark.sql("DESCRIBE HISTORY gcat.db.dml").collect()
      assert(hist.nonEmpty)
      spark.sql("OPTIMIZE gcat.db.dml")
      val dry = spark.sql("VACUUM gcat.db.dml RETAIN 0 HOURS DRY RUN").count()
      assert(dry >= 0L)
      assert(spark.sql("SELECT count(*) FROM gcat.db.dml").head().getLong(0) == 3L)
    } finally spark.sql("DROP TABLE IF EXISTS gcat.db.dml")
  }

  test("CHECK constraints through catalog ALTER are write-enforced") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    spark.sql("CREATE TABLE gcat.db.chk (k BIGINT, v DOUBLE) USING graft")
    try {
      val path = s"$wh/db/chk"
      spark.sql("INSERT INTO gcat.db.chk VALUES (1, 1.0)")
      spark.sql("ALTER TABLE gcat.db.chk ADD CONSTRAINT v_pos CHECK (v > 0)")
      assert(TxnTable.checkConstraints(spark, path) == Map("v_pos" -> "v > 0"))
      val e = intercept[Exception] {
        spark.sql("INSERT INTO gcat.db.chk VALUES (2, -5.0)")
      }
      assert(e.getMessage.contains("v_pos") ||
        Option(e.getCause).exists(_.getMessage.contains("v_pos")))
      assert(spark.sql("SELECT count(*) FROM gcat.db.chk").head().getLong(0) == 1L)
      spark.sql("ALTER TABLE gcat.db.chk DROP CONSTRAINT v_pos")
      spark.sql("INSERT INTO gcat.db.chk VALUES (2, -5.0)")
      assert(spark.sql("SELECT count(*) FROM gcat.db.chk").head().getLong(0) == 2L)
    } finally spark.sql("DROP TABLE IF EXISTS gcat.db.chk")
  }

  test("readStream.table streams a catalog table's commit log") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    spark.sql("CREATE TABLE gcat.db.strm (k BIGINT, s STRING) USING graft")
    try {
      spark.sql("INSERT INTO gcat.db.strm VALUES (1, 'a'), (2, 'b')")
      spark.sql("INSERT INTO gcat.db.strm VALUES (3, 'c')")
      val q = spark.readStream.table("gcat.db.strm")
        .writeStream.format("memory").queryName("gcat_strm")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      val out = spark.sql("SELECT k FROM gcat_strm ORDER BY k")
        .collect().map(_.getLong(0)).toSeq
      assert(out == Seq(1L, 2L, 3L))
    } finally {
      spark.sql("DROP TABLE IF EXISTS gcat.db.strm")
      spark.catalog.dropTempView("gcat_strm")
    }
  }

  test("GENERATED BY DEFAULT AS IDENTITY refuses with a clear message") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    val e = intercept[Exception] {
      spark.sql(
        """CREATE TABLE gcat.db.bad (
          |  id BIGINT GENERATED BY DEFAULT AS IDENTITY,
          |  v  DOUBLE)
          |USING graft""".stripMargin)
    }
    assert(e.getMessage.contains("GENERATED ALWAYS") ||
      e.getMessage.contains("not supported"))
  }
}
