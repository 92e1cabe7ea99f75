package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.TxnTable

/** Table properties (`#prop=` manifest lines) and DESCRIBE DETAIL:
  * SET/UNSET are metadata-only CAS commits, properties are snapshot
  * state (carried by every commit, visible to time travel, restored by
  * RESTORE), and both the SQL spellings and the connector API serve
  * them. */
class TblPropsSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark

  private def withZone(body: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_props").toFile
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
    TxnTable.commitOverwrite(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s").coalesce(1),
      table, statsCols = Seq("k"))
  }

  test("SET/UNSET TBLPROPERTIES: metadata-only, sticky, time-travels") {
    import spark.implicits._
    withZone { table =>
      seed(table)
      val filesBefore = TxnTable.snapshotFiles(spark, table, 1L)
      TxnTable.setProperties(spark, table,
        Map("owner" -> "pipeline", "quality.tier" -> "gold"))
      assert(TxnTable.snapshotFiles(spark, table, 2L) == filesBefore,
        "SET TBLPROPERTIES must be metadata-only")
      assert(TxnTable.tableProperties(spark, table) ==
        Map("owner" -> "pipeline", "quality.tier" -> "gold"))
      // sticky through appends AND overwrites (config outlives content)
      Seq((4L, "d")).toDF("k", "s").write.format("graft")
        .mode("append").save(table)
      assert(TxnTable.tableProperties(spark, table)("owner") == "pipeline")
      Seq((9L, "z")).toDF("k", "s").write.format("graft")
        .mode("overwrite").save(table)
      assert(TxnTable.tableProperties(spark, table)("owner") == "pipeline")
      // unset removes exactly the named keys
      TxnTable.unsetProperties(spark, table, Seq("quality.tier"))
      assert(TxnTable.tableProperties(spark, table) == Map("owner" -> "pipeline"))
      // time travel sees the properties of the pinned snapshot
      assert(TxnTable.tableProperties(spark, table, Some(1L)).isEmpty)
      assert(TxnTable.tableProperties(spark, table, Some(2L))
        .get("quality.tier").contains("gold"))
    }
  }

  test("SQL spellings: SET/UNSET/SHOW TBLPROPERTIES and DESCRIBE DETAIL") {
    withZone { table =>
      seed(table)
      spark.sql(s"CREATE TABLE props_sql_t USING graft OPTIONS (path '$table')")
      try {
        spark.sql(
          "ALTER TABLE props_sql_t SET TBLPROPERTIES ('owner' = 'etl', 'ttl.days' = '30')")
        val shown = spark.sql("SHOW TBLPROPERTIES props_sql_t")
          .collect().map(r => r.getString(0) -> r.getString(1)).toMap
        assert(shown == Map("owner" -> "etl", "ttl.days" -> "30"))
        spark.sql(
          "ALTER TABLE props_sql_t UNSET TBLPROPERTIES IF EXISTS ('ttl.days', 'nope')")
        assert(spark.sql("SHOW TBLPROPERTIES props_sql_t").count() == 1L)
        val dd = spark.sql("DESCRIBE DETAIL props_sql_t")
        val d = dd.head()
        def idx(c: String) = dd.schema.fieldIndex(c)
        assert(d.getString(idx("format")) == "graft")
        assert(d.getLong(idx("num_files")) == 1L)
        assert(d.getLong(idx("num_rows")) == 3L)
        assert(d.getLong(idx("size_bytes")) > 0L)
        assert(d.getString(idx("properties")) == "owner=etl")
      } finally spark.sql("DROP TABLE props_sql_t")
    }
  }

  test("catalog: CREATE TABLE ... TBLPROPERTIES persists; Spark serves it") {
    val s = spark
    if (s.conf.getOption("spark.sql.catalog.gprop").isEmpty) {
      s.conf.set("spark.sql.catalog.gprop", "graft.io.GraftTableCatalog")
      s.conf.set("spark.sql.catalog.gprop.warehouse",
        java.nio.file.Files.createTempDirectory("graft_prop_cat").toString)
    }
    s.sql("CREATE NAMESPACE IF NOT EXISTS gprop.db")
    s.sql("DROP TABLE IF EXISTS gprop.db.pt")
    try {
      s.sql(
        """CREATE TABLE gprop.db.pt (k BIGINT, v STRING) USING graft
          |TBLPROPERTIES ('pipeline' = 'ingest-v2')""".stripMargin)
      val wh = s.conf.get("spark.sql.catalog.gprop.warehouse")
      assert(TxnTable.tableProperties(s, s"$wh/db/pt")
        .get("pipeline").contains("ingest-v2"))
      // Spark's own SHOW TBLPROPERTIES reads Table.properties()
      val shown = s.sql("SHOW TBLPROPERTIES gprop.db.pt").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(shown.get("pipeline").contains("ingest-v2"), s"got $shown")
      // catalog ALTER routes SetProperty/RemoveProperty to the manifest
      s.sql("ALTER TABLE gprop.db.pt SET TBLPROPERTIES ('extra' = 'x')")
      assert(TxnTable.tableProperties(s, s"$wh/db/pt").contains("extra"))
      s.sql("ALTER TABLE gprop.db.pt UNSET TBLPROPERTIES ('extra')")
      assert(!TxnTable.tableProperties(s, s"$wh/db/pt").contains("extra"))
    } finally s.sql("DROP TABLE IF EXISTS gprop.db.pt")
  }

  test("CREATE OR REPLACE resets properties to the declaration") {
    val s = spark
    if (s.conf.getOption("spark.sql.catalog.gprop2").isEmpty) {
      s.conf.set("spark.sql.catalog.gprop2", "graft.io.GraftTableCatalog")
      s.conf.set("spark.sql.catalog.gprop2.warehouse",
        java.nio.file.Files.createTempDirectory("graft_prop_cat2").toString)
    }
    s.sql("CREATE NAMESPACE IF NOT EXISTS gprop2.db")
    s.sql("DROP TABLE IF EXISTS gprop2.db.rt")
    try {
      s.sql("""CREATE TABLE gprop2.db.rt (k BIGINT) USING graft
              |TBLPROPERTIES ('old' = '1', 'keepme' = 'no')""".stripMargin)
      val wh = s.conf.get("spark.sql.catalog.gprop2.warehouse")
      val path = s"$wh/db/rt"
      // a REPLACE is a re-declaration: the old configuration does NOT
      // leak into the new table — only the statement's properties exist
      s.sql("""CREATE OR REPLACE TABLE gprop2.db.rt (k BIGINT, v STRING)
              |USING graft TBLPROPERTIES ('new' = '2')""".stripMargin)
      assert(TxnTable.tableProperties(s, path) == Map("new" -> "2"))
      // and a REPLACE with no TBLPROPERTIES clears them
      s.sql("CREATE OR REPLACE TABLE gprop2.db.rt (k BIGINT) USING graft")
      assert(TxnTable.tableProperties(s, path).isEmpty)
    } finally s.sql("DROP TABLE IF EXISTS gprop2.db.rt")
  }

  test("properties survive OPTIMIZE; RESTORE keeps the CURRENT set") {
    withZone { table =>
      seed(table) // v1
      TxnTable.setProperties(spark, table, Map("p" -> "1")) // v2
      TxnTable.setProperties(spark, table, Map("p" -> "2")) // v3
      TxnTable.compact(spark, table, targetFiles = 1) // v4
      assert(TxnTable.tableProperties(spark, table)("p") == "2")
      // properties are POLICY, like CHECK constraints: a restore rolls
      // back table CONTENT, not configuration (same contract as checks)
      TxnTable.restore(spark, table, 2L)
      assert(TxnTable.tableProperties(spark, table)("p") == "2")
      // ...but a pinned read of the old snapshot still sees its own
      assert(TxnTable.tableProperties(spark, table, Some(2L))("p") == "1")
    }
  }
}
