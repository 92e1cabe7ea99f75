package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.TxnTable

/** SQL DDL surface over graft catalog tables: CREATE TABLE with a
  * declared schema and PARTITIONED BY, positional INSERT INTO /
  * INSERT OVERWRITE, and CTAS. */
class GraftDdlSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark

  private def withZone(body: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_ddl").toFile
    try body(root.getAbsolutePath)
    finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(root)
    }
  }

  test("CREATE TABLE + PARTITIONED BY + positional INSERT INTO") {
    withZone { zone =>
      spark.sql(s"""CREATE TABLE ddl_part (k BIGINT, seg STRING) USING graft
                   |PARTITIONED BY (seg) OPTIONS (path '$zone/p')""".stripMargin)
      try {
        // the FIRST insert has no committed manifest — the positional
        // VALUES frame must align to the DECLARED schema, or the
        // parquet lands col1/col2 names the declared read nulls out
        spark.sql("INSERT INTO ddl_part VALUES (1, 'a'), (2, 'b'), (3, 'a')")
        assert(TxnTable.partitionColumns(spark, s"$zone/p") == Seq("seg"))
        val rows = spark.sql("SELECT k, seg FROM ddl_part ORDER BY k")
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "a")))
        // partition-value file groups from the DDL-declared partitioning
        val v = TxnTable.latestVersion(spark, s"$zone/p").get
        val stats = TxnTable.fileStats(spark, s"$zone/p", v)
        val files = TxnTable.snapshotFiles(spark, s"$zone/p", v)
        assert(files.forall(f => stats.getOrElse(f, Nil).exists(s =>
          s.col == "seg" && s.minV == s.maxV)))
      } finally spark.sql("DROP TABLE ddl_part")
    }
  }

  test("INSERT OVERWRITE replaces the snapshot as one overwrite commit") {
    withZone { zone =>
      spark.sql(s"CREATE TABLE ddl_ovw (k BIGINT, s STRING) USING graft " +
        s"OPTIONS (path '$zone/o')")
      try {
        spark.sql("INSERT INTO ddl_ovw VALUES (1, 'a'), (2, 'b')")
        spark.sql("INSERT OVERWRITE ddl_ovw VALUES (9, 'z')")
        val rows = spark.sql("SELECT k, s FROM ddl_ovw")
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        assert(rows == Seq((9L, "z")))
        val ops = spark.sql(s"SELECT op FROM graft_history('$zone/o')")
          .collect().map(_.getString(0)).toSeq
        assert(ops == Seq("overwrite", "append"))
      } finally spark.sql("DROP TABLE ddl_ovw")
    }
  }

  test("CTAS lands the query result as the first commit") {
    withZone { zone =>
      spark.sql(s"CREATE TABLE ddl_ctas USING graft OPTIONS (path '$zone/c') " +
        "AS SELECT 1L AS k, 'x' AS s")
      try {
        val rows = spark.sql("SELECT k, s FROM ddl_ctas")
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        assert(rows == Seq((1L, "x")))
      } finally spark.sql("DROP TABLE ddl_ctas")
    }
  }

  test("a declared table with no data yet: SELECT empty, DML no-ops, MERGE bootstraps") {
    import spark.implicits._
    withZone { zone =>
      spark.sql(s"CREATE TABLE ddl_empty (k BIGINT, v DOUBLE) USING graft " +
        s"OPTIONS (path '$zone/t')")
      try {
        assert(spark.sql("SELECT * FROM ddl_empty").collect().isEmpty)
        assert(spark.sql("SELECT COUNT(*) AS n FROM ddl_empty")
          .head().getLong(0) == 0L)
        spark.sql("DELETE FROM ddl_empty WHERE k % 2 = 0") // no-op, no error
        spark.sql("UPDATE ddl_empty SET v = 0.0 WHERE k = 1")
        assert(TxnTable.latestVersion(spark, s"$zone/t").isEmpty,
          "no-op DML must not commit anything")
        // bootstrap-by-merge: WHEN NOT MATCHED inserts seed the table
        Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
          .createOrReplaceTempView("ddl_empty_src")
        spark.sql(
          """MERGE INTO ddl_empty t USING ddl_empty_src s ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET v = s.v
            |WHEN NOT MATCHED AND s.k < 2 THEN INSERT *
            |""".stripMargin)
        val rows = spark.sql("SELECT k, v FROM ddl_empty ORDER BY k")
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        assert(rows == Seq((1L, 1.0))) // insert condition honored
      } finally spark.sql("DROP TABLE ddl_empty")
    }
  }

  test("time transforms in SQL DDL surface the session catalog's refusal") {
    withZone { zone =>
      // V2SessionCatalog itself rejects non-identity transforms in DDL —
      // days() partitioning is the API / option spelling's job; the SQL
      // error must stay loud, not silently drop the transform
      val e = intercept[Exception] {
        spark.sql(s"""CREATE TABLE ddl_days (k BIGINT, ts TIMESTAMP_NTZ)
                     |USING graft PARTITIONED BY (days(ts))
                     |OPTIONS (path '$zone/d')""".stripMargin)
      }
      assert(e.getMessage.contains("UNSUPPORTED_PARTITION_TRANSFORM") ||
        e.getMessage.contains("days"))
    }
  }
}
