package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.TxnTable

/** SQL `VERSION AS OF` / `TIMESTAMP AS OF` on graft tables
  * (plans/GraftTimeTravel.scala): lowering, agreement with the
  * reader-option path, and non-interference with everything the rule
  * must NOT touch. */
class GraftTimeTravelSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark

  private def withTable(body: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_tt").toFile
    try body(s"${root.getAbsolutePath}/t")
    finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(root)
    }
  }

  test("VERSION AS OF and TIMESTAMP AS OF pin snapshots through SQL") {
    import spark.implicits._
    withTable { table =>
      TxnTable.commitOverwrite(Seq((1L, "a")).toDF("k", "s"), table)
      Thread.sleep(30)
      val mid = System.currentTimeMillis()
      Thread.sleep(30)
      TxnTable.commitAppend(Seq((2L, "b")).toDF("k", "s"), table)
      spark.sql(s"CREATE TABLE graft_tts_t USING graft OPTIONS (path '$table')")
      try {
        def ks(sql: String): Set[Long] =
          spark.sql(sql).select($"k").collect().map(_.getLong(0)).toSet
        assert(ks("SELECT * FROM graft_tts_t VERSION AS OF 1") == Set(1L))
        assert(ks("SELECT * FROM graft_tts_t VERSION AS OF 2") == Set(1L, 2L))
        // epoch-millis string routes through the reader's parser
        assert(ks(s"SELECT * FROM graft_tts_t TIMESTAMP AS OF '$mid'") == Set(1L))
        // a future timestamp pins the latest version; a typed timestamp
        // constant casts (Spark semantics) instead of string-parsing
        assert(ks("SELECT * FROM graft_tts_t TIMESTAMP AS OF '2035-01-01'")
          == Set(1L, 2L))
        assert(ks("SELECT * FROM graft_tts_t TIMESTAMP AS OF " +
          "timestamp'2035-01-01 00:00:00'") == Set(1L, 2L))
        // joins across two pinned versions of the SAME table resolve
        val joined = spark.sql(
          """SELECT a.k FROM graft_tts_t VERSION AS OF 2 a
            |JOIN graft_tts_t VERSION AS OF 1 b ON a.k = b.k""".stripMargin)
        assert(joined.collect().map(_.getLong(0)).toSeq == Seq(1L))
        // plain SQL read and reader options are unaffected
        assert(ks("SELECT * FROM graft_tts_t") == Set(1L, 2L))
        assert(spark.read.format("graft").option("versionAsOf", "1")
          .load(table).count() == 1L)
      } finally spark.sql("DROP TABLE graft_tts_t")
    }
  }

  test("non-graft tables and temp views keep Spark's loud refusal") {
    import spark.implicits._
    withTable { table =>
      TxnTable.commitOverwrite(Seq((1L, "a")).toDF("k", "s"), table)
      spark.sql("CREATE TABLE plain_tts_t (k INT) USING parquet")
      try {
        val e1 = intercept[org.apache.spark.sql.AnalysisException] {
          spark.sql("SELECT * FROM plain_tts_t VERSION AS OF 1").collect()
        }
        assert(e1.getMessage.contains("TIME_TRAVEL"))
      } finally spark.sql("DROP TABLE plain_tts_t")
      Seq((9L, "x")).toDF("k", "s").createOrReplaceTempView("tts_view")
      try {
        val e2 = intercept[org.apache.spark.sql.AnalysisException] {
          spark.sql("SELECT * FROM tts_view VERSION AS OF 1").collect()
        }
        assert(e2.getMessage.contains("TIME_TRAVEL"))
      } finally spark.catalog.dropTempView("tts_view")
    }
  }

  test("time travel to a reclaimed or future version fails loudly") {
    import spark.implicits._
    withTable { table =>
      TxnTable.commitOverwrite(Seq((1L, "a")).toDF("k", "s"), table)
      spark.sql(s"CREATE TABLE graft_ttf_t USING graft OPTIONS (path '$table')")
      try {
        val e = intercept[Exception] {
          spark.sql("SELECT * FROM graft_ttf_t VERSION AS OF 99").collect()
        }
        assert(e.getMessage != null)
      } finally spark.sql("DROP TABLE graft_ttf_t")
    }
  }
}
