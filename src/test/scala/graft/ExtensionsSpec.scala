package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The canonical extension wiring path: a session built with
  * `.withExtensions(new GraftExtensions)` (≙ spark.sql.extensions conf)
  * must expose the native functions and fire the TopK rewrite without any
  * runtime install() call. Uses its own session on purpose. */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions session gets functions, strategies, and the rewrite") {
    // getOrCreate returns any active session (ignoring withExtensions), so
    // clear the handles; the underlying SparkContext is reused. Never
    // stop() here — that would kill the context for the other suites.
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      // native function is SQL-callable
      assert(spark.sql("SELECT simhash64(array('a','b')) AS h").collect()(0).getLong(0) != 0L)
      // the window->TopK rewrite fires with no install() call
      val plan = spark.sql(
        """SELECT k, v FROM (
          |  SELECT k, v, ROW_NUMBER() OVER (PARTITION BY k ORDER BY v) AS rn
          |  FROM VALUES (1, 10), (1, 20), (2, 30) AS t(k, v)) x
          |WHERE rn <= 1""".stripMargin)
        .queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), plan)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach { s =>
        SparkSession.setDefaultSession(s)
        SparkSession.setActiveSession(s)
      }
    }
  }
}
