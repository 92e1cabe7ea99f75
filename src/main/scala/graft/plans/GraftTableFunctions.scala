package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{LongType, StringType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.io.{GraftDataSource, TxnTable}

/** SQL TABLE FUNCTIONS over graft tables — the Delta-parity spellings
  * for table metadata and the change feed:
  *
  *   SELECT * FROM graft_history('/path/to/t')
  *     — DESCRIBE HISTORY: (version, ts, op, added, removed) per
  *       retained commit, newest first, from bounded manifest reads.
  *
  *   SELECT * FROM graft_changes('/path/to/t', 2[, 5])
  *     — Delta's `table_changes`: every row-level change in versions
  *       (start, end] with `_change_type`/`_commit_version`, planned as
  *       the SAME pinned DSv2 change-feed relation the reader options
  *       produce (`io/GraftCdc.scala`) — no nested analysis, full
  *       pushdown-free log semantics, data cost = the changed rows.
  *
  * Registered via `SparkSessionExtensions.injectTableFunction` (config
  * path only, like the DML analyzer rules). Arguments must be constant
  * ("foldable") — a non-constant path or version has no well-defined
  * plan-time meaning. */
object GraftTableFunctions {

  private def constant(e: Expression, what: String): Any = {
    require(e.foldable, s"graft table functions need a constant $what, " +
      s"got ${e.sql}")
    e.eval(null)
  }
  private def str(e: Expression, what: String): String =
    constant(e, what) match {
      case s: UTF8String => s.toString
      case other => String.valueOf(other)
    }
  private def long(e: Expression, what: String): Long =
    constant(e, what) match {
      case n: Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"graft table functions need an integer $what, got $other")
    }

  /** `graft_history(path)` — eager, metadata-only: the rows are bounded
    * by the retained version count, so a LocalRelation is the right
    * plan (no distributed scan of a handful of manifest headers). */
  def history(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 1, "usage: graft_history(path)")
    val table = str(exprs.head, "path")
    val spark = SparkSession.active
    val out = Seq(
      AttributeReference("version", LongType, nullable = false)(),
      AttributeReference("ts", TimestampType, nullable = false)(),
      AttributeReference("op", StringType, nullable = false)(),
      AttributeReference("added", LongType, nullable = false)(),
      AttributeReference("removed", LongType, nullable = false)())
    val rows = TxnTable.commitLog(spark, table).map { ci =>
      val r = new GenericInternalRow(5)
      r.setLong(0, ci.version)
      r.setLong(1, ci.tsMillis * 1000L) // micros
      r.update(2, UTF8String.fromString(ci.op))
      r.setLong(3, ci.added)
      r.setLong(4, ci.removed)
      r: InternalRow
    }
    LocalRelation(out, rows)
  }

  /** `graft_changes(path, start[, end])` — the change-feed relation,
    * (start, end] half-open like the reader options; end defaults to
    * the latest version at plan time. */
  def changes(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 2 || exprs.length == 3,
      "usage: graft_changes(path, startingVersion[, endingVersion])")
    val table = str(exprs.head, "path")
    val opts = Map(
      "path" -> table,
      "readChangeFeed" -> "true",
      "startingVersion" -> long(exprs(1), "startingVersion").toString) ++
      (if (exprs.length == 3)
        Map("endingVersion" -> long(exprs(2), "endingVersion").toString)
      else Map.empty)
    import scala.jdk.CollectionConverters._
    val cism = new CaseInsensitiveStringMap(opts.asJava)
    val provider = new GraftDataSource()
    val t = provider.getTable(
      provider.inferSchema(cism), Array.empty[Transform],
      cism.asCaseSensitiveMap())
    DataSourceV2Relation.create(t, None, None, cism)
  }
}
