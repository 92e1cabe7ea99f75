package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{StringType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.GraftDataSource

/** SQL time travel for graft tables — `SELECT ... FROM t VERSION AS OF
  * n` / `TIMESTAMP AS OF ts` (the Delta spelling the reference's
  * `delta-core_2.12-0.7.0.jar` makes users expect; SURVEY.md §1.3),
  * lowered onto the reader-option path (`versionAsOf`/`timestampAsOf`,
  * `io/GraftDataSource.scala`) that already pins snapshots.
  *
  * Spark parses the syntax into [[RelationTimeTravel]], but its
  * analyzer only resolves it for catalogs implementing
  * `loadTable(ident, version)` — the session catalog refuses with
  * UNSUPPORTED_FEATURE.TIME_TRAVEL *inside* ResolveRelations, before
  * any extended resolution rule runs. So this rule is injected as a
  * HINT-resolution rule: the Hints batch precedes Resolution, letting
  * the rewrite replace the node with an ordinary pinned DSv2 relation
  * first. Non-graft identifiers, temp views, and non-constant
  * timestamps are left untouched — Spark's own loud error stands.
  *
  * Cost shape: the rewrite itself is one catalog metadata lookup;
  * the pinned read then plans O(log history) manifest probes
  * (`TxnTable.versionAt`) — never a directory listing. */
case class GraftTimeTravel(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, ver) =>
      (for {
        path <- graftPath(u)
        opt <- asOfOption(ts, ver)
      } yield pinnedRelation(path, opt._1, opt._2)).getOrElse(tt)
  }

  /** The table path IFF the identifier names a session-catalog table
    * whose provider is graft (temp views and other providers: None). */
  private def graftPath(u: UnresolvedRelation): Option[String] =
    GraftCatalog.pathOf(spark, u.multipartIdentifier)

  /** Reader option for the AS OF clause. `VERSION AS OF n` maps
    * directly; a NON-numeric version is a snapshot TAG name —
    * `VERSION AS OF 'release-2'` resolves through the latest
    * snapshot's tag map exactly like `option("tagAsOf", ...)`, making
    * the reproducibility pin consumable from pure SQL. `TIMESTAMP AS
    * OF` accepts a string constant (passed to the reader's UTC
    * date/datetime/millis parser) or any foldable expression castable
    * to timestamp (evaluated to epoch millis). Non-constant
    * timestamps: None — unsupported, loudly. */
  private def asOfOption(ts: Option[Expression],
                         ver: Option[String]): Option[(String, String)] =
    (ts, ver) match {
      case (None, Some(v)) =>
        Some((if (v.toLongOption.isDefined) "versionAsOf"
              else "tagAsOf") -> v)
      case (Some(e), None) if e.foldable && e.dataType == StringType =>
        Option(e.eval()).map(s => "timestampAsOf" -> s.toString)
      case (Some(e), None) if e.foldable =>
        val cast = Cast(e, TimestampType,
          Some(spark.sessionState.conf.sessionLocalTimeZone))
        Option(cast.eval()).map(us =>
          "timestampAsOf" -> (us.asInstanceOf[Long] / 1000L).toString)
      case _ => None
    }

  /** The same pinned relation `spark.read.format("graft")
    * .option(key, value).load(path)` would produce — built directly,
    * no nested analysis. */
  private def pinnedRelation(path: String, key: String,
                             value: String): LogicalPlan = {
    val opts = new CaseInsensitiveStringMap(
      java.util.Map.of("path", path, key, value))
    val provider = new GraftDataSource()
    val table = provider.getTable(
      provider.inferSchema(opts), Array.empty[Transform],
      opts.asCaseSensitiveMap())
    DataSourceV2Relation.create(table, None, None, opts)
  }
}
