package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{Command, LeafNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, StructType}

import graft.io.TxnTable

/** Shared catalog resolution: the table path IFF a multipart identifier
  * names a session-catalog table whose provider is graft. Used by the
  * time-travel rule and the maintenance-statement parser. */
private[plans] object GraftCatalog {
  def pathOf(spark: SparkSession, parts: Seq[String]): Option[String] = {
    // a GraftTableCatalog name resolves first: `gcat.db.t` targets the
    // catalog's table directory, so OPTIMIZE/VACUUM/RESTORE/DESCRIBE
    // HISTORY and time travel work on catalog names exactly like paths
    if (parts.length >= 2) {
      org.apache.spark.sql.GraftBridge.catalogPlugin(spark, parts.head)
        .collect { case g: graft.io.GraftTableCatalog => g }
        .foreach { g =>
          val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
            parts.tail.init.toArray, parts.last)
          if (g.tableExists(ident)) return Some(g.tablePathOf(ident))
        }
    }
    val ident = parts match {
      case Seq(t) => TableIdentifier(t)
      case Seq(db, t) => TableIdentifier(t, Some(db))
      case Seq(cat, db, t) if cat.equalsIgnoreCase("spark_catalog") =>
        TableIdentifier(t, Some(db))
      case _ => return None
    }
    val catalog = spark.sessionState.catalog
    if (ident.database.isEmpty && catalog.getTempView(ident.table).isDefined)
      return None
    if (!catalog.tableExists(ident)) return None
    val meta = catalog.getTableMetadata(ident)
    if (!meta.provider.exists(_.equalsIgnoreCase("graft"))) return None
    meta.storage.properties.get("path")
      .orElse(meta.storage.locationUri.map(_.getPath))
  }
}

/** MAINTENANCE SQL for graft tables — the statements the reference's
  * shipped Delta 0.7 jar implies (`VACUUM`, and OPTIMIZE as the
  * small-file compaction every daily-ingest table needs), which Spark's
  * grammar does not know. A delegating parser (the same seam Delta's
  * own SqlParser rides) intercepts exactly these two statement shapes
  * and hands EVERYTHING else — including every other parse entry point
  * — to Spark's parser:
  *
  *   VACUUM '<path>' | table_ident [RETAIN n HOURS] [KEEP n VERSIONS]
  *   OPTIMIZE '<path>' | table_ident [FILES SMALLER THAN n]
  *   RESTORE [TABLE] <target> TO VERSION AS OF n
  *   RESTORE [TABLE] <target> TO TIMESTAMP AS OF '<ts>'
  *   DESCRIBE HISTORY <target>
  *
  * VACUUM maps to [[TxnTable.vacuum]] (retention window + kept-version
  * count), OPTIMIZE to [[TxnTable.compactSmall]] (pack small files;
  * default threshold 32 MiB), RESTORE to [[TxnTable.restore]] (a NEW
  * commit reinstating the old snapshot — history is preserved), and
  * DESCRIBE HISTORY to the same bounded metadata rows as the
  * `graft_history` table function. Identifier targets resolve through
  * the session catalog; non-graft targets refuse loudly. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseMaintenance(sqlText)
      .getOrElse(delegate.parsePlan(sqlText))
  override def parsePlanWithParameters(
      sqlText: String, ctx: ParameterContext): LogicalPlan =
    GraftSqlParser.parseMaintenance(sqlText)
      .getOrElse(delegate.parsePlanWithParameters(sqlText, ctx))
  override def parseExpression(s: String): Expression = delegate.parseExpression(s)
  override def parseTableIdentifier(s: String): TableIdentifier =
    delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String): Seq[String] =
    delegate.parseMultipartIdentifier(s)
  override def parseQuery(s: String): LogicalPlan = delegate.parseQuery(s)
  override def parseRoutineParam(s: String): StructType =
    delegate.parseRoutineParam(s)
  override def parseTableSchema(s: String): StructType =
    delegate.parseTableSchema(s)
  override def parseDataType(s: String): DataType = delegate.parseDataType(s)
}

object GraftSqlParser {
  // target = 'quoted path' | "quoted path" | (possibly backquoted)
  // identifier; clauses optional, any whitespace, case-insensitive
  private val VacuumStmt =
    """(?is)\s*VACUUM\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s*(?:RETAIN\s+(\d+)\s+HOURS?\b\s*)?(?:KEEP\s+(\d+)\s+VERSIONS?\b\s*)?(DRY\s+RUN\s*)?;?\s*""".r
  // OPTIMIZE <target> [WHERE col = v | col BETWEEN a AND b]
  //   [FILES SMALLER THAN n] — the WHERE scopes compaction to files
  // whose stats prove containment (partition-scoped OPTIMIZE,
  // Delta-style; BETWEEN covers retention-window maintenance)
  private val OptimizeStmt =
    """(?is)\s*OPTIMIZE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s*(?:WHERE\s+(`[^`]+`|[\w.]+)\s*(?:=\s*('[^']*'|"[^"]*"|[\w.\-:]+)|BETWEEN\s+('[^']*'|"[^"]*"|[\w.\-:]+)\s+AND\s+('[^']*'|"[^"]*"|[\w.\-:]+))\s*)?(?:FILES\s+SMALLER\s+THAN\s+(\d+)\b\s*)?;?\s*""".r
  // OPTIMIZE <target> ZORDER BY (c1, c2[, ...]) [INTO n FILES]
  private val ZOrderStmt =
    """(?is)\s*OPTIMIZE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+ZORDER\s+BY\s*\(\s*((?:`[^`]+`|[\w.]+)(?:\s*,\s*(?:`[^`]+`|[\w.]+))+)\s*\)\s*(?:INTO\s+(\d+)\s+FILES\s*)?;?\s*""".r
  // OPTIMIZE <target> WHERE col = v | col BETWEEN a AND b
  //   ZORDER BY (...) [INTO n FILES]
  // — re-cluster only the predicate's stats-proven-contained files
  private val ZOrderWhereStmt =
    """(?is)\s*OPTIMIZE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+WHERE\s+(`[^`]+`|[\w.]+)\s*(?:=\s*('[^']*'|"[^"]*"|[\w.\-:]+)|BETWEEN\s+('[^']*'|"[^"]*"|[\w.\-:]+)\s+AND\s+('[^']*'|"[^"]*"|[\w.\-:]+))\s+ZORDER\s+BY\s*\(\s*((?:`[^`]+`|[\w.]+)(?:\s*,\s*(?:`[^`]+`|[\w.]+))+)\s*\)\s*(?:INTO\s+(\d+)\s+FILES\s*)?;?\s*""".r
  // INSERT INTO <target> REPLACE WHERE col = v | col BETWEEN a AND b
  // SELECT … — Delta's scoped-overwrite ingest spelling: the SELECT's
  // rows atomically replace exactly the predicate's slice, riding the
  // writer's replaceWhere path (stats-proven containment; rows outside
  // the slice refuse write-side)
  private val InsertReplaceWhereStmt =
    """(?is)\s*INSERT\s+INTO\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+REPLACE\s+WHERE\s+(.+?)\s+(SELECT\s.+?)\s*;?\s*""".r
  // INSERT INTO <target> STAGE 'id' SELECT … — write-audit-publish
  // staged ingest from pure SQL: the SELECT's rows land as a staged
  // manifest (invisible until ALTER TABLE … PUBLISH STAGE), riding
  // the writer's stageId option
  private val InsertStageStmt =
    """(?is)\s*INSERT\s+INTO\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+STAGE\s+('[^']+'|"[^"]+"|[\w.\-]+)\s+(SELECT\s.+?)\s*;?\s*""".r
  private val RestoreStmt =
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?('[^']+'|"[^"]+"|[\w.`/\-]+)\s+TO\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+('[^']+'|"[^"]+"|\d+)\s*;?\s*""".r
  private val HistoryStmt =
    """(?is)\s*DESCRIBE\s+HISTORY\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s*;?\s*""".r
  private val DetailStmt =
    """(?is)\s*DESCRIBE\s+DETAIL\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s*;?\s*""".r
  // SHOW PARTITIONS — intercepted ONLY for graft targets (Spark's own
  // grammar owns the statement for v1 catalog tables)
  private val ShowPartitionsStmt =
    """(?is)\s*SHOW\s+PARTITIONS\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s*;?\s*""".r
  // SHOW STAGES — the write-audit-publish auditor's pending-stage
  // listing (graft-only statement; no Spark grammar to defer to)
  private val ShowStagesStmt =
    """(?is)\s*SHOW\s+STAGES\s+(?:ON\s+)?('[^']+'|"[^"]+"|[\w.`/\-]+)\s*;?\s*""".r
  // SHOW TAGS — the release auditor's tag listing (parity with SHOW
  // STAGES; rows shared with the graft_tags TVF)
  private val ShowTagsStmt =
    """(?is)\s*SHOW\s+TAGS\s+(?:ON\s+)?('[^']+'|"[^"]+"|[\w.`/\-]+)\s*;?\s*""".r
  // ALTER TABLE family — intercepted ONLY when the target is a graft
  // table (quoted path, or identifier resolving to provider=graft);
  // every other ALTER TABLE falls through to Spark's own grammar.
  // single-column form with a DEFAULT — matched BEFORE the generic
  // list form (whose parseTableSchema has no DEFAULT grammar)
  private val AlterAddColDefaultStmt =
    """(?is)\s*ALTER\s+TABLE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+ADD\s+COLUMNS?\s*\(?\s*(`[^`]+`|[\w]+)\s+([\w]+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)\s+DEFAULT\s+(.+?)\s*\)?\s*;?\s*""".r
  private val AlterAddColsStmt =
    """(?is)\s*ALTER\s+TABLE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+ADD\s+COLUMNS?\s*\((.+)\)\s*;?\s*""".r
  private val AlterDropColStmt =
    """(?is)\s*ALTER\s+TABLE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+DROP\s+COLUMN\s+(`[^`]+`|[\w.]+)\s*;?\s*""".r
  private val AlterRenameColStmt =
    """(?is)\s*ALTER\s+TABLE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+RENAME\s+COLUMN\s+(`[^`]+`|[\w.]+)\s+TO\s+(`[^`]+`|[\w.]+)\s*;?\s*""".r
  private val AlterAddCheckStmt =
    """(?is)\s*ALTER\s+TABLE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+ADD\s+CONSTRAINT\s+(`[^`]+`|[\w]+)\s+CHECK\s*\((.+)\)\s*;?\s*""".r
  private val AlterDropCheckStmt =
    """(?is)\s*ALTER\s+TABLE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+DROP\s+CONSTRAINT\s+(`[^`]+`|[\w]+)\s*;?\s*""".r
  private val AlterNotNullStmt =
    """(?is)\s*ALTER\s+TABLE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+ALTER\s+COLUMN\s+(`[^`]+`|[\w]+)\s+SET\s+NOT\s+NULL\s*;?\s*""".r
  private val SetTblPropsStmt =
    """(?is)\s*ALTER\s+TABLE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+SET\s+TBLPROPERTIES\s*\((.+)\)\s*;?\s*""".r
  private val UnsetTblPropsStmt =
    """(?is)\s*ALTER\s+TABLE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+UNSET\s+TBLPROPERTIES\s*(?:IF\s+EXISTS\s*)?\((.+)\)\s*;?\s*""".r
  private val ShowTblPropsStmt =
    """(?is)\s*SHOW\s+TBLPROPERTIES\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s*;?\s*""".r
  private val AlterColTypeStmt =
    """(?is)\s*ALTER\s+TABLE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+ALTER\s+COLUMN\s+(`[^`]+`|[\w.]+)\s+TYPE\s+([\w]+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)\s*;?\s*""".r
  private val AlterSetDefaultStmt =
    """(?is)\s*ALTER\s+TABLE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+ALTER\s+COLUMN\s+(`[^`]+`|[\w.]+)\s+SET\s+DEFAULT\s+(.+?)\s*;?\s*""".r
  private val AlterDropDefaultStmt =
    """(?is)\s*ALTER\s+TABLE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+ALTER\s+COLUMN\s+(`[^`]+`|[\w.]+)\s+DROP\s+DEFAULT\s*;?\s*""".r
  // snapshot tags: ALTER TABLE t SET TAG 'name' [VERSION AS OF n] /
  // DROP TAG 'name' — named pinned versions (readable via
  // option("tagAsOf", name); vacuum retains tagged history)
  private val AlterSetTagStmt =
    """(?is)\s*ALTER\s+TABLE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+SET\s+TAG\s+('[^']+'|"[^"]+"|[\w.\-]+)\s*(?:VERSION\s+AS\s+OF\s+(\d+)\s*)?;?\s*""".r
  private val AlterDropTagStmt =
    """(?is)\s*ALTER\s+TABLE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+DROP\s+TAG\s+('[^']+'|"[^"]+"|[\w.\-]+)\s*;?\s*""".r
  // write-audit-publish: ALTER TABLE t PUBLISH STAGE 'id' / ABORT
  // STAGE 'id' — stages are created by the Scala API (they need a
  // frame); auditors consume and resolve them from pure SQL
  private val AlterPublishStageStmt =
    """(?is)\s*ALTER\s+TABLE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+PUBLISH\s+STAGE\s+('[^']+'|"[^"]+"|[\w.\-]+)\s*;?\s*""".r
  private val AlterAbortStageStmt =
    """(?is)\s*ALTER\s+TABLE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+ABORT\s+STAGE\s+('[^']+'|"[^"]+"|[\w.\-]+)\s*;?\s*""".r
  // the stage-retention policy's SQL spelling (VACUUM's RETAIN shape
  // applied to audits): ALTER TABLE t ABORT STAGES OLDER THAN n HOURS
  private val AlterAbortStaleStagesStmt =
    """(?is)\s*ALTER\s+TABLE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+ABORT\s+STAGES\s+OLDER\s+THAN\s+(\d+)\s+(HOURS?|MINUTES?|SECONDS?)\s*;?\s*""".r
  private val AlterSetPartStmt =
    """(?is)\s*ALTER\s+TABLE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+SET\s+PARTITIONED\s+BY\s*\((.*?)\)\s*;?\s*""".r
  private val AlterUnpartStmt =
    """(?is)\s*ALTER\s+TABLE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+SET\s+UNPARTITIONED\s*;?\s*""".r
  // CREATE TABLE <dest> LIKE <source> — structure-only fork (schema,
  // constraints, properties, partition spec; no files, fresh history)
  private val CreateLikeStmt =
    """(?is)\s*CREATE\s+TABLE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+LIKE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s*;?\s*""".r
  // CREATE TABLE <dest> SHALLOW|DEEP CLONE <source> [VERSION AS OF n]
  private val CloneStmt =
    """(?is)\s*CREATE\s+TABLE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+(SHALLOW|DEEP)\s+CLONE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s*(?:VERSION\s+AS\s+OF\s+(\d+)\s*)?;?\s*""".r
  // CONVERT TO GRAFT '<parquet dir>' [STATS (c1, c2, ...)] — in-place
  // adoption: manifest v1 over the existing files, zero rewrite
  private val ConvertStmt =
    """(?is)\s*CONVERT\s+TO\s+GRAFT\s+('[^']+'|"[^"]+")\s*(?:STATS\s*\(\s*((?:`[^`]+`|[\w]+)(?:\s*,\s*(?:`[^`]+`|[\w]+))*)\s*\)\s*)?;?\s*""".r
  // REORG TABLE <t> APPLY (PURGE) — rewrite only delete-affected files,
  // materializing merge-on-read vectors (TxnTable.reorgPurge)
  private val ReorgStmt =
    """(?is)\s*REORG\s+TABLE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*""".r
  // ANALYZE TABLE <t> COMPUTE STATISTICS [FOR COLUMNS a, b | FOR ALL COLUMNS]
  // — advisory column NDV for the CBO (TxnTable.analyzeTable)
  private val AnalyzeStmt =
    """(?is)\s*ANALYZE\s+TABLE\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+COMPUTE\s+STATISTICS\s*(?:(FOR\s+ALL\s+COLUMNS)|FOR\s+COLUMNS\s+((?:`[^`]+`|[\w]+)(?:\s*,\s*(?:`[^`]+`|[\w]+))*))?\s*;?\s*""".r
  // COPY INTO <target> FROM '<source dir>'
  //   [FILEFORMAT = parquet|csv|json] [PATTERN = '<glob>']
  private val CopyIntoStmt =
    """(?is)\s*COPY\s+INTO\s+('[^']+'|"[^"]+"|[\w.`/\-]+)\s+FROM\s+('[^']+'|"[^"]+")\s*(?:FILEFORMAT\s*=\s*(\w+)\s*)?(?:PATTERN\s*=\s*('[^']+'|"[^"]+")\s*)?;?\s*""".r

  /** Strip one layer of '…', "…", or `…` quoting, if any. */
  private def unquoteAny(s: String): String = {
    val t = s.trim
    if (t.length >= 2 &&
        ((t.startsWith("'") && t.endsWith("'")) ||
          (t.startsWith("\"") && t.endsWith("\"")) ||
          (t.startsWith("`") && t.endsWith("`"))))
      t.substring(1, t.length - 1)
    else t
  }

  /** `'k1' = 'v1', k2 = v2` → pairs. Quotes strip one layer; commas
    * split top-level entries (quoted commas are not supported — use the
    * library API for exotic values). */
  private def parseKvList(s: String): Seq[(String, String)] =
    s.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { e =>
      val i = e.indexOf('=')
      require(i > 0, s"malformed TBLPROPERTIES entry: $e")
      unquoteAny(e.take(i)) -> unquoteAny(e.drop(i + 1))
    }

  private def unquoteId(s: String): String = {
    val t = s.trim
    if (t.startsWith("`") && t.endsWith("`") && t.length >= 2)
      t.substring(1, t.length - 1)
    else t
  }

  /** Is `raw` a graft target this parser owns? Quoted paths always are;
    * identifiers only when the session catalog says provider=graft —
    * otherwise Spark's own ALTER TABLE grammar must see the statement. */
  private def graftTarget(raw: String): Boolean = {
    val t = raw.trim
    if (t.startsWith("'") || t.startsWith("\"")) true
    else try {
      val spark = SparkSession.active
      val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(t)
      GraftCatalog.pathOf(spark, parts).isDefined
    } catch { case scala.util.control.NonFatal(_) => false }
  }

  private[plans] def parseMaintenance(sql: String): Option[LogicalPlan] =
    sql match {
      case VacuumStmt(target, hours, keep, dry) if dry != null =>
        // DRY RUN is metadata-eager like DESCRIBE HISTORY: the
        // would-delete list comes back as rows, nothing is deleted
        Some(GraftTableFunctions.vacuumDryRows(
          resolveTarget(SparkSession.active, target),
          Option(keep).map(_.toInt).getOrElse(0),
          Option(hours).map(_.toLong * 3600L * 1000L).getOrElse(0L)))
      case VacuumStmt(target, hours, keep, _) =>
        Some(GraftVacuumCommand(target,
          Option(hours).map(_.toLong), Option(keep).map(_.toInt)))
      case ZOrderWhereStmt(target, whereCol, eqV, loV, hiV, colList, files) =>
        Some(GraftZOrderCommand(target,
          colList.split(",").toSeq.map(c => unquoteId(c.trim)),
          Option(files).map(_.toInt),
          Some(scopeOf(whereCol, eqV, loV, hiV))))
      case ZOrderStmt(target, colList, files) =>
        Some(GraftZOrderCommand(target,
          colList.split(",").toSeq.map(c => unquoteId(c.trim)),
          Option(files).map(_.toInt)))
      case OptimizeStmt(target, whereCol, eqV, loV, hiV, small) =>
        Some(GraftOptimizeCommand(target, Option(small).map(_.toLong),
          Option(whereCol).map(c => scopeOf(c, eqV, loV, hiV))))
      case RestoreStmt(target, kind, asOf) =>
        Some(GraftRestoreCommand(target,
          kind.equalsIgnoreCase("VERSION"), unquote(asOf)))
      case HistoryStmt(target) =>
        // metadata-eager, like the graft_history table function it
        // shares rows with — a handful of bounded manifest reads
        Some(GraftTableFunctions.history(Seq(
          org.apache.spark.sql.catalyst.expressions.Literal(
            resolveTarget(SparkSession.active, target)))))
      case DetailStmt(target) =>
        Some(GraftTableFunctions.detail(Seq(
          org.apache.spark.sql.catalyst.expressions.Literal(
            resolveTarget(SparkSession.active, target)))))
      case ShowStagesStmt(target) if graftTarget(target) =>
        Some(GraftTableFunctions.stages(Seq(
          org.apache.spark.sql.catalyst.expressions.Literal(
            resolveTarget(SparkSession.active, target)))))
      case ShowTagsStmt(target) if graftTarget(target) =>
        Some(GraftTableFunctions.tagsList(Seq(
          org.apache.spark.sql.catalyst.expressions.Literal(
            resolveTarget(SparkSession.active, target)))))
      case ShowPartitionsStmt(target) if graftTarget(target) =>
        // metadata-eager, shares rows with the graft_partitions TVF
        Some(GraftTableFunctions.partitions(Seq(
          org.apache.spark.sql.catalyst.expressions.Literal(
            resolveTarget(SparkSession.active, target)))))
      case AlterAddCheckStmt(target, name, expr) if graftTarget(target) =>
        Some(GraftAlterCommand(target, "add-check",
          Seq(unquoteId(name), expr.trim)))
      case AlterDropCheckStmt(target, name) if graftTarget(target) =>
        Some(GraftAlterCommand(target, "drop-check", Seq(unquoteId(name))))
      case AlterAddColDefaultStmt(target, name, typeDdl, dflt)
          if graftTarget(target) =>
        Some(GraftAlterCommand(target, "add-column-default",
          Seq(unquoteId(name), typeDdl.trim, dflt.trim)))
      case AlterAddColsStmt(target, colsDdl) if graftTarget(target) =>
        Some(GraftAlterCommand(target, "add-columns", Seq(colsDdl.trim)))
      case AlterDropColStmt(target, col) if graftTarget(target) =>
        Some(GraftAlterCommand(target, "drop-column", Seq(unquoteId(col))))
      case AlterRenameColStmt(target, from, to) if graftTarget(target) =>
        Some(GraftAlterCommand(target, "rename-column",
          Seq(unquoteId(from), unquoteId(to))))
      case AlterNotNullStmt(target, col) if graftTarget(target) =>
        Some(GraftAlterCommand(target, "set-not-null", Seq(unquoteId(col))))
      case SetTblPropsStmt(target, kvs) if graftTarget(target) =>
        Some(GraftAlterCommand(target, "set-props",
          parseKvList(kvs).sortBy(_._1).flatMap(kv => Seq(kv._1, kv._2))))
      case UnsetTblPropsStmt(target, ks) if graftTarget(target) =>
        Some(GraftAlterCommand(target, "unset-props",
          ks.split(",").toSeq.map(k => unquoteAny(k.trim)).filter(_.nonEmpty)))
      case ShowTblPropsStmt(target) if graftTarget(target) =>
        Some(GraftTableFunctions.tblProperties(
          resolveTarget(SparkSession.active, target)))
      case AlterColTypeStmt(target, col, typeDdl) if graftTarget(target) =>
        Some(GraftAlterCommand(target, "alter-type",
          Seq(unquoteId(col), typeDdl.trim)))
      case AlterSetDefaultStmt(target, col, dflt) if graftTarget(target) =>
        Some(GraftAlterCommand(target, "set-default",
          Seq(unquoteId(col), dflt.trim)))
      case AlterDropDefaultStmt(target, col) if graftTarget(target) =>
        Some(GraftAlterCommand(target, "drop-default", Seq(unquoteId(col))))
      case AlterSetTagStmt(target, name, version) if graftTarget(target) =>
        Some(GraftAlterCommand(target, "set-tag",
          Seq(unquoteAny(name)) ++ Option(version).toSeq))
      case AlterDropTagStmt(target, name) if graftTarget(target) =>
        Some(GraftAlterCommand(target, "drop-tag", Seq(unquoteAny(name))))
      case AlterPublishStageStmt(target, id) if graftTarget(target) =>
        Some(GraftAlterCommand(target, "publish-stage",
          Seq(unquoteAny(id))))
      case AlterAbortStaleStagesStmt(target, n, unit)
          if graftTarget(target) =>
        Some(GraftAlterCommand(target, "abort-stale-stages",
          Seq(n, unit.toUpperCase)))
      case AlterAbortStageStmt(target, id) if graftTarget(target) =>
        Some(GraftAlterCommand(target, "abort-stage", Seq(unquoteAny(id))))
      case AlterSetPartStmt(target, entries) if graftTarget(target) =>
        // paren-aware split: bucket(8, k) holds a comma of its own
        Some(GraftAlterCommand(target, "set-partition-spec",
          graft.io.TxnTable.splitTopLevel(entries).map(e =>
            e.replaceAll("`", "")))) // backticked inner ids → plain
      case AlterUnpartStmt(target) if graftTarget(target) =>
        Some(GraftAlterCommand(target, "set-partition-spec", Nil))
      case ConvertStmt(target, stats) =>
        Some(GraftConvertCommand(unquote(target),
          Option(stats).toSeq.flatMap(_.split(",").toSeq)
            .map(c => unquoteId(c.trim)).filter(_.nonEmpty)))
      case ReorgStmt(target) if graftTarget(target) =>
        Some(GraftReorgCommand(target))
      case AnalyzeStmt(target, allCols, cols) if graftTarget(target) =>
        // the bare form (no FOR clause) is Spark's cheap TABLE-level
        // analysis — the manifest already tracks exact row counts and
        // sizes, so it's a provable no-op here, NOT a full NDV scan
        Some(GraftAnalyzeCommand(target,
          Option(cols).toSeq.flatMap(_.split(",").toSeq)
            .map(c => unquoteId(c.trim)).filter(_.nonEmpty),
          ndv = allCols != null || cols != null))
      case CopyIntoStmt(target, source, format, pattern) if graftTarget(target) =>
        Some(GraftCopyIntoCommand(target, unquote(source),
          Option(format).map(_.toLowerCase).getOrElse("parquet"),
          Option(pattern).map(unquote).getOrElse("*")))
      case InsertReplaceWhereStmt(target, pred, select)
          if graftTarget(target) =>
        Some(GraftReplaceWhereInsertCommand(target, pred.trim, select.trim))
      case InsertStageStmt(target, id, select) if graftTarget(target) =>
        Some(GraftStageInsertCommand(target, unquoteAny(id), select.trim))
      case CloneStmt(target, mode, source, version) if graftTarget(source) =>
        Some(GraftCloneCommand(target, source,
          deep = mode.equalsIgnoreCase("deep"),
          Option(version).map(_.toLong)))
      case CreateLikeStmt(target, source) if graftTarget(source) =>
        Some(GraftCloneCommand(target, source, deep = false, None,
          like = true))
      case _ => None
    }

  /** OPTIMIZE WHERE scope as an inclusive [lo, hi] range: equality is
    * the degenerate v..v range (same containment test either way). */
  private def scopeOf(col: String, eqV: String, loV: String,
                      hiV: String): (String, Any, Any) =
    if (eqV != null) {
      val v = literalValue(eqV); (unquoteId(col), v, v)
    } else (unquoteId(col), literalValue(loV), literalValue(hiV))

  /** A scalar literal from the OPTIMIZE WHERE grammar: quoted → string,
    * else integral → Long, decimal → Double, anything else verbatim
    * (dates/timestamps normalize downstream against the column type). */
  private def literalValue(t0: String): Any = {
    val t = t0.trim
    if (t.startsWith("'") || t.startsWith("\"")) unquote(t)
    else t.toLongOption.getOrElse(
      t.toDoubleOption.getOrElse(t): Any)
  }

  private def unquote(t0: String): String = {
    val t = t0.trim
    if ((t.startsWith("'") && t.endsWith("'") && t.length >= 2) ||
        (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2))
      t.substring(1, t.length - 1)
    else t
  }

  /** After a manifest-level schema change (ALTER TABLE, first COPY INTO
    * into a declared-empty table), push the new snapshot schema into the
    * session catalog entry for identifier targets — `spark.table(name)`
    * resolves through the CATALOG's stored schema, which CREATE TABLE
    * froze at creation time. Quoted-path targets have no catalog entry
    * and need nothing. */
  private[plans] def syncCatalogSchema(spark: SparkSession, raw: String): Unit = {
    val t = raw.trim
    if (t.startsWith("'") || t.startsWith("\"")) return
    try {
      val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(t)
      val ident = parts match {
        case Seq(tb) => TableIdentifier(tb)
        case Seq(db, tb) => TableIdentifier(tb, Some(db))
        case Seq(cat, db, tb) if cat.equalsIgnoreCase("spark_catalog") =>
          TableIdentifier(tb, Some(db))
        case _ => return
      }
      val catalog = spark.sessionState.catalog
      if (!catalog.tableExists(ident)) return
      val path = GraftCatalog.pathOf(spark, parts).getOrElse(return)
      TxnTable.latestVersion(spark, path)
        .flatMap(v => TxnTable.snapshotSchema(spark, path, v))
        .foreach { s =>
          val meta = catalog.getTableMetadata(ident)
          catalog.alterTable(meta.copy(schema = s))
          catalog.refreshTable(ident)
        }
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Quoted target = literal path; identifier target = session-catalog
    * graft table (resolved at execution, so DROP/CREATE between parse
    * and run behave as expected). */
  private[plans] def resolveTarget(spark: SparkSession, raw: String): String = {
    val t = raw.trim
    if (t.startsWith("'") || t.startsWith("\"")) unquote(t)
    else {
      val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(t)
      GraftCatalog.pathOf(spark, parts).getOrElse(
        throw new IllegalArgumentException(
          s"$t is not a graft table — VACUUM/OPTIMIZE apply to graft " +
            "tables only (use a quoted path for path-addressed tables)"))
    }
  }
}

case class GraftVacuumCommand(target: String, retainHours: Option[Long],
                              keepVersions: Option[Int])
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

case class GraftOptimizeCommand(target: String, smallBytes: Option[Long],
                                scope: Option[(String, Any, Any)] = None)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** OPTIMIZE … [WHERE col = v] ZORDER BY (c1, c2, …) — Morton-curve
  * re-clustering, whole-table or scoped to the predicate's files. */
case class GraftZOrderCommand(target: String, cols: Seq[String],
                              targetFiles: Option[Int],
                              scope: Option[(String, Any, Any)] = None)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** `byVersion`: asOf is a version number; else a timestamp string in
  * the reader's `timestampAsOf` grammar (epoch millis or UTC
  * date/datetime). */
case class GraftRestoreCommand(target: String, byVersion: Boolean,
                               asOf: String)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** ALTER TABLE on a graft table. `kind` selects the operation; `args`
  * carries its operands (column DDL, names, or constraint SQL). */
case class GraftAlterCommand(target: String, kind: String, args: Seq[String])
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** In-place adoption of an existing parquet directory (CONVERT TO
  * GRAFT — Delta 0.7's CONVERT TO DELTA). Path-addressed only: the
  * target is not a catalog table until someone registers it. */
case class GraftConvertCommand(target: String, statsCols: Seq[String])
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** Idempotent batch file ingestion (COPY INTO). */
case class GraftCopyIntoCommand(target: String, source: String,
                                format: String, pattern: String)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** Scoped-overwrite ingest (INSERT INTO … REPLACE WHERE … SELECT …). */
case class GraftReplaceWhereInsertCommand(target: String, pred: String,
                                          select: String)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** Staged ingest (INSERT INTO … STAGE 'id' SELECT …): the rows land
  * as a write-audit-publish stage, invisible until published. */
case class GraftStageInsertCommand(target: String, id: String,
                                   select: String)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** Table fork (CREATE TABLE … SHALLOW|DEEP CLONE … / … LIKE …):
  * shallow = one manifest referencing the source files; deep =
  * materialized full copy, independent of the source's lifecycle;
  * like = STRUCTURE only (schema/constraints/properties/partition
  * spec, no files, fresh history). */
case class GraftCloneCommand(target: String, source: String,
                             deep: Boolean, version: Option[Long],
                             like: Boolean = false)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** ANALYZE TABLE … COMPUTE STATISTICS — with a FOR clause (`ndv`),
  * one aggregate pass computing approx column NDV, persisted as the
  * advisory `_ndv` sidecar the scan reports to the cost-based
  * optimizer; empty `cols` = all NDV-supported columns. The bare form
  * (`ndv = false`) is Spark's cheap table-level analysis — the
  * manifest already tracks exact row counts, so it's a no-op, not a
  * full scan. */
case class GraftAnalyzeCommand(target: String, cols: Seq[String],
                               ndv: Boolean = true)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** REORG TABLE … APPLY (PURGE) — rewrite only delete-affected files. */
case class GraftReorgCommand(target: String)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

object GraftMaintenanceStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GraftVacuumCommand(target, hours, keep) =>
      GraftDmlExec(s"VACUUM $target", () => {
        val spark = SparkSession.active
        TxnTable.vacuum(spark, GraftSqlParser.resolveTarget(spark, target),
          keep = keep.getOrElse(0),
          retainMs = hours.map(_ * 3600L * 1000L).getOrElse(0L))
      }) :: Nil
    case GraftZOrderCommand(target, cols, files, scope) =>
      GraftDmlExec(s"OPTIMIZE $target ZORDER BY (${cols.mkString(", ")})",
        () => {
          val spark = SparkSession.active
          val path = GraftSqlParser.resolveTarget(spark, target)
          scope match {
            case Some((c, lo, hi)) =>
              TxnTable.zorderWhere(spark, path, cols, c, lo, hi, files)
            case None => TxnTable.zorderBy(spark, path, cols, files)
          }
          ()
        }) :: Nil
    case GraftOptimizeCommand(target, small, scope) =>
      GraftDmlExec(s"OPTIMIZE $target", () => {
        val spark = SparkSession.active
        // checkpoint = true: the compaction writes a FULL manifest, so
        // a follow-up VACUUM can reclaim the packed small-file history
        TxnTable.compactSmall(spark,
          GraftSqlParser.resolveTarget(spark, target),
          smallBytes = small.getOrElse(32L << 20), checkpoint = true,
          scope = scope)
        ()
      }) :: Nil
    case GraftRestoreCommand(target, byVersion, asOf) =>
      GraftDmlExec(s"RESTORE $target", () => {
        val spark = SparkSession.active
        val table = GraftSqlParser.resolveTarget(spark, target)
        val v =
          if (byVersion) asOf.toLong
          else TxnTable.versionAt(spark, table, TxnTable.parseUtcMillis(asOf))
            .getOrElse(throw new IllegalStateException(
              s"$table has no version committed at or before $asOf"))
        TxnTable.restore(spark, table, v)
        ()
      }) :: Nil
    case GraftAlterCommand(target, kind, args) =>
      GraftDmlExec(s"ALTER TABLE $target ($kind)", () => {
        val spark = SparkSession.active
        val table = GraftSqlParser.resolveTarget(spark, target)
        kind match {
          case "add-columns" =>
            // `ADD COLUMNS (s.f BIGINT)` — a dotted first token routes
            // to nested evolution; plain DDL parses as a column list
            val NestedCol = """(?s)\s*([\w]+(?:\.[\w]+)+)\s+(.+)""".r
            val NestedDefault =
              """(?is)(.+?)\s+DEFAULT\s+(.+)""".r
            args.head match {
              case NestedCol(path, NestedDefault(ddl, dflt)) =>
                TxnTable.addNestedColumnWithDefault(spark, table, path,
                  spark.sessionState.sqlParser.parseDataType(ddl.trim),
                  dflt.trim)
              case NestedCol(path, ddl) =>
                TxnTable.addNestedColumn(spark, table, path,
                  spark.sessionState.sqlParser.parseDataType(ddl.trim))
              case ddl =>
                TxnTable.addColumns(spark, table,
                  spark.sessionState.sqlParser.parseTableSchema(ddl))
            }
          case "add-column-default" =>
            TxnTable.addColumnWithDefault(spark, table, args(0),
              spark.sessionState.sqlParser.parseDataType(args(1)), args(2))
          case "drop-column" =>
            if (args.head.contains('.'))
              TxnTable.dropNestedColumn(spark, table, args.head)
            else TxnTable.dropColumn(spark, table, args.head)
          case "rename-column" =>
            // nested renames need parquet field-ID mapping (the id, not
            // the name, resolves old files) — renameNestedColumn
            // enforces that and refuses on name-mode tables with the
            // supported workaround; top-level renames work on both
            // (aliases on name-mode, pure metadata on id-mode)
            if (args.head.contains('.'))
              TxnTable.renameNestedColumn(spark, table, args(0), args(1))
            else TxnTable.renameColumn(spark, table, args(0), args(1))
          case "add-check" =>
            TxnTable.addCheck(spark, table, args(0), args(1))
          case "drop-check" =>
            TxnTable.dropCheck(spark, table, args.head)
          case "set-not-null" =>
            // NOT NULL is a named check, so DROP CONSTRAINT can undo it
            TxnTable.addCheck(spark, table, s"${args.head}_not_null",
              s"`${args.head}` IS NOT NULL")
          case "alter-type" =>
            TxnTable.alterColumnType(spark, table, args(0),
              spark.sessionState.sqlParser.parseDataType(args(1)))
          case "set-default" =>
            TxnTable.setColumnDefault(spark, table, args(0), Some(args(1)))
          case "drop-default" =>
            TxnTable.setColumnDefault(spark, table, args(0), None)
          case "set-tag" =>
            TxnTable.setTag(spark, table, args.head,
              args.drop(1).headOption.map(_.toLong))
          case "drop-tag" =>
            TxnTable.deleteTag(spark, table, args.head)
          case "publish-stage" =>
            TxnTable.publishStage(spark, table, args.head)
          case "abort-stage" =>
            TxnTable.abortStage(spark, table, args.head)
          case "abort-stale-stages" =>
            val unitMs =
              if (args(1).startsWith("HOUR")) 3600000L
              else if (args(1).startsWith("MINUTE")) 60000L
              else 1000L
            TxnTable.abortStagesOlderThan(spark, table,
              args(0).toLong * unitMs)
            ()
          case "set-props" =>
            TxnTable.setProperties(spark, table,
              args.grouped(2).map(p => p(0) -> p(1)).toMap)
          case "unset-props" =>
            TxnTable.unsetProperties(spark, table, args)
          case "set-partition-spec" =>
            TxnTable.setPartitionSpec(spark, table, args)
          case other => throw new IllegalStateException(
            s"unknown ALTER kind $other")
        }
        GraftSqlParser.syncCatalogSchema(spark, target)
      }) :: Nil
    case GraftConvertCommand(target, statsCols) =>
      GraftDmlExec(s"CONVERT TO GRAFT $target", () => {
        TxnTable.convert(SparkSession.active, target, statsCols)
        ()
      }) :: Nil
    case GraftAnalyzeCommand(target, cols, ndv) =>
      GraftDmlExec(s"ANALYZE TABLE $target", () => {
        if (ndv) {
          val spark = SparkSession.active
          TxnTable.analyzeTable(spark,
            GraftSqlParser.resolveTarget(spark, target), cols)
        }
        ()
      }) :: Nil
    case GraftReorgCommand(target) =>
      GraftDmlExec(s"REORG TABLE $target", () => {
        val spark = SparkSession.active
        TxnTable.reorgPurge(spark,
          GraftSqlParser.resolveTarget(spark, target))
        ()
      }) :: Nil
    case GraftCopyIntoCommand(target, source, format, pattern) =>
      GraftDmlExec(s"COPY INTO $target", () => {
        val spark = SparkSession.active
        val table = GraftSqlParser.resolveTarget(spark, target)
        TxnTable.copyInto(spark, table, source, format, pattern)
        GraftSqlParser.syncCatalogSchema(spark, target)
      }) :: Nil
    case GraftReplaceWhereInsertCommand(target, pred, select) =>
      GraftDmlExec(s"INSERT INTO $target REPLACE WHERE $pred", () => {
        val spark = SparkSession.active
        val table = GraftSqlParser.resolveTarget(spark, target)
        spark.sql(select).write.format("graft")
          .option("replaceWhere", pred).mode("overwrite").save(table)
        GraftSqlParser.syncCatalogSchema(spark, target)
      }) :: Nil
    case GraftStageInsertCommand(target, id, select) =>
      GraftDmlExec(s"INSERT INTO $target STAGE $id", () => {
        val spark = SparkSession.active
        val table = GraftSqlParser.resolveTarget(spark, target)
        spark.sql(select).write.format("graft")
          .option("stageId", id).mode("append").save(table)
        ()
      }) :: Nil
    case GraftCloneCommand(target, source, deep, version, like) =>
      val mode = if (like) "LIKE" else if (deep) "DEEP" else "SHALLOW"
      def clone(spark: SparkSession, src: String, dst: String): Long =
        if (like) TxnTable.createLike(spark, src, dst)
        else if (deep) TxnTable.cloneDeep(spark, src, dst, version)
        else TxnTable.cloneShallow(spark, src, dst, version)
      GraftDmlExec(s"$mode CLONE $source", () => {
        val spark = SparkSession.active
        val src = GraftSqlParser.resolveTarget(spark, source)
        val t = target.trim
        if (t.startsWith("'") || t.startsWith("\"")) {
          // path-addressed clone: no catalog entry
          clone(spark, src, GraftSqlParser.resolveTarget(spark, t))
          ()
        } else {
          // identifier clone: materialize under the warehouse default
          // location and register a graft catalog entry over it
          val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(t)
          val ident = parts match {
            case Seq(tb) => TableIdentifier(tb)
            case Seq(db, tb) => TableIdentifier(tb, Some(db))
            case _ => throw new IllegalArgumentException(
              s"unsupported clone target identifier $t")
          }
          val catalog = spark.sessionState.catalog
          require(!catalog.tableExists(ident),
            s"table $t already exists — $mode CLONE creates a NEW table")
          val loc = catalog.defaultTablePath(ident)
          val path = new Path(loc).toUri.getPath
          clone(spark, src, path)
          val schema = TxnTable.snapshotSchema(spark, path, 1L).get
          import org.apache.spark.sql.catalyst.catalog.{
            CatalogStorageFormat, CatalogTable, CatalogTableType}
          catalog.createTable(CatalogTable(
            identifier = ident,
            tableType = CatalogTableType.EXTERNAL,
            storage = CatalogStorageFormat.empty.copy(
              locationUri = Some(new java.net.URI(s"file:$path")),
              properties = Map("path" -> path)),
            schema = schema,
            provider = Some("graft")), ignoreIfExists = false)
          ()
        }
      }) :: Nil
    case _ => Nil
  }
}
