package graft.plans

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, EqualNullSafe, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, Join, JoinHint, LocalRelation, LogicalPlan, MergeIntoTable, Project, Union, UpdateTable, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.{GraftDataSource, GraftTable, TxnTable}

/** MERGE-ON-READ deletes, applied DECLARATIVELY: every graft relation
  * whose pinned snapshot carries live equality-delete files
  * (`TxnTable.deleteWhereMoR` — the deletion-vector answer for point
  * deletes at 100 TB) is rewritten during analysis into
  *
  *   Project(original output attrs,
  *     Union over gate groups(
  *       AntiJoin(scan(group's files), delete tuples, null-safe keys)))
  *
  * so the subtraction is an ordinary Catalyst plan: the delete side is
  * a few kilobytes of parquet, so the optimizer BROADCASTS the
  * anti-join (no shuffle), column pruning still reaches the data scan
  * (the join only adds the delete's key columns), and every read path
  * — SQL, DataFrame, time travel, the DML phases' own snapshot reads —
  * inherits the semantics without a custom reader. Files are grouped
  * by their APPLICABLE delete set (a delete gates only files added at
  * earlier versions — Iceberg's sequence-number rule), so rows
  * appended after a delete are never joined against it at all.
  *
  * Scale shape: planning cost is one manifest-chain read per relation;
  * execution adds one broadcast anti-join per live delete file —
  * exactly the merge-on-read read amplification OPTIMIZE/compact
  * materializes away.
  *
  * Boundaries (each shielded subtree owns its own delete handling):
  *   - DML targets (UPDATE/DELETE/MERGE): the GraftDml lowering reads
  *     its snapshots through fresh graft reads where this rule applies,
  *     and its file-surgical phase 1 needs the BARE relation;
  *   - write targets (INSERT/AppendData/Overwrite...): rewriting the
  *     sink relation would corrupt the write plan;
  *   - `ignoreDeletes=true` reader option: the explicit raw escape
  *     hatch (and this rule's own recursion guard);
  *   - change-feed reads: the feed is a log, not a snapshot. */
case class GraftApplyDeletes(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val shielded = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    plan.foreach {
      case u: UpdateTable => u.table.foreach(shielded.add)
      case d: DeleteFromTable => d.table.foreach(shielded.add)
      case m: MergeIntoTable => m.targetTable.foreach(shielded.add)
      case w: V2WriteCommand => w.table.foreach(shielded.add)
      case i: InsertIntoStatement => i.table.foreach(shielded.add)
      case _ => ()
    }
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation if !shielded.contains(r) && eligible(r) =>
        rewrite(r)
    }
  }

  private def eligible(r: DataSourceV2Relation): Boolean = r.table match {
    case t: GraftTable =>
      !r.options.containsKey("ignoreDeletes") &&
        !r.options.containsKey("graftRuleSubset") &&
        !Option(r.options.get("readChangeFeed")).exists(_.toBoolean) &&
        // POSITIONAL vectors apply INSIDE the DSv2 scan now
        // (GraftVecBatch) — this rule only handles EQUALITY deletes...
        (t.morMeta.dels.exists(_.keyCols != TxnTable.PosDelKeyCols) ||
          // ...and NESTED existence defaults: pre-declaration files
          // need the read-time fill projection (Spark's readers only
          // fill missing TOP-LEVEL columns from EXISTS_DEFAULT)
          TxnTable.nestedDefaults(t.schema())
            .exists(nd => nd.existsSql.isDefined && nd.sinceV > 0L))
    case _ => false
  }

  private def rewrite(r: DataSourceV2Relation): LogicalPlan = {
    val t = r.table.asInstanceOf[GraftTable]
    val ms = t.morMeta
    val schema = t.schema()
    // gates(): the version gate for both flavors, AND — for positional
    // vectors that recorded their file list at commit — only the files
    // the vector actually names. That confinement is what keeps the
    // 100 TB fast path alive under a live deletion vector: every
    // un-named file groups WITHOUT the positional delete and keeps the
    // DSv2 scan (manifest-stats/bloom file skipping, agg pushdown);
    // only the vector's own files take the identity-subtraction branch.
    def applicable(f: String): Seq[TxnTable.DelMeta] =
      ms.dels.filter(d => d.keyCols != TxnTable.PosDelKeyCols &&
        d.gates(f, ms.addv.getOrElse(f, 0L)))
    // nested existence defaults join the group key: files predating a
    // defaulted nested field's declaration take a fill projection leg
    val ndefs = TxnTable.nestedDefaults(schema)
      .filter(nd => nd.existsSql.isDefined && nd.sinceV > 0L)
    def vintage(f: String): Seq[TxnTable.NestedDefault] =
      ndefs.filter(nd => ms.addv.getOrElse(f, 0L) < nd.sinceV)
    val groups = ms.files.groupBy(f => (applicable(f), vintage(f)))
      .toSeq.sortBy(_._2.head)
    if (groups.isEmpty) return LocalRelation(r.output) // all-deleted table
    // NOTHING applies to any file (the delete entries are gate-dead and
    // every file postdates every default — the steady state after
    // OPTIMIZE materializes): keep the ORIGINAL relation, with its V2
    // statistics, runtime-filter, and aggregate-pushdown surfaces
    // intact, instead of pinning an equivalent subset scan forever
    if (groups.size == 1 && groups.head._1._1.isEmpty &&
        groups.head._1._2.isEmpty)
      return r
    val branches: Seq[LogicalPlan] = groups.map { case ((dels, vdefs), fs) =>
      def filled(p: LogicalPlan): LogicalPlan =
        if (vdefs.isEmpty) p
        else TxnTable.fillNestedDefaults(GraftBridge.ofRows(spark, p), vdefs)
          .queryExecution.analyzed
      val scan = subsetRelation(t, schema, fs)
      filled(dels.foldLeft(scan: LogicalPlan) { (left, d) =>
        // tuple sidecars are library-written and resolve BY NAME — the
        // requested key schema must not carry field ids
        val keySchema = graft.io.FieldIds.strip(
          StructType(d.keyCols.map(k => schema(k))))
        val right = GraftBridge.parquetRelation(
          spark, Seq(s"${t.tablePath}/${d.file}"), keySchema)
        val cond = d.keyCols.map { k =>
          EqualNullSafe(
            left.output.find(_.name == k).getOrElse(throw new IllegalStateException(
              s"delete key '$k' missing from ${t.tablePath}'s read schema")),
            right.output.find(_.name == k).get)
        }.reduce[Expression](And(_, _))
        Join(left, right, LeftAnti, Some(cond), JoinHint.NONE)
      })
    }
    val combined = if (branches.size == 1) branches.head else Union(branches)
    // parents reference the ORIGINAL relation's attribute ids — alias
    // the rewritten plan's columns back onto them
    val aliases: Seq[NamedExpression] = r.output.zip(combined.output).map {
      case (o, u) => Alias(u, o.name)(exprId = o.exprId,
        qualifier = o.qualifier, explicitMetadata = Some(o.metadata))
    }
    Project(aliases, combined)
  }

  /** The same pinned relation a reader would build, restricted to one
    * gate group's files and marked delete-exempt (recursion guard). */
  private def subsetRelation(t: GraftTable, schema: StructType,
                             files: Seq[String]): DataSourceV2Relation = {
    val opts = new java.util.HashMap[String, String]()
    opts.put("path", t.tablePath)
    opts.put("versionAsOf", t.pinnedVersion.toString)
    opts.put("filesSubset", files.mkString(","))
    // recursion guard ONLY — unlike `ignoreDeletes`, the subset's scan
    // still applies its files' positional vectors in-scan
    opts.put("graftRuleSubset", "true")
    val csm = new CaseInsensitiveStringMap(opts)
    val provider = new GraftDataSource()
    val table = provider.getTable(schema, Array.empty[Transform],
      csm.asCaseSensitiveMap())
    DataSourceV2Relation.create(table, None, None, csm)
  }
}
