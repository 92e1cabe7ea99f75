package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Coalesce, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, LogicalPlan, MergeIntoTable, Project, UpdateTable, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.{GraftDataSource, GraftTable}

/** COLUMN-MAPPING reads for the DSv2 path (zero-rewrite RENAME COLUMN):
  * a graft relation whose pinned snapshot carries `#alias=` entries is
  * rewritten during analysis into
  *
  *   Project(original attrs ← COALESCE(newName, oldName, ...),
  *     relation over the EXTENDED schema (logical + alias fields))
  *
  * The extended scan asks the parquet reader for BOTH physical names —
  * a file contains exactly one of them and surfaces the other as NULL
  * (a constant null vector, no extra I/O) — and one codegen'd COALESCE
  * restores the logical column. Same plan shape [[graft.io.TxnTable]]'s
  * own read paths use (`planFiles`); this rule extends it to SQL /
  * DataFrame reads over `USING graft` tables.
  *
  * Costs, stated honestly: filters on a renamed column become filters
  * over a COALESCE — file-level stats pruning still applies (the
  * manifest stats entries renamed with the column), but parquet
  * row-group pushdown and the metadata-only aggregate pushdown fall
  * back to ordinary scans. Rewrite churn (OPTIMIZE) migrates bytes to
  * the new name and the alias map drops with the last old file's
  * overwrite.
  *
  * Boundaries mirror [[GraftApplyDeletes]]: DML / write targets keep
  * the bare relation; `ignoreRenames=true` is the recursion guard. */
case class GraftResolveRenames(spark: SparkSession) extends Rule[LogicalPlan] {

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

  private def live(t: GraftTable): Map[String, Seq[String]] = {
    val names = t.schema().fieldNames.toSet
    t.morMeta.aliases.filter { case (l, as) => as.nonEmpty && names(l) }
  }

  /** A scan whose schema already CONTAINS an alias physical name is an
    * extended scan this rule (or a composed rewrite over one) produced —
    * extending it again would duplicate fields and prevent the
    * Resolution batch from reaching a fixpoint with GraftApplyDeletes
    * (each rule would forever rewrite the other's fresh relations). */
  private def alreadyExtended(t: GraftTable): Boolean = {
    val names = t.schema().fieldNames.toSet
    t.morMeta.aliases.values.flatten.exists(names)
  }

  private def eligible(r: DataSourceV2Relation): Boolean = r.table match {
    case t: GraftTable =>
      !r.options.containsKey("ignoreRenames") &&
        !Option(r.options.get("readChangeFeed")).exists(_.toBoolean) &&
        live(t).nonEmpty && !alreadyExtended(t)
    case _ => false
  }

  private def rewrite(r: DataSourceV2Relation): LogicalPlan = {
    val t = r.table.asInstanceOf[GraftTable]
    val aliases = live(t)
    val schema = t.schema()
    val extended = StructType(schema.fields.flatMap { f =>
      f +: aliases.getOrElse(f.name, Nil)
        .map(a => StructField(a, f.dataType)).toArray[StructField]
    })
    val inner = extendedRelation(t, extended, r)
    def attr(n: String) = inner.output.find(_.name == n).getOrElse(
      throw new IllegalStateException(
        s"alias column $n missing from ${t.tablePath}'s extended scan"))
    val projected: Seq[NamedExpression] = r.output.map { o =>
      val e = aliases.get(o.name) match {
        case Some(as) => Coalesce((o.name +: as).map(attr))
        case None => attr(o.name)
      }
      Alias(e, o.name)(exprId = o.exprId, qualifier = o.qualifier,
        explicitMetadata = Some(o.metadata))
    }
    Project(projected, inner)
  }

  /** The same pinned relation, re-opened over the extended (logical +
    * alias physical names) schema and marked rename-exempt. The
    * ORIGINAL relation's options carry over verbatim — in particular a
    * `filesSubset`/`ignoreDeletes` pair from GraftApplyDeletes, so the
    * composed plan (coalesce below the delete anti-join, per gate
    * group) keeps both rewrites' semantics and the Resolution batch
    * terminates. */
  private def extendedRelation(t: GraftTable, extended: StructType,
                               r: DataSourceV2Relation): DataSourceV2Relation = {
    val opts = new java.util.HashMap[String, String](r.options)
    opts.put("path", t.tablePath)
    opts.put("versionAsOf", t.pinnedVersion.toString)
    opts.put("ignoreRenames", "true")
    val csm = new CaseInsensitiveStringMap(opts)
    val provider = new GraftDataSource()
    val table = provider.getTable(extended, Array.empty[Transform],
      csm.asCaseSensitiveMap())
    DataSourceV2Relation.create(table, None, None, csm)
  }
}
