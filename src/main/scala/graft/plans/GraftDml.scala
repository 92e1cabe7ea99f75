package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, ExprId, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

import graft.io.{GraftTable, TxnTable}

/** SQL `UPDATE` and `MERGE INTO` for graft tables — the warehouse DML
  * spellings the reference's Postgres surface makes users expect (ref
  * `dags/s3-etl-wallet-csv.py:204-236`), mapped onto [[TxnTable]]'s
  * copy-on-write commit instead of Spark's `SupportsRowLevelOperations`
  * machinery: graft's commit protocol (pinned-CAS manifest publish,
  * file-surgical rewrite set, stats/bloom carry-forward) IS the
  * group-based row-level operation, so the analyzer rule below
  * intercepts the resolved `UpdateTable` / `MergeIntoTable` plans that
  * Spark's own `RewriteUpdateTable` / `RewriteMergeIntoTable` leave
  * untouched (the graft Table is not RLO-capable) and lowers them to a
  * command executing `TxnTable.rewriteCommit`.
  *
  * Scale shape (the part Spark's generic group-rewrite cannot know):
  * phase 1 finds the TOUCHED files through the graft DSv2 scan, so the
  * UPDATE's WHERE (and nothing else) drives manifest-stats + bloom file
  * skipping; phase 2 rewrites only those files, every other file
  * carries forward by reference — a predicate touching 0.1% of a
  * 100 TB table rewrites 0.1% of it. Requires the extension to be
  * installed at session build (`spark.sql.extensions=
  * graft.functions.GraftExtensions`): analyzer rules cannot be added to
  * a live session. */
object GraftDmlRewrite extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute

  private def graftTarget(p: LogicalPlan): Option[(Seq[Attribute], String)] =
    p.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        (r.output, r.table.asInstanceOf[GraftTable].tablePath)
    }

  /** Merge-expression resolution the analyzer SKIPS for graft targets:
    * ACCEPT_ANY_SCHEMA (needed for evolved appends) sets the relation's
    * `skipSchemaResolution`, which makes ResolveReferences leave every
    * merge action unresolved. This rule therefore resolves attribute
    * references itself — scoped per SQL MERGE rules (ON + matched: both
    * sides; insert values/conditions: source; not-matched-by-source:
    * target) — and expands `UPDATE *` / `INSERT *` against same-name
    * source columns. Partial progress is returned into the fixed point,
    * so ResolveFunctions etc. still handle the rest; only a FULLY
    * resolved merge is lowered to the command. */
  private def resolveMergeStep(m: MergeIntoTable): MergeIntoTable = {
    val resolver = org.apache.spark.sql.internal.SQLConf.get.resolver
    def res(scope: Seq[LogicalPlan])(e: Expression): Expression = e.transformUp {
      case u: UnresolvedAttribute =>
        scope.view.flatMap(p => p.resolve(u.nameParts, resolver))
          .headOption.getOrElse(u)
    }
    val both = Seq(m.targetTable, m.sourceTable)
    val tgt = Seq(m.targetTable)
    val src = Seq(m.sourceTable)
    val tgtOut = m.targetTable.output
    val srcOut = m.sourceTable.output
    // Star expansion is STRICT, like Spark/Delta: a target column with
    // no same-name source column fails analysis (silently landing NULLs
    // from a typo'd source column is worse than the error). WITH SCHEMA
    // EVOLUTION additionally assigns source-only columns — keyed by the
    // source attribute itself; the rewrite evolves the target schema.
    def starAssignments: Seq[Assignment] = {
      val base = tgtOut.map { t =>
        srcOut.find(s => resolver(s.name, t.name)) match {
          case Some(s) => Assignment(t, s)
          case None => throw new UnsupportedOperationException(
            s"MERGE INTO ... SET * / INSERT *: target column `${t.name}` " +
              "has no same-name source column — assign it explicitly")
        }
      }
      val extra =
        if (!m.withSchemaEvolution) Nil
        else srcOut.filterNot(s => tgtOut.exists(t => resolver(t.name, s.name)))
          .map(s => Assignment(s, s))
      base ++ extra
    }
    def rAssign(a: Assignment, valueScope: Seq[LogicalPlan]): Assignment =
      Assignment(res(tgt)(a.key), res(valueScope)(a.value))
    def rAction(a: MergeAction, matchedSide: Boolean): MergeAction = a match {
      case ua: UpdateAction =>
        val scope = if (matchedSide) both else tgt
        UpdateAction(ua.condition.map(res(scope)),
          ua.assignments.map(rAssign(_, scope)))
      case da: DeleteAction =>
        DeleteAction(da.condition.map(res(if (matchedSide) both else tgt)))
      case ia: InsertAction =>
        InsertAction(ia.condition.map(res(src)),
          ia.assignments.map(rAssign(_, src)))
      case us: UpdateStarAction =>
        UpdateAction(us.condition.map(res(both)), starAssignments)
      case is: InsertStarAction =>
        InsertAction(is.condition.map(res(src)), starAssignments)
      case other => other
    }
    m.copy(
      mergeCondition = res(both)(m.mergeCondition),
      matchedActions = m.matchedActions.map(rAction(_, matchedSide = true)),
      notMatchedActions = m.notMatchedActions.map(rAction(_, matchedSide = true)),
      notMatchedBySourceActions =
        m.notMatchedBySourceActions.map(rAction(_, matchedSide = false)))
  }

  private def mergeResolved(m: MergeIntoTable): Boolean =
    m.mergeCondition.resolved &&
      (m.matchedActions ++ m.notMatchedActions ++ m.notMatchedBySourceActions)
        .forall {
          case ua: UpdateAction =>
            ua.condition.forall(_.resolved) && ua.assignments.forall(a =>
              a.key.resolved && a.value.resolved)
          case da: DeleteAction => da.condition.forall(_.resolved)
          case ia: InsertAction =>
            ia.condition.forall(_.resolved) && ia.assignments.forall(a =>
              a.key.resolved && a.value.resolved)
          case _ => false
        }

  /** DELETE shapes the table's SupportsDelete path handles as METADATA
    * (point / closed-range on one column — GraftTable.deletePlan):
    * those must stay on Spark's DeleteFromTable plan, where they cost
    * zero-to-boundary I/O. Everything else (multi-column predicates,
    * IS NULL, open ranges, subqueries) lowers to the copy-on-write
    * rewrite below — full SQL DELETE coverage instead of an
    * unsupported-shape error. */
  private def metadataDeletable(cond: Option[Expression]): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    def col(e: Expression): Option[ExprId] = e match {
      case a: AttributeReference => Some(a.exprId)
      case _ => None
    }
    cond match {
      case None => false
      case Some(e) => e match {
        // literals must be NON-NULL in every shape, mirroring
        // GraftTable.deletePlan exactly — `k >= NULL AND k <= x` must
        // lower to the copy-on-write no-op, not reach SupportsDelete
        // where the null-guard would refuse the statement
        case EqualTo(a, Literal(v, _)) if col(a).isDefined && v != null => true
        case EqualTo(Literal(v, _), a) if col(a).isDefined && v != null => true
        case And(GreaterThanOrEqual(a, Literal(lo, _)),
            LessThanOrEqual(b, Literal(hi, _)))
            if col(a).isDefined && col(a) == col(b) &&
              lo != null && hi != null => true
        case And(LessThanOrEqual(a, Literal(hi, _)),
            GreaterThanOrEqual(b, Literal(lo, _)))
            if col(a).isDefined && col(a) == col(b) &&
              lo != null && hi != null => true
        case _ => false
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case u @ UpdateTable(target, assignments, condition)
        if u.resolved && graftTarget(target).isDefined =>
      val (out, path) = graftTarget(target).get
      GraftUpdateCommand(new UpdatePayload(path, out, assignments, condition))
    case d @ DeleteFromTable(target, condition)
        if d.resolved && graftTarget(target).isDefined &&
          (!metadataDeletable(Some(condition)) ||
            // merge-on-read tables route EVERY delete through the
            // command path — runDelete then commits an equality-delete
            // file instead of dropping/rewriting data files — and
            // positional-mode tables likewise (their contract is zero
            // data-file rewrites, which the metadata path's boundary
            // rewrite would violate)
            TxnTable.morEnabled(SparkSession.active,
              graftTarget(target).get._2) ||
            GraftDml.positionalDeletes(SparkSession.active,
              graftTarget(target).get._2)) =>
      val (out, path) = graftTarget(target).get
      GraftDeleteCommand(new DeletePayload(path, out, condition))
    case m: MergeIntoTable
        if m.targetTable.resolved && m.sourceTable.resolved &&
          graftTarget(m.targetTable).isDefined =>
      if (!mergeResolved(m)) resolveMergeStep(m) // progress; fixed point re-runs
      else {
        val (out, path) = graftTarget(m.targetTable).get
        GraftMergeCommand(new MergePayload(path, out, m.sourceTable,
          m.mergeCondition, m.matchedActions, m.notMatchedActions,
          m.notMatchedBySourceActions, m.withSchemaEvolution))
      }
  }
}

/** Plain (non-Product) holders: captured expressions/plans must NOT
  * surface as the command node's own `expressions`/`children` — a leaf
  * command with dangling attribute references would fail CheckAnalysis'
  * missing-input check. The payload is opaque to TreeNode reflection. */
final class UpdatePayload(
    val table: String,
    val targetOutput: Seq[Attribute],
    val assignments: Seq[Assignment],
    val condition: Option[Expression])

final class MergePayload(
    val table: String,
    val targetOutput: Seq[Attribute],
    val source: LogicalPlan,
    val condition: Expression,
    val matched: Seq[MergeAction],
    val notMatched: Seq[MergeAction],
    val notMatchedBySource: Seq[MergeAction],
    val withSchemaEvolution: Boolean = false)

final class DeletePayload(
    val table: String,
    val targetOutput: Seq[Attribute],
    val condition: Expression)

case class GraftUpdateCommand(payload: UpdatePayload)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

case class GraftDeleteCommand(payload: DeletePayload)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

case class GraftMergeCommand(payload: MergePayload)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

object GraftDmlStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GraftUpdateCommand(p) =>
      GraftDmlExec(s"UPDATE graft.`${p.table}`",
        () => GraftDml.runUpdate(SparkSession.active, p)) :: Nil
    case GraftMergeCommand(p) =>
      GraftDmlExec(s"MERGE INTO graft.`${p.table}`",
        () => GraftDml.runMerge(SparkSession.active, p)) :: Nil
    case GraftDeleteCommand(p) =>
      GraftDmlExec(s"DELETE FROM graft.`${p.table}`",
        () => GraftDml.runDelete(SparkSession.active, p)) :: Nil
    case _ => Nil
  }
}

/** Command-style exec: runs the rewrite exactly once on first collect
  * (the eager-command execution path), returns no rows. */
case class GraftDmlExec(label: String, run: () => Unit) extends LeafExecNode {
  override def output: Seq[Attribute] = Nil
  private lazy val done: Array[InternalRow] = { run(); Array.empty }
  override def executeCollect(): Array[InternalRow] = done
  override protected def doExecute(): RDD[InternalRow] = {
    done
    sparkContext.emptyRDD[InternalRow]
  }
  override def simpleString(maxFields: Int): String = s"GraftDmlExec $label"
}

private[plans] object GraftDml extends org.apache.spark.internal.Logging {

  /** `TBLPROPERTIES ('graft.deleteMode' = 'positional')` — every SQL
    * DELETE commits a deletion vector (exact coordinates) instead of
    * an equality tuple set or a copy-on-write rewrite. The matching
    * `graft.updateMode` routes SQL UPDATE through the positional
    * UPDATE (append the changed rows + a vector of the originals). */
  private[plans] def positionalMode(spark: SparkSession, table: String,
                                    key: String): Boolean =
    try TxnTable.tableProperties(spark, table)
      .get(key).contains("positional")
    catch { case _: IllegalStateException => false }

  private[plans] def positionalDeletes(spark: SparkSession,
                                       table: String): Boolean =
    positionalMode(spark, table, "graft.deleteMode")

  /** Attribute of `df`'s analyzed plan named `name` (resolution-rule
    * output names match the committed schema's exactly). */
  private def attrOf(df: DataFrame, name: String): Attribute =
    GraftBridge.analyzedOutput(df).find(_.name == name).getOrElse(
      throw new IllegalStateException(
        s"rewrite frame lost column $name — schema changed concurrently?"))

  /** Captured expression → Column over the CURRENT rewrite frames:
    * target references (captured exprIds) re-point at `targetDf`'s
    * attributes by name; anything else (source references, literals)
    * passes through by exprId. */
  private def subst(e: Expression, byId: Map[ExprId, String],
                    targetDf: DataFrame): Column =
    GraftBridge.column(e.transform {
      case a: AttributeReference if byId.contains(a.exprId) =>
        attrOf(targetDf, byId(a.exprId))
    })

  private def keyName(k: Expression, byId: Map[ExprId, String]): String =
    k match {
      case a: AttributeReference => byId.getOrElse(a.exprId, a.name)
      case other => throw new UnsupportedOperationException(
        s"only top-level column assignment is supported, got ${other.sql}")
    }

  /** A (column, bound) the condition provably confines every matching
    * row to — one target column's range assembled from the WHERE's
    * top-level conjuncts. Handed to the rewrite commit as its REBASE
    * proof: a CAS loss against appends whose stats refute the bound
    * keeps the written rewrite instead of recomputing. Inclusive
    * widening of strict comparisons is sound (a wider bound only makes
    * the disjointness proof harder, never wrong). */
  private def disjointKeyOf(cond: Option[Expression],
                            byId: Map[ExprId, String],
                            schema: org.apache.spark.sql.types.StructType)
      : Option[(String, TxnTable.Bound)] = {
    import org.apache.spark.sql.catalyst.expressions._
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      // BETWEEN survives analysis as its runtime-replaceable node
      case b: Between =>
        Seq(GreaterThanOrEqual(b.input, b.lower), LessThanOrEqual(b.input, b.upper))
      case other => Seq(other)
    }
    // constant side: any FOLDABLE expression (the analyzer leaves type
    // promotions as unfolded Casts around literals — `k BETWEEN 100 AND
    // 200` on a bigint column arrives as `k >= cast(100 as bigint)`)
    def ext(e: Expression): Option[Any] =
      if (!e.foldable) None
      else Option(org.apache.spark.sql.catalyst.CatalystTypeConverters
        .convertToScala(e.eval(null), e.dataType))
    def colOf(e: Expression): Option[String] = e match {
      case a: AttributeReference => byId.get(a.exprId)
      case _ => None
    }
    // (column, lo?, hi?) contributed by one conjunct; conjunction means
    // every contribution holds for matching rows, so combining any lo
    // with any hi of the same column stays a containing bound
    val parts: Seq[(String, Option[Any], Option[Any])] =
      cond.toSeq.flatMap(conjuncts).flatMap {
        case EqualTo(a, l) if colOf(a).isDefined =>
          ext(l).map(v => (colOf(a).get, Some(v): Option[Any], Some(v): Option[Any]))
        case EqualTo(l, a) if colOf(a).isDefined =>
          ext(l).map(v => (colOf(a).get, Some(v): Option[Any], Some(v): Option[Any]))
        case GreaterThanOrEqual(a, l) if colOf(a).isDefined =>
          ext(l).map(v => (colOf(a).get, Some(v): Option[Any], None: Option[Any]))
        case GreaterThan(a, l) if colOf(a).isDefined =>
          ext(l).map(v => (colOf(a).get, Some(v): Option[Any], None: Option[Any]))
        case LessThanOrEqual(a, l) if colOf(a).isDefined =>
          ext(l).map(v => (colOf(a).get, None: Option[Any], Some(v): Option[Any]))
        case LessThan(a, l) if colOf(a).isDefined =>
          ext(l).map(v => (colOf(a).get, None: Option[Any], Some(v): Option[Any]))
        case GreaterThanOrEqual(l, a) if colOf(a).isDefined =>
          ext(l).map(v => (colOf(a).get, None: Option[Any], Some(v): Option[Any]))
        case GreaterThan(l, a) if colOf(a).isDefined =>
          ext(l).map(v => (colOf(a).get, None: Option[Any], Some(v): Option[Any]))
        case LessThanOrEqual(l, a) if colOf(a).isDefined =>
          ext(l).map(v => (colOf(a).get, Some(v): Option[Any], None: Option[Any]))
        case LessThan(l, a) if colOf(a).isDefined =>
          ext(l).map(v => (colOf(a).get, Some(v): Option[Any], None: Option[Any]))
        case _ => None
      }
    val byCol = parts.groupBy(_._1)
    // prefer a closed range; fall back to the first one-sided bound
    val ordered = parts.map(_._1).distinct
      .sortBy(c => !byCol(c).exists(_._2.isDefined) || !byCol(c).exists(_._3.isDefined))
    ordered.view.flatMap { c =>
      for {
        f <- schema.find(_.name == c)
        b <- TxnTable.boundOf(
          byCol(c).flatMap(_._2).headOption,
          byCol(c).flatMap(_._3).headOption, f.dataType)
      } yield c -> b
    }.headOption
  }

  /** A DECLARED table with no commit yet (CREATE TABLE before the first
    * insert) has no rows: UPDATE/DELETE are no-ops, MERGE reduces to
    * its WHEN NOT MATCHED inserts — never an error. */
  private def neverCommitted(spark: SparkSession, table: String): Boolean =
    TxnTable.latestVersion(spark, table).isEmpty

  def runUpdate(spark: SparkSession, p: UpdatePayload): Unit = {
    if (neverCommitted(spark, p.table)) return
    val byId = p.targetOutput.map(a => a.exprId -> a.name).toMap
    val sets: Map[String, Expression] =
      p.assignments.map(a => keyName(a.key, byId) -> a.value).toMap
    // POSITIONAL mode (`TBLPROPERTIES ('graft.updateMode' =
    // 'positional')`): the update commits the changed rows plus a
    // deletion vector of the originals' coordinates — no determinism
    // or key-function contract on the WHERE (subqueries, rankings,
    // byte-identical duplicate rows all stay exact), write I/O is the
    // changed rows + a kilobyte sidecar. A WHERE-less UPDATE falls
    // through (a whole-table vector has no advantage over a rewrite).
    if (p.condition.isDefined &&
        GraftDml.positionalMode(spark, p.table, "graft.updateMode")) {
      TxnTable.updateWherePosWith(spark, p.table,
        snap => coalesce(subst(p.condition.get, byId, snap), lit(false)),
        snap => sets.map { case (k, v) => k -> subst(v, byId, snap) })
      return
    }
    // MERGE-ON-READ UPDATE: while the table's #mor flag is on, an
    // UPDATE whose predicate is a deterministic, subquery-free function
    // of its column references commits the UPDATED ROWS plus an
    // equality-delete file of the originals' key tuples — write I/O is
    // the changed rows, not the touched files (a one-row update on a
    // 1 GB file writes one row, not a gigabyte). Shapes outside the
    // tuple contract (subqueries, rand(), WHERE-less) fall back to the
    // copy-on-write rewrite below.
    if (TxnTable.morEnabled(spark, p.table) &&
        p.condition.exists(c => c.deterministic && c.find(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression])
          .isEmpty)) {
      val keyCols = p.condition.get.references.toSeq
        .map(a => byId.getOrElse(a.exprId, a.name)).distinct.sorted
      if (keyCols.nonEmpty) {
        TxnTable.upsertMoR(spark, p.table, "update", (snap, _) => {
          val hit = coalesce(subst(p.condition.get, byId, snap), lit(false))
          val matched = snap.filter(hit)
          val fields = snap.schema.fields.toIndexedSeq
          def assigned(f: StructField): Column = sets.get(f.name) match {
            case Some(v) => subst(v, byId, snap).cast(f.dataType).as(f.name)
            case None => col(f.name)
          }
          val updated = matched.select(fields.map(f => assigned(f).as(f.name)): _*)
          val changes = matched
            .withColumn(TxnTable.ChangeTypeCol, lit("update_preimage"))
            .unionByName(updated
              .withColumn(TxnTable.ChangeTypeCol, lit("update_postimage")))
          Some(TxnTable.MorWrite(keyCols,
            matched.select(keyCols.map(k => col(s"`$k`")): _*),
            Some(updated), Some(changes)))
        })
        return
      }
    }
    TxnTable.rewriteCommit(spark, p.table, "update", (snap, ver) => {
      // phase 1: touched files — the WHERE flows through the graft DSv2
      // scan, so manifest stats + blooms prune before any data is read.
      // Filter BEFORE the input_file_name projection: a nondeterministic
      // projection blocks predicate pushdown, which would cost the
      // phase-1 scan its file skipping.
      val cond = p.condition.map(subst(_, byId, snap)).getOrElse(lit(true))
      val touched = snap.filter(cond)
        .withColumn("__graft_file", input_file_name())
        .select(col("__graft_file")).distinct()
        .collect().map(_.getString(0)).toSeq
      if (touched.isEmpty) None
      else {
        // phase 2: rewrite ONLY the touched files — matching rows get
        // the assignments (cast to the column's type), others carry;
        // a NULL condition keeps the row (SQL UPDATE semantics)
        // del-aware read: the replacement files must not resurrect
        // rows a merge-on-read delete already removed
        val tdf = TxnTable.readSnapshotFiles(spark, p.table, ver, touched)
        val cond2 = p.condition.map(subst(_, byId, tdf)).getOrElse(lit(true))
        def assigned(f: StructField): Column = sets.get(f.name) match {
          case Some(v) => subst(v, byId, tdf).cast(f.dataType).as(f.name)
          case None => col(f.name)
        }
        val out = tdf.select(snap.schema.fields.toIndexedSeq.map { f =>
          sets.get(f.name) match {
            case Some(_) =>
              when(cond2, assigned(f)).otherwise(col(f.name)).as(f.name)
            case None => col(f.name)
          }
        }: _*)
        // CDF: the selected rows before and after assignment (evaluated
        // on the ORIGINAL rows — post-assignment values must not feed
        // the condition); written iff the table has CDF enabled
        val hit = coalesce(cond2, lit(false))
        val fields = snap.schema.fields.toIndexedSeq
        val changes = tdf.filter(hit)
          .select(fields.map(f => col(f.name)): _*)
          .withColumn(TxnTable.ChangeTypeCol, lit("update_preimage"))
          .unionByName(tdf.filter(hit)
            .select(fields.map(assigned): _*)
            .withColumn(TxnTable.ChangeTypeCol, lit("update_postimage")))
        Some(TxnTable.Rewrite(touched, out, Some(changes),
          disjointKeyOf(p.condition, byId, snap.schema)))
      }
    })
    ()
  }

  /** Copy-on-write DELETE for predicates the metadata-gated
    * SupportsDelete shapes can't express: phase 1 finds touched files
    * through the DSv2 scan (the predicate prunes via stats/blooms),
    * phase 2 rewrites only those files with the complement. SQL NULL
    * semantics: a NULL predicate RETAINS the row (`not(coalesce(cond,
    * false))`). */
  def runDelete(spark: SparkSession, p: DeletePayload): Unit = {
    if (neverCommitted(spark, p.table)) return
    val byId = p.targetOutput.map(a => a.exprId -> a.name).toMap
    // POSITIONAL mode (`TBLPROPERTIES ('graft.deleteMode' =
    // 'positional')`): route EVERY delete through a deletion-vector
    // commit — including the shapes the equality flavor must refuse
    // (subquery predicates, conditions that are not a function of
    // stable key columns, byte-identical duplicate rows). The
    // committed artifact is the matched COORDINATES, not a predicate
    // or key set, so no determinism/key-function contract applies and
    // a `DELETE … WHERE id IN (SELECT …)` on a 100 TB table commits a
    // kilobyte sidecar instead of rewriting files.
    if (GraftDml.positionalDeletes(spark, p.table)) {
      TxnTable.deleteWherePos(spark, p.table,
        snap => subst(p.condition, byId, snap))
      return
    }
    // MERGE-ON-READ: while the table's #mor flag is on, a DELETE whose
    // predicate is a deterministic, subquery-free function of its
    // column references commits an equality-delete file (kilobytes)
    // instead of rewriting data files; readers subtract it until
    // OPTIMIZE/compact materializes. Shapes outside that contract
    // (subqueries — tuples wouldn't determine membership; rand()) fall
    // back to the copy-on-write rewrite below, which stays exact.
    if (TxnTable.morEnabled(spark, p.table) && p.condition.deterministic &&
        p.condition.find(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression])
          .isEmpty) {
      val keyCols = p.condition.references.toSeq
        .map(a => byId.getOrElse(a.exprId, a.name)).distinct.sorted
      if (keyCols.nonEmpty) {
        TxnTable.deleteWhereMoR(spark, p.table, keyCols,
          snap => subst(p.condition, byId, snap))
        return
      }
    }
    TxnTable.rewriteCommit(spark, p.table, "delete", (snap, ver) => {
      // filter BEFORE the input_file_name projection (pushdown-blocking
      // nondeterminism) — the predicate's file skipping is the point
      val cond = subst(p.condition, byId, snap)
      val touched = snap.filter(cond)
        .withColumn("__graft_file", input_file_name())
        .select(col("__graft_file")).distinct()
        .collect().map(_.getString(0)).toSeq
      if (touched.isEmpty) None
      else {
        val tdf = TxnTable.readSnapshotFiles(spark, p.table, ver, touched)
        val cond2 = subst(p.condition, byId, tdf)
        val changes = tdf.filter(coalesce(cond2, lit(false)))
          .withColumn(TxnTable.ChangeTypeCol, lit("delete"))
        Some(TxnTable.Rewrite(touched,
          tdf.filter(!coalesce(cond2, lit(false))), Some(changes),
          disjointKeyOf(Some(p.condition), byId, snap.schema)))
      }
    })
    ()
  }

  def runMerge(spark: SparkSession, p: MergePayload): Unit = {
    val byId = p.targetOutput.map(a => a.exprId -> a.name).toMap

    // GENERATED ALWAYS AS IDENTITY: the statement can never ASSIGN the
    // column — matched rows inherit their values through the update
    // cascade's keep-default, carried rows ride untouched, and WHEN NOT
    // MATCHED inserts MINT fresh values above the PINNED snapshot's
    // high-water mark (TxnTable.merge's recipe, moved into this
    // lowering): assignSequential numbers the insert rows, a
    // localCheckpoint freezes the minting so the data write and the CDC
    // frame observe the same values, and the commit publishes the
    // advanced hwm atomically with the rows that consumed it. CAS
    // losses recompute against the fresh snapshot (never fast-rebase),
    // re-minting above the NEW hwm — racing appends can never collide.
    def identityOf(ver: Long): Option[TxnTable.IdentityDef] = {
      val d = TxnTable.snapshotSchema(spark, p.table, ver)
        .flatMap(TxnTable.identityColumn)
      d.foreach { dd =>
        val assigned = (p.matched ++ p.notMatched ++ p.notMatchedBySource)
          .flatMap {
            case ua: UpdateAction => ua.assignments
            case ia: InsertAction => ia.assignments
            case _ => Nil
          }.map(a => keyName(a.key, byId))
        require(!assigned.exists(_.equalsIgnoreCase(dd.col)),
          s"IDENTITY column ${dd.col} is GENERATED ALWAYS — MERGE cannot " +
            "assign it: matched rows inherit their values, inserts mint " +
            "fresh ones")
      }
      d
    }
    // each compute attempt localCheckpoints its minted insert frame
    // (freezing the values so data and CDC agree); a CAS-losing attempt
    // must release the previous checkpoint's cached blocks or the retry
    // loop leaks one insert frame per attempt until the session ends
    var lastMinted: Option[DataFrame] = None
    def mintInserts(ins: Option[DataFrame], d: Option[TxnTable.IdentityDef])
        : (Option[DataFrame], Option[Long]) = (ins, d) match {
      case (Some(df), Some(dd)) =>
        lastMinted.foreach(GraftBridge.unpersistCheckpoint)
        val hwmBase = dd.hwm.getOrElse(dd.start - dd.step)
        val (m, n) = TxnTable.assignSequential(
          df.drop(dd.col), dd.col, hwmBase + dd.step, dd.step)
        val ordered = m.select(
          df.columns.map(c => col(s"`$c`")).toIndexedSeq: _*).localCheckpoint()
        lastMinted = Some(ordered)
        (Some(ordered), if (n == 0L) None else Some(hwmBase + dd.step * n))
      case _ => (ins, None)
    }

    // Every target-column reference in a post-join frame must go through
    // the PRE-join target frame's attributes: after `target JOIN source`
    // both sides usually carry the same column names, and a by-name
    // `col("k")` would be ambiguous. Source references resolve by their
    // captured exprIds; target references substitute to `targetDf`'s.
    // A field the target frame does not have yet (WITH SCHEMA
    // EVOLUTION) reads as NULL — pre-evolution rows surface the new
    // columns as NULL, exactly like pre-evolution files at read time.
    def tcol(targetDf: DataFrame, f: StructField): Column =
      if (targetDf.columns.contains(f.name))
        GraftBridge.column(attrOf(targetDf, f.name))
      else lit(null).cast(f.dataType)

    def actionCond(a: MergeAction, targetDf: DataFrame): Column = a match {
      case ua: UpdateAction => ua.condition.map(subst(_, byId, targetDf)).getOrElse(lit(true))
      case da: DeleteAction => da.condition.map(subst(_, byId, targetDf)).getOrElse(lit(true))
      case ia: InsertAction => ia.condition.map(subst(_, byId, targetDf)).getOrElse(lit(true))
      case other => throw new UnsupportedOperationException(
        s"unsupported MERGE action: $other")
    }

    /** TRUE iff the first applicable action for this row is a DELETE. */
    def deleteCascade(actions: Seq[MergeAction], targetDf: DataFrame): Column =
      actions.foldRight(lit(false)) { (a, els) =>
        a match {
          case _: DeleteAction => when(actionCond(a, targetDf), lit(true)).otherwise(els)
          case _ => when(actionCond(a, targetDf), lit(false)).otherwise(els)
        }
      }

    /** Value of column `f` after the first applicable action (keep when
      * none applies, or when the applicable UPDATE does not assign it). */
    def updateCascade(actions: Seq[MergeAction], targetDf: DataFrame,
                      f: StructField): Column =
      actions.foldRight(tcol(targetDf, f)) { (a, els) =>
        a match {
          case ua: UpdateAction =>
            val assigned = ua.assignments.collectFirst {
              case Assignment(k, v) if keyName(k, byId) == f.name => v
            }
            assigned match {
              case Some(v) =>
                when(actionCond(ua, targetDf), subst(v, byId, targetDf).cast(f.dataType))
                  .otherwise(els)
              case None => when(actionCond(ua, targetDf), tcol(targetDf, f)).otherwise(els)
            }
          case da: DeleteAction =>
            // row is filtered by the delete cascade; value irrelevant
            when(actionCond(da, targetDf), tcol(targetDf, f)).otherwise(els)
          case other => throw new UnsupportedOperationException(
            s"unsupported MERGE action: $other")
        }
      }

    /** Insert rows: source rows matching NO row of `prunedTarget`,
      * through the first applicable WHEN NOT MATCHED action (none
      * applies → dropped); insert values reference only the source, so
      * no substitution. Shared by the copy-on-write and merge-on-read
      * paths. */
    def insertsFor(prunedTarget: DataFrame, source: DataFrame,
                   fields: IndexedSeq[StructField]): Option[DataFrame] =
      if (p.notMatched.isEmpty) None
      else {
        val unmatched = source.join(prunedTarget,
          subst(p.condition, byId, prunedTarget), "left_anti")
        val idx = p.notMatched.zipWithIndex
          .foldRight(lit(-1)) { case ((a, i), els) =>
            when(actionCond(a, unmatched), lit(i)).otherwise(els)
          }
        val chosen = unmatched.withColumn("__graft_act", idx)
          .filter(col("__graft_act") >= 0)
        val outCols = fields.map { f =>
          p.notMatched.zipWithIndex.foldRight(lit(null).cast(f.dataType)) {
            case ((a, i), els) =>
              val v = a.asInstanceOf[InsertAction].assignments.collectFirst {
                case Assignment(k, vv) if keyName(k, byId) == f.name => vv
              }
              v match {
                case Some(vv) =>
                  when(col("__graft_act") === i,
                    GraftBridge.column(vv).cast(f.dataType)).otherwise(els)
                case None =>
                  when(col("__graft_act") === i,
                    lit(null).cast(f.dataType)).otherwise(els)
              }
          }.as(f.name)
        }
        Some(chosen.select(outCols: _*))
      }

    // never-committed target: no row can match, so the merge reduces to
    // its WHEN NOT MATCHED inserts against the DECLARED schema — the
    // bootstrap-by-merge shape (Delta allows it; erroring would force
    // users to seed tables with a dummy insert first)
    if (neverCommitted(spark, p.table)) {
      if (p.notMatched.isEmpty) return
      val source = GraftBridge.ofRows(spark, p.source)
      val declared = StructType(p.targetOutput.map(a =>
        StructField(a.name, a.dataType, a.nullable)))
      val insertFields = declared.fields.toIndexedSeq ++ (
        if (!p.withSchemaEvolution) Nil
        else p.notMatched
          .flatMap { case ia: InsertAction => ia.assignments; case _ => Nil }
          .map(a => keyName(a.key, byId) -> a.value.dataType)
          .filterNot { case (n, _) => declared.fieldNames.contains(n) }
          .distinctBy(_._1)
          .map { case (n, dt) => StructField(n, dt, nullable = true) })
      // insert conditions/values are source-scoped by SQL MERGE rules —
      // no target reference can appear, so they evaluate on the source
      def cond(a: MergeAction): Column = a match {
        case ia: InsertAction => ia.condition.map(GraftBridge.column).getOrElse(lit(true))
        case other => throw new UnsupportedOperationException(
          s"unsupported WHEN NOT MATCHED action: $other")
      }
      val idx = p.notMatched.zipWithIndex.foldRight(lit(-1)) {
        case ((a, i), els) => when(cond(a), lit(i)).otherwise(els)
      }
      val chosen = source.withColumn("__graft_act", idx)
        .filter(col("__graft_act") >= 0)
      val outCols = insertFields.map { f =>
        p.notMatched.zipWithIndex.foldRight(lit(null).cast(f.dataType)) {
          case ((a, i), els) =>
            a.asInstanceOf[InsertAction].assignments.collectFirst {
              case Assignment(k, vv) if keyName(k, byId) == f.name => vv
            } match {
              case Some(vv) => when(col("__graft_act") === i,
                GraftBridge.column(vv).cast(f.dataType)).otherwise(els)
              case None => when(col("__graft_act") === i,
                lit(null).cast(f.dataType)).otherwise(els)
            }
        }.as(f.name)
      }
      TxnTable.commitAppend(chosen.select(outCols: _*), p.table)
      return
    }

    // MERGE-ON-READ MERGE (the upsert shape): while the table's #mor
    // flag is on and the merge is the canonical upsert — ON a pure
    // conjunction of `target.col = <source expr>` equi-predicates, ONE
    // unconditional WHEN MATCHED UPDATE or DELETE, optional WHEN NOT
    // MATCHED inserts, no NOT-MATCHED-BY-SOURCE, no schema evolution —
    // commit the updated+inserted rows plus an equality-delete file of
    // the matched target keys, instead of rewriting every touched
    // file. Matching is determined by the target key tuple (the ON is
    // exactly an equi-join on those columns), so the tuple subtraction
    // removes precisely the matched rows; the commit's own appended
    // files are gate-exempt. Everything else falls back to the
    // copy-on-write rewrite below.
    val morMergeKeys: Option[Seq[(String, Expression)]] = {
      def conjunctsOf(e: Expression): Seq[Expression] = e match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
          conjunctsOf(l) ++ conjunctsOf(r)
        case other => Seq(other)
      }
      def srcOnly(e: Expression): Boolean =
        e.references.forall(a => !byId.contains(a.exprId))
      val cs = conjunctsOf(p.condition)
      val keys = cs.flatMap {
        case org.apache.spark.sql.catalyst.expressions.EqualTo(
            t: AttributeReference, s)
            if byId.contains(t.exprId) && srcOnly(s) => Some(byId(t.exprId) -> s)
        case org.apache.spark.sql.catalyst.expressions.EqualTo(
            s, t: AttributeReference)
            if byId.contains(t.exprId) && srcOnly(s) => Some(byId(t.exprId) -> s)
        case _ => None
      }
      val matchedOk = p.matched match {
        case Seq(ua: UpdateAction) => ua.condition.isEmpty
        case Seq(da: DeleteAction) => da.condition.isEmpty
        case _ => false
      }
      if (TxnTable.morEnabled(spark, p.table) && !p.withSchemaEvolution &&
          p.notMatchedBySource.isEmpty && matchedOk &&
          keys.size == cs.size && keys.nonEmpty &&
          p.condition.deterministic &&
          p.condition.find(
            _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression])
            .isEmpty)
        Some(keys)
      else None
    }
    if (morMergeKeys.isDefined) {
      val equiKeys = morMergeKeys.get
      val keyCols = equiKeys.map(_._1).distinct.sorted
      TxnTable.upsertMoR(spark, p.table, "merge", (snap, pv) => {
        val idDef = identityOf(pv)
        val source = GraftBridge.ofRows(spark, p.source)
        val fields = snap.schema.fields.toIndexedSeq
        // the same source-key min/max pre-filter as the copy-on-write
        // path: prunes the target scan to files that can hold a match
        val aggs = equiKeys.zipWithIndex.flatMap { case ((_, s), i) =>
          Seq(min(GraftBridge.column(s)).as(s"__graft_lo_$i"),
            max(GraftBridge.column(s)).as(s"__graft_hi_$i"))
        }
        val row = source.agg(aggs.head, aggs.drop(1): _*).head()
        val preFilter = equiKeys.zipWithIndex.map { case ((t, _), i) =>
          val lo = row.getAs[Any](s"__graft_lo_$i")
          if (lo == null) lit(false)
          else GraftBridge.column(attrOf(snap, t))
            .between(lit(lo), lit(row.getAs[Any](s"__graft_hi_$i")))
        }.reduce(_ && _)
        val tdf = snap.filter(preFilter)
          .withColumn("__graft_tid", monotonically_increasing_id())
        val joined = tdf.join(source, subst(p.condition, byId, tdf), "inner")
          .withColumn("__graft_dup",
            count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("__graft_tid"))))
        // SQL MERGE cardinality check, folded into whichever scan runs
        val guarded = joined.filter(
          when(col("__graft_dup") > 1,
            raise_error(lit("MERGE INTO: a target row matched multiple " +
              "source rows — the update/delete to apply is ambiguous " +
              "(SQL MERGE cardinality violation)")).cast("boolean"))
            .otherwise(lit(true)))
        val tuples = guarded.select(
          keyCols.map(k => GraftBridge.column(attrOf(tdf, k)).as(k)): _*)
        val updated: Option[DataFrame] = p.matched.head match {
          case _: UpdateAction => Some(guarded.select(fields.map(f =>
            updateCascade(p.matched, tdf, f).as(f.name)): _*))
          case _ => None // DELETE: matched rows contribute no appended rows
        }
        val (inserts, idHwm) =
          mintInserts(insertsFor(snap.filter(preFilter), source, fields), idDef)
        val appended = (updated.toSeq ++ inserts.toSeq)
          .reduceOption(_.unionByName(_))
        val changeParts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        def typed(df: DataFrame, tpe: String): DataFrame =
          df.withColumn(TxnTable.ChangeTypeCol, lit(tpe))
        p.matched.head match {
          case _: UpdateAction =>
            changeParts += typed(guarded.select(
              fields.map(f => tcol(tdf, f).as(f.name)): _*), "update_preimage")
            updated.foreach(u => changeParts += typed(u, "update_postimage"))
          case _ =>
            changeParts += typed(guarded.select(
              fields.map(f => tcol(tdf, f).as(f.name)): _*), "delete")
        }
        inserts.foreach(i => changeParts += typed(i, "insert"))
        Some(TxnTable.MorWrite(keyCols, tuples, appended,
          changeParts.reduceOption(_.unionByName(_)),
          identityHandled = idDef.isDefined, identityHwm = idHwm))
      })
      lastMinted.foreach(GraftBridge.unpersistCheckpoint)
      return
    }

    TxnTable.rewriteCommit(spark, p.table, "merge", (snap, ver) => {
      val idDef = identityOf(ver)
      val source = GraftBridge.ofRows(spark, p.source)
      val schema = snap.schema
      // WITH SCHEMA EVOLUTION: columns assigned by any action but
      // absent from the target evolve the schema — typed from the
      // assigned value, appended after the existing fields. The
      // rewrite commit merges them into the recorded schema;
      // untouched rows and carried files read them back as NULL.
      val evolved: Seq[StructField] =
        if (!p.withSchemaEvolution) Nil
        else {
          val existing = schema.fieldNames.toSet
          (p.matched ++ p.notMatched ++ p.notMatchedBySource)
            .flatMap {
              case ua: UpdateAction => ua.assignments
              case ia: InsertAction => ia.assignments
              case _ => Nil
            }
            .map(a => keyName(a.key, byId) -> a.value.dataType)
            .filterNot { case (n, _) => existing.contains(n) }
            .distinctBy(_._1)
            .map { case (n, dt) => StructField(n, dt, nullable = true) }
        }
      val fields = schema.fields.toIndexedSeq ++ evolved

      // STATS PRE-PRUNE (the same shape TxnTable.merge uses): for each
      // equi-join conjunct `t.k = <source expr>`, the source's [min,
      // max] of that expr bounds every MATCHABLE target row — pushed as
      // a range filter into the graft DSv2 scan, it prunes candidate
      // FILES from the manifest stats before any data is read. A merge
      // touching a narrow key slice of a 100 TB table plans its phase-1
      // scan over that slice's files only.
      val targetIds = byId.keySet
      def conjuncts(e: Expression): Seq[Expression] = e match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
          conjuncts(l) ++ conjuncts(r)
        case other => Seq(other)
      }
      def sourceOnly(e: Expression): Boolean =
        e.references.forall(a => !targetIds.contains(a.exprId))
      val equiKeys: Seq[(String, Expression)] =
        conjuncts(p.condition).collect {
          case org.apache.spark.sql.catalyst.expressions.EqualTo(
              t: AttributeReference, s)
              if byId.contains(t.exprId) && sourceOnly(s) => byId(t.exprId) -> s
          case org.apache.spark.sql.catalyst.expressions.EqualTo(
              s, t: AttributeReference)
              if byId.contains(t.exprId) && sourceOnly(s) => byId(t.exprId) -> s
        }
      val (preFilter, mergeBound): (Column, Option[(String, TxnTable.Bound)]) =
        if (equiKeys.isEmpty) (lit(true), None)
        else {
          val aggs = equiKeys.zipWithIndex.flatMap { case ((_, s), i) =>
            Seq(min(GraftBridge.column(s)).as(s"__graft_lo_$i"),
              max(GraftBridge.column(s)).as(s"__graft_hi_$i"))
          }
          val row = source.agg(aggs.head, aggs.drop(1): _*).head()
          val cond = equiKeys.zipWithIndex.map { case ((t, _), i) =>
            val lo = row.getAs[Any](s"__graft_lo_$i")
            val hi = row.getAs[Any](s"__graft_hi_$i")
            if (lo == null) lit(false) // no non-null source keys: no match
            else GraftBridge.column(attrOf(snap, t)).between(lit(lo), lit(hi))
          }.reduce(_ && _)
          // the same key bounds double as the rewrite's REBASE proof:
          // an interleaved append stats-disjoint from the source keys
          // can neither match nor change the insert decision — but only
          // when no NOT MATCHED BY SOURCE action exists (those can
          // touch ANY target row, appended ones included)
          val bound =
            if (p.notMatchedBySource.nonEmpty) None
            else equiKeys.zipWithIndex.view.flatMap { case ((t, _), i) =>
              val lo = row.getAs[Any](s"__graft_lo_$i")
              val hi = row.getAs[Any](s"__graft_hi_$i")
              if (lo == null || hi == null) None
              else schema.find(_.name == t).flatMap(f =>
                TxnTable.boundOf(Some(lo), Some(hi), f.dataType).map(t -> _))
            }.headOption
          (cond, bound)
        }

      // phase 1: touched files. Matched actions touch files holding a
      // row that matches some source row. WHEN NOT MATCHED BY SOURCE
      // can affect ANY target row — but when EVERY such action carries
      // a condition, only files holding a row satisfying SOME condition
      // can change (the conditions reference the target alone, so they
      // prune through the DSv2 scan's stats/blooms like a WHERE); a
      // file in neither set carries by reference. An UNconditioned
      // clause really does rewrite the whole table — warned loudly,
      // because at 100 TB that is almost never what the user meant.
      def filesOf(df: DataFrame): Seq[String] =
        df.withColumn("__graft_file", input_file_name())
          .select(col("__graft_file")).distinct()
          .collect().map(_.getString(0)).toSeq
      def matchFiles: Seq[String] =
        if (p.matched.isEmpty) Nil
        else filesOf(snap.filter(preFilter)
          .withColumn("__graft_file", input_file_name())
          .join(source, subst(p.condition, byId, snap), "inner"))
      def condOf(a: MergeAction): Option[Expression] = a match {
        case ua: UpdateAction => ua.condition
        case da: DeleteAction => da.condition
        case ia: InsertAction => ia.condition
        case _ => None
      }
      val touched: Seq[String] =
        if (p.notMatchedBySource.nonEmpty) {
          val conds = p.notMatchedBySource.map(condOf)
          val nmbsFiles =
            if (conds.forall(_.isDefined))
              filesOf(snap.filter(
                conds.flatten.map(subst(_, byId, snap)).reduce(_ || _)))
            else {
              logWarning(s"MERGE INTO graft.`${p.table}`: an unconditioned " +
                "WHEN NOT MATCHED BY SOURCE clause touches every target " +
                "row — the whole table will be rewritten; add a condition " +
                "with target-key bounds to confine the rewrite")
              filesOf(snap)
            }
          (nmbsFiles ++ matchFiles).distinct
        }
        else matchFiles

      // phase 2: replacement rows for the touched files. The change
      // frames mirror each half — assembled alongside, written as this
      // commit's change files iff the table has CDF enabled.
      val changeParts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      def typed(df: DataFrame, tpe: String): DataFrame =
        df.withColumn(TxnTable.ChangeTypeCol, lit(tpe))
      val rewritten: Option[DataFrame] =
        if (touched.isEmpty) None
        else {
          val tdf = TxnTable.readSnapshotFiles(spark, p.table, ver, touched)
            .withColumn("__graft_tid", monotonically_increasing_id())
          val condT = subst(p.condition, byId, tdf)
          // matched half: SQL MERGE forbids one target row matching
          // several source rows when update/delete actions exist. The
          // cardinality check rides INSIDE the join as a per-target-row
          // window count guarding the delete-cascade filter — one
          // executed plan, not a separate probe job over a second join.
          val matchedPart: DataFrame =
            if (p.matched.isEmpty)
              tdf.join(source, condT, "left_semi")
                .select(fields.map(f => tcol(tdf, f).as(f.name)): _*)
            else {
              val joined = tdf.join(source, condT, "inner")
                .withColumn("__graft_dup",
                  count(lit(1)).over(org.apache.spark.sql.expressions.Window
                    .partitionBy(col("__graft_tid"))))
              val guarded = joined.filter(
                when(col("__graft_dup") > 1,
                  raise_error(lit("MERGE INTO: a target row matched " +
                    "multiple source rows — the update/delete to apply " +
                    "is ambiguous (SQL MERGE cardinality violation)"))
                    .cast("boolean"))
                  .otherwise(!deleteCascade(p.matched, tdf)))
              val applies = p.matched.foldRight(lit(false))((a, els) =>
                when(actionCond(a, tdf), lit(true)).otherwise(els))
              val updHit = joined.filter(applies && !deleteCascade(p.matched, tdf))
              changeParts += typed(joined.filter(deleteCascade(p.matched, tdf))
                .select(fields.map(f => tcol(tdf, f).as(f.name)): _*), "delete")
              changeParts += typed(updHit
                .select(fields.map(f => tcol(tdf, f).as(f.name)): _*),
                "update_preimage")
              changeParts += typed(updHit
                .select(fields.map(f =>
                  updateCascade(p.matched, tdf, f).as(f.name)): _*),
                "update_postimage")
              guarded.select(fields.map(f =>
                updateCascade(p.matched, tdf, f).as(f.name)): _*)
            }
          // not-matched-by-source half: target rows with no source match
          val unmatchedBase = tdf.join(source, condT, "left_anti")
          val unmatchedPart: DataFrame =
            if (p.notMatchedBySource.isEmpty)
              unmatchedBase.select(fields.map(f => tcol(tdf, f).as(f.name)): _*)
            else {
              val applies = p.notMatchedBySource.foldRight(lit(false))((a, els) =>
                when(actionCond(a, tdf), lit(true)).otherwise(els))
              val del = deleteCascade(p.notMatchedBySource, tdf)
              val updHit = unmatchedBase.filter(applies && !del)
              changeParts += typed(unmatchedBase.filter(del)
                .select(fields.map(f => tcol(tdf, f).as(f.name)): _*), "delete")
              changeParts += typed(updHit
                .select(fields.map(f => tcol(tdf, f).as(f.name)): _*),
                "update_preimage")
              changeParts += typed(updHit
                .select(fields.map(f =>
                  updateCascade(p.notMatchedBySource, tdf, f).as(f.name)): _*),
                "update_postimage")
              unmatchedBase
                .filter(!del)
                .select(fields.map(f =>
                  updateCascade(p.notMatchedBySource, tdf, f)
                    .as(f.name)): _*)
            }
          Some(matchedPart.unionByName(unmatchedPart))
        }

      // inserts: target rows outside the source key bounds can't match
      // any source row, so the anti-join's right side prunes to the
      // same file slice as phase 1
      val (inserts, idHwm) =
        mintInserts(insertsFor(snap.filter(preFilter), source, fields), idDef)
      inserts.foreach(i => changeParts += typed(i, "insert"))

      (rewritten, inserts) match {
        case (None, None) => None
        case (r, i) =>
          val replacement = (r.toSeq ++ i.toSeq).reduce(_.unionByName(_))
          val changes =
            if (changeParts.isEmpty) None
            else Some(changeParts.reduce(
              _.unionByName(_, allowMissingColumns = true)))
          Some(TxnTable.Rewrite(touched, replacement, changes, mergeBound,
            identityHandled = idDef.isDefined, identityHwm = idHwm))
      }
    })
    lastMinted.foreach(GraftBridge.unpersistCheckpoint)
    ()
  }
}
