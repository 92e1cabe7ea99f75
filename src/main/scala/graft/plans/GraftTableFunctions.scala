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

  /** `graft_snapshot_diff(path, fromVersion, toVersion)` — what changed
    * between two snapshots, manifest arithmetic only: one row per data
    * file that is in exactly one of the two, with its direction, row
    * count (null for pre-row-tracking files), and per-version row
    * delta derivable by aggregation. The 100 TB triage question
    * "what did last night's job actually touch" answers without
    * listing a single data directory. */
  def snapshotDiff(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 3,
      "usage: graft_snapshot_diff(path, fromVersion, toVersion)")
    val table = str(exprs.head, "path")
    val from = long(exprs(1), "fromVersion")
    val to = long(exprs(2), "toVersion")
    val spark = SparkSession.active
    val a = TxnTable.snapshotFiles(spark, table, from).toSet
    val b = TxnTable.snapshotFiles(spark, table, to).toSet
    val rowsB = TxnTable.fileRows(spark, table, to)
    val rowsA = TxnTable.fileRows(spark, table, from)
    val out = Seq(
      AttributeReference("file", StringType, nullable = false)(),
      AttributeReference("change", StringType, nullable = false)(),
      AttributeReference("n_rows", LongType, nullable = true)())
    def row(f: String, change: String, n: Option[Long]): InternalRow = {
      val r = new GenericInternalRow(3)
      r.update(0, UTF8String.fromString(f))
      r.update(1, UTF8String.fromString(change))
      n match { case Some(v) => r.setLong(2, v); case None => r.setNullAt(2) }
      r
    }
    val data =
      (b -- a).toSeq.sorted.map(f => row(f, "added", rowsB.get(f))) ++
        (a -- b).toSeq.sorted.map(f => row(f, "removed", rowsA.get(f)))
    LocalRelation(out, data)
  }

  /** `VACUUM … DRY RUN` — the would-delete list as rows, one
    * table-relative path per row. Nothing is deleted; a real VACUUM
    * with the same arguments deletes exactly these paths. */
  def vacuumDryRows(table: String, keep: Int, retainMs: Long): LogicalPlan = {
    val spark = SparkSession.active
    val out = Seq(AttributeReference("path", StringType, nullable = false)())
    val rows = TxnTable.vacuumDryRun(spark, table, keep, retainMs).map { f =>
      val r = new GenericInternalRow(1)
      r.update(0, UTF8String.fromString(f))
      r: InternalRow
    }
    LocalRelation(out, rows)
  }

  /** `DESCRIBE DETAIL` / `graft_detail(path)` — one metadata-only row
    * describing the latest snapshot (Delta's DESCRIBE DETAIL shape):
    * format, location, version, file count, total bytes, partition
    * spec, constraint count, and the CDF / merge-on-read flags. Bounded
    * manifest reads plus one file-status pass over the snapshot's file
    * list (O(files) stat calls, no data I/O). */
  def detail(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 1, "usage: graft_detail(path)")
    val table = str(exprs.head, "path")
    val spark = SparkSession.active
    val v = TxnTable.latestVersion(spark, table).getOrElse(
      throw new IllegalStateException(s"no committed version in $table"))
    val files = TxnTable.snapshotFiles(spark, table, v)
    val conf = spark.sessionState.newHadoopConf()
    val bytes = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(s"$table/$f")
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    val out = Seq(
      AttributeReference("format", StringType, nullable = false)(),
      AttributeReference("location", StringType, nullable = false)(),
      AttributeReference("version", LongType, nullable = false)(),
      AttributeReference("num_files", LongType, nullable = false)(),
      AttributeReference("size_bytes", LongType, nullable = false)(),
      AttributeReference("partition_columns", StringType, nullable = false)(),
      AttributeReference("num_constraints", LongType, nullable = false)(),
      AttributeReference("change_feed", org.apache.spark.sql.types.BooleanType,
        nullable = false)(),
      AttributeReference("merge_on_read", org.apache.spark.sql.types.BooleanType,
        nullable = false)(),
      AttributeReference("converted_in_place", org.apache.spark.sql.types.BooleanType,
        nullable = false)(),
      AttributeReference("column_aliases", StringType, nullable = false)(),
      AttributeReference("generated_columns", StringType, nullable = false)(),
      AttributeReference("identity_column", StringType, nullable = false)(),
      // merge-on-read read amplification at a glance: live delete
      // entries (either flavor) and their recorded row counts — the
      // numbers that say "time to REORG ... APPLY (PURGE)"
      AttributeReference("num_delete_files", LongType, nullable = false)(),
      AttributeReference("num_delete_rows", LongType, nullable = false)(),
      // ANALYZE freshness: which columns carry CBO NDV at this version
      AttributeReference("analyzed_columns", StringType, nullable = false)(),
      // exact manifest row count (null while any file predates per-file
      // row tracking) and the free-form property map as sorted k=v text
      AttributeReference("num_rows", LongType, nullable = true)(),
      AttributeReference("properties", StringType, nullable = false)())
    val r = new GenericInternalRow(18)
    r.update(0, UTF8String.fromString("graft"))
    r.update(1, UTF8String.fromString(table))
    r.setLong(2, v)
    r.setLong(3, files.size.toLong)
    r.setLong(4, bytes)
    r.update(5, UTF8String.fromString(
      TxnTable.partitionColumns(spark, table).mkString(",")))
    r.setLong(6, TxnTable.checkConstraints(spark, table).size.toLong)
    r.setBoolean(7, TxnTable.changeFeedEnabled(spark, table))
    r.setBoolean(8, graft.io.TxnTable.mergeOnReadEnabled(spark, table))
    r.setBoolean(9, TxnTable.convertedInPlace(spark, table))
    r.update(10, UTF8String.fromString(
      TxnTable.columnAliases(spark, table).toSeq.sortBy(_._1)
        .map { case (l, as) => s"$l<-${as.mkString("|")}" }.mkString(", ")))
    val schema = TxnTable.snapshotSchema(spark, table, v)
    r.update(11, UTF8String.fromString(
      schema.map(TxnTable.generatedColumns).getOrElse(Map.empty)
        .toSeq.sortBy(_._1)
        .map { case (n, sql) => s"$n AS ($sql)" }.mkString(", ")))
    r.update(12, UTF8String.fromString(
      schema.flatMap(TxnTable.identityColumn)
        .map(d => s"${d.col} START ${d.start} STEP ${d.step}" +
          d.hwm.map(h => s" HWM $h").getOrElse(""))
        .getOrElse("")))
    val ms = TxnTable.morState(spark, table, v)
    val liveDels = ms.dels.filter(d =>
      ms.files.exists(f => ms.addv.getOrElse(f, 0L) < d.version))
    r.setLong(13, liveDels.size.toLong)
    r.setLong(14, liveDels.map(_.rows).sum)
    r.update(15, UTF8String.fromString(
      TxnTable.ndvStats(spark, table, v).keys.toSeq.sorted.mkString(",")))
    val rowsByFile = TxnTable.fileRows(spark, table, v)
    if (files.forall(rowsByFile.contains))
      r.setLong(16, files.map(rowsByFile).sum)
    else r.setNullAt(16)
    r.update(17, UTF8String.fromString(
      TxnTable.tableProperties(spark, table, Some(v)).toSeq.sortBy(_._1)
        .map { case (k, pv) => s"$k=$pv" }.mkString(",")))
    LocalRelation(out, Seq(r: InternalRow))
  }

  /** `graft_files(path[, version])` — the Iceberg `files` metadata
    * table, graft-spelled: one row per data file of the snapshot with
    * rows, bytes, and the per-column skipping stats serialized as
    * `col=[min..max](nulls)` pairs — what an operator inspects to judge
    * layout health (small-file pressure, clustering quality, stats
    * coverage) before deciding to OPTIMIZE. Metadata-eager like
    * graft_history: O(files) manifest entries + one FS size probe per
    * file, zero data reads. */
  def files(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 1 || exprs.length == 2,
      "usage: graft_files(path[, version])")
    val table = str(exprs.head, "path")
    val spark = SparkSession.active
    val v = if (exprs.length == 2) long(exprs(1), "version")
      else TxnTable.latestVersion(spark, table).getOrElse(
        throw new IllegalStateException(s"no committed version in $table"))
    val fs = TxnTable.snapshotFiles(spark, table, v)
    val stats = TxnTable.fileStats(spark, table, v)
    val rows = TxnTable.fileRows(spark, table, v)
    val conf = spark.sessionState.newHadoopConf()
    val out = Seq(
      AttributeReference("file", StringType, nullable = false)(),
      AttributeReference("rows", LongType, nullable = true)(),
      AttributeReference("bytes", LongType, nullable = false)(),
      AttributeReference("stats", StringType, nullable = false)())
    val data = fs.sorted.map { f =>
      val p = new org.apache.hadoop.fs.Path(s"$table/$f")
      val bytes = p.getFileSystem(conf).getFileStatus(p).getLen
      val ss = stats.getOrElse(f, Nil).sortBy(_.col)
        .map(s => s"${s.col}=[${s.minV}..${s.maxV}](${s.nulls})")
        .mkString(", ")
      val r = new GenericInternalRow(4)
      r.update(0, UTF8String.fromString(f))
      rows.get(f) match {
        case Some(n) => r.setLong(1, n)
        case None => r.setNullAt(1) // pre-rows manifest: unknown, not 0
      }
      r.setLong(2, bytes)
      r.update(3, UTF8String.fromString(ss))
      r: InternalRow
    }
    LocalRelation(out, data)
  }

  /** `graft_partitions(path[, version])` — `SHOW PARTITIONS`, manifest
    * arithmetic only: one row per partition value-tuple with file
    * count, row count (null if any file predates row tracking), and
    * bytes. Values parse from the hive-layout path segments both write
    * vintages produce (`__gp_<entry>=<v>` graft-written, `<col>=<v>`
    * converted-in-place), so partition-spec evolution shows each
    * vintage's real layout. At 100 TB this answers "which days are
    * hot / small-filed / missing" without listing a single data dir —
    * the triage query before a scoped OPTIMIZE or replaceWhere. */
  def partitions(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 1 || exprs.length == 2,
      "usage: graft_partitions(path[, version])")
    val table = str(exprs.head, "path")
    val spark = SparkSession.active
    val v = if (exprs.length == 2) long(exprs(1), "version")
      else TxnTable.latestVersion(spark, table).getOrElse(
        throw new IllegalStateException(s"no committed version in $table"))
    val fs = TxnTable.snapshotFiles(spark, table, v)
    val rows = TxnTable.fileRows(spark, table, v)
    val conf = spark.sessionState.newHadoopConf()
    def partOf(f: String): String =
      f.split('/').dropRight(1)
        .filter(seg => seg.contains('=') && !seg.startsWith("w="))
        .map(seg =>
          if (seg.startsWith("__gp_")) seg.substring("__gp_".length) else seg)
        .mkString("/")
    val out = Seq(
      AttributeReference("partition", StringType, nullable = false)(),
      AttributeReference("n_files", LongType, nullable = false)(),
      AttributeReference("n_rows", LongType, nullable = true)(),
      AttributeReference("bytes", LongType, nullable = false)())
    val data = fs.groupBy(partOf).toSeq.sortBy(_._1).map { case (p, group) =>
      val bytes = group.map { f =>
        val hp = new org.apache.hadoop.fs.Path(s"$table/$f")
        hp.getFileSystem(conf).getFileStatus(hp).getLen
      }.sum
      val counts = group.map(rows.get)
      val r = new GenericInternalRow(4)
      r.update(0, UTF8String.fromString(p))
      r.setLong(1, group.size.toLong)
      if (counts.forall(_.isDefined)) r.setLong(2, counts.flatten.sum)
      else r.setNullAt(2) // any pre-rows file makes the count unknown
      r.setLong(3, bytes)
      r: InternalRow
    }
    LocalRelation(out, data)
  }

  /** `graft_stages(path)` — the write-audit-publish auditor's listing:
    * pending stages with file/row counts, their stage-time base
    * versions, and the staged-at instant (so abandoned vacuum-pinned
    * stages are findable by an age policy, not by a human noticing).
    * Bounded by the pending-stage count, metadata-only →
    * LocalRelation, exactly like graft_history. */
  def stages(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 1, "usage: graft_stages(path)")
    val table = str(exprs.head, "path")
    val spark = SparkSession.active
    val out = Seq(
      AttributeReference("stage_id", StringType, nullable = false)(),
      AttributeReference("n_files", LongType, nullable = false)(),
      AttributeReference("n_rows", LongType, nullable = false)(),
      AttributeReference("base_version", LongType, nullable = true)(),
      AttributeReference("staged_at", TimestampType, nullable = true)())
    val data = TxnTable.stagedSummaries(spark, table)
      .map { case (id, nf, nr, bv, at) =>
        val r = new GenericInternalRow(5)
        r.update(0, UTF8String.fromString(id))
        r.setLong(1, nf)
        r.setLong(2, nr)
        bv match {
          case Some(v) => r.setLong(3, v)
          case None => r.setNullAt(3)
        }
        at match {
          case Some(ms) => r.setLong(4, ms * 1000L) // micros
          case None => r.setNullAt(4)
        }
        r: InternalRow
      }
    LocalRelation(out, data)
  }

  /** `graft_tags(path)` — the tag map as rows (tag_name, version),
    * name-ordered: the release auditor's listing, parity with
    * graft_stages. Bounded by the tag count, metadata-only →
    * LocalRelation. */
  def tagsList(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 1, "usage: graft_tags(path)")
    val table = str(exprs.head, "path")
    val spark = SparkSession.active
    val out = Seq(
      AttributeReference("tag_name", StringType, nullable = false)(),
      AttributeReference("version", LongType, nullable = false)())
    val data = TxnTable.tags(spark, table).toSeq.sortBy(_._1)
      .map { case (name, v) =>
        val r = new GenericInternalRow(2)
        r.update(0, UTF8String.fromString(name))
        r.setLong(1, v)
        r: InternalRow
      }
    LocalRelation(out, data)
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

  /** SHOW TBLPROPERTIES — (key, value) rows from the manifest's
    * property lines; metadata-eager like SHOW PARTITIONS. */
  def tblProperties(table: String): LogicalPlan = {
    val spark = SparkSession.active
    val props = TxnTable.tableProperties(spark, table)
    val out = Seq(
      AttributeReference("key", StringType, nullable = false)(),
      AttributeReference("value", StringType, nullable = false)())
    val data = props.toSeq.sortBy(_._1).map { case (k, v) =>
      val r = new GenericInternalRow(2)
      r.update(0, UTF8String.fromString(k))
      r.update(1, UTF8String.fromString(v))
      r: InternalRow
    }
    LocalRelation(out, data)
  }

}
