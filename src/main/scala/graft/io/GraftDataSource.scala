package graft.io

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 surface for [[TxnTable]]: `spark.read.format("graft")
  * .load(tablePath)` — and therefore plain SQL over a temp view — gets
  * manifest-stats FILE SKIPPING automatically, instead of only through
  * the blessed `TxnTable.readRange` API. This is what the reference's
  * shipped-but-unused Delta jar represents (ref
  * `spark/jars/delta-core_2.12-0.7.0.jar`, SURVEY.md §1.3): a table
  * format whose planning consults the commit log, not the filesystem.
  *
  * Division of labour (Spark-first): this class only decides WHICH
  * files a query must read — snapshot pinning at planning time, filter
  * → min/max overlap pruning, column pruning — and then hands the
  * chosen files to Spark's own vectorized `ParquetScan` (via
  * GraftBridge), so execution inherits whole-stage codegen, nested
  * schema pruning, and row-group skipping for free.
  *
  * Filter contract: pushed range/equality filters are used for file
  * skipping only — every filter is also RETURNED as a residual, so
  * Spark re-evaluates them row-by-row post-scan. Skipping is sound for
  * NULL-laden files because a range/equality predicate on the stats
  * column can never select a NULL row anyway.
  *
  * Options: `versionAsOf` time-travels to a committed snapshot; the
  * default pins the latest version once at planning (a long query never
  * sees a torn snapshot).
  */
class GraftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  private def tablePath(options: util.Map[String, String]): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "graft format requires a table path: spark.read.format(\"graft\").load(path)")
    p
  }

  private def pinnedVersion(spark: SparkSession, table: String,
                            options: util.Map[String, String]): Long =
    Option(options.get("versionAsOf")).map(_.toLong).getOrElse(
      TxnTable.latestVersion(spark, table).getOrElse(
        throw new IllegalStateException(s"no committed version in $table")))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val table = tablePath(options)
    val v = pinnedVersion(spark, table, options)
    TxnTable.snapshotSchema(spark, table, v).getOrElse(
      throw new IllegalStateException(
        s"$table@v$v predates the schema log — unreadable through format(\"graft\")"))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val spark = SparkSession.active
    val table = tablePath(properties)
    new GraftTable(table, pinnedVersion(spark, table, properties), schema)
  }
}

private[io] class GraftTable(table: String, version: Long, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft.`$table`@v$version"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(SparkSession.active, table, version, tableSchema, options)
}

/** Marker the spec bridge (GraftBridge.dsv2ScannedFiles) reads the
  * post-pruning file count through, now that the planner sees the graft
  * wrapper Scan instead of Spark's FileScan directly. */
trait GraftScanFiles { def scannedFileCount: Int }

private[io] class GraftScanBuilder(
    spark: SparkSession, table: String, version: Long,
    dataSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = dataSchema
  private var pushed: Array[Filter] = Array.empty

  import TxnTable.Bound

  /** One filter value normalized against the column's declared type —
    * numbers and temporals to Right(epoch/double), strings on string
    * columns to Left(lexicographic). None = unprunable value. */
  private def value(c: String, v: Any): Option[Either[String, Double]] =
    dataSchema.find(_.name == c).flatMap { f =>
      try Some(TxnTable.boundValue(v, f.dataType))
      catch { case _: IllegalArgumentException => None }
    }

  private def point(e: Either[String, Double]): Bound = e match {
    case Right(d) => Bound("num", lo = d, hi = d)
    case Left(s) => Bound("str", loS = s, hiS = s)
  }
  private def lower(e: Either[String, Double]): Bound = e match {
    case Right(d) => Bound("num", lo = d)
    case Left(s) => Bound("str", loS = s)
  }
  private def upper(e: Either[String, Double]): Bound = e match {
    case Right(d) => Bound("num", hi = d)
    case Left(s) => Bound("str", hiS = s)
  }
  /** Intersection of two bounds on the same column (ANDed filters); a
    * kind conflict yields an unprunable marker, never a wrong prune. */
  private def inter(a: Bound, b: Bound): Bound =
    if (a.kind == "num" && b.kind == "num")
      Bound("num", lo = math.max(a.lo, b.lo), hi = math.min(a.hi, b.hi))
    else if (a.kind == "str" && b.kind == "str")
      Bound("str",
        loS = (Option(a.loS) ++ Option(b.loS))
          .reduceOption((x: String, y: String) => if (x >= y) x else y).orNull,
        hiS = (Option(a.hiS) ++ Option(b.hiS))
          .reduceOption((x: String, y: String) => if (x <= y) x else y).orNull)
    else Bound("conflict")

  /** Conservative per-column bounds a filter implies: only shapes whose
    * satisfying rows PROVABLY fall in a single column's range are
    * extracted (equality, one-sided and two-sided ranges, In,
    * conjunctions). Anything else contributes no bound — never wrong,
    * just unpruned. Typed: numeric, string, and temporal columns all
    * prune against their manifest stats. */
  private def bounds(f: Filter): Map[String, Bound] = f match {
    case EqualTo(c, v) => value(c, v).map(e => Map(c -> point(e))).getOrElse(Map.empty)
    case GreaterThan(c, v) => value(c, v).map(e => Map(c -> lower(e))).getOrElse(Map.empty)
    case GreaterThanOrEqual(c, v) => value(c, v).map(e => Map(c -> lower(e))).getOrElse(Map.empty)
    case LessThan(c, v) => value(c, v).map(e => Map(c -> upper(e))).getOrElse(Map.empty)
    case LessThanOrEqual(c, v) => value(c, v).map(e => Map(c -> upper(e))).getOrElse(Map.empty)
    case In(c, vs) if vs.nonEmpty =>
      val es = vs.toSeq.map(v => value(c, v))
      if (es.exists(_.isEmpty)) Map.empty
      else es.flatten.foldLeft(Option.empty[Bound]) {
        // In = UNION of points: the enclosing [min, max] envelope
        case (None, e) => Some(point(e))
        case (Some(b), e) => point(e) match {
          case p if p.kind == b.kind && p.kind == "num" =>
            Some(Bound("num", lo = math.min(b.lo, p.lo), hi = math.max(b.hi, p.hi)))
          case p if p.kind == b.kind =>
            Some(Bound("str",
              loS = Ordering[String].min(b.loS, p.loS),
              hiS = Ordering[String].max(b.hiS, p.hiS)))
          case _ => Some(Bound("conflict"))
        }
      }.map(b => Map(c -> b)).getOrElse(Map.empty)
    case And(a, b) =>
      val (ba, bb) = (bounds(a), bounds(b))
      (ba.keySet ++ bb.keySet).map { c =>
        (ba.get(c), bb.get(c)) match {
          case (Some(x), Some(y)) => c -> inter(x, y)
          case (Some(x), None) => c -> x
          case (None, Some(y)) => c -> y
          case _ => c -> Bound("conflict") // unreachable
        }
      }.toMap
    case _ => Map.empty
  }

  /** Equality constraints a filter implies, one entry per conjunct:
    * `k === x` yields (k, [x]); `k IN (…)` yields (k, values) — a file
    * survives if ANY value might be present. Applied AFTER min/max
    * pruning as an independent bloom probe per constraint. */
  private def eqConstraints(f: Filter): Seq[(String, Seq[Any])] = f match {
    case EqualTo(c, v) if v != null => Seq(c -> Seq(v))
    case In(c, vs) if vs.nonEmpty => Seq(c -> vs.toSeq)
    case And(a, b) => eqConstraints(a) ++ eqConstraints(b)
    case _ => Nil
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => bounds(f).nonEmpty)
    filters // ALL filters stay residual: skipping prunes files, Spark prunes rows
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val files = TxnTable.snapshotFiles(spark, table, version)
    val stats = TxnTable.fileStats(spark, table, version)
    // intersect bounds across every pushed filter (they are ANDed)
    val merged = pushed.map(bounds).foldLeft(Map.empty[String, Bound]) {
      (acc, m) =>
        (acc.keySet ++ m.keySet).map { c =>
          (acc.get(c), m.get(c)) match {
            case (Some(x), Some(y)) => c -> inter(x, y)
            case (Some(x), None) => c -> x
            case (None, Some(y)) => c -> y
            case _ => c -> Bound("conflict") // unreachable
          }
        }.toMap
    }
    val statsChosen = files.filter { f =>
      merged.forall { case (c, b) =>
        stats.getOrElse(f, Nil).find(_.col == c).forall(_.mayOverlap(b))
      }
    }
    // equality constraints additionally probe bloom sidecars — the
    // pruning min/max can't do on a hash-partitioned point lookup
    val chosen = pushed.flatMap(eqConstraints).distinct
      .foldLeft(statsChosen) { case (fs, (c, vs)) =>
        TxnTable.pruneByBloom(spark, table, version, c, vs, fs)
      }
    new GraftScan(spark, table, version, dataSchema, required, pushed,
      chosen, options)
  }
}

/** The Scan the graft planner hands Spark: batch execution delegates to
  * Spark's own vectorized ParquetScan over the pruned file list (as
  * before — the wrapper adds no execution code), and streaming execution
  * exposes the commit log as a MicroBatchStream. */
private[io] class GraftScan(
    spark: SparkSession, table: String, version: Long,
    dataSchema: StructType, required: StructType,
    pushed: Array[Filter], chosenFiles: Seq[String],
    options: CaseInsensitiveStringMap)
    extends Scan with GraftScanFiles {
  override def readSchema(): StructType = required
  override def description(): String =
    s"GraftScan graft.`$table`@v$version [${chosenFiles.size} files]"
  override def scannedFileCount: Int = chosenFiles.size
  override def toBatch: org.apache.spark.sql.connector.read.Batch =
    org.apache.spark.sql.GraftBridge.parquetScan(
      spark, chosenFiles.map(f => s"$table/$f"), dataSchema, required,
      pushed, options).toBatch
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftMicroBatchStream(spark, table, dataSchema, required, pushed, options)
}

/** Offset = committed table VERSION: the log's linear history is the
  * stream's order, so offsets are exact, replayable, and comparable —
  * the property Spark's checkpointing needs for exactly-once. */
private[io] class GraftOffset(val v: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = v.toString
}

/** STREAMING SOURCE over the TxnTable commit log: each microbatch reads
  * the files ADDED between two committed versions (append-only history
  * enforced — an overwrite/delete in range fails loudly rather than
  * misreport as pure addition; compact between streamed batches is a
  * stop-the-stream operation, as for Delta's source). Planning is pure
  * manifest arithmetic — no directory listing, no per-file mtime
  * tracking, cost independent of table history (checkpointed log) —
  * and execution reuses Spark's vectorized parquet readers batch-style.
  * With Trigger.AvailableNow, Spark's own wrapper drains up to the
  * stream-start version and stops — the scheduled-ingest shape. */
private[io] class GraftMicroBatchStream(
    spark: SparkSession, table: String,
    dataSchema: StructType, required: StructType,
    pushed: Array[Filter], options: CaseInsensitiveStringMap)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
  import org.apache.spark.sql.connector.read.streaming.Offset

  private def ver(o: Offset): Long = o.asInstanceOf[GraftOffset].v

  /** `startingVersion` option: first microbatch starts AFTER this
    * version (default 0 = consume the whole table). */
  override def initialOffset(): Offset = new GraftOffset(
    Option(options.get("startingVersion")).map(_.toLong).getOrElse(0L))
  override def latestOffset(): Offset = new GraftOffset(
    TxnTable.latestVersion(spark, table).getOrElse(0L))
  override def deserializeOffset(json: String): Offset =
    new GraftOffset(json.toLong)

  // the scan planned for the current batch's file delta; the reader
  // factory is requested right after planning, on the same driver thread
  private var planned: Option[org.apache.spark.sql.connector.read.Scan] = None

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (ver(start), ver(end))
    if (e <= s) return Array.empty
    val delta = TxnTable.changedFiles(spark, table, s, e)
    val scan = org.apache.spark.sql.GraftBridge.parquetScan(
      spark, delta.map(f => s"$table/$f"), dataSchema, required, pushed, options)
    planned = Some(scan)
    scan.toBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    planned.getOrElse(org.apache.spark.sql.GraftBridge.parquetScan(
      spark, Nil, dataSchema, required, pushed, options))
      .toBatch.createReaderFactory()

  override def commit(end: Offset): Unit = () // progress lives in Spark's checkpoint
  override def stop(): Unit = ()
}
