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
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(SparkSession.active, table, version, tableSchema, options)
}

private[io] class GraftScanBuilder(
    spark: SparkSession, table: String, version: Long,
    dataSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = dataSchema
  private var pushed: Array[Filter] = Array.empty

  /** Conservative per-column bounds a filter implies: only shapes whose
    * satisfying rows PROVABLY fall in [lo, hi] on a single column are
    * extracted (equality, one-sided and two-sided ranges, conjunctions
    * — intersect). Anything else contributes no bound — never wrong,
    * just unpruned. */
  private def bounds(f: Filter): Map[String, (Double, Double)] = {
    def num(v: Any): Option[Double] = v match {
      case n: Number => Some(n.doubleValue())
      case _ => None // strings/timestamps: no numeric-stats pruning (yet)
    }
    f match {
      case EqualTo(c, v) => num(v).map(d => Map(c -> (d, d))).getOrElse(Map.empty)
      case GreaterThan(c, v) =>
        num(v).map(d => Map(c -> (d, Double.PositiveInfinity))).getOrElse(Map.empty)
      case GreaterThanOrEqual(c, v) =>
        num(v).map(d => Map(c -> (d, Double.PositiveInfinity))).getOrElse(Map.empty)
      case LessThan(c, v) =>
        num(v).map(d => Map(c -> (Double.NegativeInfinity, d))).getOrElse(Map.empty)
      case LessThanOrEqual(c, v) =>
        num(v).map(d => Map(c -> (Double.NegativeInfinity, d))).getOrElse(Map.empty)
      case In(c, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Number]) =>
        val ds = vs.map(_.asInstanceOf[Number].doubleValue())
        Map(c -> (ds.min, ds.max))
      case And(a, b) =>
        val (ba, bb) = (bounds(a), bounds(b))
        (ba.keySet ++ bb.keySet).map { c =>
          val (lo1, hi1) = ba.getOrElse(c, (Double.NegativeInfinity, Double.PositiveInfinity))
          val (lo2, hi2) = bb.getOrElse(c, (Double.NegativeInfinity, Double.PositiveInfinity))
          c -> (math.max(lo1, lo2), math.min(hi1, hi2))
        }.toMap
      case _ => Map.empty
    }
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
    val merged = pushed.map(bounds).foldLeft(
      Map.empty[String, (Double, Double)]) { (acc, m) =>
      (acc.keySet ++ m.keySet).map { c =>
        val (lo1, hi1) = acc.getOrElse(c, (Double.NegativeInfinity, Double.PositiveInfinity))
        val (lo2, hi2) = m.getOrElse(c, (Double.NegativeInfinity, Double.PositiveInfinity))
        c -> (math.max(lo1, lo2), math.min(hi1, hi2))
      }.toMap
    }
    val chosen = files.filter { f =>
      merged.forall { case (c, (lo, hi)) =>
        stats.getOrElse(f, Nil).find(_.col == c)
          .forall(s => s.max >= lo && s.min <= hi)
      }
    }
    org.apache.spark.sql.GraftBridge.parquetScan(
      spark, chosen.map(f => s"$table/$f"), dataSchema, required, pushed, options)
  }
}
