package graft.io

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Minimal TRANSACTIONAL parquet table: versioned snapshot dirs plus an
  * atomically-flipped manifest pointer — the commit-protocol core of the
  * table formats (Delta/Iceberg) whose jar the reference shipped but never
  * used (ref `spark/jars/delta-core_2.12-0.7.0.jar`, SURVEY.md §1.3).
  *
  * Layout:
  *   table/v=1/part-*.parquet     immutable snapshot dirs
  *   table/v=2/part-*.parquet
  *   table/_latest                manifest: the committed version number
  *
  * Protocol: a writer materializes the FULL new snapshot under `v=n+1/`,
  * then commits by atomically replacing `_latest` (temp file + overwrite
  * rename). Readers resolve `_latest` first and only ever list a committed
  * snapshot dir, so they see the old version or the new one — never a
  * partial write; a writer that dies mid-write leaves an orphan dir and an
  * untouched pointer (re-runs overwrite it: idempotent). This is exactly
  * the non-atomicity fix for the reference's copy-then-delete zone hops
  * (ref `dags/s3-etl-wallet-csv.py:161-176`; SURVEY.md §4.2-5).
  *
  * Scale/portability notes: the atomicity seam is ONE small-object
  * replace — rename is atomic on HDFS/local (FileContext.rename OVERWRITE)
  * and maps to the single-key atomic PUT on object stores; data volume
  * never moves through the commit path. Old snapshots stay readable
  * (time travel) until `vacuum`. Single-writer protocol: concurrent
  * committers need a CAS on the pointer, which plain FS rename can't
  * give — that is the (documented) line between this and a full Delta. */
object TxnTable {

  private val Manifest = "_latest"

  private def fc(spark: SparkSession): FileContext =
    FileContext.getFileContext(spark.sparkContext.hadoopConfiguration)

  /** Highest committed version, if any. */
  def latestVersion(spark: SparkSession, table: String): Option[Long] = {
    val ctx = fc(spark)
    val p = new Path(table, Manifest)
    if (!ctx.util.exists(p)) None
    else {
      val in = ctx.open(p)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    }
  }

  /** Write `df` as the next snapshot and commit it atomically.
    * @return the committed version number. */
  def commitOverwrite(df: DataFrame, table: String): Long = {
    val spark = df.sparkSession
    val next = latestVersion(spark, table).getOrElse(0L) + 1L
    df.write.mode(SaveMode.Overwrite).parquet(s"$table/v=$next")
    commitPointer(spark, table, next)
    next
  }

  /** Flip the manifest to `version` (exposed separately so tests can
    * simulate a writer dying between data write and commit). */
  def commitPointer(spark: SparkSession, table: String, version: Long): Unit = {
    val ctx = fc(spark)
    val tmp = new Path(table,
      s"$Manifest.tmp.${java.util.UUID.randomUUID().toString.take(8)}")
    val out = ctx.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE),
      Options.CreateOpts.createParent())
    try out.write(version.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // the commit point: one atomic small-object replace
    ctx.rename(tmp, new Path(table, Manifest), Options.Rename.OVERWRITE)
  }

  /** Read the committed snapshot. */
  def read(spark: SparkSession, table: String): DataFrame =
    readVersion(spark, table,
      latestVersion(spark, table).getOrElse(
        throw new IllegalStateException(s"no committed version in $table")))

  /** Time travel: read snapshot `version` (must not be vacuumed). */
  def readVersion(spark: SparkSession, table: String, version: Long): DataFrame =
    spark.read.parquet(s"$table/v=$version")

  /** All snapshot versions present on disk (committed or orphaned). */
  def versions(spark: SparkSession, table: String): Seq[Long] = {
    val ctx = fc(spark)
    val dir = new Path(table)
    if (!ctx.util.exists(dir)) Seq.empty
    else {
      val it = ctx.listStatus(dir) // RemoteIterator
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (it.hasNext) {
        val st = it.next()
        val n = st.getPath.getName
        if (st.isDirectory && n.startsWith("v=")) buf += n.drop(2).toLong
      }
      buf.sorted.toSeq
    }
  }

  /** Compaction: rewrite the committed snapshot into `targetFiles` files
    * as a NEW version (readers on the old version are never disturbed —
    * same commit path as any write). The small-files answer for a table
    * fed by incremental appends/streaming batches; pair with `vacuum` to
    * reclaim the superseded fragments. */
  def compact(spark: SparkSession, table: String, targetFiles: Int = 1): Long =
    commitOverwrite(read(spark, table).coalesce(targetFiles), table)

  /** Delete snapshots older than the committed one (minus `keep` extra
    * retained versions) — bounded storage for a daily-overwrite table. */
  def vacuum(spark: SparkSession, table: String, keep: Int = 0): Unit = {
    val ctx = fc(spark)
    latestVersion(spark, table).foreach { latest =>
      versions(spark, table)
        .filter(_ < latest - keep)
        .foreach(v => ctx.delete(new Path(table, s"v=$v"), true))
    }
  }
}
