package graft.io

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal TRANSACTIONAL parquet table: per-version FILE MANIFESTS plus an
  * atomically-flipped pointer — the commit-protocol core of the table
  * formats (Delta/Iceberg) whose jar the reference shipped but never used
  * (ref `spark/jars/delta-core_2.12-0.7.0.jar`, SURVEY.md §1.3).
  *
  * Layout:
  *   table/v=1/part-*.parquet      immutable data-file dirs, one per commit
  *   table/v=2/part-*.parquet
  *   table/_v00001.manifest        the file list of snapshot 1
  *   table/_v00002.manifest        the file list of snapshot 2
  *   table/_latest                 pointer: the committed version number
  *
  * Protocol: a writer materializes its new data files under `v=n+1/`,
  * writes the version's manifest (OVERWRITE commit: just the new files;
  * APPEND commit: the previous manifest's files plus the new ones), then
  * commits by atomically replacing `_latest`. Readers resolve `_latest` →
  * manifest → file list, so they see a complete old snapshot or a
  * complete new one — never a partial write; a writer that dies before
  * the flip leaves orphan files and an untouched pointer (invisible to
  * readers AND to `versions`; the next committer overwrites the slot).
  * This is the non-atomicity fix for the reference's copy-then-delete
  * zone hops (ref `dags/s3-etl-wallet-csv.py:161-176`; SURVEY.md §4.2-5).
  *
  * Scale/portability: the atomicity seam is ONE small-object replace —
  * atomic on HDFS/local via FileContext rename OVERWRITE, mapping to the
  * single-key atomic PUT on object stores; data volume never moves
  * through the commit path, and an append commit rewrites NO existing
  * data (manifest concatenation only). Superseded snapshots stay
  * readable (time travel via their manifests) until `vacuum` reclaims
  * unreferenced files. Single-writer protocol: concurrent committers
  * need a CAS on the pointer, which plain FS rename can't give — the
  * documented line between this and a full Delta. Streaming foreachBatch
  * replay after a sink failure can re-append a batch; full idempotence
  * needs the (appId, batchId) txn markers real Delta stores. */
object TxnTable {

  private val Latest = "_latest"
  private def manifestName(v: Long) = f"_v$v%05d.manifest"

  private def fc(spark: SparkSession): FileContext =
    FileContext.getFileContext(spark.sparkContext.hadoopConfiguration)

  private def readSmall(ctx: FileContext, p: Path): String = {
    val in = ctx.open(p)
    try new String(in.readAllBytes(), UTF_8) finally in.close()
  }

  private def writeSmallAtomic(ctx: FileContext, dest: Path, content: String): Unit = {
    val tmp = new Path(dest.getParent,
      s"${dest.getName}.tmp.${java.util.UUID.randomUUID().toString.take(8)}")
    val out = ctx.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE),
      Options.CreateOpts.createParent())
    try out.write(content.getBytes(UTF_8)) finally out.close()
    ctx.rename(tmp, dest, Options.Rename.OVERWRITE)
  }

  /** Highest committed version, if any. */
  def latestVersion(spark: SparkSession, table: String): Option[Long] = {
    val ctx = fc(spark)
    val p = new Path(table, Latest)
    if (!ctx.util.exists(p)) None
    else Some(readSmall(ctx, p).trim.toLong)
  }

  /** Committed snapshot versions (those with a manifest), ascending.
    * Orphan `v=` dirs from dead writers are NOT listed. */
  def versions(spark: SparkSession, table: String): Seq[Long] = {
    val ctx = fc(spark)
    val dir = new Path(table)
    if (!ctx.util.exists(dir)) Seq.empty
    else {
      val it = ctx.listStatus(dir)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (it.hasNext) {
        val n = it.next().getPath.getName
        if (n.startsWith("_v") && n.endsWith(".manifest"))
          buf += n.stripPrefix("_v").stripSuffix(".manifest").toLong
      }
      buf.sorted.toSeq
    }
  }

  /** Table-relative data files of snapshot `version`. */
  private def manifestFiles(spark: SparkSession, table: String, version: Long): Seq[String] = {
    val ctx = fc(spark)
    val p = new Path(table, manifestName(version))
    require(ctx.util.exists(p),
      s"no manifest for version $version in $table (never committed, or vacuumed)")
    readSmall(ctx, p).split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private def listParquet(spark: SparkSession, table: String, v: Long): Seq[String] = {
    val ctx = fc(spark)
    val it = ctx.listStatus(new Path(s"$table/v=$v"))
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val n = it.next().getPath.getName
      if (n.endsWith(".parquet")) buf += s"v=$v/$n"
    }
    buf.sorted.toSeq
  }

  private def commit(df: DataFrame, table: String, append: Boolean): Long = {
    val spark = df.sparkSession
    val prior = latestVersion(spark, table)
    val next = prior.getOrElse(0L) + 1L
    // Overwrite clobbers any orphan dir a dead writer left in this slot
    df.write.mode(SaveMode.Overwrite).parquet(s"$table/v=$next")
    val newFiles = listParquet(spark, table, next)
    val files =
      if (append) prior.map(manifestFiles(spark, table, _)).getOrElse(Nil) ++ newFiles
      else newFiles
    val ctx = fc(spark)
    writeSmallAtomic(ctx, new Path(table, manifestName(next)), files.mkString("\n"))
    commitPointer(spark, table, next)
    next
  }

  /** Write `df` as a full replacement snapshot and commit it atomically. */
  def commitOverwrite(df: DataFrame, table: String): Long =
    commit(df, table, append = false)

  /** Append `df` as a new snapshot = previous snapshot + new files —
    * no existing data is rewritten; the commit is manifest concatenation
    * plus the atomic pointer flip. The streaming-sink shape: each
    * microbatch appends atomically, readers always see whole batches. */
  def commitAppend(df: DataFrame, table: String): Long =
    commit(df, table, append = true)

  /** Flip the pointer to `version` (exposed separately so tests can
    * simulate a writer dying between data write and commit). */
  def commitPointer(spark: SparkSession, table: String, version: Long): Unit =
    writeSmallAtomic(fc(spark), new Path(table, Latest), version.toString)

  /** Read the committed snapshot. */
  def read(spark: SparkSession, table: String): DataFrame =
    readVersion(spark, table,
      latestVersion(spark, table).getOrElse(
        throw new IllegalStateException(s"no committed version in $table")))

  /** Time travel: read snapshot `version` (must not be vacuumed). */
  def readVersion(spark: SparkSession, table: String, version: Long): DataFrame = {
    val files = manifestFiles(spark, table, version).map(f => s"$table/$f")
    spark.read.parquet(files: _*)
  }

  /** Compaction: rewrite the committed snapshot into `targetFiles` files
    * as a NEW version (readers on the old version are never disturbed —
    * same commit path as any write). The small-files answer for a table
    * fed by streaming appends; pair with `vacuum` to reclaim fragments. */
  def compact(spark: SparkSession, table: String, targetFiles: Int = 1): Long =
    commitOverwrite(read(spark, table).coalesce(targetFiles), table)

  /** Drop snapshot manifests older than `latest - keep` and delete data
    * files no RETAINED manifest references (append commits share files
    * across versions, so reclamation is reference-counted, not per-dir). */
  def vacuum(spark: SparkSession, table: String, keep: Int = 0): Unit = {
    val ctx = fc(spark)
    latestVersion(spark, table).foreach { latest =>
      val (dropped, retained) = versions(spark, table).partition(_ < latest - keep)
      dropped.foreach(v => ctx.delete(new Path(table, manifestName(v)), false))
      // reclamation is FILE-driven, not version-driven: append lineage
      // lets retained manifests reference files in ANY older version dir
      // (and an already-dropped manifest's shared files only become
      // unreferenced when the last retainer drops), so sweep every v=*
      // dir on disk and delete what no surviving manifest references —
      // then whole-dir delete emptied dirs (clears _SUCCESS/checksums).
      val referenced = retained.flatMap(manifestFiles(spark, table, _)).toSet
      val dirIt = ctx.listStatus(new Path(table))
      while (dirIt.hasNext) {
        val st = dirIt.next()
        val n = st.getPath.getName
        if (st.isDirectory && n.startsWith("v=")) {
          val v = n.drop(2).toLong
          val files = listParquet(spark, table, v)
          if (files.forall(f => !referenced.contains(f)))
            ctx.delete(st.getPath, true)
          else files.filterNot(referenced.contains)
            .foreach(f => ctx.delete(new Path(s"$table/$f"), false))
        }
      }
    }
  }
}
