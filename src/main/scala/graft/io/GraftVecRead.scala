package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.types.StructType

/** POSITIONAL deletion vectors applied INSIDE the DSv2 scan — the read
  * half of [[TxnTable.deletePositions]] on the fast path. Before this,
  * any file a vector named was routed through an analyzer splice into
  * the library's `_metadata` anti-join read, losing metadata-only
  * aggregates, exact scan statistics, and runtime filtering for its
  * whole gate group. Now each vector-NAMED file gets its own delegate
  * parquet scan whose requested schema appends Spark's temporary
  * ROW-INDEX column (the parquet readers fill it exactly, row-group
  * and page skipping accounted); the partition reader loads the
  * file's DISTINCT deleted ordinals from the kilobyte sidecars (one
  * small-object read per task, the Delta deletion-vector shape — no
  * driver materialization) and drops exactly those rows, projecting
  * the ordinal column away. Un-named files ride the ordinary delegate
  * untouched — columnar, whole-stage codegen, everything.
  *
  * Scale shape: a vector naming k of a 100 TB table's files costs k
  * single-file scans (row-based, the one concession) while every
  * other file keeps the vectorized fast path; the subtraction is an
  * O(|vector|) hash probe per task, not a join. */
private[io] class GraftVecBatch(
    clean: Option[Batch],
    vecs: Seq[(String, Batch, Seq[String])], // (fileRel, delegate, sidecars)
    tableRoot: String,
    out: StructType) extends Batch {

  override def planInputPartitions(): Array[InputPartition] =
    (clean.toSeq.flatMap(_.planInputPartitions()
        .map(p => new GraftCleanPartition(p))) ++
      vecs.zipWithIndex.flatMap { case ((f, b, _), i) =>
        b.planInputPartitions().map(p => new GraftVecPartition(i, f, p))
      }).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftVecReaderFactory(
      clean.map(_.createReaderFactory()),
      vecs.map(_._2.createReaderFactory()).toArray,
      vecs.map(_._3.toArray).toArray,
      tableRoot, out)
}

private[io] class GraftCleanPartition(val inner: InputPartition)
    extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

private[io] class GraftVecPartition(val idx: Int, val fileRel: String,
                                    val inner: InputPartition)
    extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

private[io] class GraftVecReaderFactory(
    cleanF: Option[PartitionReaderFactory],
    vecFs: Array[PartitionReaderFactory],
    sidecars: Array[Array[String]],
    tableRoot: String,
    out: StructType) extends PartitionReaderFactory {

  // ALL partitions read ROW-BASED: the ordinal filter is a per-row
  // probe, and Spark refuses a scan mixing columnar and row partitions
  // — the one concession a live vector costs its table's scans
  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case c: GraftCleanPartition => cleanF.get.createReader(c.inner)
      case v: GraftVecPartition =>
        val inner = vecFs(v.idx).createReader(v.inner)
        new PartitionReader[InternalRow] {
          private val deleted = PosVectors.ordinalsFor(
            new org.apache.hadoop.conf.Configuration(),
            sidecars(v.idx).toSeq.map(s => new Path(s"$tableRoot/$s")),
            v.fileRel)
          // delegate rows carry the requested columns + the row index
          // LAST; this codegen'd projection drops the index again so
          // downstream sees exactly readSchema() positionally
          private val proj =
            org.apache.spark.sql.catalyst.expressions.UnsafeProjection
              .create(out.fields.map(_.dataType))
          private var current: InternalRow = _
          override def next(): Boolean = {
            while (inner.next()) {
              val r = inner.get()
              if (!deleted.contains(r.getLong(out.length))) {
                current = r
                return true
              }
            }
            false
          }
          override def get(): InternalRow = proj(current)
          override def close(): Unit = inner.close()
        }
    }
}
