package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.types.{Decimal, StructType}
import org.apache.spark.sql.vectorized.{ColumnarArray, ColumnarBatch, ColumnarMap, ColumnVector}
import org.apache.spark.unsafe.types.UTF8String

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
  * driver materialization) and drops exactly those rows. Un-named
  * files ride the ordinary delegate untouched.
  *
  * COLUMNAR: the scan stays on the vectorized parquet reader
  * everywhere. Vector-named partitions filter at the ColumnarBatch
  * level — per delegate batch, one pass over the row-index vector
  * builds the surviving-ordinal map; a batch with no deleted rows
  * re-emits the delegate's vectors as-is (zero indirection, the common
  * case since vectors are sparse), a hit batch wraps each vector in a
  * [[RemapColumnVector]] that redirects row ids through the map
  * (Iceberg's ColumnVectorWithFilter shape — no data copy). Clean
  * partitions pass the delegate's batches through untouched, so ONE
  * named file no longer de-vectorizes the other 10,000. Row-based
  * reads remain only when the delegate itself refuses columnar (e.g.
  * vectorization disabled by conf), decided uniformly up front so the
  * scan never mixes partition kinds.
  *
  * Scale shape: a vector naming k of a 100 TB table's files costs k
  * single-file scans that keep the vectorized reader; the subtraction
  * is an O(batch) ordinal probe per 4k-row batch, not a join. */
private[io] class GraftVecBatch(
    clean: Option[Batch],
    vecs: Seq[(String, Batch, Seq[String])], // (fileRel, delegate, sidecars)
    tableRoot: String,
    out: StructType,
    // the DRIVER's session Hadoop conf (spark.hadoop.* keys, session
    // overrides, object-store credentials), broadcast so the per-task
    // sidecar reads resolve the filesystem exactly like the scan
    // itself — a bare executor-side `new Configuration()` would drop
    // every driver-configured key and break on any non-default FS
    bcConf: org.apache.spark.broadcast.Broadcast[
      org.apache.spark.util.SerializableConfiguration]) extends Batch {

  // delegate partitions planned ONCE (file listing cost): both
  // planInputPartitions and the columnar decision below read these
  private lazy val cleanParts: Option[Array[InputPartition]] =
    clean.map(_.planInputPartitions())
  private lazy val vecParts: Seq[Array[InputPartition]] =
    vecs.map(_._2.planInputPartitions())

  override def planInputPartitions(): Array[InputPartition] =
    (cleanParts.toSeq.flatMap(_.map(p => new GraftCleanPartition(p))) ++
      vecs.zipWithIndex.flatMap { case ((f, _, _), i) =>
        vecParts(i).map(p => new GraftVecPartition(i, f, p))
      }).toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val cleanF = clean.map(_.createReaderFactory())
    val vecFs = vecs.map(_._2.createReaderFactory())
    // Spark refuses a scan mixing columnar and row partitions — decide
    // ONCE for all of them: columnar iff every delegate supports it for
    // every one of its partitions (they share one schema modulo the
    // appended long row-index, so in practice this is all-or-nothing)
    val columnar =
      cleanParts.zip(cleanF).forall { case (ps, f) =>
        ps.forall(f.supportColumnarReads) } &&
      vecParts.zip(vecFs).forall { case (ps, f) =>
        ps.forall(f.supportColumnarReads) }
    new GraftVecReaderFactory(cleanF, vecFs.toArray,
      vecs.map(_._3.toArray).toArray, tableRoot, out, columnar, bcConf)
  }
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
    out: StructType,
    columnar: Boolean,
    bcConf: org.apache.spark.broadcast.Broadcast[
      org.apache.spark.util.SerializableConfiguration])
    extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = columnar

  // the broadcast DRIVER conf, not a bare new Configuration(): sidecar
  // GETs must see the same spark.hadoop.* keys / credentials as the
  // delegate parquet scan or they break on any non-default filesystem
  private def deletedOf(v: GraftVecPartition): java.util.HashSet[java.lang.Long] =
    PosVectors.ordinalsFor(
      bcConf.value.value,
      sidecars(v.idx).toSeq.map(s => new Path(s"$tableRoot/$s")),
      v.fileRel)

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case c: GraftCleanPartition => cleanF.get.createReader(c.inner)
      case v: GraftVecPartition =>
        val inner = vecFs(v.idx).createReader(v.inner)
        new PartitionReader[InternalRow] {
          private val deleted = deletedOf(v)
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

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[ColumnarBatch] = p match {
    case c: GraftCleanPartition => cleanF.get.createColumnarReader(c.inner)
    case v: GraftVecPartition =>
      val inner = vecFs(v.idx).createColumnarReader(v.inner)
      new PartitionReader[ColumnarBatch] {
        private val deleted = deletedOf(v)
        private var current: ColumnarBatch = _
        override def next(): Boolean = {
          while (inner.next()) {
            val b = inner.get()
            val n = b.numRows()
            val idxVec = b.column(out.length)
            // one pass over the row-index vector: surviving delegate
            // ordinals, in order
            val map = new Array[Int](n)
            var kept = 0
            var i = 0
            while (i < n) {
              if (!deleted.contains(idxVec.getLong(i))) {
                map(kept) = i; kept += 1
              }
              i += 1
            }
            if (kept > 0) {
              val cols: Array[ColumnVector] =
                if (kept == n) Array.tabulate(out.length)(b.column)
                else Array.tabulate[ColumnVector](out.length)(j =>
                  new RemapColumnVector(b.column(j), map))
              current = new ColumnarBatch(cols, kept)
              return true
            }
            // fully-deleted batch: skip it
          }
          false
        }
        override def get(): ColumnarBatch = current
        override def close(): Unit = inner.close()
      }
  }
}

/** A [[ColumnVector]] view over a delegate with deleted rows skipped:
  * logical row id i reads the delegate's `map(i)` (the Iceberg
  * ColumnVectorWithFilter shape). No data copies or moves — one array
  * index per access, and only on batches that actually contain deleted
  * rows. `hasNull`/`numNulls` delegate unchanged (over-reporting nulls
  * that sat on deleted rows is safe: callers use them to pick the
  * null-checking code path, never as row truth). The delegate's reader
  * owns vector lifecycle, so `close()` is a no-op — closing here could
  * double-free the reused off-heap buffers the parquet reader recycles
  * across batches. */
private[io] final class RemapColumnVector(
    delegate: ColumnVector, map: Array[Int])
    extends ColumnVector(delegate.dataType()) {
  override def close(): Unit = ()
  override def hasNull: Boolean = delegate.hasNull
  override def numNulls: Int = delegate.numNulls
  override def isNullAt(i: Int): Boolean = delegate.isNullAt(map(i))
  override def getBoolean(i: Int): Boolean = delegate.getBoolean(map(i))
  override def getByte(i: Int): Byte = delegate.getByte(map(i))
  override def getShort(i: Int): Short = delegate.getShort(map(i))
  override def getInt(i: Int): Int = delegate.getInt(map(i))
  override def getLong(i: Int): Long = delegate.getLong(map(i))
  override def getFloat(i: Int): Float = delegate.getFloat(map(i))
  override def getDouble(i: Int): Double = delegate.getDouble(map(i))
  override def getArray(i: Int): ColumnarArray = delegate.getArray(map(i))
  override def getMap(i: Int): ColumnarMap = delegate.getMap(map(i))
  override def getDecimal(i: Int, precision: Int, scale: Int): Decimal =
    delegate.getDecimal(map(i), precision, scale)
  override def getUTF8String(i: Int): UTF8String =
    delegate.getUTF8String(map(i))
  override def getBinary(i: Int): Array[Byte] = delegate.getBinary(map(i))
  // struct (and interval/variant) access goes through getStruct(i) →
  // ColumnarRow(this, i) → getChild(ord).getX(i): children must remap
  // with the SAME map. Lazily wrapped per ordinal — child count varies
  // by type and only struct-bearing vectors ever ask.
  private val children =
    new java.util.HashMap[Integer, ColumnVector]()
  override def getChild(ordinal: Int): ColumnVector = {
    val got = children.get(ordinal)
    if (got != null) got
    else {
      val made = new RemapColumnVector(delegate.getChild(ordinal), map)
      children.put(ordinal, made)
      made
    }
  }
}
