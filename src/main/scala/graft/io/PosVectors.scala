package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Positional deletion-vector sidecar access — the (table-relative
  * file, row ordinal) pairs [[TxnTable.deletePositions]] commits. Read
  * through parquet-mr's example Group API so BOTH sides can use it:
  * the driver (metadata-only aggregate planning subtracts per-file
  * deleted counts) and executor tasks (each vector-gated file's
  * partition reader loads its own ordinal set — no driver
  * materialization of vectors on the row path, the Delta DV shape).
  * Sidecars are kilobytes by design (`coalesce(1)` at commit), so a
  * per-task re-read costs one small-object GET. */
object PosVectors {

  /** Iterate a sidecar's (file, ordinal) pairs. */
  def pairs(conf: Configuration, sidecar: Path): Iterator[(String, Long)] = {
    val reader = org.apache.parquet.hadoop.ParquetReader
      .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
        sidecar)
      .withConf(conf).build()
    new Iterator[(String, Long)] {
      private var nextGroup: org.apache.parquet.example.data.Group = reader.read()
      override def hasNext: Boolean = {
        val has = nextGroup != null
        if (!has) reader.close()
        has
      }
      override def next(): (String, Long) = {
        val g = nextGroup
        nextGroup = reader.read()
        (g.getString(TxnTable.PosFileCol, 0),
          g.getLong(TxnTable.PosOrdCol, 0))
      }
    }
  }

  /** The DISTINCT deleted ordinals of `fileRel` across `sidecars`
    * (distinct because overlapping vectors from separate commits may
    * re-delete the same coordinate — subtracting twice would corrupt
    * counts). */
  def ordinalsFor(conf: Configuration, sidecars: Seq[Path],
                  fileRel: String): java.util.HashSet[java.lang.Long] = {
    val out = new java.util.HashSet[java.lang.Long]()
    sidecars.foreach { sc =>
      pairs(conf, sc).foreach { case (f, ord) =>
        if (f == fileRel) { out.add(ord); () }
      }
    }
    out
  }

  /** Per-file DISTINCT deleted-row counts across every (file, sidecar
    * set) pairing — the driver-side input to metadata-only COUNT
    * subtraction and exact scan statistics. `gate` maps each data file
    * to the sidecars that apply to it (the version/named gating is the
    * caller's). None when the vectors exceed `rowsLimit` total
    * recorded pairs — the guard that keeps planning driver-safe; the
    * row path never needs this map. */
  def deletedCounts(conf: Configuration, tableRoot: String,
                    gate: Map[String, Seq[String]],
                    rowsLimit: Long): Option[Map[String, Long]] = {
    if (gate.isEmpty) return Some(Map.empty)
    val sidecars = gate.values.flatten.toSeq.distinct
    // one pass per sidecar: ordinal sets per (sidecar, file), then per
    // file the union over its applicable sidecars
    val perSidecar = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Map[String, scala.collection.mutable.Set[Long]]]
    var seen = 0L
    sidecars.foreach { sc =>
      val m = scala.collection.mutable.Map
        .empty[String, scala.collection.mutable.Set[Long]]
      pairs(conf, new Path(s"$tableRoot/$sc")).foreach { case (f, ord) =>
        seen += 1L
        if (seen > rowsLimit) return None
        m.getOrElseUpdate(f, scala.collection.mutable.Set.empty) += ord
      }
      perSidecar(sc) = m
    }
    Some(gate.map { case (f, scs) =>
      val union = scala.collection.mutable.Set.empty[Long]
      scs.foreach(sc =>
        perSidecar.get(sc).flatMap(_.get(f)).foreach(union ++= _))
      f -> union.size.toLong
    })
  }
}
