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

  /** Visit a sidecar's (file, ordinal) pairs in order; stop early when
    * `f` returns false. The reader closes on EVERY exit path — early
    * stop, exhaustion, or a thrown read error — so callers with bounded
    * traversals (the [[deletedCounts]] rows-limit guard) never leak the
    * parquet input stream. Returns false iff the visit stopped early. */
  def foreachPair(conf: Configuration, sidecar: Path)(
      f: (String, Long) => Boolean): Boolean = {
    val reader = org.apache.parquet.hadoop.ParquetReader
      .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
        sidecar)
      .withConf(conf).build()
    try {
      var g = reader.read()
      while (g != null) {
        if (!f(g.getString(TxnTable.PosFileCol, 0),
            g.getLong(TxnTable.PosOrdCol, 0))) return false
        g = reader.read()
      }
      true
    } finally reader.close()
  }

  /** The DISTINCT deleted ordinals of `fileRel` across `sidecars`
    * (distinct because overlapping vectors from separate commits may
    * re-delete the same coordinate — subtracting twice would corrupt
    * counts). */
  def ordinalsFor(conf: Configuration, sidecars: Seq[Path],
                  fileRel: String): java.util.HashSet[java.lang.Long] = {
    val out = new java.util.HashSet[java.lang.Long]()
    sidecars.foreach { sc =>
      foreachPair(conf, sc) { (f, ord) =>
        if (f == fileRel) { out.add(ord); () }
        true
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
    // file the union over its applicable sidecars. The limit guard
    // stops the traversal mid-sidecar; foreachPair still closes the
    // reader on that early exit.
    val perSidecar = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Map[String, scala.collection.mutable.Set[Long]]]
    var seen = 0L
    sidecars.foreach { sc =>
      val m = scala.collection.mutable.Map
        .empty[String, scala.collection.mutable.Set[Long]]
      val complete = foreachPair(conf, new Path(s"$tableRoot/$sc")) {
        (f, ord) =>
          seen += 1L
          if (seen > rowsLimit) false
          else {
            m.getOrElseUpdate(f, scala.collection.mutable.Set.empty) += ord
            true
          }
      }
      if (!complete) return None
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
