package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Parquet FIELD-ID column mapping — Iceberg's field-ids / Delta's
  * `columnMapping.mode = id`, realized on Spark's own public contract:
  * every struct field (top-level and nested, including fields inside
  * array elements and map values) carries a STABLE numeric id in its
  * field metadata under `parquet.field.id`. Spark's parquet writer
  * stamps the ids into each data file's schema
  * (`spark.sql.parquet.fieldId.write.enabled`, default on), and its
  * vectorized reader resolves requested columns BY ID when the
  * requested schema carries them (`spark.sql.parquet.fieldId.read
  * .enabled`). With resolution by id:
  *
  *   - RENAME — top-level or nested — is pure metadata: the id is
  *     unchanged, so every old file serves the renamed column directly
  *     (no alias/COALESCE legs, no name retirement);
  *   - re-ADDING a dropped column's name mints a FRESH id: the old
  *     files' same-named bytes carry the old id and read as NULL —
  *     stale values can never resurrect;
  *   - evolution INSIDE arrays/maps (add / rename / widen a struct
  *     field of an element) resolves per-id exactly like top-level.
  *
  * Ids live in the recorded snapshot schema's field metadata — the
  * schema json the manifest already carries — so they ride every
  * commit, RESTORE, and CLONE with zero new manifest machinery, and
  * mode detection is self-describing: a schema whose fields carry ids
  * IS an id-mode table ([[hasIds]]).
  *
  * OPT-IN AT CREATION (`TBLPROPERTIES ('graft.columnMapping.mode' =
  * 'id')`, or [[graft.io.TxnTable.withFieldIds]] on the creating
  * frame): files written before enablement would carry no ids and
  * id-resolution would read them as all-NULL, so the mode can only be
  * declared while the table has no files. Converted tables (adopted
  * foreign files) stay name-mode for the same reason.
  *
  * NEVER-REUSE: a dropped field's id must stay out of circulation
  * forever (a re-mint would resurrect its bytes). Drops of id-mode
  * columns record `name#id` in the retired list; [[mint]] floors above
  * both the live schema's max id and every retired id. */
object FieldIds {
  /** Spark's public field-id metadata key (ParquetUtils). */
  val Key = "parquet.field.id"

  val ModeProp = "graft.columnMapping.mode"

  def hasIds(s: StructType): Boolean =
    s.fields.exists(_.metadata.contains(Key))

  def idOf(f: StructField): Option[Long] =
    if (f.metadata.contains(Key)) Some(f.metadata.getLong(Key)) else None

  /** Largest id anywhere in `s` (0 when none). */
  def maxId(s: StructType): Long = {
    def goF(f: StructField): Long =
      math.max(idOf(f).getOrElse(0L), goT(f.dataType))
    def goT(t: DataType): Long = t match {
      case st: StructType => (0L +: st.fields.toSeq.map(goF)).max
      case a: ArrayType   => goT(a.elementType)
      case m: MapType     => math.max(goT(m.keyType), goT(m.valueType))
      case _              => 0L
    }
    goT(s)
  }

  /** Ids of retired id-mode columns (`name#id` entries). */
  def retiredIds(retired: Seq[String]): Seq[Long] =
    retired.flatMap { r =>
      val i = r.lastIndexOf('#')
      if (i < 0) None else r.substring(i + 1).toLongOption
    }

  /** Never-reuse floor: the largest retired id (0 when none). */
  def floorOf(retired: Seq[String]): Long = (0L +: retiredIds(retired)).max

  /** Lower-cased dotted paths of retired `name#id` entries (bare name,
    * `#id` stripped) — the names whose BYTES may still sit in old files
    * under a different id. */
  def retiredPaths(retired: Seq[String]): Set[String] =
    retired.flatMap { r =>
      val i = r.lastIndexOf('#')
      if (i < 0 || r.substring(i + 1).toLongOption.isEmpty) None
      else Some(r.substring(0, i).toLowerCase)
    }.toSet

  /** Live schema paths that COLLIDE with a retired name: a dropped (or
    * renamed-away) column's bytes still sit in old files under this
    * name with a DIFFERENT id, and Spark's vectorized reader cannot
    * serve a requested field whose name matches a file column of
    * another id (it pairs clipped columns by name) — such columns must
    * be REQUESTED under a mangled name and aliased back. */
  def collidePaths(schema: StructType, retired: Seq[String]): Set[String] = {
    val dead = retiredPaths(retired)
    if (dead.isEmpty) return Set.empty
    val out = Set.newBuilder[String]
    def goT(p: String, dt: DataType): Unit = dt match {
      case s: StructType => go(p, s)
      case a: ArrayType  => goT(s"$p.element", a.elementType)
      case m: MapType =>
        goT(s"$p.key", m.keyType); goT(s"$p.value", m.valueType)
      case _ => ()
    }
    def go(prefix: String, st: StructType): Unit = st.fields.foreach { f =>
      val p = if (prefix.isEmpty) f.name.toLowerCase
        else s"$prefix.${f.name.toLowerCase}"
      if (dead(p)) out += p
      goT(p, f.dataType)
    }
    go("", schema)
    out.result()
  }

  private def mangled(name: String, id: Long): String = s"__gfid${id}_$name"

  /** `s` with every field at a path in `collide` renamed to a unique
    * non-colliding physical name (`__gfid<id>_<name>`). Only the NAME
    * changes — the id metadata still resolves the right bytes in
    * post-re-add files; old files (where the name collides under the
    * dead id) serve NULL through the fake-name miss. */
  def mangle(s: StructType, collide: Set[String]): StructType = {
    def goT(p: String, dt: DataType): DataType = dt match {
      case inner: StructType => goS(p, inner)
      case a: ArrayType => a.copy(elementType = goT(s"$p.element", a.elementType))
      case m: MapType => m.copy(keyType = goT(s"$p.key", m.keyType),
        valueType = goT(s"$p.value", m.valueType))
      case other => other
    }
    def goS(prefix: String, st: StructType): StructType =
      StructType(st.fields.map { f =>
        val p = if (prefix.isEmpty) f.name.toLowerCase
          else s"$prefix.${f.name.toLowerCase}"
        val f2 = f.copy(dataType = goT(p, f.dataType))
        if (collide(p)) f2.copy(name = mangled(f.name, idOf(f).getOrElse(0L)))
        else f2
      })
    goS("", s)
  }

  /** `next` fully id-stamped: a field matching `prior` at the same
    * path (case-insensitive name) CARRIES prior's id; a field that
    * already carries an id keeps it; everything else MINTS fresh ids
    * above max(`floor`, prior's max, next's max). Deterministic in its
    * inputs — a CAS-losing writer recomputing against a fresh snapshot
    * assigns the same ids iff the snapshot's schema is unchanged. */
  def assign(prior: Option[StructType], next: StructType,
             floor: Long = 0L): StructType = {
    var ctr = math.max(floor,
      math.max(prior.map(maxId).getOrElse(0L), maxId(next)))
    def mint(): Long = { ctr += 1L; ctr }
    def goT(p: Option[DataType], t: DataType): DataType = (p, t) match {
      case (Some(ps: StructType), st: StructType) => goS(Some(ps), st)
      case (_, st: StructType)                    => goS(None, st)
      case (Some(pa: ArrayType), a: ArrayType) =>
        a.copy(elementType = goT(Some(pa.elementType), a.elementType))
      case (_, a: ArrayType) =>
        a.copy(elementType = goT(None, a.elementType))
      case (Some(pm: MapType), m: MapType) =>
        m.copy(keyType = goT(Some(pm.keyType), m.keyType),
          valueType = goT(Some(pm.valueType), m.valueType))
      case (_, m: MapType) =>
        m.copy(keyType = goT(None, m.keyType),
          valueType = goT(None, m.valueType))
      case (_, other) => other
    }
    def goS(p: Option[StructType], st: StructType): StructType =
      StructType(st.fields.map { f =>
        val pf = p.flatMap(_.fields.find(_.name.equalsIgnoreCase(f.name)))
        val id = pf.flatMap(idOf).orElse(idOf(f)).getOrElse(mint())
        f.copy(
          dataType = goT(pf.map(_.dataType), f.dataType),
          metadata = new MetadataBuilder().withMetadata(f.metadata)
            .putLong(Key, id).build())
      })
    goS(prior, next)
  }

  /** `df` with the ids of `declared` copied onto matching paths —
    * metadata only, physical rows untouched (the plan is re-rooted on
    * the same InternalRow RDD). Every data file of an id-mode table
    * MUST be written from a stamped frame: the parquet writer takes the
    * ids from the frame's schema, and a file missing a column's id
    * would serve NULL for it under id-resolution. */
  /** `s` with the ids of `declared` copied onto matching paths
    * (case-insensitive names, recursing through structs and array/map
    * elements) — fields `declared` doesn't know keep their metadata. */
  def overlay(declared: StructType, s: StructType): StructType = {
    def goT(d: Option[DataType], t: DataType): DataType = (d, t) match {
      case (Some(ds: StructType), st: StructType) => goS(Some(ds), st)
      case (Some(da: ArrayType), a: ArrayType) =>
        a.copy(elementType = goT(Some(da.elementType), a.elementType))
      case (Some(dm: MapType), m: MapType) =>
        m.copy(keyType = goT(Some(dm.keyType), m.keyType),
          valueType = goT(Some(dm.valueType), m.valueType))
      case (_, other) => other
    }
    def goS(d: Option[StructType], st: StructType): StructType =
      StructType(st.fields.map { f =>
        val dfld = d.flatMap(_.fields.find(_.name.equalsIgnoreCase(f.name)))
        val md = dfld.flatMap(idOf) match {
          case Some(id) => new MetadataBuilder().withMetadata(f.metadata)
            .putLong(Key, id).build()
          case None => f.metadata
        }
        f.copy(dataType = goT(dfld.map(_.dataType), f.dataType),
          metadata = md)
      })
    goS(Some(declared), s)
  }

  def stamp(df: DataFrame, declared: StructType): DataFrame = {
    val stamped = overlay(declared, df.schema)
    if (stamped == df.schema) df
    else org.apache.spark.sql.GraftBridge.internalCreateDataFrame(
      df.sparkSession, df.queryExecution.toRdd, stamped)
  }

  /** `s` with every field-id removed — for requested schemas that must
    * resolve BY NAME (internal sidecar reads like the change feed,
    * whose files are library-written with the names of their commit
    * time), and for re-deriving a deterministic assignment from a
    * frame that was already stamped once. */
  def strip(s: StructType): StructType = {
    def goT(t: DataType): DataType = t match {
      case st: StructType => goS(st)
      case a: ArrayType   => a.copy(elementType = goT(a.elementType))
      case m: MapType     => m.copy(keyType = goT(m.keyType),
        valueType = goT(m.valueType))
      case other => other
    }
    def goS(st: StructType): StructType =
      StructType(st.fields.map(f => f.copy(
        dataType = goT(f.dataType),
        metadata = new MetadataBuilder().withMetadata(f.metadata)
          .remove(Key).build())))
    goS(s)
  }

  /** The id a frame column was stamped with, by path — for the CAS-loss
    * check: a concurrent schema evolution that re-minted differently
    * invalidates the already-written files. */
  def idMap(s: StructType): Map[String, Long] = {
    val out = Map.newBuilder[String, Long]
    def goT(prefix: String, t: DataType): Unit = t match {
      case st: StructType => st.fields.foreach { f =>
        val p = if (prefix.isEmpty) f.name.toLowerCase else s"$prefix.${f.name.toLowerCase}"
        idOf(f).foreach(out += p -> _)
        goT(p, f.dataType)
      }
      case a: ArrayType => goT(s"$prefix.element", a.elementType)
      case m: MapType =>
        goT(s"$prefix.key", m.keyType); goT(s"$prefix.value", m.valueType)
      case _ => ()
    }
    goT("", s)
    out.result()
  }

  /** Ensure field-id READ resolution is on for this session — a no-op
    * for name-mode requested schemas (Spark falls back to name
    * matching when a requested field carries no id), so the conf is
    * safe session-wide. */
  def enableRead(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
}
