package graft.io

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Column => V2Column, _}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A real DSv2 TableCatalog over graft tables — the multi-part-name
  * front door (`spark.sql.catalog.<name> = graft.io.GraftTableCatalog`)
  * that the path-based `format("graft")` provider cannot offer:
  *
  *   CREATE TABLE g.db.t (
  *     id     BIGINT GENERATED ALWAYS AS IDENTITY,
  *     ts     TIMESTAMP,
  *     p_date DATE   GENERATED ALWAYS AS (CAST(ts AS DATE)),
  *     v      DOUBLE)
  *   USING graft PARTITIONED BY (p_date)
  *
  * The SQL spellings for generated and identity columns flow through
  * Spark 4's connector API (`Column.generationExpression` /
  * `Column.identityColumnSpec`, gated by the
  * SUPPORTS_CREATE_TABLE_WITH_* capabilities) and land as the SAME
  * schema-metadata keys the TxnTable API writes — so `INSERT INTO`
  * through the catalog auto-fills both, exactly like a programmatic
  * append. Tables live under the catalog's `warehouse` option (one
  * directory per namespace segment); everything else — reads, writes,
  * DELETE, TRUNCATE, time travel — reuses [[GraftTable]] unchanged.
  *
  * ALTER TABLE routes the metadata-only evolution primitives
  * (add/drop/rename column) straight to their TxnTable implementations;
  * RENAME TABLE is refused because shallow clones reference source data
  * files by RELATIVE path — a directory move would silently break every
  * clone of the table (Delta shares this caveat for path-based
  * tables). */
class GraftTableCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.FunctionCatalog
    with StagingTableCatalog {

  // ---- FunctionCatalog: the `bucket` transform function -------------
  // Storage-partitioned joins over bucket(n, col) tables need the
  // catalog to RESOLVE the transform so Spark can compare the two
  // sides' clustering (TransformExpression canonicalName + bucket
  // count). The bound function also computes the bucket id exactly as
  // the write path does — pmod(murmur3 seed 42, n) — so Spark could
  // re-bucket one side (v2.bucketing.shuffle) without disagreeing with
  // the files.
  override def listFunctions(namespace: Array[String])
      : Array[Identifier] =
    Array(Identifier.of(namespace, "bucket"))

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name().equalsIgnoreCase("bucket")) GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)

  private var catName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = Option(options.get("warehouse"))
      .getOrElse(SparkSession.active.sessionState.conf.warehousePath
        .stripPrefix("file:").stripSuffix("/") + "/graft")
  }
  override def name(): String = catName

  private def dirOf(ident: Identifier): String =
    (warehouse +: (ident.namespace().toSeq :+ ident.name())).mkString("/")

  /** The table's directory — what the maintenance-statement parser
    * (OPTIMIZE/VACUUM/RESTORE/DESCRIBE HISTORY on catalog names) hands
    * to the TxnTable primitives. */
  def tablePathOf(ident: Identifier): String = dirOf(ident)

  override def capabilities(): util.Set[TableCatalogCapability] =
    util.EnumSet.of(
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS,
      TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  // ------------------------------------------------------------ tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new java.io.File((warehouse +: namespace.toSeq).mkString("/"))
    if (!dir.isDirectory) throw new NoSuchNamespaceException(namespace)
    dir.listFiles()
      .filter(d => d.isDirectory && d.listFiles() != null &&
        d.listFiles().exists(_.getName.matches("_v\\d+\\.manifest")))
      .map(d => Identifier.of(namespace, d.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    TxnTable.latestVersion(SparkSession.active, dirOf(ident)).isDefined

  override def loadTable(ident: Identifier): Table = {
    val spark = SparkSession.active
    val path = dirOf(ident)
    val v = TxnTable.latestVersion(spark, path).getOrElse(
      throw new NoSuchTableException(ident))
    val schema = TxnTable.snapshotSchema(spark, path, v).getOrElse(
      new StructType())
    new GraftTable(path, v, schema)
  }

  /** SQL `SELECT ... FROM g.db.t VERSION AS OF n` — the catalog half of
    * time travel (the path-based provider spells it
    * `option("versionAsOf", n)`). A NON-numeric version is a snapshot
    * TAG name resolved through the latest snapshot's tag map
    * ([[TxnTable.setTag]]) — `VERSION AS OF 'release-2'` — so the
    * reproducibility pin tags sell is consumable from pure SQL, not
    * just `option("tagAsOf", ...)`. Tagged versions survive vacuum
    * below the contiguous floor, so resolution skips the range check
    * the numeric spelling keeps. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val spark = SparkSession.active
    val path = dirOf(ident)
    val v = version.toLongOption match {
      case Some(n) =>
        require(TxnTable.versions(spark, path).contains(n),
          s"no committed version $n in $path")
        n
      case None =>
        TxnTable.tags(spark, path).getOrElse(version,
          throw new IllegalArgumentException(
            s"'$version' is neither a numeric version nor a tag of $path"))
    }
    val schema = TxnTable.snapshotSchema(spark, path, v).getOrElse(
      new StructType())
    new GraftTable(path, v, schema)
  }

  /** SQL `TIMESTAMP AS OF` — Spark hands epoch MICROseconds. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val spark = SparkSession.active
    val path = dirOf(ident)
    val v = TxnTable.versionAt(spark, path, timestamp / 1000L).getOrElse(
      throw new IllegalStateException(
        s"$path has no version committed at or before the given timestamp"))
    val schema = TxnTable.snapshotSchema(spark, path, v).getOrElse(
      new StructType())
    new GraftTable(path, v, schema)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    createTable(ident,
      schema.fields.map(f => V2Column.create(f.name, f.dataType, f.nullable)),
      partitions, properties)

  override def createTable(ident: Identifier, columns: Array[V2Column],
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val spark = SparkSession.active
    val (path, schema, partCols) =
      declaration(ident, columns, partitions, properties)
    TxnTable.commitOverwrite(
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema),
      path, partitionCols = partCols)
    storeDeclaredProps(path, properties)
    new GraftTable(path, TxnTable.latestVersion(spark, path).get, schema,
      partCols)
  }

  /** Persist a CREATE statement's TBLPROPERTIES into the manifest,
    * filtering Spark's own bookkeeping keys. `reset` (the REPLACE
    * path) re-declares the whole map — a replaced table does NOT
    * inherit the old table's configuration. */
  private def storeDeclaredProps(path: String,
                                 properties: util.Map[String, String],
                                 reset: Boolean = false): Unit = {
    import scala.jdk.CollectionConverters._
    val reserved = Set(TableCatalog.PROP_LOCATION, TableCatalog.PROP_PROVIDER,
      TableCatalog.PROP_OWNER, TableCatalog.PROP_EXTERNAL,
      TableCatalog.PROP_COMMENT, TableCatalog.PROP_IS_MANAGED_LOCATION)
    val user = properties.asScala.toMap
      .filterNot { case (k, _) => reserved(k) || k.startsWith("option.") }
    if (reset)
      TxnTable.replaceProperties(SparkSession.active, path, user)
    else if (user.nonEmpty)
      TxnTable.setProperties(SparkSession.active, path, user)
  }

  /** Translate a CREATE/REPLACE declaration (v2 columns + transforms)
    * to graft's schema-metadata spelling: generated / identity /
    * DEFAULT declarations all land as the SAME StructField metadata
    * keys the TxnTable API writes. */
  private def declaration(ident: Identifier, columns: Array[V2Column],
                          partitions: Array[Transform],
                          properties: util.Map[String, String])
      : (String, StructType, Seq[String]) = {
    val path = Option(properties.get(TableCatalog.PROP_LOCATION))
      .getOrElse(dirOf(ident))
    val fields = columns.map { c =>
      val mb = new MetadataBuilder()
      Option(c.metadataInJSON())
        .foreach(j => mb.withMetadata(Metadata.fromJson(j)))
      Option(c.generationExpression())
        .foreach(e => mb.putString(TxnTable.GenExprKey, e))
      Option(c.identityColumnSpec()).foreach { s =>
        require(!s.isAllowExplicitInsert,
          s"${c.name()}: GENERATED BY DEFAULT AS IDENTITY is not " +
            "supported — use GENERATED ALWAYS (explicit inserts would " +
            "race the high-water mark)")
        mb.putLong(TxnTable.IdStartKey, s.getStart)
        mb.putLong(TxnTable.IdStepKey, s.getStep)
        mb.putLong(TxnTable.IdHwmKey, s.getStart - s.getStep)
      }
      StructField(c.name(), c.dataType(), c.nullable(), mb.build())
    }
    // DEFAULT declarations: record Spark's own CURRENT_DEFAULT key and
    // constant-fold EXISTS_DEFAULT, the same contract ALTER TABLE ...
    // ADD COLUMN ... DEFAULT writes (see TxnTable.addColumnWithDefault)
    val withDefaults = fields.zip(columns).map { case (f, c) =>
      Option(c.defaultValue()) match {
        case None => f
        case Some(d) =>
          val cur = org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
            .CURRENT_DEFAULT_COLUMN_METADATA_KEY
          val declared = StructType(Seq(f.copy(
            metadata = new MetadataBuilder().withMetadata(f.metadata)
              .putString(cur, d.getSql).build())))
          org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
            .constantFoldCurrentDefaultsToExistDefaults(
              declared, "CREATE TABLE").fields.head
      }
    }
    // FIELD-ID column mapping opt-in: `TBLPROPERTIES
    // ('graft.columnMapping.mode' = 'id')` stamps the declared schema
    // (every field, nested included) with stable parquet field ids —
    // the creating commit detects the stamped schema and enforces the
    // files-empty precondition (TxnTable.commit)
    val mode = Option(properties.get(FieldIds.ModeProp)).map(_.trim.toLowerCase)
    mode.foreach(m => require(m == "id" || m == "none" || m == "name",
      s"unsupported ${FieldIds.ModeProp} '$m' — supported: 'id' " +
        "(parquet field-id column mapping), 'name'/'none' (default)"))
    val schema0 = StructType(withDefaults)
    val schema =
      if (mode.contains("id")) FieldIds.assign(None, schema0) else schema0
    val partCols = partitions.toSeq.map {
      case t if t.name == "identity" && t.references.length == 1 &&
          t.references.head.fieldNames.length == 1 =>
        t.references.head.fieldNames.head
      case t if TxnTable.PartTransformNames.contains(t.name) &&
          t.references.length == 1 &&
          t.references.head.fieldNames.length == 1 =>
        s"${t.name}(${t.references.head.fieldNames.head})"
      case t if t.name == "bucket" && t.references.length == 1 &&
          t.references.head.fieldNames.length == 1 =>
        val n = t.arguments.collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.dataType == org.apache.spark.sql.types.IntegerType =>
            l.value.asInstanceOf[Int]
        }.getOrElse(throw new UnsupportedOperationException(
          s"bucket transform needs an integer bucket count, got $t"))
        TxnTable.BucketEntry(n, t.references.head.fieldNames.head)
      case other => throw new UnsupportedOperationException(
        "graft tables support identity, days/hours/months/years(), and " +
          s"bucket(n, col) partitioning, got $other")
    }
    (path, schema, partCols)
  }

  // ---- CREATE OR REPLACE TABLE: atomic swap via the manifest CAS ----
  // A graft "replace" is a commitOverwrite at the SAME path: one atomic
  // manifest publish switches readers from the old lineage to the new,
  // old pinned snapshots stay readable (their manifests and files are
  // untouched until VACUUM), and time travel spans the replace. The
  // staged-table contract maps onto that directly: a CTAS write lands
  // the swap itself (its overwrite IS one CAS commit); a plain REPLACE
  // with only a declared schema commits the empty overwrite at
  // commitStagedChanges. Nothing is visible before the CAS, so there
  // is nothing to clean up on abort.
  override def stageCreate(ident: Identifier,
                           info: org.apache.spark.sql.connector.catalog.TableInfo)
      : StagedTable = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    staged(ident, info)
  }

  override def stageReplace(ident: Identifier,
                            info: org.apache.spark.sql.connector.catalog.TableInfo)
      : StagedTable = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    staged(ident, info)
  }

  override def stageCreateOrReplace(ident: Identifier,
                                    info: org.apache.spark.sql.connector.catalog.TableInfo)
      : StagedTable = staged(ident, info)

  private def staged(ident: Identifier,
                     info: org.apache.spark.sql.connector.catalog.TableInfo)
      : StagedTable = {
    val spark = SparkSession.active
    val (path, declaredSchema, partCols) =
      declaration(ident, info.columns(), info.partitions(), info.properties())
    val at = TxnTable.latestVersion(spark, path)
    new GraftTable(path, at.getOrElse(0L), declaredSchema, partCols)
        with StagedTable {
      override def commitStagedChanges(): Unit = {
        // a CTAS write already landed the swap (the version advanced);
        // otherwise this is declaration-only CREATE/REPLACE — publish
        // the empty overwrite with the declared schema now
        if (TxnTable.latestVersion(spark, path) == at)
          TxnTable.commitOverwrite(
            spark.createDataFrame(
              java.util.Collections.emptyList[org.apache.spark.sql.Row](),
              declaredSchema),
            path, partitionCols = partCols)
        storeDeclaredProps(path, info.properties(), reset = true)
      }
      override def abortStagedChanges(): Unit = ()
    }
  }

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    val spark = SparkSession.active
    val path = dirOf(ident)
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1,
          "graft ALTER supports top-level columns only")
        TxnTable.addColumns(spark, path, StructType(Seq(
          StructField(add.fieldNames.head, add.dataType, add.isNullable))))
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames.length == 1,
          "graft ALTER supports top-level columns only")
        TxnTable.dropColumn(spark, path, del.fieldNames.head)
      case ren: TableChange.RenameColumn =>
        // nested renames route to the field-id path (refuses with the
        // supported workaround on name-mode tables)
        if (ren.fieldNames.length > 1)
          TxnTable.renameNestedColumn(spark, path,
            ren.fieldNames.mkString("."), ren.newName)
        else
          TxnTable.renameColumn(spark, path, ren.fieldNames.head, ren.newName)
      case ut: TableChange.UpdateColumnType =>
        require(ut.fieldNames.length == 1,
          "graft ALTER supports top-level columns only")
        TxnTable.alterColumnType(spark, path, ut.fieldNames.head,
          ut.newDataType())
      case sp: TableChange.SetProperty =>
        TxnTable.setProperties(spark, path,
          Map(sp.property() -> sp.value()))
      case rp: TableChange.RemoveProperty =>
        TxnTable.unsetProperties(spark, path, Seq(rp.property()))
      case d: TableChange.UpdateColumnDefaultValue =>
        require(d.fieldNames.length == 1,
          "graft ALTER supports top-level columns only")
        // null DefaultValue = Spark's DROP DEFAULT spelling; a default
        // delivered without its SQL text cannot round-trip through the
        // manifest metadata — refuse rather than silently dropping
        TxnTable.setColumnDefault(spark, path, d.fieldNames.head,
          Option(d.newCurrentDefault()).map { dv =>
            val sql = dv.getSql
            require(sql != null && sql.nonEmpty,
              s"default for ${d.fieldNames.head} has no SQL form")
            sql
          })
      case ac: TableChange.AddConstraint =>
        ac.constraint() match {
          case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
            TxnTable.addCheck(spark, path, c.name(), c.predicateSql())
          case other => throw new UnsupportedOperationException(
            s"graft tables support CHECK constraints only, got $other")
        }
      case dc: TableChange.DropConstraint =>
        if (!dc.ifExists() ||
            TxnTable.checkConstraints(spark, path).contains(dc.name()))
          TxnTable.dropCheck(spark, path, dc.name())
      case other => throw new UnsupportedOperationException(
        s"ALTER change not supported through the graft catalog: $other")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    Tables.deleteTree(new java.io.File(dirOf(ident)))
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "RENAME TABLE is not supported: shallow clones reference source " +
        "data files by relative path — moving the directory would break " +
        "them. CLONE to the new name instead.")

  // -------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] = {
    val root = new java.io.File(warehouse)
    if (!root.isDirectory) return Array.empty
    root.listFiles().filter(_.isDirectory)
      .filter(d => d.listFiles() == null ||
        !d.listFiles().exists(_.getName.matches("_v\\d+\\.manifest")))
      .map(d => Array(d.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      new java.io.File((warehouse +: namespace.toSeq).mkString("/")).isDirectory

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) java.util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    new java.io.File((warehouse +: namespace.toSeq).mkString("/")).mkdirs()
    ()
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val dir = new java.io.File((warehouse +: namespace.toSeq).mkString("/"))
    if (!dir.isDirectory) return false
    if (!cascade && dir.listFiles() != null && dir.listFiles().nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty")
    Tables.deleteTree(dir)
    true
  }
}

/** The `bucket(n, col)` V2 function the catalog serves so Spark can
  * resolve and compare bucket-transform clustering across tables
  * (storage-partitioned joins). Bound semantics MUST equal the write
  * path's partDirExpr: pmod over Spark's Murmur3 hash with seed 42 —
  * one definition of "which bucket" for writers, the planner, and any
  * runtime re-bucketing. */
object GraftBucketFunction
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  import org.apache.spark.sql.types._

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): pmod(murmur3(col, seed 42), n)"

  override def bind(inputType: StructType)
      : org.apache.spark.sql.connector.catalog.functions.BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets INT, col), got $inputType")
    val argTypes = inputType.fields.map(_.dataType)
    require(argTypes(0) == IntegerType,
      s"bucket count must be INT, got ${argTypes(0)}")
    new org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Int] {
      override def inputTypes(): Array[DataType] = argTypes
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = "graft.bucket"
      override def isResultNullable: Boolean = false
      override def produceResult(
          input: org.apache.spark.sql.catalyst.InternalRow): Int = {
        val n = input.getInt(0)
        val v = input.get(1, argTypes(1))
        val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
          .hash(v, argTypes(1), 42L).toInt
        val r = h % n
        if (r < 0) r + n else r
      }
    }
  }
}
