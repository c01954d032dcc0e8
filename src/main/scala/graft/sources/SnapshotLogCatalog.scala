package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** `TableCatalog` plugin over [[SnapshotLog]] tables — the SQL-surface
  * catalog integration the reference gets from its Iceberg catalogs
  * (IcebergDDLExecutor.kt; REST/Glue/local in `bodo/io/iceberg/catalog/`).
  * Wire it once per session:
  *
  *   spark.sql.catalog.snap           = graft.sources.SnapshotLogCatalog
  *   spark.sql.catalog.snap.warehouse = /path/to/warehouse
  *
  * and plain SQL gets the full table lifecycle, including Spark's native
  * time-travel syntax (parsed by Spark, served by `loadTable` overloads):
  *
  *   CREATE TABLE snap.ns.t AS SELECT ...          -- v1 create + v2 append
  *   INSERT INTO snap.ns.t SELECT ...              -- next append snapshot
  *   INSERT OVERWRITE snap.ns.t SELECT ...         -- overwrite snapshot
  *   SELECT * FROM snap.ns.t VERSION AS OF 2       -- manifest pin
  *   SELECT * FROM snap.ns.t TIMESTAMP AS OF '...' -- largest commit ts <=
  *   SHOW TABLES IN snap.ns / DROP TABLE snap.ns.t
  *
  * Identifiers map to filesystem layout (`warehouse/ns…/name`), so the
  * catalog itself is stateless — the manifests ARE the metadata, exactly
  * like a Hadoop-catalog Iceberg warehouse. Reads resolve through
  * [[SnapshotLogTable]], i.e. the same pinned-manifest DSv2 scan with
  * stats pruning; writes go through the V1 insertable-relation fallback,
  * which hands the WHOLE DataFrame to `SnapshotLog.commit` — one
  * distributed parquet write + footer walk + manifest publish, the same
  * commit path as the programmatic API (no per-row DSv2 writer needed).
  */
class SnapshotLogCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  /** Accept `DEFAULT <expr>` in DDL — ALTER TABLE ADD COLUMN records the
    * default as Iceberg-v3-style initial-default metadata the readers
    * honor for pre-evolution files. */
  override def capabilities()
      : java.util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  /** V2 functions backing storage-partitioned joins: Spark resolves a
    * table's `bucket[N]` partition transform through the owning catalog
    * (Iceberg's SparkCatalog does the same). The resolver probes with the
    * transform's bare name under an EMPTY namespace; explicit namespaces
    * must exist (FunctionCatalog contract — a nonexistent namespace is
    * NoSuchNamespaceException, not a phantom function listing). */
  private def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || {
      val nsDir = (warehouse +: namespace.toSeq).mkString("/")
      fs(nsDir).exists(new Path(nsDir))
    }
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    ident.name match {
      case "bucket" if namespaceExists(ident.namespace()) =>
        SnapshotFunctions.BucketUnbound
      case "days" if namespaceExists(ident.namespace()) =>
        SnapshotFunctions.DaysUnbound
      case "truncate" if namespaceExists(ident.namespace()) =>
        SnapshotFunctions.TruncateUnbound
      case _ => throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident)
    }
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespaceExists(namespace))
      Array(Identifier.of(namespace, "bucket"),
        Identifier.of(namespace, "days"),
        Identifier.of(namespace, "truncate"))
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchNamespaceException(namespace)
  private var catalogName: String = _
  private var warehouse: String = _

  /** Iceberg-style maintenance procedures:
    * `CALL snap.system.rewrite_data_files('ns.t' [, target_bytes,
    * cluster_by])`, `CALL snap.system.expire_snapshots('ns.t',
    * keep_from_version [, orphan_scan])`. */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    SnapshotProcedures.load(warehouse, ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    SnapshotProcedures.list(namespace)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse"))
      .getOrElse("/tmp/graft_snap_warehouse")
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def rootFor(ident: Identifier): String =
    (warehouse +: ident.namespace().toSeq :+ ident.name()).mkString("/")

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  override def tableExists(ident: Identifier): Boolean =
    SnapshotLog.snapshots(spark, rootFor(ident)).nonEmpty

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val nsDir = (warehouse +: namespace.toSeq).mkString("/")
    val f = fs(nsDir)
    if (!f.exists(new Path(nsDir))) return Array.empty
    f.listStatus(new Path(nsDir))
      .filter(s => s.isDirectory && f.exists(new Path(s.getPath, "_log")))
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  override def loadTable(ident: Identifier): Table =
    load(ident, None, None)

  /** VERSION AS OF n — Spark parses, we pin the manifest. A non-numeric
    * version is a TAG name (Iceberg refs): 'v1-release' resolves through
    * the table's refs to its pinned version. */
  override def loadTable(ident: Identifier, version: String): Table =
    if (version.forall(_.isDigit)) load(ident, Some(version.toInt), None)
    else {
      val root = rootFor(ident)
      val v = SnapshotLog.refs(spark, root).getOrElse(version,
        throw new NoSuchTableException(ident))
      load(ident, Some(v), None)
    }

  /** TIMESTAMP AS OF t — Spark hands epoch MICROSECONDS; the travel rule
    * (largest commitTs <= asked) lives in SnapshotLog.pick. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    load(ident, None, Some(timestampMicros / 1000L))

  private val metaSuffixes =
    Set("history", "files", "snapshots", "refs", "deletes", "partitions",
      "manifests", "blooms", "ngrams", "sorts", "nulls")

  private def load(ident: Identifier, v: Option[Int], tsMs: Option[Long]): Table = {
    val root = rootFor(ident)
    if (SnapshotLog.snapshots(spark, root).isEmpty) {
      // Iceberg-style metadata tables: `snap.ns.t.history` parses as
      // Identifier(namespace = [ns, t], name = history) — if the
      // NAMESPACE resolves to a real table, serve its metadata relation
      if (metaSuffixes.contains(ident.name().toLowerCase) &&
          ident.namespace().nonEmpty) {
        val baseIdent = Identifier.of(ident.namespace().dropRight(1),
          ident.namespace().last)
        val baseRoot = rootFor(baseIdent)
        val snaps = SnapshotLog.snapshots(spark, baseRoot)
        if (snaps.nonEmpty) {
          val nm = s"snapshotlog:$baseRoot#${ident.name().toLowerCase}"
          return ident.name().toLowerCase match {
            case "history" => SnapshotMetaTable.history(nm, snaps)
            case "files" =>
              SnapshotMetaTable.files(nm, SnapshotLog.pick(spark, baseRoot, v, tsMs))
            case "snapshots" => SnapshotMetaTable.snapshots(nm, snaps)
            case "refs" =>
              SnapshotMetaTable.refsTable(nm, SnapshotLog.refsTyped(spark, baseRoot))
            case "deletes" =>
              SnapshotMetaTable.deletesTable(nm,
                SnapshotLog.pick(spark, baseRoot, v, tsMs))
            case "partitions" =>
              SnapshotMetaTable.partitionsTable(nm,
                SnapshotLog.pick(spark, baseRoot, v, tsMs))
            case "manifests" =>
              SnapshotMetaTable.manifestsTable(nm,
                SnapshotLog.manifestInventory(spark, baseRoot, v, tsMs))
            case "blooms" =>
              SnapshotMetaTable.bloomsTable(nm,
                SnapshotLog.pick(spark, baseRoot, v, tsMs),
                SnapshotBlooms.bloomsAt(baseRoot))
            case "ngrams" => // same (file, column, bits) inventory shape
              SnapshotMetaTable.bloomsTable(nm,
                SnapshotLog.pick(spark, baseRoot, v, tsMs),
                SnapshotNgramBlooms.ngramsAt(baseRoot)
                  .view.mapValues(_.view.mapValues(_._2).toMap).toMap)
            case "sorts" =>
              SnapshotMetaTable.sortsTable(nm,
                SnapshotLog.pick(spark, baseRoot, v, tsMs),
                SnapshotSorts.sortsAt(baseRoot))
            case "nulls" =>
              SnapshotMetaTable.nullsTable(nm,
                SnapshotLog.pick(spark, baseRoot, v, tsMs),
                SnapshotNulls.nullsAt(baseRoot))
          }
        }
      }
      throw new NoSuchTableException(ident)
    }
    new SnapshotLogTable(root, SnapshotLog.pick(spark, root, v, tsMs))
  }

  /** CREATE TABLE … [PARTITIONED BY (transforms…)]: Spark's parsed
    * partition transforms map onto the hidden-partition spec
    * ([[SnapshotPartition]]) — `bucket(N, c)`, `days(ts)`, `truncate(W, c)`
    * and identity columns; every INSERT then lays data out by the spec and
    * the DSv2 scan prunes on it. */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    val spec = partitions.toSeq.map(SnapshotLogCatalog.toSpecField)
    val root = rootFor(ident)
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    SnapshotLog.createEmpty(spark, root, schema,
      SnapshotLog.nextCommitTs(spark, root), spec)
    // persist user TBLPROPERTIES (Spark-managed keys like provider/
    // location/owner are engine bookkeeping, not table behavior)
    val reserved = Set("provider", "location", "owner", "comment", "external")
    val user = properties.asScala.view
      .filterKeys(k => !reserved.contains(k) && !k.startsWith("option.")).toMap
    if (user.nonEmpty) SnapshotLog.setTableProps(spark, root, user): Unit
    loadTable(ident)
  }

  /** ALTER TABLE … ADD COLUMN(S): additive schema evolution as a
    * metadata-only "alter" snapshot (no data moves; old files read the new
    * column as null — the Iceberg schema update). Rename/drop/retype are
    * refused: resolution into old files is name-based (Iceberg needs field
    * IDs for those). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val root = rootFor(ident)
    if (SnapshotLog.snapshots(spark, root).isEmpty)
      throw new NoSuchTableException(ident)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1,
          "snapshotlog catalog: nested ADD COLUMN is not supported")
        // always nullable: pre-evolution files hold the DEFAULT if one
        // was declared (Iceberg v3 initial-default), else null
        SnapshotLog.addColumn(spark, root, add.fieldNames()(0),
          add.dataType(),
          Option(add.defaultValue()).map(_.getSql)
            .filter(s => s != null && s.nonEmpty),
          SnapshotLog.nextCommitTs(spark, root)): Unit
      // rename/drop are METADATA-ONLY through field ids (Iceberg schema
      // evolution): the id keeps across a rename so old files resolve;
      // a dropped id is retired and never reused
      case rn: TableChange.RenameColumn =>
        require(rn.fieldNames().length == 1,
          "snapshotlog catalog: nested RENAME COLUMN is not supported")
        SnapshotLog.renameColumn(spark, root, rn.fieldNames()(0), rn.newName(),
          SnapshotLog.nextCommitTs(spark, root)): Unit
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames().length == 1,
          "snapshotlog catalog: nested DROP COLUMN is not supported")
        SnapshotLog.dropColumn(spark, root, del.fieldNames()(0),
          SnapshotLog.nextCommitTs(spark, root)): Unit
      // SET/UNSET TBLPROPERTIES: table-level write-behavior switches
      // (e.g. write.delete.mode=merge-on-read)
      case sp: TableChange.SetProperty =>
        SnapshotLog.setTableProps(spark, root,
          Map(sp.property() -> sp.value())): Unit
      case rp: TableChange.RemoveProperty =>
        SnapshotLog.setTableProps(spark, root, Map.empty,
          unset = Seq(rp.property())): Unit
      case other => throw new UnsupportedOperationException(
        s"snapshotlog catalog: unsupported ALTER TABLE change $other " +
          "(ADD / RENAME / DROP COLUMN only — retype unsupported)")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val root = rootFor(ident)
    if (!tableExists(ident)) false
    else fs(root).delete(new Path(root), true)
  }

  /** Refused, exactly like Iceberg's path-based HadoopCatalog: the table's
    * identity IS its warehouse path and manifests reference data files by
    * absolute path, so a directory move would strand every manifest. A
    * name-mapping catalog (metastore-backed) is where rename belongs. */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "snapshotlog catalog: RENAME is not supported by this path-based " +
        "catalog (manifests hold absolute paths) — CTAS to the new name " +
        "and DROP the old, or use a name-mapping catalog")
}

object SnapshotLogCatalog {
  import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}

  /** Spark parsed partition transform → [[SnapshotPartition]] spec field,
    * via the public `Transform.name()/arguments()` surface (the Scala
    * case classes are private[sql]). */
  private[sources] def toSpecField(t: Transform): (String, String) = {
    val cols = t.arguments().collect { case n: NamedReference => n }
    val lits = t.arguments().collect { case l: Literal[_] => l }
    def col: String = {
      require(cols.length == 1 && cols.head.fieldNames().length == 1,
        s"snapshotlog catalog: partition transform $t must reference one " +
          "top-level column")
      cols.head.fieldNames()(0)
    }
    t.name().toLowerCase match {
      case "identity" => col -> "identity"
      case "bucket" =>
        require(lits.length == 1,
          s"snapshotlog catalog: bucket transform needs a width literal: $t")
        col -> s"bucket[${lits.head.value()}]"
      case "day" | "days" => col -> "day"
      case "truncate" =>
        require(lits.length == 1,
          s"snapshotlog catalog: truncate transform needs a width literal: $t")
        col -> s"truncate[${lits.head.value()}]"
      case other => throw new UnsupportedOperationException(
        s"snapshotlog catalog: unsupported partition transform $other " +
          "(identity, bucket(N, c), days(ts), truncate(W, c))")
    }
  }
}
