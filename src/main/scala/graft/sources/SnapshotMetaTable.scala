package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style METADATA TABLES for the `snap` catalog: a table's log
  * and file inventory as SQL relations —
  *
  *   SELECT * FROM snap.ns.t.history    -- version, operation, ts, files
  *   SELECT * FROM snap.ns.t.files      -- path, size, partition tuple
  *   SELECT * FROM snap.ns.t.snapshots  -- history + commit props JSON
  *
  * (reference: Iceberg's `history`/`files`/`snapshots` metadata tables;
  * EXTERNAL_TABLE_FILES in TableFunctionOperatorTable.java). The rows are
  * MANIFEST METADATA materialized on the driver at load time — never a
  * data scan; a 100 TB table's `files` relation is file-count-sized. */
private[sources] class SnapshotMetaTable(tableName: String,
    metaSchema: StructType, rows: Seq[Seq[Any]])
    extends Table with SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = metaSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = metaSchema
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] =
          Array(SnapshotMetaPartition(SnapshotMetaTable.encode(metaSchema, rows)))
        override def createReaderFactory(): PartitionReaderFactory =
          SnapshotMetaReaderFactory()
      }
    }
}

private[sources] object SnapshotMetaTable {
  /** Serializable row payload (strings stay JVM strings; the reader
    * converts to UTF8String). */
  def encode(schema: StructType, rows: Seq[Seq[Any]]): Array[Array[Any]] =
    rows.map(_.toArray).toArray

  def history(name: String, snaps: Seq[SnapshotLog.Snapshot]): SnapshotMetaTable =
    new SnapshotMetaTable(name,
      StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("operation", StringType, nullable = false),
        StructField("commit_ts_ms", LongType, nullable = false),
        StructField("n_files", LongType, nullable = false))),
      snaps.map(s => Seq(s.version, s.operation, s.commitTsMs,
        s.files.size.toLong)))

  def refsTable(name: String, refs: Map[String, (String, Int)]): SnapshotMetaTable =
    new SnapshotMetaTable(name,
      StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("type", StringType, nullable = false),
        StructField("version", IntegerType, nullable = false))),
      refs.toSeq.sortBy(_._1).map { case (n, (k, v)) => Seq(n, k, v) })

  /** Positional/equality delete-file inventory of one snapshot (Iceberg's
    * position_deletes metadata relation, collapsed to file granularity):
    * one row per (data file, delete file) edge. */
  def deletesTable(name: String, snap: SnapshotLog.Snapshot): SnapshotMetaTable =
    new SnapshotMetaTable(name,
      StructType(Seq(
        StructField("data_file", StringType, nullable = false),
        StructField("delete_file", StringType, nullable = false))),
      snap.dels.toSeq.sortBy(_._1).flatMap { case (df, ds) =>
        ds.map(d => Seq(df, d))
      })

  /** Bloom-sidecar inventory of one snapshot: one row per covered
    * (data file, column) with the bloom's bit size — the observability
    * face of [[SnapshotBlooms]] (which files a needle probe can skip). */
  def bloomsTable(name: String, snap: SnapshotLog.Snapshot,
                  blooms: Map[String, Map[String, org.apache.spark.util.sketch.BloomFilter]])
      : SnapshotMetaTable = {
    val live = snap.files.map(SnapshotLog.norm).toSet
    new SnapshotMetaTable(name,
      StructType(Seq(
        StructField("data_file", StringType, nullable = false),
        StructField("column", StringType, nullable = false),
        StructField("bloom_bits", LongType, nullable = false))),
      blooms.toSeq.sortBy(_._1).flatMap { case (c, perFile) =>
        perFile.toSeq.filter(e => live.contains(e._1)).sortBy(_._1)
          .map { case (f, bf) => Seq(f, c, bf.bitSize()) }
      })
  }

  /** Sort-order inventory of one snapshot: one row per recorded-sorted
    * data file with its comma-joined sort columns ([[SnapshotSorts]]). */
  def sortsTable(name: String, snap: SnapshotLog.Snapshot,
                 sorts: Map[String, Seq[String]]): SnapshotMetaTable = {
    val live = snap.files.map(SnapshotLog.norm).toSet
    new SnapshotMetaTable(name,
      StructType(Seq(
        StructField("data_file", StringType, nullable = false),
        StructField("sort_order", StringType, nullable = false))),
      sorts.toSeq.filter(e => live.contains(e._1)).sortBy(_._1)
        .map { case (f, o) => Seq(f, o.mkString(",")) })
  }

  /** Null-count inventory of one snapshot: one row per recorded
    * (data file, column) with its null count ([[SnapshotNulls]], the
    * Iceberg null_value_counts analog feeding top-k file skipping). */
  def nullsTable(name: String, snap: SnapshotLog.Snapshot,
                 nulls: Map[String, Map[String, Long]]): SnapshotMetaTable = {
    val live = snap.files.map(SnapshotLog.norm).toSet
    new SnapshotMetaTable(name,
      StructType(Seq(
        StructField("data_file", StringType, nullable = false),
        StructField("column", StringType, nullable = false),
        StructField("null_count", LongType, nullable = false))),
      nulls.toSeq.filter(e => live.contains(e._1)).sortBy(_._1)
        .flatMap { case (f, cols) =>
          cols.toSeq.sortBy(_._1).map { case (c, n) => Seq(f, c, n) }
        })
  }

  /** Shard inventory (Iceberg's `manifests` table): one row per manifest
    * shard + one for the inline block — path, size, entry counts split
    * live vs tombstoned. Input rows come from
    * [[SnapshotLog.manifestInventory]]. */
  def manifestsTable(name: String,
      rows: Seq[(String, String, Long, Long, Long, Long)]): SnapshotMetaTable =
    new SnapshotMetaTable(name,
      StructType(Seq(
        StructField("path", StringType, nullable = false),
        StructField("kind", StringType, nullable = false),
        StructField("size_bytes", LongType, nullable = false),
        StructField("n_entries", LongType, nullable = false),
        StructField("n_live", LongType, nullable = false),
        StructField("n_tombstoned", LongType, nullable = false))),
      rows.map(r => Seq(r._1, r._2, r._3, r._4, r._5, r._6)))

  def files(name: String, snap: SnapshotLog.Snapshot): SnapshotMetaTable =
    new SnapshotMetaTable(name,
      StructType(Seq(
        StructField("file_path", StringType, nullable = false),
        StructField("size_bytes", LongType, nullable = true),
        StructField("partition", StringType, nullable = true))),
      snap.files.map { f =>
        val key = SnapshotLog.norm(f)
        val tuple = snap.parts.get(key)
          .map(vs => snap.spec.map(_._1).zip(vs)
            .map { case (c, v) => s"$c=$v" }.mkString("/"))
        Seq(f, snap.sizes.get(key).map(Long.box).orNull, tuple.orNull)
      })

  /** Per-partition rollup (Iceberg's `partitions` metadata table): one
    * row per distinct partition tuple with file/row/byte totals — the
    * relation users query for skew and file-size audits. NULL partition
    * = unpartitioned files (or a null tuple). Row/byte totals are null
    * when any member file predates the manifest field that records
    * them (conservative, like the agg pushdown's refusal). */
  def partitionsTable(name: String, snap: SnapshotLog.Snapshot): SnapshotMetaTable = {
    val groups = snap.files.groupBy { f =>
      val key = SnapshotLog.norm(f)
      snap.parts.get(key)
        .map(vs => snap.specOf(f).map(_._1).zip(vs)
          .map { case (c, v) => s"$c=$v" }.mkString("/")).orNull
    }
    new SnapshotMetaTable(name,
      StructType(Seq(
        StructField("partition", StringType, nullable = true),
        StructField("n_files", LongType, nullable = false),
        StructField("n_rows", LongType, nullable = true),
        StructField("size_bytes", LongType, nullable = true))),
      groups.toSeq.sortBy(g => Option(g._1).getOrElse("")).map { case (p, fs) =>
        val rows = fs.map(f => snap.rows.get(SnapshotLog.norm(f)))
        val sizes = fs.map(f => snap.sizes.get(SnapshotLog.norm(f)))
        Seq(p, fs.size.toLong,
          if (rows.exists(_.isEmpty)) null else Long.box(rows.flatten.sum),
          if (sizes.exists(_.isEmpty)) null else Long.box(sizes.flatten.sum))
      })
  }

  def snapshots(name: String, snaps: Seq[SnapshotLog.Snapshot]): SnapshotMetaTable =
    new SnapshotMetaTable(name,
      StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("operation", StringType, nullable = false),
        StructField("commit_ts_ms", LongType, nullable = false),
        StructField("n_files", LongType, nullable = false),
        StructField("props_json", StringType, nullable = false))),
      snaps.map { s =>
        // Jackson, not string interpolation: property values are user/
        // engine-supplied (checkpoint paths, free-form strings) — a quote
        // or backslash would yield malformed JSON if hand-concatenated.
        val node = propsOm.createObjectNode()
        s.props.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
        Seq(s.version, s.operation, s.commitTsMs, s.files.size.toLong,
          propsOm.writeValueAsString(node))
      })

  private val propsOm = new com.fasterxml.jackson.databind.ObjectMapper()
}

private[sources] case class SnapshotMetaPartition(rows: Array[Array[Any]])
    extends InputPartition

private[sources] case class SnapshotMetaReaderFactory()
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val rows = partition.asInstanceOf[SnapshotMetaPartition].rows
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow =
        new GenericInternalRow(rows(i).map {
          case s: String => UTF8String.fromString(s)
          case other => other
        }.asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
}
