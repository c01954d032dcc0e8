package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => LegacyOffset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types._

/** STREAMING CDC over a SnapshotLog table — Delta Change Data Feed /
  * Iceberg changelog-as-a-stream analog: `readStream.format
  * ("snapshotlog-cdc").load(root)` emits ONE ROW PER NET ROW-LEVEL
  * CHANGE (tagged `_change_type` insert|delete, `_commit_version`,
  * `_commit_ts_ms`) as new snapshots land, EXACTLY ONCE.
  *
  * Offsets are snapshot VERSIONS — durable, total-ordered, and already
  * fsync'd by the table's own commit protocol — so the micro-batch for
  * `(start, end]` is [[SnapshotLog.changes]] over exactly that range:
  * deterministic on replay (restart re-computes the identical diff from
  * the immutable manifests), and costing only the range's TOUCHED files
  * (compaction snapshots are skipped wholesale by `changes`). This is
  * the legacy Source API on purpose: a CDC batch is a multi-stage DIFF
  * (two exceptAlls), i.e. a full DataFrame plan, which `getBatch` can
  * return directly — a DSv2 `PartitionReader` cannot express a shuffle.
  *
  * Options: `fromVersion` (default 0 = full history as inserts first),
  * `maxVersionsPerTrigger` (bound versions per micro-batch; a restart
  * may plan one larger catch-up batch from the checkpoint, like every
  * rate-limited Spark source), `identifierColumns` (comma-separated key
  * columns: each micro-batch pairs a version's delete+insert of a key
  * into `update_preimage`/`update_postimage` rows — Delta CDF's streamed
  * update images). The output schema is pinned at stream start; columns
  * added to the table mid-stream surface after a stream restart (Delta
  * CDF's contract).
  *
  * Reference surface: the reference reads Iceberg CDC through the
  * connector; this is the native stream over the snapshot log. */
class SnapshotLogCdcSource extends StreamSourceProvider with DataSourceRegister {
  import SnapshotLogCdcSource._

  override def shortName(): String = "snapshotlog-cdc"

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), cdcSchema(sqlContext.sparkSession, rootOf(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    new CdcSource(spark, root,
      parameters.get("fromVersion").map(_.toInt).getOrElse(0),
      parameters.get("maxVersionsPerTrigger").map(_.toInt),
      cdcSchema(spark, root),
      parameters.get("identifierColumns").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty))
  }
}

private[sources] object SnapshotLogCdcSource {
  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "snapshotlog-cdc: .load(<table root>) path is required"))

  private[sources] def cdcSchema(spark: SparkSession, root: String): StructType = {
    val main = SnapshotLog.snapshots(spark, root).filter(_.branch.isEmpty)
    require(main.nonEmpty, s"snapshotlog-cdc: no mainline snapshots at $root")
    val clash = main.last.schema.fieldNames.filter(SnapshotLog.ChangelogMetaCols)
    require(clash.isEmpty,
      s"snapshotlog-cdc: table schema contains reserved CDC meta column(s) " +
        s"${clash.mkString(", ")}; rename them before streaming a changelog")
    StructType(main.last.schema.fields ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", IntegerType, nullable = false),
      StructField("_commit_ts_ms", LongType, nullable = false)))
  }

  private[sources] class CdcSource(spark: SparkSession, root: String,
      fromVersion: Int, maxVersionsPerTrigger: Option[Int],
      declared: StructType,
      identifierCols: Seq[String] = Nil) extends Source {

    override def schema: StructType = declared

    // field ids of the declared (stream-start) schema: a mid-stream
    // RENAME then still feeds the declared column from its new name
    // instead of silently null-filling it
    private val declaredFids: Map[String, Int] = {
      val main = SnapshotLog.snapshots(spark, root).filter(_.branch.isEmpty)
      main.lastOption.map(SnapshotLog.fidsOf).getOrElse(Map.empty)
    }

    // rate-limit watermark: the highest version this source has PLANNED
    // (not committed) — restart resets it to fromVersion, and the first
    // getBatch bumps it past the checkpoint's recovered end, so recovery
    // replans the identical pending batch before new ones
    private var planned: Int = fromVersion

    /** Version carried by an offset: LongOffset live, SerializedOffset
      * after checkpoint recovery — both print the bare number as json. */
    private def ver(o: LegacyOffset): Int = o.json().trim.toLong.toInt

    override def getOffset: Option[LegacyOffset] = {
      val head = SnapshotLog.snapshots(spark, root)
        .filter(_.branch.isEmpty).lastOption.map(_.version)
        .getOrElse(fromVersion)
      val next = maxVersionsPerTrigger
        .map(m => math.min(head, planned + math.max(1, m)))
        .getOrElse(head)
      // monotonic clamp: `planned` is the highest offset ever returned OR
      // seen in getBatch, so even if a restart path calls getOffset before
      // the recovery getBatch, this source never emits an offset that
      // regresses below an end the engine has already checkpointed
      if (next <= math.max(fromVersion, planned)) None
      else { planned = next; Some(LongOffset(next.toLong)) }
    }

    override def getBatch(start: Option[LegacyOffset],
        end: LegacyOffset): DataFrame = {
      val fromV = start.map(ver).getOrElse(fromVersion)
      val toV = ver(end)
      planned = math.max(planned, toV)
      // conform to the DECLARED schema: changes() conforms to the range
      // end's schema, which can drift from the stream-start pin under
      // mid-stream column adds
      val ch = SnapshotLog.changes(spark, root, fromV, Some(toV),
        identifierCols = identifierCols)
      // the batch's columns carry the RANGE END's names; resolve each
      // declared column through its stable field id so a mid-stream
      // rename keeps feeding it (a column dropped mid-stream null-fills)
      val rangeEndFids = SnapshotLog.snapshots(spark, root)
        .filter(_.branch.isEmpty).filter(_.version <= toV).lastOption
        .map(SnapshotLog.fidsOf).getOrElse(Map.empty)
      val conformed = ch.select(declared.fields.toSeq.map { f =>
        val nameNow = declaredFids.get(f.name)
          .flatMap(id => rangeEndFids.collectFirst {
            case (n, i) if i == id => n })
          .getOrElse(f.name)
        (if (ch.columns.contains(nameNow)) col(nameNow).cast(f.dataType)
         else lit(null).cast(f.dataType)).as(f.name)
      }: _*)
      // MicroBatchExecution asserts isStreaming on the returned plan
      org.apache.spark.sql.GraftSqlShim.asStreaming(spark, conformed)
    }

    override def stop(): Unit = ()
  }
}
