package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Murmur3Hash}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** V2 catalog functions backing storage-partitioned joins (SPJ).
  *
  * Spark plans a shuffle-free join between two `KeyGroupedPartitioning`
  * scans only when it can resolve each partition TRANSFORM to a catalyst
  * expression. `identity` resolves natively; `bucket[N]` resolves through
  * the table catalog's [[org.apache.spark.sql.connector.catalog.FunctionCatalog]]
  * — exactly how Iceberg's SparkCatalog exposes its bucket function. The
  * bound function must compute the SAME bucket id the writer's layout
  * derivation does ([[SnapshotPartition.transformCol]]: `pmod(hash(col),
  * n)`, Murmur3 seed 42), or a runtime re-evaluation (e.g. Spark's
  * partially-clustered distribution) would disagree with the stored
  * tuples. (Reference surface: the reference reads/writes Iceberg bucket
  * layouts through the connector; this is the native function analog.) */
object SnapshotFunctions {

  /** `bucket(numBuckets, col)` — unbound: binds to any key type the
    * writer can hash (Murmur3Hash covers all atomic types). */
  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): pmod(murmur3_hash(col), n) — snapshotlog layout hash"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket expects (numBuckets, value), got ${inputType.catalogString}")
      new BucketBound(inputType.fields(1).dataType)
    }
  }

  /** `days(col)` — the time-partitioning transform (UTC epoch days),
    * matching the writer's derivation exactly: timestamps floorDiv
    * through epoch seconds, dates pass through, NTZ truncates the
    * wall-clock value ([[SnapshotPartition.transformCol]] "day"). */
  object DaysUnbound extends UnboundFunction {
    override def name(): String = "days"
    override def description(): String =
      "days(ts): UTC epoch days — snapshotlog day-partition transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"days expects (value), got ${inputType.catalogString}")
      new DaysBound(inputType.fields.head.dataType)
    }
  }

  final class DaysBound(dt: DataType) extends ScalarFunction[Integer] {
    require(dt == DateType || dt == TimestampType || dt == TimestampNTZType,
      s"days: unsupported source type ${dt.catalogString}")
    override def inputTypes(): Array[DataType] = Array(dt)
    override def resultType(): DataType = DateType
    override def name(): String = "days"
    override def canonicalName(): String =
      s"snapshotlog.days(${dt.catalogString})"
    override def isResultNullable: Boolean = true
    override def isDeterministic: Boolean = true
    override def produceResult(input: InternalRow): Integer =
      if (input.isNullAt(0)) null
      else dt match {
        case DateType => Integer.valueOf(input.getInt(0))
        case _ => // catalyst timestamps are epoch MICROS (NTZ: wall-clock
          // micros — the same value the writer's to_date truncation uses)
          Integer.valueOf(java.lang.Math.floorDiv(
            input.getLong(0), 86400000000L).toInt)
      }
  }

  /** `truncate(width, col)` — numeric floorDiv(v,W)*W (LONG), string
    * W-char prefix; matches the writer's truncate[W] layout exactly. */
  object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(w, col): floorDiv(col, w)*w for numerics, w-char prefix " +
        "for strings — snapshotlog truncate-partition transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"truncate expects (width, value), got ${inputType.catalogString}")
      new TruncateBound(inputType.fields(1).dataType)
    }
  }

  final class TruncateBound(dt: DataType) extends ScalarFunction[Any] {
    require(dt == IntegerType || dt == LongType || dt == StringType,
      s"truncate: unsupported source type ${dt.catalogString}")
    override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
    // numeric truncation is computed in LONG space (the writer casts the
    // derived column to LongType); strings truncate to strings
    override def resultType(): DataType =
      if (dt == StringType) StringType else LongType
    override def name(): String = "truncate"
    override def canonicalName(): String =
      s"snapshotlog.truncate(${dt.catalogString})"
    override def isResultNullable: Boolean = true
    override def isDeterministic: Boolean = true
    override def produceResult(input: InternalRow): Any =
      if (input.isNullAt(0) || input.isNullAt(1)) null // null-in, null-out
      else {
        val w = input.getInt(0)
        require(w > 0, s"truncate: width must be positive, got $w")
        dt match {
          case StringType =>
            val s = input.getUTF8String(1)
            if (s.numChars() <= w) s else s.substringSQL(1, w)
          case IntegerType =>
            java.lang.Long.valueOf(
              java.lang.Math.floorDiv(input.getInt(1).toLong, w.toLong) * w)
          case _ =>
            java.lang.Long.valueOf(
              java.lang.Math.floorDiv(input.getLong(1), w.toLong) * w)
        }
      }
  }

  /** Bound per key type. `canonicalName` carries the type so two sides of
    * a join compare equal exactly when their key types match —
    * `KeyGroupedShuffleSpec` compatibility hinges on this equality. */
  final class BucketBound(dt: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String =
      s"snapshotlog.bucket(${dt.catalogString})"
    override def isResultNullable: Boolean = true // null numBuckets -> null
    override def isDeterministic: Boolean = true
    // Murmur3 over the value at ordinal 1, seed 42 — bit-identical to the
    // writer's functions.hash(col); evaluated only when Spark needs the
    // transform's VALUE (the SPJ fast path compares stored tuples)
    @transient private lazy val hasher =
      Murmur3Hash(Seq(BoundReference(1, dt, nullable = true)), 42)
    override def produceResult(input: InternalRow): Integer =
      if (input.isNullAt(0)) null // null numBuckets -> null, not mod-zero
      else {
        val n = input.getInt(0)
        require(n > 0, s"bucket: numBuckets must be positive, got $n")
        // null VALUES hash to the seed (writer semantics: pmod(hash(null),n))
        Integer.valueOf(java.lang.Math.floorMod(
          hasher.eval(input).asInstanceOf[Int], n))
      }
  }
}
