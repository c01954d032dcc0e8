package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Bounded KMV (k-minimum-values) distinct-count sketch — the same sketch
  * family as the reference's Iceberg theta-sketch NDV statistics
  * (bodo/io/iceberg/theta.py, bodo/libs/_theta_sketches.cpp,
  * bodo/libs/_puffin.cpp): keep the K smallest distinct 60-bit hashes of the
  * input; if fewer than K were seen the count is exact, otherwise estimate
  * NDV as (K-1) / x_(K) where x_(K) is the K-th smallest hash normalized to
  * (0,1].
  *
  * A genuine distributed sketch: the buffer is a bounded sorted set, update
  * inserts-and-truncates, merge unions-and-truncates, so partial aggregation
  * (map-side combine) works and the shuffled state per group is at most
  * K longs — the property that makes NDV stats collection feasible on a
  * 100 TB table (constant memory per group, one pass, no count-distinct
  * shuffle of the raw keys).
  *
  * The input child must already be the 60-bit hash
  * (`TextKernels.md5Long`-style: first 15 hex chars of md5), which keeps the
  * whole computation engine-independent and lets the DuckDB oracle replay it
  * exactly: deterministic hash, deterministic k-smallest, identical
  * double-precision estimate formula.
  */
@ExpressionDescription(
  usage = "kmv_ndv(hash60) - KMV sketch distinct-count estimate over 60-bit hashes.")
case class KmvNdv(
    child: Expression,
    k: Int = KmvNdv.DefaultK,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_ndv"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last) { // keep only the k smallest
      if (buf.add(h)) { buf.pollLast(); () }
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * KmvNdv.Pow60 / buf.last.toDouble

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvNdv =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvNdv =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvNdv =
    copy(child = newChild)
}

object KmvNdv {
  /** 64 longs/group: small enough to shuffle freely, ~12% rel. error. */
  val DefaultK = 64
  /** md5Long hashes are 60-bit, so x/2^60 normalizes to (0,1]. */
  val Pow60: Double = 1152921504606846976.0d // 2^60

  /** NDV estimate from a materialized k-min sketch ([[KmvSketch]] output):
    * exact below k, (k-1)/x_(k) above — the same formula [[KmvNdv]]
    * applies to its live buffer. */
  def estimateFromSketch(hashes: Seq[Long], k: Int): Long =
    if (hashes.size < k) hashes.size.toLong
    else math.round((k - 1).toDouble * Pow60 / hashes.max.toDouble)
}

/** The SKETCH itself (sorted k smallest 60-bit hashes, array<long>) —
  * what ANALYZE persists in the manifest sidecar so NDV survives as
  * MERGEABLE state (union-and-truncate folds sketches from different
  * analyses without rescanning), the reference's Iceberg Puffin/theta
  * pattern (bodo/io/iceberg/theta.py). Same buffer discipline as
  * [[KmvNdv]]: bounded sorted set, map-side combinable. */
case class KmvSketch(
    child: Expression,
    k: Int = KmvNdv.DefaultK,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.{ArrayType, LongType}

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last) {
      if (buf.add(h)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}
