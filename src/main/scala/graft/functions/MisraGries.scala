package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch: a bounded frequency summary whose
  * candidate set is GUARANTEED to contain every item with true frequency
  * > N/(capacity+1). Mergeable (Agarwal et al., "Mergeable Summaries",
  * PODS'12): combine maps by summing, then subtract the (capacity+1)-th
  * largest count from everything and drop the non-positives — the same
  * error bound survives arbitrary merge trees, which is what makes the
  * sketch partial-aggregatable (map-side combine; at most `capacity`
  * (string, long) pairs shuffle per group, independent of corpus size).
  *
  * Surviving COUNTS are order-dependent lower bounds, so the aggregate
  * returns only the candidate ITEM SET (sorted for a stable output).
  * The deterministic pattern is two-pass: sketch → exact-count the ≤
  * capacity candidates → threshold. Any threshold ≥ N/(capacity+1) then
  * yields exactly the true heavy hitters — no dependence on partitioning
  * or merge order. (Reference analog: the reference collects NDV/stat
  * sketches per column the same bounded-mergeable way —
  * bodo/io/iceberg/theta.py; a frequency summary is the companion sketch
  * for skew/hot-key discovery at 100 TB.)
  */
@ExpressionDescription(
  usage = "mg_topk_candidates(expr, capacity) - Misra-Gries heavy-hitter candidate set.")
case class MisraGries(
    child: Expression,
    capacity: Int = MisraGries.DefaultCapacity,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
    with UnaryLike[Expression] {

  require(capacity > 0, "mg_topk_candidates capacity must be positive")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "mg_topk_candidates"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  /** Subtract the (capacity+1)-th largest count and drop non-positives —
    * the shrink step shared by overflowing updates and merges. */
  private def shrink(buf: java.util.HashMap[String, Long]): Unit = {
    if (buf.size <= capacity) return
    val counts = new Array[Long](buf.size)
    var i = 0
    val vit = buf.values.iterator()
    while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
    java.util.Arrays.sort(counts)
    val d = counts(buf.size - capacity - 1) // (capacity+1)-th largest
    val eit = buf.entrySet().iterator()
    while (eit.hasNext) {
      val e = eit.next()
      if (e.getValue <= d) eit.remove() else e.setValue(e.getValue - d)
    }
  }

  /** Classic MG decrement for the per-row path: after a +1 insert the
    * buffer holds at most capacity+1 entries, so the (capacity+1)-th
    * largest count IS the minimum — one O(cap) scan (no sort, no
    * allocation) per saturated update, versus shrink()'s O(cap·log cap).
    * The quantile-based shrink stays for merge(), where overflow can be
    * arbitrary and the sort amortizes over a whole partial buffer. */
  private def shrinkByMin(buf: java.util.HashMap[String, Long]): Unit = {
    if (buf.size <= capacity) return
    var d = Long.MaxValue
    val vit = buf.values.iterator()
    while (vit.hasNext) { val c = vit.next(); if (c < d) d = c }
    val eit = buf.entrySet().iterator()
    while (eit.hasNext) {
      val e = eit.next()
      if (e.getValue <= d) eit.remove() else e.setValue(e.getValue - d)
    }
  }

  override def update(
      buf: java.util.HashMap[String, Long], input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.merge(key, 1L, (a, b) => a + b)
      shrinkByMin(buf)
    }
    buf
  }

  override def merge(
      buf: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.merge(e.getKey, e.getValue, (a, b) => a + b)
    }
    shrink(buf)
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val keys = new Array[String](buf.size)
    buf.keySet().toArray(keys)
    java.util.Arrays.sort(keys.asInstanceOf[Array[AnyRef]])
    new GenericArrayData(keys.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    var size = 4
    val entries = buf.entrySet().iterator()
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Long)]
    while (entries.hasNext) {
      val e = entries.next()
      val b = e.getKey.getBytes("UTF-8")
      pairs += ((b, e.getValue))
      size += 4 + b.length + 8
    }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(pairs.size)
    for ((b, c) <- pairs) { bb.putInt(b.length); bb.put(b); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.put(new String(b, "UTF-8"), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {
  /** 64 entries/group shuffle at most; guarantees candidates for any item
    * with frequency > N/65. */
  val DefaultCapacity = 64
}
