package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hidden partitioning for [[SnapshotLog]] tables — Iceberg's signature
  * feature re-expressed Spark-first (reference: bodo/io/iceberg transform
  * handling; Iceberg partition spec semantics). A table declares a spec of
  * `(source column, transform)` fields; the WRITER derives the partition
  * tuple and lays files out by it; the MANIFEST records each file's tuple;
  * the PLANNER converts pushed predicates on the SOURCE column into
  * partition-tuple constraints and skips files — the user never sees or
  * mentions the partition column (that is the "hidden" part, vs. Hive
  * partitioning where queries must name the derived column).
  *
  * Transforms (the Iceberg set, minus the ones the fixture types don't
  * exercise):
  *   - `identity`      — the value itself
  *   - `bucket[N]`     — pmod(murmur3(v), N); prunes equality/IN probes on
  *                       hash-distributed keys, which min/max stats can
  *                       NEVER prune (every file spans the key range)
  *   - `truncate[W]`   — numeric: floorDiv(v, W)*W; string: W-char prefix
  *   - `day`           — days since epoch of a timestamp (UTC session)
  *
  * Pruning is conservative: a transform derives a constraint only where it
  * is sound (bucket: equality/IN only — a hash is not monotone; identity /
  * truncate / day: ranges too — monotone non-decreasing), and any file
  * whose tuple is unknown, null-valued, or not provably disjoint is kept.
  * The exact predicate is always re-applied by Spark (the scan returns all
  * filters as residuals), so partition pruning can only skip files, never
  * change results.
  */
object SnapshotPartition {

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncRe = """truncate\[(\d+)\]""".r

  /** Hive's null-partition directory marker. */
  val NullMarker = "__HIVE_DEFAULT_PARTITION__"

  /** Writer-side derived column for one spec field (over the real column,
    * so the data files keep every source column — the derived `_p_i`
    * columns exist only in the directory layout). */
  def transformCol(source: String, transform: String, dt: DataType): Column =
    transform match {
      case "identity" => col(source)
      case BucketRe(n) => pmod(hash(col(source)), lit(n.toInt))
      case TruncRe(w) => dt match {
        case StringType => substring(col(source), 1, w.toInt)
        case LongType | IntegerType =>
          (col(source) - pmod(col(source), lit(w.toLong))).cast(LongType)
        case other => throw new IllegalArgumentException(
          s"snapshotlog: truncate[$w] unsupported for $other")
      }
      // UTC-explicit epoch-day arithmetic: transformLit prunes via
      // floorDiv(epochUs, 86400e6) in UTC, so the writer must derive the
      // same value regardless of spark.sql.session.timeZone — to_date()
      // on a timestamp is session-TZ-dependent and would mis-bucket rows
      // near midnight under a non-UTC session. (pmod makes this floorDiv,
      // exact for pre-1970 instants too.)
      case "day" => dt match {
        case TimestampType =>
          // floorDiv(us, 86.4e9) = floorDiv(floorDiv(us, 1e6), 86400), and
          // unix_seconds does the inner floorDiv in exact LONG arithmetic.
          // The remaining Column `/` is double division, exact only below
          // 2^53 — in SECONDS that bound is ~year 285M (vs ~year 2255 if
          // dividing microseconds), so the writer-side value provably
          // agrees with transformLit's Math.floorDiv pruning value.
          val s = unix_seconds(col(source))
          ((s - pmod(s, lit(86400L))) / lit(86400L)).cast(LongType)
        case DateType => datediff(col(source), lit("1970-01-01").cast(DateType))
        // NTZ has no instant semantics: to_date() truncates the wall-clock
        // value with no TZ involved — identical to the UTC epoch-day math
        // transformLit uses for NTZ literals
        case TimestampNTZType =>
          datediff(to_date(col(source)), lit("1970-01-01").cast(DateType))
        case other => throw new IllegalArgumentException(
          s"snapshotlog: day transform unsupported for $other")
      }
      case other => throw new IllegalArgumentException(
        s"snapshotlog: unknown partition transform '$other'")
    }

  /** Driver-side transform of a pushed-filter literal into partition-value
    * space, as a comparable scalar matching [[parsePartValue]]'s output.
    * None = literal not convertible (prune nothing). Timestamp literals
    * arrive in the shapes Catalyst pushes (java.sql.Timestamp / Instant /
    * LocalDateTime — all mapped through UTC like the writer's session). */
  def transformLit(v: Any, dt: DataType, transform: String): Option[Any] = {
    def epochUs: Option[Long] = v match {
      case t: java.sql.Timestamp =>
        Some(Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000)
      case i: java.time.Instant => Some(i.getEpochSecond * 1000000L + i.getNano / 1000)
      case l: java.time.LocalDateTime =>
        val inst = l.toInstant(java.time.ZoneOffset.UTC)
        Some(inst.getEpochSecond * 1000000L + inst.getNano / 1000)
      case _ => None
    }
    transform match {
      case "identity" => v match {
        case n: Number => Some(Long.box(n.longValue()))
        case s: String => Some(s)
        case u: UTF8String => Some(u.toString)
        case _ => None
      }
      case BucketRe(n) =>
        val lit = v match {
          case u: UTF8String => Literal(u.toString)
          case other =>
            try Literal.create(other, dt) catch { case _: Exception => null }
        }
        if (lit == null) None
        else Some(Long.box(Math.floorMod(
          Murmur3Hash(Seq(lit), 42).eval(null).asInstanceOf[Int].toLong,
          n.toLong)))
      case TruncRe(w) => v match {
        case n: Number =>
          Some(Long.box(Math.floorDiv(n.longValue(), w.toLong) * w.toLong))
        case s: String => Some(s.take(w.toInt))
        case u: UTF8String => Some(u.toString.take(w.toInt))
        case _ => None
      }
      case "day" => epochUs.map(us => Long.box(Math.floorDiv(us, 86400000000L)))
      case _ => None
    }
  }

  /** Is a range constraint sound for this transform? (bucket is a hash —
    * only equality probes carry over). */
  def monotone(transform: String): Boolean = transform match {
    case "identity" | "day" => true
    case TruncRe(_) => true
    case _ => false
  }

  /** Parse a manifest-recorded partition value (written by the directory
    * layout) into the same scalar space as [[transformLit]]. None = null
    * partition (never pruned). */
  def parsePartValue(raw: String, dt: DataType, transform: String): Option[Any] = {
    if (raw == NullMarker) return None
    val isStringSpace = transform match {
      case "identity" | TruncRe(_) if dt == StringType => true
      case _ => false
    }
    if (isStringSpace) Some(unescape(raw))
    else
      try Some(Long.box(raw.toLong)) catch { case _: Exception => None }
  }

  /** Undo Hive's %xx path escaping (partitionBy escapes specials). */
  private[sources] def unescape(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 3 <= s.length) {
        try {
          sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } catch { case _: Exception => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** May a file whose partition tuple is `tuple` (aligned with `spec`)
    * contain a row matching `f`? Unknown shapes / missing values are kept. */
  def mayMatch(spec: Seq[(String, String)], tuple: Seq[String],
               schema: StructType, f: Filter): Boolean = {
    // the recorded value for each spec field on attribute `a`, with its
    // transform — a file must be compatible with EVERY field's constraint
    def fields(a: String): Seq[(String, Option[Any])] =
      spec.zipWithIndex.collect {
        case ((src, tr), i) if src == a && i < tuple.length =>
          val dt = schema.find(_.name == a).map(_.dataType).getOrElse(NullType)
          tr -> parsePartValue(tuple(i), dt, tr)
      }
    def dtOf(a: String): DataType =
      schema.find(_.name == a).map(_.dataType).getOrElse(NullType)
    def eqMatch(a: String, v: Any): Boolean =
      fields(a).forall {
        case (tr, Some(w)) =>
          transformLit(v, dtOf(a), tr) match {
            case Some(t) => SnapshotLog.cmp(t, w) == 0
            case None => true
          }
        case _ => true
      }
    def rangeMatch(a: String, v: Any, keep: (Int) => Boolean): Boolean =
      fields(a).forall {
        case (tr, Some(w)) if monotone(tr) =>
          transformLit(v, dtOf(a), tr) match {
            case Some(t) => keep(SnapshotLog.cmp(w, t))
            case None => true
          }
        case _ => true
      }
    f match {
      case And(l, r) => mayMatch(spec, tuple, schema, l) && mayMatch(spec, tuple, schema, r)
      case Or(l, r) => mayMatch(spec, tuple, schema, l) || mayMatch(spec, tuple, schema, r)
      case EqualTo(a, v) if v != null => eqMatch(a, v)
      case EqualNullSafe(a, v) if v != null => eqMatch(a, v)
      case In(a, vs) =>
        if (vs == null || vs.isEmpty) true
        else vs.exists(v => v == null || eqMatch(a, v))
      // monotone transforms only: row >= lo ⟹ t(row) >= t(lo), so a file
      // whose single tuple value w has w < t(lo) cannot hold a match
      // (strict > uses the same non-strict bound — conservative)
      case GreaterThan(a, v) => rangeMatch(a, v, _ >= 0)
      case GreaterThanOrEqual(a, v) => rangeMatch(a, v, _ >= 0)
      case LessThan(a, v) => rangeMatch(a, v, _ <= 0)
      case LessThanOrEqual(a, v) => rangeMatch(a, v, _ <= 0)
      case _ => true
    }
  }
}
