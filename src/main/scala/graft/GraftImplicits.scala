package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.{Asof, Interval}

/** Method syntax for the library's whole-operator extensions — the
  * ergonomic surface a user migrating from the reference's DataFrame API
  * reaches for (`df.merge_asof(...)`-style call sites instead of
  * companion-object builders):
  *
  * {{{
  * import graft.GraftImplicits._
  * probes.asofJoin(quotes, "user_id", "q_user", "p_ts", "q_ts")
  * points.intervalJoin(windows, "pt", "t0", "t1")
  * docs.llmGenerate("text", "reply", backend)
  * }}}
  *
  * Pure delegation — every method forwards to the operator's canonical
  * entry point, so plan shapes, validation, and semantics are identical
  * whichever spelling is used.
  */
object GraftImplicits {

  implicit class GraftDataFrameOps(private val df: DataFrame) extends AnyVal {

    /** merge_asof: latest (backward) / earliest (forward) match per probe
      * row. See [[graft.plans.Asof.join]]. */
    def asofJoin(quotes: DataFrame, leftKey: String, rightKey: String,
                 leftTime: String, rightTime: String,
                 direction: String = "backward",
                 tolerance: Option[Long] = None): DataFrame =
      Asof.join(df, quotes, leftKey, rightKey, leftTime, rightTime,
        direction, tolerance)

    /** Point-in-interval join (inner or left). See
      * [[graft.plans.Interval.join]]. */
    def intervalJoin(intervals: DataFrame, point: String,
                     start: String, end: String,
                     startInclusive: Boolean = true,
                     endInclusive: Boolean = false,
                     joinType: String = "inner"): DataFrame =
      Interval.join(df, intervals, point, start, end, startInclusive,
        endInclusive, joinType)

    /** Interval-overlap join. See [[graft.plans.Interval.joinOverlap]]. */
    def intervalOverlapJoin(intervals: DataFrame, pStart: String, pEnd: String,
                            start: String, end: String): DataFrame =
      Interval.joinOverlap(df, intervals, pStart, pEnd, start, end)

    /** MERGE INTO row semantics over this DataFrame as target. See
      * [[graft.operators.MergeInto.merge]]. */
    def mergeInto(source: DataFrame, key: String, cols: Seq[String],
                  whenMatched: String => Column,
                  whenNotMatched: String => Column,
                  deleteNotMatchedBySource: Boolean): DataFrame =
      graft.operators.MergeInto.merge(df, source, key, cols,
        whenMatched, whenNotMatched, deleteNotMatchedBySource)

    /** Commit this frame to a SnapshotLog table (append by default). See
      * [[graft.sources.SnapshotLog.commit]]. */
    def writeSnapshot(root: String, commitTsMs: Long,
                      overwrite: Boolean = false): Int =
      graft.sources.SnapshotLog.commit(df, root, overwrite, commitTsMs)

    /** Batched LLM generation appending `outCol`. See
      * [[graft.llm.LlmFunctions.llmGenerate]]. */
    def llmGenerate(textCol: String, outCol: String,
                    backend: graft.llm.GenBackend,
                    batchSize: Int = 32): DataFrame =
      graft.llm.LlmFunctions.llmGenerate(df, textCol, outCol, backend, batchSize)

    // ---- ordered Series operations --------------------------------------
    // pandas Series ops that depend on ROW ORDER (shift/diff/cumsum/rank)
    // have no implicit order on a distributed DataFrame, so the veneer
    // takes the ordering — and an optional partitioning for per-group
    // semantics (df.groupby(g).x.shift()) — explicitly. Reference surface:
    // bodo/hiframes/series_impl.py (shift, diff, pct_change, cumsum,
    // rank), rolling/fill compositions live in the win_pandas_* entries.

    private def w(orderBy: Seq[Column], partitionBy: Seq[Column]) =
      Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)

    /** Series.shift(periods): value `periods` rows back (negative = lead). */
    def shiftCol(c: Column, orderBy: Seq[Column], periods: Int = 1,
                 partitionBy: Seq[Column] = Nil): Column =
      if (periods >= 0) lag(c, periods).over(w(orderBy, partitionBy))
      else lead(c, -periods).over(w(orderBy, partitionBy))

    /** Series.diff(): first discrete difference. */
    def diffCol(c: Column, orderBy: Seq[Column], periods: Int = 1,
                partitionBy: Seq[Column] = Nil): Column =
      c - shiftCol(c, orderBy, periods, partitionBy)

    /** Series.pct_change(): fractional change from the previous row. */
    def pctChangeCol(c: Column, orderBy: Seq[Column],
                     partitionBy: Seq[Column] = Nil): Column = {
      val prev = shiftCol(c, orderBy, 1, partitionBy)
      (c - prev) / prev
    }

    /** Series.cumsum() (running total, current row inclusive). */
    def cumsumCol(c: Column, orderBy: Seq[Column],
                  partitionBy: Seq[Column] = Nil): Column =
      sum(c).over(w(orderBy, partitionBy)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    /** Series.cummax() / cummin(). */
    def cummaxCol(c: Column, orderBy: Seq[Column],
                  partitionBy: Seq[Column] = Nil): Column =
      max(c).over(w(orderBy, partitionBy)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    def cumminCol(c: Column, orderBy: Seq[Column],
                  partitionBy: Seq[Column] = Nil): Column =
      min(c).over(w(orderBy, partitionBy)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    /** Series.rank(method='min'|'dense'|'first'), ascending. */
    def rankCol(c: Column, method: String = "min",
                partitionBy: Seq[Column] = Nil): Column = method match {
      case "min"   => rank().over(w(Seq(c), partitionBy))
      case "dense" => dense_rank().over(w(Seq(c), partitionBy))
      case "first" => row_number().over(w(Seq(c), partitionBy))
      case other => throw new IllegalArgumentException(
        s"rank method must be min|dense|first, got $other")
    }

    /** Series.value_counts(): (value, count) descending, ties by value. */
    def valueCounts(c: Column): DataFrame =
      df.groupBy(c.as("value")).agg(count(lit(1)).as("count"))
        .orderBy(col("count").desc, col("value"))
  }

  /** pandas Series scalar surface as method syntax on [[Column]]: the
    * `.str` / `.dt` accessors and the numeric element-wise methods, every
    * one delegating to a codegen'd Spark builtin (reference surface:
    * bodo/hiframes/series_str_impl.py, series_dt_impl.py,
    * series_impl.py). Ops that need row order live on the DataFrame
    * veneer above, where the caller supplies the ordering. */
  implicit class SeriesColumnOps(private val c: Column) extends AnyVal {
    def str: StrAccessor = new StrAccessor(c)
    def dt: DtAccessor = new DtAccessor(c)

    /** Series.fillna(value). */
    def fillna(v: Any): Column = coalesce(c, lit(v))
    /** Series.isna() / notna(). */
    def isna: Column = c.isNull
    def notna: Column = c.isNotNull
    /** Series.clip(lower, upper). */
    def clip(lo: Any, hi: Any): Column = greatest(least(c, lit(hi)), lit(lo))
    /** Series.between(left, right), inclusive both ends (pandas default). */
    def betweenInc(lo: Any, hi: Any): Column = c >= lit(lo) && c <= lit(hi)
    /** Series.astype(dtype). */
    def astype(t: String): Column = c.cast(t)
    /** Series.abs() / round(n) / pow. */
    def absS: Column = abs(c)
    def roundS(n: Int): Column = round(c, n)
    def powS(e: Double): Column = pow(c, e)
    /** Series.floordiv / mod. */
    def floordiv(d: Any): Column = floor(c / lit(d)).cast("long")
    def modS(d: Any): Column = c % lit(d)
    /** Series.isin(values). */
    def isinS(vs: Any*): Column = c.isin(vs: _*)
    /** Series.where(cond) / mask(cond): keep where cond holds (else null)
      * / null where cond holds. */
    def whereS(cond: Column): Column = when(cond, c)
    def maskS(cond: Column): Column = when(!cond, c)
  }

  /** `.str` accessor: pandas string methods on a Column. 0-based,
    * stop-exclusive pandas indexing is translated to SQL's 1-based
    * inclusive at the boundary. */
  final class StrAccessor(private val c: Column) extends AnyVal {
    def len: Column = length(c)
    def lower: Column = org.apache.spark.sql.functions.lower(c)
    def upper: Column = org.apache.spark.sql.functions.upper(c)
    def strip: Column = trim(c)
    def lstrip: Column = ltrim(c)
    def rstrip: Column = rtrim(c)
    def title: Column = initcap(c)
    def capitalize: Column =
      concat(org.apache.spark.sql.functions.upper(substring(c, 1, 1)),
        org.apache.spark.sql.functions.lower(substring(c, 2, Int.MaxValue)))
    /** contains(pat, regex=true|false) — pandas defaults regex=true. */
    def containsPat(pat: String, regex: Boolean = true): Column =
      if (regex) c.rlike(pat) else c.contains(pat)
    def startswith(p: String): Column = c.startsWith(p)
    def endswith(p: String): Column = c.endsWith(p)
    /** slice(start, stop): 0-based, stop-exclusive. */
    def slice(start: Int, stop: Int): Column =
      substring(c, start + 1, math.max(stop - start, 0))
    /** get(i): char at 0-based index (empty past the end, like pandas). */
    def get(i: Int): Column = substring(c, i + 1, 1)
    def repeat(n: Int): Column =
      org.apache.spark.sql.functions.repeat(c, n)
    def pad(width: Int, side: String = "left", fill: String = " "): Column =
      side match {
        case "left"  => lpad(c, width, fill)
        case "right" => rpad(c, width, fill)
        case "both"  =>
          // pandas center: extra fill goes to the RIGHT; built from
          // Column.substr because lpad/rpad only take literal widths
          val padTotal = greatest(lit(width) - length(c), lit(0))
          val leftN = (padTotal / 2).cast("int")
          val fills = lit(fill * width)
          concat(fills.substr(lit(1), leftN), c,
            fills.substr(lit(1), (padTotal - leftN).cast("int")))
        case other => throw new IllegalArgumentException(
          s"pad side must be left|right|both, got $other")
      }
    /** zfill(width): sign-aware zero pad (pandas puts zeros AFTER +/-;
      * strings already at/over the width pass through — lpad would
      * truncate them). */
    def zfill(width: Int): Column =
      when(length(c) >= width, c)
        .when(substring(c, 1, 1).isin("-", "+"),
          concat(substring(c, 1, 1),
            lpad(substring(c, 2, Int.MaxValue), width - 1, "0")))
        .otherwise(lpad(c, width, "0"))
    /** find(sub): 0-based index of first occurrence, -1 if absent. */
    def find(sub: String): Column = (instr(c, sub) - 1).cast("int")
    /** count(pat): non-overlapping regex match count. */
    def countPat(pat: String): Column =
      size(regexp_extract_all(c, lit(pat), lit(0)))
    def extract(pat: String, group: Int = 1): Column =
      regexp_extract(c, pat, group)
    def replaceAll(pat: String, repl: String, regex: Boolean = true): Column =
      if (regex) regexp_replace(c, pat, repl)
      else org.apache.spark.sql.functions.replace(c, lit(pat), lit(repl))
    def splitPat(pat: String): Column =
      org.apache.spark.sql.functions.split(c, pat)
    // character-class predicates (pandas: true iff non-empty and all chars)
    def isdigit: Column = c.rlike("^[0-9]+$")
    def isalpha: Column = c.rlike("^[A-Za-z]+$")
    def isalnum: Column = c.rlike("^[A-Za-z0-9]+$")
    def isspace: Column = c.rlike("^\\s+$")
    def isupper: Column = c === org.apache.spark.sql.functions.upper(c) &&
      c.rlike("[A-Za-z]")
    def islower: Column = c === org.apache.spark.sql.functions.lower(c) &&
      c.rlike("[A-Za-z]")
  }

  /** `.dt` accessor: pandas datetime properties on a Column. */
  final class DtAccessor(private val c: Column) extends AnyVal {
    def year: Column = org.apache.spark.sql.functions.year(c)
    def month: Column = org.apache.spark.sql.functions.month(c)
    def day: Column = dayofmonth(c)
    def hour: Column = org.apache.spark.sql.functions.hour(c)
    def minute: Column = org.apache.spark.sql.functions.minute(c)
    def second: Column = org.apache.spark.sql.functions.second(c)
    /** Monday=0 like pandas (Spark's dayofweek is Sunday=1). */
    def dayofweek: Column =
      ((org.apache.spark.sql.functions.dayofweek(c) + 5) % 7).cast("int")
    def dayofyear: Column = org.apache.spark.sql.functions.dayofyear(c)
    def quarter: Column = org.apache.spark.sql.functions.quarter(c)
    def daysinmonth: Column = dayofmonth(last_day(c))
    def isMonthStart: Column = dayofmonth(c) === 1
    def isMonthEnd: Column = dayofmonth(c) === dayofmonth(last_day(c))
    def date: Column = to_date(c)
    /** normalize(): midnight of the same day. */
    def normalize: Column = date_trunc("DAY", c)
    def strftime(sparkFmt: String): Column = date_format(c, sparkFmt)
    def weekofyear: Column = org.apache.spark.sql.functions.weekofyear(c)
  }
}
