package graft

import org.apache.spark.sql.{Column, DataFrame}
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

    /** Point-in-interval join. See [[graft.plans.Interval.join]]. */
    def intervalJoin(intervals: DataFrame, point: String,
                     start: String, end: String,
                     startInclusive: Boolean = true,
                     endInclusive: Boolean = false): DataFrame =
      Interval.join(df, intervals, point, start, end, startInclusive, endInclusive)

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

    /** Batched LLM generation appending `outCol`. See
      * [[graft.llm.LlmFunctions.llmGenerate]]. */
    def llmGenerate(textCol: String, outCol: String,
                    backend: graft.llm.GenBackend,
                    batchSize: Int = 32): DataFrame =
      graft.llm.LlmFunctions.llmGenerate(df, textCol, outCol, backend, batchSize)
  }
}
