package graft

import org.apache.spark.sql.functions._

/** Empirical scale-bound check for the EVENTS pillar (windows,
  * sessionization, as-of and interval joins) — the companion of
  * DedupScale, which covers the documents pillar. Synthesizes an N×
  * events corpus and prints per-scale timings so runtime-vs-corpus-size
  * is measured, not argued.
  *
  * Corpus construction: replica r > 0 shifts user_id (and event_id for
  * uniqueness) into a fresh range AND shifts ts by r × (span + 1 day) —
  * the "more users over more time" growth axis, which is how event data
  * actually scales. The time shift matters for the KEYLESS interval
  * joins: replicating users over the SAME fixed span makes the corpus
  * denser, and a point-in-interval join's qualifying-pair OUTPUT then
  * grows quadratically — an inherent property of the result, not
  * operator waste (measured: 3.2×/doubling before the shift, see
  * BASELINE.md). With temporal density held constant the output grows
  * linearly and the harness measures the operator.
  *
  * Timing is min-of-2 passes per query per scale (same rationale as
  * DedupScale/Bench: min is the right statistic for purely-additive
  * host interference).
  *
  * Usage: runMain graft.EventsScale <sfDir> <scales e.g. 1,2,4,8,16> [query-substring] */
object EventsScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val scales = (if (args.length > 1) args(1) else "1,2,4")
      .split(",").map(_.trim.toInt)
    val flt = if (args.length > 2) args(2) else ""
    val spark = Sessions.local()
    val queries = Seq(
      "win_rank", "win_frames", "win_sessionize", "win_session_native",
      "win_time_range", "win_qualify", "win_topn_per_group",
      "join_asof", "join_asof_native", "join_asof_native_bygroups",
      "join_interval_native", "join_interval_binned")
      .filter(_.contains(flt))
    val base0 = Tables.events(spark, sfDir)
    // span + 1 day, in µs: the per-replica time shift (scalar metadata
    // fetch — harness-side only, never part of a measured plan)
    val span = base0.agg(
      (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))
        + 86400L * 1000000L).as("s")).head.getLong(0)
    val results = scales.map { n =>
      val dir = s"/tmp/graft_scale_events/x$n"
      val base = Tables.events(spark, sfDir)
      val scaled = base.crossJoin(spark.range(n).toDF("rep"))
        .select(
          (col("event_id") + col("rep") * 1000000000L).as("event_id"),
          timestamp_micros(unix_micros(col("ts")) + col("rep") * span).as("ts"),
          (col("user_id") + col("rep") * 10000000L).as("user_id"),
          col("event_type"), col("value"), col("props"))
      scaled.write.mode("overwrite").parquet(s"$dir/events.parquet")
      val rows = spark.read.parquet(s"$dir/events.parquet").count()
      def onePass(q: String): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val times = queries.map(q => q -> math.min(onePass(q), onePass(q)))
      (n, rows, times)
    }
    results.foreach { case (n, rows, times) =>
      val qs = times.map { case (q, t) => f""""$q":$t%.2f""" }.mkString(",")
      val tot = times.map(_._2).sum
      println(f"""{"scale":$n,"events":$rows,"total_s":$tot%.2f,$qs}""")
    }
    spark.stop()
  }
}
