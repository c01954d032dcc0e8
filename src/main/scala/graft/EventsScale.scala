package graft

import org.apache.spark.sql.functions._

/** Empirical scale-bound check for the EVENTS pillar (windows,
  * sessionization, as-of and interval joins) — the companion of
  * DedupScale, which covers the documents pillar. Synthesizes an N×
  * events corpus and prints per-scale timings so runtime-vs-corpus-size
  * is measured, not argued.
  *
  * TWO growth axes, because they stress different machinery:
  *
  * - mode=users (default): replica r > 0 shifts user_id (and event_id for
  *   uniqueness) into a fresh range AND shifts ts by r × (span + 1 day) —
  *   "more users over more time", how event data usually scales. Temporal
  *   density and per-user event counts stay constant; what grows is
  *   partition COUNT. The time shift matters for the KEYLESS interval
  *   joins: replicating users over the SAME fixed span makes the corpus
  *   denser and a point-in-interval join's qualifying-pair OUTPUT then
  *   grows quadratically — an inherent property of the result, not
  *   operator waste (measured: 3.2×/doubling before the shift, see
  *   BASELINE.md).
  *
  * - mode=density: SAME users, SAME span, each event replicated with a
  *   small deterministic ts jitter (r × 1.3 s, far under the 30-minute
  *   session gap) — "each user does N× more", the axis that grows the
  *   per-PARTITION buffers of the window family (win_sessionize /
  *   win_qualify were the two highest users-axis slopes in r11). Sessions
  *   and windows keep their boundaries; each holds N× rows. The keyless
  *   interval joins are EXCLUDED here by default: under densification
  *   their output is quadratic by construction (the documented r11
  *   routing: shard by time range instead), so timing them would measure
  *   result size, not the operator.
  *
  * Timing is min-of-2 passes per query per scale (same rationale as
  * DedupScale/Bench: min is the right statistic for purely-additive
  * host interference).
  *
  * Usage: runMain graft.EventsScale <sfDir> <scales e.g. 1,2,4,8,16>
  *        [query-substring] [users|density] */
object EventsScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val scales = (if (args.length > 1) args(1) else "1,2,4")
      .split(",").map(_.trim.toInt)
    // trailing args: an optional query-substring filter ("-" or "all" =
    // none) and an optional mode; mode is recognized positionally-last so
    // `runMain ... 1,2,4 density` works without a filter placeholder
    val trailing = args.drop(2).toSeq
    val mode =
      if (trailing.lastOption.exists(Set("users", "density"))) trailing.last
      else "users"
    val flt = trailing.dropRight(if (mode == trailing.lastOption.orNull) 1 else 0)
      .headOption.filterNot(Set("-", "all", "''")).getOrElse("")
    val spark = Sessions.local()
    val windowFamily = Seq(
      "win_rank", "win_frames", "win_sessionize", "win_session_native",
      "win_time_range", "win_qualify", "win_topn_per_group",
      "join_asof", "join_asof_native", "join_asof_native_bygroups")
    val intervalFamily = Seq("join_interval_native", "join_interval_binned")
    val queries = (mode match {
      case "density" => windowFamily // interval joins: output-quadratic here
      case _         => windowFamily ++ intervalFamily
    }).filter(_.contains(flt))
    val base0 = Tables.events(spark, sfDir)
    // span + 1 day, in µs: the per-replica time shift of the users axis
    // (scalar metadata fetch — harness-side only, never in a measured plan)
    val span = base0.agg(
      (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))
        + 86400L * 1000000L).as("s")).head.getLong(0)
    val results = scales.map { n =>
      val dir = s"/tmp/graft_scale_events/${mode}_x$n"
      val base = Tables.events(spark, sfDir)
      val scaled = base.crossJoin(spark.range(n).toDF("rep"))
        .select(
          (col("event_id") + col("rep") * 1000000000L).as("event_id"),
          (mode match {
            case "density" => // jitter ≪ session gap: windows densify
              timestamp_micros(unix_micros(col("ts")) + col("rep") * 1300000L)
            case _ =>         // fresh time range per replica
              timestamp_micros(unix_micros(col("ts")) + col("rep") * span)
          }).as("ts"),
          (mode match {
            case "density" => col("user_id") // same users, more events each
            case _         => col("user_id") + col("rep") * 10000000L
          }).as("user_id"),
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
      println(f"""{"mode":"$mode","scale":$n,"events":$rows,"total_s":$tot%.2f,$qs}""")
    }
    spark.stop()
  }
}
