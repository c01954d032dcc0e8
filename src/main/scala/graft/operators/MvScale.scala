package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.sources.SnapshotLog

/** Scale study: the incremental-MV loop's two claims, measured as the
  * base grows 1x -> 8x (250k -> 2M rows):
  *   - SERVE: the dashboard aggregate (GROUP BY day over the base, and
  *     the r18 ROLLUP GROUP BY over a subset key) answered via the
  *     transparent rewrite vs the same query with the rewrite disabled
  *     (a full base re-aggregation) — the MV side should be FLAT.
  *   - REFRESH: incremental maintain() after a 1k-row trickle append vs
  *     rebuilding the MV from scratch — refresh cost tracks the CHANGE,
  *     rebuild cost tracks the base.
  * Times are min of 2, local[32]. */
private[graft] object MvScale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val base = 250000L
    for (mult <- Seq(1, 2, 4, 8)) {
      val root = s"/tmp/graft_mv_scale/m$mult"
      val ns = s"mvscale_m$mult"
      val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new Path(root), true)
      fs.delete(new Path(s"/tmp/graft_snap_warehouse/$ns"), true)
      val n = base * mult
      val df = spark.range(0, n).selectExpr("id AS k",
        "cast(id % 365 AS int) AS day", "cast(id % 50 AS int) AS cc",
        "id % 1000 AS v")
      SnapshotLog.commit(df, root, overwrite = true, 100L,
        math.max(4, (n / 125000L).toInt))
      def timed(f: => Unit): Double =
        (0 until 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }.min
      val rebuildS = timed {
        IncrementalMv.create(spark, root, s"$ns.mv", Seq("day", "cc"), Seq("v"))
      }
      val t = spark.read.format("snapshotlog").load(root)
      def dash() = t.groupBy(col("day"), col("cc"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      def roll() = t.groupBy(col("day"))
        .agg(count(lit(1)).as("n"), avg(col("v")).as("a"))
      def run(df2: org.apache.spark.sql.DataFrame): Double =
        timed(df2.write.format("noop").mode("overwrite").save())
      val servedS = run(dash())
      val rollupS = run(roll())
      spark.conf.set("spark.graft.mv.autoRewrite", "false")
      val directS = run(dash())
      val directRollS = run(roll())
      spark.conf.unset("spark.graft.mv.autoRewrite")
      // trickle: 1k rows — refresh must cost ~the change, not the base.
      // maintain() is idempotent at the head, so each measurement needs
      // its OWN unapplied append (min of 2 real refreshes, not a no-op)
      val refreshS = (0 until 2).map { i =>
        SnapshotLog.commit(df.limit(1000), root, overwrite = false,
          200L + i, 1)
        val t0 = System.nanoTime()
        IncrementalMv.maintain(spark, root, s"$ns.mv", Seq("day", "cc"),
          Seq("v")): Unit
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"""{"mult":$mult,"rows":$n,"serve_mv_s":$servedS%.3f,"serve_direct_s":$directS%.3f,"rollup_mv_s":$rollupS%.3f,"rollup_direct_s":$directRollS%.3f,"refresh_1k_s":$refreshS%.3f,"rebuild_s":$rebuildS%.3f}""")
      IncrementalMv.unregister(spark, root)
      fs.delete(new Path(root), true)
    }
    spark.stop()
  }
}
