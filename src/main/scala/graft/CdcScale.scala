package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotLog

/** Empirical scale check for the CDC changelog read
  * ([[SnapshotLog.changes]]): the promise is cost ∝ the TRANSITION'S
  * TOUCHED FILES, never table size — a trickle delete on a 2n-file
  * table must replay in the same time at every n. This harness measures
  * it instead of asserting it.
  *
  * Per scale n: the orders table is committed n times with disjoint key
  * ranges (2 files per commit), then ONE fixed-size MoR delete and ONE
  * fixed-size append land on top. Timed (min of 2 on the same immutable
  * history — changes() is read-only):
  *
  *   - changes_trickle: the changelog of just the delete+append
  *     transitions — the flat row (touched = 2 data files + 1 fragment,
  *     independent of n)
  *   - changes_full: the changelog from genesis — the control that
  *     SHOULD grow linearly (replays every commit's files)
  *
  * Usage: runMain graft.CdcScale <sfDir> <scales e.g. 1,2,4,8> */
object CdcScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val scales = (if (args.length > 1) args(1) else "1,2,4")
      .split(",").map(_.trim.toInt)
    val spark = Sessions.local()
    val wh = "/tmp/graft_cdc_scale"

    def build(n: Int): (String, Int) = {
      val root = s"$wh/t$n"
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_totalprice"))
      for (r <- 0 until n)
        SnapshotLog.commit(
          o.select((col("o_orderkey") + lit(r * 1000000000L)).as("k"),
            col("o_totalprice").as("v")),
          root, overwrite = r == 0, commitTsMs = 1000L * (r + 1))
      val preDml = SnapshotLog.snapshots(spark, root).last.version
      // the fixed-size trickle on top: same touched bytes at every n
      SnapshotLog.deleteWhereMoR(spark, root, col("k").between(1000L, 2000L),
        SnapshotLog.nextCommitTs(spark, root))
      SnapshotLog.commit(
        spark.range(0, 500).selectExpr("id + 5000000000000 AS k",
          "CAST(1 AS DOUBLE) AS v"),
        root, overwrite = false, SnapshotLog.nextCommitTs(spark, root))
      (root, preDml)
    }

    val results = scales.map { n =>
      val (root, preDml) = build(n)
      def trickle(): Long =
        SnapshotLog.changes(spark, root, fromVersion = preDml).count()
      def full(): Long =
        SnapshotLog.changes(spark, root, fromVersion = 0).count()
      trickle(); full() // warm codegen
      def timed(f: () => Long): (Double, Long) = {
        def once(): (Double, Long) = {
          val t0 = System.nanoTime()
          val rows = f()
          ((System.nanoTime() - t0) / 1e9, rows)
        }
        val (a, b) = (once(), once())
        (math.min(a._1, b._1), a._2)
      }
      val (ts, tr) = timed(trickle _)
      val (fs, fr) = timed(full _)
      (n, 2L * n, ts, tr, fs, fr)
    }
    results.foreach { case (n, files, ts, tr, fs, fr) =>
      println(f"""{"scale":$n,"table_files":$files,""" +
        f""""changes_trickle":{"s":$ts%.2f,"rows":$tr},""" +
        f""""changes_full":{"s":$fs%.2f,"rows":$fr}}""")
    }
    spark.stop()
  }
}
