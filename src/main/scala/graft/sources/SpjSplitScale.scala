package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.{col, sum}

import graft.Sessions

/** SPJ × SPLITS composition study: split reads are (correctly) DISABLED
  * under KeyGroupedPartitioning — a byte-range task covers part of a
  * file, so per-tuple ≤1-file sort/grouping proofs would break. The cost
  * of that rule is parallelism: a co-bucketed join of B big bucket files
  * runs as B tasks, however large each file is. The alternative plan —
  * bucketing off, scan SPLITS on (files past the 128 MiB threshold plan
  * as row-group ranges), two exchanges — trades shuffle bytes for
  * parallelism. This measures both joins on the same co-bucketed tables
  * at few-big-buckets vs many-small-buckets, and prints one JSON line
  * per config; the crossover guidance lands in BASELINE.md and the
  * SURVEY §2.3 row. */
private[sources] object SpjSplitScale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val wh = "/tmp/graft_snap_warehouse"
    val fs = new Path(wh).getFileSystem(spark.sessionState.newHadoopConf())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val rows = if (args.nonEmpty) args(0).toLong else 12000000L
    val bucketList = // one JVM per config avoids cross-config GC bleed
      if (args.length > 1) args(1).split(",").map(_.trim.toInt).toSeq
      else Seq(2, 4, 32)
    for (buckets <- bucketList) {
      Seq("l", "r").foreach(t =>
        fs.delete(new Path(s"$wh/spjsplit/t_$t"), true))
      val spec = Seq("k" -> s"bucket[$buckets]")
      // ~150 B/row of pad so 6M rows ≈ 0.4-0.9 GB on disk: at 4 buckets
      // each bucket file crosses the 128 MiB split threshold
      SnapshotLog.commitPartitioned(
        spark.range(0, rows).selectExpr("id AS k", "id * 2 AS v",
          "concat(md5(cast(id AS string)), md5(cast(id + 1 AS string)), " +
            "md5(cast(id + 2 AS string))) AS pad"),
        s"$wh/spjsplit/t_l", spec, overwrite = true, 1000L)
      SnapshotLog.commitPartitioned(
        spark.range(0, rows, 2).selectExpr("id AS k", "id + 7 AS w",
          "md5(cast(id AS string)) AS pad2"),
        s"$wh/spjsplit/t_r", spec, overwrite = true, 1000L)
      val perTuple = SnapshotLog.snapshots(spark, s"$wh/spjsplit/t_l")
        .last.sizes.values.sum / buckets
      def join() = spark.table("snap.spjsplit.t_l").hint("merge")
        .join(spark.table("snap.spjsplit.t_r"), "k")
        .agg(sum(col("v") + col("w")))
      def timed(): Double = {
        join().collect() // warm manifests + JIT
        (0 until 2).map { _ =>
          val t0 = System.nanoTime()
          join().collect()
          (System.nanoTime() - t0) / 1e9
        }.min
      }
      val spjS = timed()
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val shufS = timed()
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      println(f"""{"buckets":$buckets,"rows":$rows,"mb_per_tuple":${perTuple / 1048576.0}%.1f,"spj_s":$spjS%.2f,"shuffled_split_s":$shufS%.2f}""")
    }
    Seq("l", "r").foreach(t =>
      fs.delete(new Path(s"$wh/spjsplit/t_$t"), true))
    spark.stop()
  }
}
