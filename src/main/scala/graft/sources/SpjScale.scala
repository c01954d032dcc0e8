package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

import graft.Sessions

/** One-off driver-side measurement: storage-partitioned join vs the same
  * join shuffled, across doubling row scales. The quantity that matters
  * at 100 TB is not this absolute time but the EXCHANGED BYTES: the SPJ
  * plan moves zero rows over the network while the shuffled plan moves
  * both sides, so the gap widens linearly with data (and with every
  * repeat of the join). Prints one JSON line per scale. */
private[sources] object SpjScale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val wh = "/tmp/graft_snap_warehouse"
    val fs = new Path(wh).getFileSystem(spark.sessionState.newHadoopConf())
    val scales = (if (args.nonEmpty) args(0) else "250000,500000,1000000,2000000")
      .split(",").map(_.trim.toLong)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    scales.foreach { n =>
      Seq("l", "r").foreach(t =>
        fs.delete(new Path(s"$wh/spjscale/t_$t"), true))
      val spec = Seq("k" -> "bucket[32]")
      SnapshotLog.commitPartitioned(
        spark.range(0, n).selectExpr("id AS k", "id * 2 AS v",
          "md5(cast(id AS string)) AS pad"),
        s"$wh/spjscale/t_l", spec, overwrite = true, 1000L)
      SnapshotLog.commitPartitioned(
        spark.range(0, n, 2).selectExpr("id AS k", "id + 7 AS w"),
        s"$wh/spjscale/t_r", spec, overwrite = true, 1000L)
      def joinOnly() = spark.table("snap.spjscale.t_l")
        .hint("merge")
        .join(spark.table("snap.spjscale.t_r"), "k")
      def join() = joinOnly()
        .agg(org.apache.spark.sql.functions.sum(col("v") + col("w")))
      def time(body: => Long): (Double, Long) = {
        val t0 = System.nanoTime(); val r = body
        ((System.nanoTime() - t0) / 1e9, r)
      }
      // warm the manifests, then measure SPJ vs forced-shuffle
      join().collect()
      val (spjS, _) = time(join().collect().length.toLong)
      // count exchanges on the JOIN alone (the global agg on top adds its
      // own single-partition exchange either way)
      val jo = joinOnly(); jo.collect()
      val spjPlan = jo.queryExecution.executedPlan.toString
      val spjShuffles = "Exchange".r.findAllIn(spjPlan).size -
        "BroadcastExchange".r.findAllIn(spjPlan).size
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val (shufS, _) = time(join().collect().length.toLong)
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      println(f"""{"rows":$n,"spj_s":$spjS%.2f,"shuffled_s":$shufS%.2f,"spj_exchanges":$spjShuffles}""")
    }
    Seq("l", "r").foreach(t =>
      fs.delete(new Path(s"$wh/spjscale/t_$t"), true))
    spark.stop()
  }
}
