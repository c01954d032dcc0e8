package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.Sessions

/** Scale study: SPLIT READS of a single large file. The degenerate
  * layout a 100-TB table produces after aggressive compaction — few,
  * huge files — used to serialize one task per file; with byte-range
  * splits the same scan fans across every core. Measures a scan-heavy
  * aggregate over ONE multi-row-group file, whole-file (1 task) vs
  * split (~8 MiB/task), as rows grow 1x → 4x. */
private[sources] object SplitScale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val key = "graft.snapshotlog.split.targetBytes"
    for (mult <- Seq(1, 2, 4)) {
      val root = s"/tmp/graft_split_scale/m$mult"
      val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new Path(root), true)
      val n = 1500000L * mult
      spark.conf.set("spark.hadoop.parquet.block.size", (1 << 20).toString)
      SnapshotLog.commit(
        spark.range(0, n).selectExpr("id AS k", "id * 2 AS v",
          "md5(cast(id AS string)) AS pad"),
        root, overwrite = true, 1000L, 1)
      spark.conf.unset("spark.hadoop.parquet.block.size")
      def timed(target: Long): (Double, Int) = {
        val old = System.getProperty(key)
        System.setProperty(key, target.toString)
        try {
          val df = spark.read.format("snapshotlog").load(root)
            .groupBy((col("k") % 16).as("g"))
            .agg(sum(col("v")), count(lit(1)), max(col("pad")))
          val parts = spark.read.format("snapshotlog").load(root)
            .rdd.getNumPartitions
          val secs = (0 until 2).map { _ =>
            val t0 = System.nanoTime()
            df.write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }.min
          (secs, parts)
        } finally {
          if (old == null) System.clearProperty(key)
          else System.setProperty(key, old)
        }
      }
      val (wholeS, wholeParts) = timed(Long.MaxValue)
      val (splitS, splitParts) = timed(8L << 20)
      val size = SnapshotLog.snapshots(spark, root).last.sizes.values.sum
      println(f"""{"mult":$mult,"rows":$n,"file_bytes":$size,""" +
        f""""whole_tasks":$wholeParts,"whole_s":$wholeS%.3f,""" +
        f""""split_tasks":$splitParts,"split_s":$splitS%.3f}""")
      fs.delete(new Path(root), true)
    }
    spark.stop()
  }
}
