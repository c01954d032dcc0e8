package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.Sessions

/** Scale study: top-k file skipping on a TIME-CLUSTERED append-only
  * table as it grows 1x -> 16x (commits 8 -> 128, rows 80k -> 1.28M).
  * The interactive dashboard probe — `ORDER BY ts DESC LIMIT 100` —
  * measured per scale WITH the pushdown vs with it disabled (forced via
  * a non-default null ordering, which refuses the push but computes the
  * same rows). The 100-TB claim in measurable form: planned files and
  * query seconds stay FLAT (the newest file or two) as the table grows,
  * while the no-pushdown control scans every file and grows linearly. */
private[sources] object TopkScale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val base = 80000L
    val commits0 = 8
    for (mult <- Seq(1, 2, 4, 8, 16)) {
      val root = s"/tmp/graft_topk_scale/m$mult"
      val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new Path(root), true)
      val n = base * mult
      val commits = commits0 * mult
      val per = n / commits
      for (i <- 0 until commits)
        SnapshotLog.commit(
          spark.range(i * per, (i + 1) * per)
            .selectExpr("id AS ts", "id * 3 AS v"),
          root, overwrite = i == 0, 100L * (i + 1), 1)
      val t = spark.read.format("snapshotlog").load(root)
      def filesPlanned(df2: org.apache.spark.sql.DataFrame): Int =
        df2.queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            r.scan.asInstanceOf[SnapshotLogScan].keptFiles.size
        }.head
      def timed(df2: org.apache.spark.sql.DataFrame): Double =
        (0 until 2).map { _ =>
          val t0 = System.nanoTime()
          df2.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.min
      val pushed = t.orderBy(col("ts").desc).limit(100)
      // control: desc_nulls_first refuses the push (non-default null
      // ordering) but the column has no nulls, so the ROWS are identical
      val control = t.orderBy(col("ts").desc_nulls_first).limit(100)
      val total = SnapshotLog.snapshots(spark, root).last.files.size
      println(f"""{"mult":$mult,"rows":$n,"files_total":$total,""" +
        f""""topk_kept":${filesPlanned(pushed)},""" +
        f""""topk_s":${timed(pushed)}%.3f,""" +
        f""""control_kept":${filesPlanned(control)},""" +
        f""""control_s":${timed(control)}%.3f}""")
      fs.delete(new Path(root), true)
    }
    spark.stop()
  }
}
