package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.Sessions

/** Scale study: sort-on-write's COST (commit time — the write pays a
  * range partition + in-partition sort instead of a hash repartition)
  * against its PAYOFF (a ~1% key-range probe and an ORDER BY DESC
  * LIMIT 100, both of which prune to O(1) files on the clustered
  * layout and scan everything on the unsorted one), as the commit
  * grows 1x -> 8x (500k -> 4M rows, files 8 -> 64). Times min of 2,
  * fresh table per measurement, local[32]. */
private[sources] object SortWriteScale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val base = 500000L
    for (mult <- Seq(1, 2, 4, 8)) {
      val n = base * mult
      val files = 8 * mult
      val df = spark.range(0, n).selectExpr(
        "cast(xxhash64(id) % 100000000 AS bigint) AS k", "id AS v")
        .localCheckpoint() // input generation priced out of the commits
      val out = new StringBuilder
      for (sorted <- Seq(true, false)) {
        val root = s"/tmp/graft_sortwrite_scale/m${mult}_$sorted"
        val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
        def freshCommit(): Double = {
          fs.delete(new Path(root), true)
          SnapshotLog.commit(spark.sql(
            "SELECT CAST(-1 AS BIGINT) AS k, CAST(-1 AS BIGINT) AS v"),
            root, overwrite = true, 100L, 1)
          if (sorted) SnapshotLog.setTableProps(spark, root,
            Map("write.sort.order" -> "k"))
          val t0 = System.nanoTime()
          SnapshotLog.commit(df, root, overwrite = false, 200L, files)
          (System.nanoTime() - t0) / 1e9
        }
        val commitS = (0 until 2).map(_ => freshCommit()).min
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
        val range = t.filter(col("k").between(50000000L, 51000000L))
        val topk = t.orderBy(col("k").desc).limit(100)
        val tag = if (sorted) "sorted" else "unsorted"
        out ++= f""""$tag":{"commit_s":$commitS%.2f,"range_kept":${filesPlanned(range)},"range_s":${timed(range)}%.3f,"topk_kept":${filesPlanned(topk)},"topk_s":${timed(topk)}%.3f},"""
        fs.delete(new Path(root), true)
      }
      println(s"""{"mult":$mult,"rows":$n,"files":$files,${out.dropRight(1)}}""")
    }
    spark.stop()
  }
}
