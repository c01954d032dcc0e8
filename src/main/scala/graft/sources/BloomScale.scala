package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.Sessions

/** Scale study: per-file bloom pruning on a NEEDLE lookup as the table
  * grows 1x -> 16x (files 4 -> 64, rows 40k -> 640k of uuid-like keys).
  * Measures, per scale and per direction (hit / miss):
  *   - files the planner keeps WITH blooms vs WITHOUT (min/max only),
  *   - end-to-end query seconds (min of 2),
  * plus the bloom-vs-stats metadata footprint. The 100-TB claim in
  * measurable form: a miss keeps ~0 files regardless of table size, a
  * hit keeps O(1); without blooms every probe keeps EVERY file. */
private[sources] object BloomScale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    import spark.implicits._
    val base = 40000L
    for (mult <- Seq(1, 2, 4, 8, 16)) {
      val out = new StringBuilder
      for (blooms <- Seq(true, false)) {
        val root = s"/tmp/graft_bloom_scale/m${mult}_$blooms"
        val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
        fs.delete(new Path(root), true)
        val n = base * mult
        val df = spark.range(0, n).selectExpr(
          "md5(cast(id AS string)) AS k", "id AS v")
        // 4 commits x (mult) files each; property set after v1 would leave
        // an uncovered generation — set it on a 1-row bootstrap instead so
        // EVERY data commit is covered
        SnapshotLog.commit(df.limit(0).union(
          spark.range(-1, 0).selectExpr("md5(cast(id AS string)) AS k",
            "id AS v")), root, overwrite = true, 100L, 1)
        if (blooms) SnapshotLog.setTableProps(spark, root,
          Map("write.bloom.columns" -> "k"))
        for (i <- 0 until 4)
          SnapshotLog.commit(df.filter(col("v") % 4 === i), root,
            overwrite = false, 200L + i, mult)
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
        val hit = t.filter(col("k") === md5(lit((n / 2).toString)))
        val miss = t.filter(col("k") === md5(lit("absent-key")))
        val total = SnapshotLog.snapshots(spark, root).last.files.size
        val tag = if (blooms) "bloom" else "nobloom"
        val bloomBytes =
          if (!blooms || !fs.exists(new Path(root, "blooms"))) 0L
          else fs.listStatus(new Path(root, "blooms")).map(_.getLen).sum
        out ++= f""""${tag}":{"files_total":$total,"hit_kept":${filesPlanned(hit)},"miss_kept":${filesPlanned(miss)},"hit_s":${timed(hit)}%.3f,"miss_s":${timed(miss)}%.3f,"bloom_bytes":$bloomBytes},"""
        fs.delete(new Path(root), true)
      }
      println(s"""{"mult":$mult,"rows":${base * mult},${out.dropRight(1)}}""")
    }
    spark.stop()
  }
}
