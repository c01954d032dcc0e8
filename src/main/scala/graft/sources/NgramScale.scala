package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.Sessions

/** Scale study: trigram-bloom SUBSTRING pruning as a document corpus
  * grows 1x -> 16x (files 4 -> 64, docs 20k -> 320k of ~60-word synthetic
  * prose). Measures, per scale and per direction (hit: a marker string in
  * ONE doc / miss: absent string):
  *   - files the planner keeps WITH trigram blooms vs WITHOUT,
  *   - end-to-end query seconds (min of 2),
  * plus the sidecar footprint. The 100-TB claim in measurable form: a
  * keyword probe over a corpus opens O(1) files however big the table,
  * while the control scans (and regex-filters) EVERY file. */
private[sources] object NgramScale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val base = 20000L
    for (mult <- Seq(1, 2, 4, 8, 16)) {
      val out = new StringBuilder
      for (ngrams <- Seq(true, false)) {
        val root = s"/tmp/graft_ngram_scale/m${mult}_$ngrams"
        val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
        fs.delete(new Path(root), true)
        val n = base * mult
        // ~60 shuffled vocab words per doc; doc n/2 carries the marker
        val df = spark.range(0, n).selectExpr(
          "id",
          s"""concat(
             array_join(transform(sequence(1, 60), i ->
               element_at(array('alpha','beta','gamma','delta','epsilon',
                 'table','value','query','window','batch','stream','merge',
                 'column','filter','vector','group','order','hash'),
                 1 + cast(pmod(xxhash64(id * 100 + i), 18) AS int))), ' '),
             CASE WHEN id = ${n / 2} THEN ' zebraquuxmarker' ELSE '' END)
             AS text""")
        SnapshotLog.commit(df.limit(0).union(
          spark.range(-1, 0).selectExpr("id", "'bootstrap doc' AS text")),
          root, overwrite = true, 100L, 1)
        if (ngrams) SnapshotLog.setTableProps(spark, root,
          Map("write.ngrambloom.columns" -> "text"))
        for (i <- 0 until 4)
          SnapshotLog.commit(df.filter(col("id") % 4 === i), root,
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
        val hit = t.filter(col("text").contains("zebraquuxmarker"))
        val miss = t.filter(col("text").contains("qqqzzzvvvwww"))
        val total = SnapshotLog.snapshots(spark, root).last.files.size
        val tag = if (ngrams) "ngram" else "nongram"
        val sidecarBytes =
          if (!ngrams || !fs.exists(new Path(root, "ngrams"))) 0L
          else fs.listStatus(new Path(root, "ngrams")).map(_.getLen).sum
        out ++= f""""${tag}":{"files_total":$total,"hit_kept":${filesPlanned(hit)},"miss_kept":${filesPlanned(miss)},"hit_s":${timed(hit)}%.3f,"miss_s":${timed(miss)}%.3f,"sidecar_bytes":$sidecarBytes},"""
        fs.delete(new Path(root), true)
      }
      println(s"""{"mult":$mult,"docs":${base * mult},${out.dropRight(1)}}""")
    }
    spark.stop()
  }
}
