package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.Sessions

/** Scale study: DELETE-APPLY cost of deletion vectors (`.dv` RoaringBitmap
  * sidecars, `write.delete.vector=true`) vs classic parquet positional
  * delete files, at ~1e5 deleted rows per data file and growing file
  * counts (4 → 32 files, 0.5M → 4M rows). Measures, per scale and per
  * flavor:
  *   - full-scan seconds under the deletes (min of 2) — every task pays
  *     the delete-apply load for its file,
  *   - total delete metadata bytes on disk.
  * The 100-TB claim in measurable form: the parquet flavor makes EVERY
  * task parse EVERY delete file's full coordinate list (O(total deletes)
  * per task); a vector is the file's OWN ordinals, parsed once per JVM
  * (O(own deletes)) — the gap widens with file count. */
private[sources] object DvScale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val perFile = 125000L // rows per file; ~80% deleted → 1e5 deletes/file
    for (files <- Seq(4, 8, 16, 32)) {
      val out = new StringBuilder
      for (dv <- Seq(true, false)) {
        val root = s"/tmp/graft_dv_scale/f${files}_$dv"
        val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
        fs.delete(new Path(root), true)
        val n = perFile * files
        SnapshotLog.commit(
          spark.range(0, n).selectExpr("id AS k", "id * 2 AS v"),
          root, overwrite = true, 100L, files)
        if (dv) SnapshotLog.setTableProps(spark, root,
          Map("write.delete.vector" -> "true"))
        // one statement deleting 80% of every file: ~1e5 ordinals/file
        SnapshotLog.deleteWhereMoR(spark, root, col("k") % 5 =!= 0L, 200L)
        val t = spark.read.format("snapshotlog").load(root)
        def timed(): Double = (0 until 2).map { _ =>
          val t0 = System.nanoTime()
          t.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.min
        val delBytes = {
          def walk(p: Path): Long =
            fs.listStatus(p).map(s =>
              if (s.isDirectory) walk(s.getPath) else s.getLen).sum
          val d = new Path(root, "deletes")
          if (fs.exists(d)) walk(d) else 0L
        }
        val survivors = t.count()
        require(survivors == n / 5, s"delete-apply wrong: $survivors")
        val tag = if (dv) "dv" else "parquet"
        out ++= f""""$tag":{"scan_s":${timed()}%.3f,"delete_bytes":$delBytes},"""
        fs.delete(new Path(root), true)
      }
      println(s"""{"files":$files,"rows":${perFile * files},"deleted_per_file":${perFile * 4 / 5},${out.dropRight(1)}}""")
    }
    spark.stop()
  }
}
