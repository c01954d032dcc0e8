package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark
import graft.sources.SnapshotLog

/** IN-PLACE IMPORT of an existing parquet directory (Iceberg `snapshot`
  * procedure analog): zero data movement at adoption time, full
  * snapshot-table behavior afterwards, and the SOURCE files are never
  * deleted — not by DML rewrites, not by snapshot expiry. */
class SnapshotImportSpec extends AnyFunSuite {
  import spark.implicits._

  private def fresh(name: String): (String, String) = {
    val base = s"/tmp/graft_import/$name"
    val fs = new Path(base).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(base), true)
    (s"$base/source", s"$base/table")
  }

  private def writeSource(dir: String, n: Long): Unit =
    spark.range(0, n).selectExpr("id AS k", "id * 2 AS v")
      .repartition(4).write.parquet(dir)

  test("import references the source files in place and reads exactly") {
    val (src, root) = fresh("basic")
    writeSource(src, 5000)
    SnapshotLog.importParquetDir(spark, src, root, 1000L)
    val snap = SnapshotLog.snapshots(spark, root).last
    assert(snap.operation === "import")
    assert(snap.files.forall(_.contains("/source/")),
      "no data may move at import time")
    assert(snap.rows.values.sum === 5000L)
    val t = spark.read.format("snapshotlog").load(root)
    assert(t.count() === 5000L)
    assert(t.agg(sum(col("v"))).as[Long].head() ===
      (0L until 5000L).map(_ * 2).sum)
    // stats lifted: a range probe prunes like any native commit
    val pr = t.filter(col("k") === 17L)
    assert(pr.as[(Long, Long)].collect().toSeq === Seq((17L, 34L)))
  }

  test("DML and expiry after import never touch the source files") {
    val (src, root) = fresh("dml")
    writeSource(src, 2000)
    val fs = new Path(src).getFileSystem(spark.sessionState.newHadoopConf())
    val before = fs.listStatus(new Path(src))
      .map(s => s.getPath.getName -> s.getLen).toMap
    SnapshotLog.importParquetDir(spark, src, root, 1000L)
    // copy-on-write delete rewrites into the TABLE root
    SnapshotLog.deleteWhereMoR(spark, root, col("k") % 4 === 1L, 2000L)
    SnapshotLog.rewriteDataFiles(spark, root, 3000L, targetBytes = 1L << 30)
    val head = SnapshotLog.snapshots(spark, root).last.version
    SnapshotLog.expireSnapshots(spark, root, keepFromVersion = head)
    // table content exact
    val t = spark.read.format("snapshotlog").load(root)
    assert(t.count() === (0L until 2000L).count(_ % 4 != 1).toLong)
    // source untouched byte for byte
    val after = fs.listStatus(new Path(src))
      .map(s => s.getPath.getName -> s.getLen).toMap
    assert(after === before,
      "imported source files must survive DML + compaction + expiry")
    // and the live file set has moved fully under the table root
    assert(SnapshotLog.snapshots(spark, root).last.files
      .forall(_.contains("/table/")))
  }

  test("hive-partitioned sources refuse with a clear error (the " +
       "partition column lives in paths, not files)") {
    val (src, root) = fresh("hive")
    spark.range(0, 300).selectExpr("id AS k", "cast(id % 3 AS int) AS p")
      .write.partitionBy("p").parquet(src)
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.importParquetDir(spark, src, root, 1000L)
    }
    assert(e.getMessage.contains("not physically present") ||
      e.getMessage.contains("hive-style"), e.getMessage)
  }

  test("SQL procedure surfaces the import; re-import refuses") {
    val (src, root0) = fresh("proc")
    writeSource(src, 800)
    val ns = "import_proc"
    spark.sql(s"DROP TABLE IF EXISTS snap.$ns.t")
    new Path(s"/tmp/graft_snap_warehouse/$ns")
      .getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new Path(s"/tmp/graft_snap_warehouse/$ns"), true)
    val row = spark.sql(
      s"CALL snap.system.import_parquet('$src', '$ns.t')").collect().head
    assert(row.getInt(0) === 1 && row.getLong(2) === 800L)
    assert(spark.table(s"snap.$ns.t").count() === 800L)
    intercept[Exception] {
      SnapshotLog.importParquetDir(spark, src,
        s"/tmp/graft_snap_warehouse/$ns/t", 99000L)
    }
    assert(root0.nonEmpty) // silence unused warning
  }
}
