package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark
import graft.sources.SnapshotLog

/** Z-ORDER compaction (`rewriteDataFiles(zorderBy)`): bit-interleaved
  * multi-dimensional clustering — every output file's min/max is tight
  * on EVERY z column, so probes on ANY single dimension prune files, the
  * layout a lexicographic clusterBy can only give its first key. */
class SnapshotZorderSpec extends AnyFunSuite {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val root = s"/tmp/graft_zorder_spec/$tag"
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(root), true)
    root
  }

  private def filesPlanned(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan.asInstanceOf[graft.sources.SnapshotLogScan].keptFiles.size
    }.head

  /** 64k rows over a 1024x1024 (x, y) grid, rewritten into ~32 files. */
  private def build(root: String, zorder: Boolean): Unit = {
    val df = spark.range(0, 65536).selectExpr(
      "id % 1024 AS x", "(id * 2654435761) % 1024 AS y", "id AS v")
    SnapshotLog.commit(df, root, overwrite = true, 100L, 4)
    val bytes = SnapshotLog.snapshots(spark, root).last.sizes.values.sum
    SnapshotLog.rewriteDataFiles(spark, root, 200L,
      targetBytes = math.max(1L, bytes / 32), smallBytes = Long.MaxValue,
      clusterBy = if (zorder) Nil else Seq("x"),
      zorderBy = if (zorder) Seq("x", "y") else Nil)
  }

  test("z-order prunes range probes on BOTH dimensions; clusterBy(x) " +
       "cannot prune y at all") {
    val zr = freshRoot("z"); build(zr, zorder = true)
    val cr = freshRoot("c"); build(cr, zorder = false)
    val zt = spark.read.format("snapshotlog").load(zr)
    val ct = spark.read.format("snapshotlog").load(cr)
    val zTotal = SnapshotLog.snapshots(spark, zr).last.files.size
    val cTotal = SnapshotLog.snapshots(spark, cr).last.files.size

    def xProbe(t: DataFrame) = t.filter(col("x") >= 100L && col("x") < 164L)
    def yProbe(t: DataFrame) = t.filter(col("y") >= 700L && col("y") < 764L)
    def ptProbe(t: DataFrame) = t.filter(col("x") === 37L && col("y") === 503L)

    // z-order: every direction prunes
    assert(filesPlanned(xProbe(zt)) * 2 <= zTotal,
      s"x probe kept ${filesPlanned(xProbe(zt))}/$zTotal")
    assert(filesPlanned(yProbe(zt)) * 2 <= zTotal,
      s"y probe kept ${filesPlanned(yProbe(zt))}/$zTotal")
    assert(filesPlanned(ptProbe(zt)) * 4 <= zTotal,
      s"point probe kept ${filesPlanned(ptProbe(zt))}/$zTotal")
    // clusterBy(x): x prunes HARD, y prunes NOTHING — the contrast that
    // motivates z-order
    assert(filesPlanned(xProbe(ct)) * 4 <= cTotal)
    assert(filesPlanned(yProbe(ct)) === cTotal,
      "a lexicographic x layout must be useless for y probes")
    // rows identical to the pre-rewrite content in both layouts
    val want = (0L until 65536L)
      .map(id => (id % 1024, (id * 2654435761L) % 1024, id)).toSet
    assert(zt.as[(Long, Long, Long)].collect().toSet === want)
    assert(ct.as[(Long, Long, Long)].collect().toSet === want)
  }

  test("zorder via the SQL procedure; misuse refused") {
    val ns = "zproc"
    val root = s"/tmp/graft_snap_warehouse/$ns/t"
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(root), true)
    spark.sql(s"DROP TABLE IF EXISTS snap.$ns.t")
    spark.sql(s"CREATE TABLE snap.$ns.t AS SELECT id % 64 AS x, " +
      "(id * 7) % 64 AS y, id AS v FROM range(0, 20000)")
    val r = spark.sql(
      s"""CALL snap.system.rewrite_data_files(table => '$ns.t',
         |  target_bytes => ${1L << 20}, zorder_by => 'x,y')""".stripMargin)
      .head()
    assert(r.getAs[Boolean]("rewrote"))
    assert(spark.table(s"snap.$ns.t").count() === 20000)

    // misuse: both cluster and zorder; single column; string column;
    // partitioned table
    intercept[IllegalArgumentException] {
      SnapshotLog.rewriteDataFiles(spark, root,
        SnapshotLog.snapshots(spark, root).last.commitTsMs + 1,
        clusterBy = Seq("x"), zorderBy = Seq("x", "y"))
    }
    intercept[IllegalArgumentException] {
      SnapshotLog.rewriteDataFiles(spark, root,
        SnapshotLog.snapshots(spark, root).last.commitTsMs + 1,
        smallBytes = Long.MaxValue, zorderBy = Seq("x"))
    }
    val pr = freshRoot("zpart")
    SnapshotLog.commitPartitioned(
      spark.range(0, 100).selectExpr("id % 4 AS g", "id AS v", "id % 7 AS w"),
      pr, Seq("g" -> "identity"), overwrite = true, 100L)
    intercept[IllegalArgumentException] {
      SnapshotLog.rewriteDataFiles(spark, pr, 200L,
        smallBytes = Long.MaxValue, zorderBy = Seq("v", "w"))
    }
  }
}
