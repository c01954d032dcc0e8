package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark
import graft.sources.SnapshotLog

/** SPLIT READS of large files (r17): one file no longer means one task —
  * files past graft.snapshotlog.split.targetBytes plan as byte-range
  * partitions, row-group-aligned at read time (parquet-mr midpoint
  * rule), with row ordinals offset so `_pos` and merge-on-read
  * positional deletes keep their file-level coordinates. At 100 TB a
  * pruned scan of a few multi-GB files fans across the cluster instead
  * of serializing one straggler task per file. */
class SnapshotSplitSpec extends AnyFunSuite {
  import spark.implicits._

  private val TargetKey = "graft.snapshotlog.split.targetBytes"

  private def withTarget[A](bytes: Long)(body: => A): A = {
    val old = System.getProperty(TargetKey)
    System.setProperty(TargetKey, bytes.toString)
    try body
    finally if (old == null) System.clearProperty(TargetKey)
    else System.setProperty(TargetKey, old)
  }

  private def fresh(name: String): String = {
    val root = s"/tmp/graft_split/$name"
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(root), true)
    root
  }

  /** ONE parquet file, many row groups (small block size). */
  private def bigSingleFile(root: String, n: Long): Unit = {
    val old = spark.conf.getOption("spark.hadoop.parquet.block.size")
    spark.conf.set("spark.hadoop.parquet.block.size", (64 * 1024).toString)
    try SnapshotLog.commit(
      spark.range(0, n).selectExpr("id AS k", "id * 2 AS v",
        "md5(cast(id AS string)) AS pad"),
      root, overwrite = true, 1000L, 1)
    finally old match {
      case Some(v) => spark.conf.set("spark.hadoop.parquet.block.size", v)
      case None => spark.conf.unset("spark.hadoop.parquet.block.size")
    }
  }

  private def tasksOf(df: DataFrame): Int = df.rdd.getNumPartitions

  test("a large file splits into many tasks; rows and order stay exact") {
    val root = fresh("basic")
    bigSingleFile(root, 200000)
    def read: DataFrame = spark.read.format("snapshotlog").load(root)
    val whole = withTarget(Long.MaxValue) {
      assert(tasksOf(read) === 1)
      read.agg(count(lit(1)), sum(col("v"))).as[(Long, Long)].head()
    }
    withTarget(256 * 1024) {
      val t = read
      assert(tasksOf(t) >= 4,
        s"a multi-row-group file should split, got ${tasksOf(t)} tasks")
      assert(t.agg(count(lit(1)), sum(col("v"))).as[(Long, Long)].head() ===
        whole)
      // every key exactly once — ranges neither overlap nor gap
      assert(t.groupBy(col("k")).count().filter(col("count") =!= 1).count() === 0)
    }
  }

  test("_pos keeps FILE-level ordinals across splits") {
    val root = fresh("pos")
    bigSingleFile(root, 100000)
    withTarget(256 * 1024) {
      val t = spark.read.format("snapshotlog").load(root).select("k", "_pos")
      // rows were written in k order into one file: _pos == k everywhere,
      // which only holds if each split offsets by the skipped row groups
      assert(t.filter(col("k") =!= col("_pos")).count() === 0)
    }
  }

  test("positional MoR deletes stay exact on split reads, both reader " +
       "paths") {
    val root = fresh("mor")
    bigSingleFile(root, 100000)
    SnapshotLog.deleteWhereMoR(spark, root, col("k") % 7 === 3L, 2000L)
    val expect = (0L until 100000L).filter(_ % 7 != 3)
    withTarget(256 * 1024) {
      val t = spark.read.format("snapshotlog").load(root)
      // flat projection = vectorized path
      val cnt = t.agg(count(lit(1)), sum(col("k"))).as[(Long, Long)].head()
      assert(cnt === ((expect.size.toLong, expect.sum)))
      // _pos projection forces the row reader
      val rows = t.select("k", "_pos")
      assert(rows.count() === expect.size.toLong)
      assert(rows.filter(col("k") =!= col("_pos")).count() === 0)
    }
  }

  test("equality deletes and residual filters stay exact on splits") {
    val root = fresh("eq")
    bigSingleFile(root, 60000)
    SnapshotLog.deleteEqualityMoR(spark, root,
      (0L until 60000L by 100).toDF("k"), 2000L)
    withTarget(256 * 1024) {
      val t = spark.read.format("snapshotlog").load(root)
      assert(t.count() === 60000L - 600L)
      assert(t.filter(col("k") < 1000L).count() === 1000L - 10L)
    }
  }

  test("SPJ layouts never split (grouping would swallow the parallelism " +
       "and break the order proof)") {
    val root = fresh("spj")
    SnapshotLog.commitPartitioned(
      spark.range(0, 50000).selectExpr("id AS k", "id AS v",
        "md5(cast(id AS string)) AS pad"),
      root, Seq("k" -> "bucket[4]"), overwrite = true, 1000L)
    withTarget(16 * 1024) {
      val t = spark.read.format("snapshotlog").load(root)
      val scan = t.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan.asInstanceOf[graft.sources.SnapshotLogScan]
      }.head
      val parts = scan.toBatch.planInputPartitions()
      val files = scan.keptFiles.size
      assert(parts.length === files,
        s"bucketed layout must stay one task per file " +
          s"(${parts.length} vs $files)")
      assert(t.count() === 50000L)
    }
  }
}
