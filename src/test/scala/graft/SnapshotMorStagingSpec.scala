package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark
import graft.sources.SnapshotLog

/** r14: merge-on-read staging must not funnel through one task. Delete
  * coordinates / key sets are range-partitioned (trickle → AQE folds to
  * one kb file; bulk → per-task sorted parts), and the manifest maps
  * each data file ONLY to the delete parquet(s) overlapping it.
  */
class SnapshotMorStagingSpec extends AnyFunSuite {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val root = s"/tmp/graft_morstage_spec/$tag"
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(root), true)
    root
  }

  /** Run `body` with a tiny AQE advisory partition size so modest data
    * volumes exercise the multi-part staging path. */
  private def withTinyPartitions[A](body: => A): A = {
    // AQE coalesces by COMPRESSED shuffle bytes; shrink both the advisory
    // target and the parallelism-first floor so a modest (highly
    // compressible) coordinate set exercises the multi-part staging path
    val keys = Seq(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")
    val olds = keys.map { case (k, _) => k -> spark.conf.get(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("a trickle positional delete still stages ONE delete file") {
    val root = freshRoot("trickle")
    SnapshotLog.commit(spark.range(0, 10000).selectExpr("id AS k"),
      root, overwrite = true, 100L, 4)
    SnapshotLog.deleteWhereMoR(spark, root, col("k") === 7L, 200L)
    val snap = SnapshotLog.snapshots(spark, root).last
    assert(snap.dels.values.flatten.toSeq.distinct.size === 1)
    assert(spark.read.format("snapshotlog").load(root).count() === 9999)
  }

  test("a bulk positional delete stages MULTIPLE per-task sorted parts, " +
       "each data file scoped to its own parts only") {
    val root = freshRoot("bulk")
    SnapshotLog.commit(
      spark.range(0, 400000, 1, 8).selectExpr("id AS k",
        "repeat('x', 20) AS pad"),
      root, overwrite = true, 100L, 8)
    withTinyPartitions {
      SnapshotLog.deleteWhereMoR(spark, root, col("k") % 2 === 0, 200L)
    }
    val snap = SnapshotLog.snapshots(spark, root).last
    val allDel = snap.dels.values.flatten.toSeq.distinct
    assert(allDel.size > 1,
      s"bulk delete should fan out across staging tasks, got ${allDel.size}")
    // scoping: no data file should reference every delete part
    assert(snap.dels.values.exists(_.size < allDel.size),
      "per-file delete scoping should map files to overlapping parts only")
    val t = spark.read.format("snapshotlog").load(root)
    assert(t.count() === 200000)
    assert(t.filter(col("k") % 2 === 0).count() === 0)
    // vector path still green over many delete parts
    assert(t.agg(sum("k")).head().getLong(0) ===
      (1L until 400000L by 2).sum)
  }

  test("a bulk equality delete stages multiple parts with footer-bound " +
       "pair scoping") {
    val root = freshRoot("bulkeq")
    // data laid out in disjoint key slices so per-file stats are tight
    SnapshotLog.commit(
      spark.range(0, 200000, 1, 8).selectExpr("id AS k",
        "CAST(id AS DOUBLE) AS v"),
      root, overwrite = true, 100L, 8)
    val keys = spark.range(0, 200000).filter(col("id") % 4 === 0)
      .selectExpr("id AS k")
    withTinyPartitions {
      SnapshotLog.deleteEqualityMoR(spark, root, keys, 200L)
    }
    val snap = SnapshotLog.snapshots(spark, root).last
    val allDel = snap.dels.values.flatten.toSeq.distinct
    assert(allDel.size > 1,
      s"bulk equality delete should fan out, got ${allDel.size}")
    val t = spark.read.format("snapshotlog").load(root)
    assert(t.count() === 150000)
    assert(t.filter(col("k") % 4 === 0).count() === 0)
  }

  test("rewriteDeleteFiles fans ACCUMULATED deletes across ranges; each " +
       "data file remaps only to the parts holding its rows") {
    val root = freshRoot("delcompact")
    SnapshotLog.commit(
      spark.range(0, 100000, 1, 4).selectExpr("id AS k"),
      root, overwrite = true, 100L, 4)
    // a trickle of 6 MoR deletes accumulates 6+ positional delete files
    (0 until 6).foreach { i =>
      SnapshotLog.deleteWhereMoR(spark, root,
        col("k") % 100 === i.toLong, 200L + i)
    }
    val before = SnapshotLog.snapshots(spark, root).last
    val beforeDel = before.dels.values.flatten.toSeq.distinct
    assert(beforeDel.size >= 6, s"expected accumulation, got ${beforeDel.size}")
    // size targetBytes to a third of the accumulated volume: the
    // rewrite must fan out across ~3 (file_path, pos) ranges — the
    // accumulated path, no repartition(1) funnel
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val total = beforeDel.map(f => fs.getFileStatus(new Path(f)).getLen).sum
    SnapshotLog.rewriteDeleteFiles(spark, root, 900L,
      targetBytes = (total + 2) / 3)
    val after = SnapshotLog.snapshots(spark, root).last
    val afterDel = after.dels.values.flatten.toSeq.distinct
    assert(afterDel.size > 1,
      s"accumulated compaction must fan out across ranges, got ${afterDel.size}")
    assert(afterDel.size < beforeDel.size,
      "compaction should still reduce the per-scan delete file count")
    // per-range remap: range partitioning by file_path keeps each data
    // file's coordinates in few ranges — no file references every part
    assert(after.dels.values.exists(_.size < afterDel.size),
      "per-file remap should scope files to overlapping ranges only")
    val t = spark.read.format("snapshotlog").load(root)
    assert(t.count() === 100000L - 6 * 1000)
    (0 until 6).foreach { i =>
      assert(t.filter(col("k") % 100 === i.toLong).count() === 0)
    }
  }

  test("equality pair scoping: a delete part whose key range misses a " +
       "file's stats is not referenced by it") {
    val root = freshRoot("eqscope")
    // two widely-separated key slices -> two files with disjoint stats
    SnapshotLog.commit(
      spark.range(0, 1000, 1, 1).selectExpr("id AS k"),
      root, overwrite = true, 100L, 1)
    SnapshotLog.commit(
      spark.range(1000000, 1001000, 1, 1).selectExpr("id AS k"),
      root, overwrite = false, 200L, 1)
    // keys hitting ONLY the low slice
    SnapshotLog.deleteEqualityMoR(spark, root,
      spark.range(0, 10).selectExpr("id AS k"), 300L)
    val snap = SnapshotLog.snapshots(spark, root).last
    assert(snap.dels.size === 1,
      s"only the low-slice file should carry the delete, got ${snap.dels.keySet}")
    assert(spark.read.format("snapshotlog").load(root).count() === 1990)
  }
}
