package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark
import graft.sources.SnapshotLog

/** DELETION-VECTOR MoR deletes (`write.delete.vector=true`): per-data-file
  * RoaringBitmap sidecars instead of parquet (file_path, pos) rows —
  * correctness across both reader paths, time travel, flavor mixing,
  * compaction folding, and expiry. */
class SnapshotDvSpec extends AnyFunSuite {
  import spark.implicits._

  private def fresh(name: String): String = {
    val root = s"/tmp/graft_dv/$name"
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(root), true)
    root
  }

  private def armDv(root: String): Unit =
    SnapshotLog.setTableProps(spark, root, Map("write.delete.vector" -> "true"))

  private def read(root: String, v: Option[Int] = None): DataFrame = {
    var r = spark.read.format("snapshotlog")
    v.foreach(x => r = r.option("asOfVersion", x))
    r.load(root)
  }

  private def dvFilesOf(root: String): Seq[String] =
    SnapshotLog.snapshots(spark, root).last.dels.values.flatten.toSeq
      .distinct.filter(_.endsWith(".dv"))

  test("DV delete: correct on the columnar AND row reader paths, " +
       "sidecars are .dv bitmaps, time travel serves the pre-delete state") {
    val root = fresh("basic")
    SnapshotLog.commit(
      spark.range(0, 10000).selectExpr("id AS k", "id * 3 AS v"),
      root, overwrite = true, 1000L, 4)
    armDv(root)
    val v2 = SnapshotLog.deleteWhereMoR(spark, root, col("k") % 7 === 0, 2000L)
    assert(v2 === 2)
    val dvs = dvFilesOf(root)
    assert(dvs.nonEmpty, "the delete must stage .dv sidecars")
    assert(dvs.forall(_.endsWith(".dv")))
    val want = (0L until 10000L).filterNot(_ % 7 == 0)
    // columnar path (flat projection)
    val colPath = read(root).select("k").as[Long].collect().sorted
    assert(colPath.toSeq === want)
    // row reader path (requesting _pos forces it)
    val rowPath = read(root).select(col("k"), col("_pos"))
      .select("k").as[Long].collect().sorted
    assert(rowPath.toSeq === want)
    // aggregate through the scan (vector batch path under codegen)
    assert(read(root).agg(sum("v")).as[Long].head() ===
      want.map(_ * 3).sum)
    // time travel: v1 still serves all rows
    assert(read(root, Some(1)).count() === 10000)
  }

  test("stacked flavors compose: parquet positional + DV + equality " +
       "deletes on the same file all apply") {
    val root = fresh("mixed")
    SnapshotLog.commit(
      spark.range(0, 5000).selectExpr("id AS k", "id AS v"),
      root, overwrite = true, 1000L, 2)
    // v2: classic parquet positional delete (prop off)
    SnapshotLog.deleteWhereMoR(spark, root, col("k") < 100, 2000L)
    // v3: DV delete (prop on)
    armDv(root)
    SnapshotLog.deleteWhereMoR(spark, root,
      col("k") >= 200 && col("k") < 300, 3000L)
    // v4: equality delete on sampled keys
    SnapshotLog.deleteEqualityMoR(spark, root,
      Seq(400L, 401L, 4999L).toDF("k"), 4000L)
    val got = read(root).select("k").as[Long].collect().toSet
    val want = (0L until 5000L).filterNot(k =>
      k < 100 || (k >= 200 && k < 300) || Set(400L, 401L, 4999L)(k)).toSet
    assert(got === want)
    // both pos flavors coexist in the manifest
    val dels = SnapshotLog.snapshots(spark, root).last.dels.values.flatten.toSeq
    assert(dels.exists(_.endsWith(".dv")))
    assert(dels.exists(d => !d.endsWith(".dv")))
    // changelog (applyDels path) sees every delete with correct counts
    val byV = SnapshotLog.changes(spark, root, 1)
      .groupBy("_commit_version", "_change_type").count()
      .as[(Int, String, Long)].collect().toSet
    assert(byV === Set((2, "delete", 100L), (3, "delete", 100L),
      (4, "delete", 3L)))
  }

  test("updateWhereMoR under DV: old rows suppressed by vector, new rows " +
       "appended; correctness matches the model") {
    val root = fresh("upd")
    SnapshotLog.commit(
      spark.range(0, 3000).selectExpr("id AS k", "id AS v"),
      root, overwrite = true, 1000L, 2)
    armDv(root)
    SnapshotLog.updateWhereMoR(spark, root, col("k") % 10 === 3,
      Map("v" -> (col("v") + 1000000L)), 2000L)
    assert(dvFilesOf(root).nonEmpty)
    val got = read(root).select("k", "v").as[(Long, Long)].collect().toMap
    assert(got.size === 3000)
    (0L until 3000L).foreach { k =>
      assert(got(k) === (if (k % 10 == 3) k + 1000000L else k))
    }
  }

  test("compaction folds a file's stacked vectors with a bitmap-or; " +
       "reads unchanged; expiry reclaims dead vectors") {
    val root = fresh("fold")
    SnapshotLog.commit(
      spark.range(0, 8000).selectExpr("id AS k", "id AS v"),
      root, overwrite = true, 1000L, 1)
    armDv(root)
    for (i <- 0 until 4) // 4 trickle deletes → 4 stacked .dv on one file
      SnapshotLog.deleteWhereMoR(spark, root,
        col("k") % 10 === i.toLong, 2000L + i * 1000L)
    assert(dvFilesOf(root).size === 4)
    val before = read(root).select("k").as[Long].collect().sorted.toSeq
    val v = SnapshotLog.rewriteDeleteFiles(spark, root,
      SnapshotLog.nextCommitTs(spark, root))
    assert(v === 6, "the fold must commit a rewrite snapshot")
    assert(dvFilesOf(root).size === 1,
      "4 stacked vectors must fold into ONE")
    assert(read(root).select("k").as[Long].collect().sorted.toSeq === before)
    // the pre-fold snapshots still read (their own vectors survive)
    assert(read(root, Some(3)).count() === 8000 - 1600)
    // expire everything below the fold: dead vectors reclaimed, reads hold
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val allDvOnDisk = {
      def walk(p: Path): Seq[Path] =
        fs.listStatus(p).toSeq.flatMap(s =>
          if (s.isDirectory) walk(s.getPath)
          else if (s.getPath.getName.endsWith(".dv")) Seq(s.getPath) else Nil)
      walk(new Path(root, "deletes"))
    }
    assert(allDvOnDisk.size === 5) // 4 originals + 1 folded
    SnapshotLog.expireSnapshots(spark, root, keepFromVersion = 6)
    val survivors = {
      def walk(p: Path): Seq[Path] =
        fs.listStatus(p).toSeq.flatMap(s =>
          if (s.isDirectory) walk(s.getPath)
          else if (s.getPath.getName.endsWith(".dv")) Seq(s.getPath) else Nil)
      walk(new Path(root, "deletes"))
    }
    assert(survivors.size === 1, s"expiry must reclaim dead vectors, " +
      s"kept ${survivors.map(_.getName)}")
    assert(read(root).select("k").as[Long].collect().sorted.toSeq === before)
  }

  test("maintenance policy folds vector pressure too " +
       "(write.delete.max-files-per-data-file)") {
    val root = fresh("maint")
    SnapshotLog.commit(
      spark.range(0, 4000).selectExpr("id AS k", "id AS v"),
      root, overwrite = true, 1000L, 1)
    SnapshotLog.setTableProps(spark, root, Map(
      "write.delete.vector" -> "true",
      "write.delete.max-files-per-data-file" -> "2"))
    for (i <- 0 until 4)
      SnapshotLog.deleteWhereMoR(spark, root,
        col("k") % 9 === i.toLong, 2000L + i * 1000L)
    // the auto-maintenance fold keeps per-file vector count at/below 2
    assert(dvFilesOf(root).size <= 2,
      s"auto-fold must bound vector pressure, got ${dvFilesOf(root).size}")
    val want = (0L until 4000L).filterNot(k => (0 until 4).exists(i => k % 9 == i))
    assert(read(root).select("k").as[Long].collect().sorted.toSeq === want)
  }
}
