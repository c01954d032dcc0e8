package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark
import graft.sources.SnapshotLog

/** Commit-time automatic maintenance ([[SnapshotLog.maybeMaintain]]):
  * the policy rides AFTER every successful commit/DML publish, armed by
  * table properties. These specs pin the contract the r15 verdict
  * demanded: thresholds trip exactly when exceeded (and DON'T below),
  * both the delete-fold and the bin-pack policies fire without manual
  * CALLs, hidden-partitioned tables participate and keep their layout,
  * and — the hard rule — NOTHING in the policy (malformed property
  * values included) can ever fail the caller's already-durable commit.
  */
class SnapshotMaintainSpec extends AnyFunSuite {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val root = s"/tmp/graft_maintain_spec/$tag"
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(root), true)
    root
  }

  private def df(lo: Long, hi: Long) =
    spark.range(lo, hi).selectExpr("id AS k", "id % 7 AS v")

  private def rewrites(root: String): Int =
    SnapshotLog.snapshots(spark, root).count(_.operation == "rewrite")

  private def worstDels(root: String): Int =
    SnapshotLog.snapshots(spark, root).last.dels.values
      .map(_.size).maxOption.getOrElse(0)

  /** The policy counts POSITIONAL delete files only (equality deletes
    * are folded by the bin-pack, not the delete-fold). */
  private def worstPosDels(root: String): Int =
    SnapshotLog.snapshots(spark, root).last.dels.values.map(_.count { f =>
      spark.read.parquet(f).columns.toSeq == Seq("file_path", "pos")
    }).maxOption.getOrElse(0)

  test("delete-fold fires only past write.delete.max-files-per-data-file") {
    val root = freshRoot("del_fold")
    SnapshotLog.commit(df(0, 2000), root, overwrite = true, 1000L, 2)
    SnapshotLog.setTableProps(spark, root,
      Map("write.delete.max-files-per-data-file" -> "2"))
    SnapshotLog.deleteWhereMoR(spark, root, col("k") % 100 === 1, 2000L)
    SnapshotLog.deleteWhereMoR(spark, root, col("k") % 100 === 2, 3000L)
    // at the threshold, NOT past it: no maintenance yet
    assert(rewrites(root) === 0, "fold fired under threshold")
    assert(worstDels(root) === 2)
    // the third trickle pushes a data file past 2 → auto-fold
    SnapshotLog.deleteWhereMoR(spark, root, col("k") % 100 === 3, 4000L)
    assert(rewrites(root) === 1, "fold did not fire past threshold")
    assert(worstDels(root) <= 2, "fold left the delete count unbounded")
    val expect = (0L until 2000L).filterNot(k =>
      k % 100 == 1 || k % 100 == 2 || k % 100 == 3)
    assert(spark.read.format("snapshotlog").load(root)
      .select("k").as[Long].collect().sorted === expect.toArray)
  }

  test("small-file bin-pack fires only past write.data.max-small-files") {
    val root = freshRoot("bin_pack")
    SnapshotLog.commit(df(0, 400), root, overwrite = true, 1000L, 2)
    SnapshotLog.setTableProps(spark, root,
      Map("write.data.max-small-files" -> "4"))
    SnapshotLog.commit(df(400, 500), root, overwrite = false, 2000L, 2)
    // 4 live files = at the threshold: no bin-pack
    assert(rewrites(root) === 0, "bin-pack fired under threshold")
    assert(SnapshotLog.snapshots(spark, root).last.files.size === 4)
    SnapshotLog.commit(df(500, 600), root, overwrite = false, 3000L, 1)
    // 5 > 4 → auto-bin-pack
    assert(rewrites(root) === 1, "bin-pack did not fire past threshold")
    val head = SnapshotLog.snapshots(spark, root).last
    assert(head.files.size <= 4, s"still ${head.files.size} live files")
    assert(spark.read.format("snapshotlog").load(root).count() === 600)
  }

  test("malformed property values warn and skip — the durable commit " +
       "NEVER fails") {
    val root = freshRoot("malformed")
    SnapshotLog.commit(df(0, 100), root, overwrite = true, 1000L, 1)
    SnapshotLog.setTableProps(spark, root, Map(
      "write.delete.max-files-per-data-file" -> "banana",
      "write.data.max-small-files" -> "2.5",
      "write.data.small-file-bytes" -> "lots"))
    // every commit flavor must land despite the poisoned thresholds
    SnapshotLog.commit(df(100, 200), root, overwrite = false, 2000L, 1)
    SnapshotLog.deleteWhereMoR(spark, root, col("k") % 10 === 3, 3000L)
    SnapshotLog.upsertEqualityMoR(spark, root,
      Seq((5L, 99L)).toDF("k", "v"), Seq("k"), 4000L)
    assert(rewrites(root) === 0)
    val t = spark.read.format("snapshotlog").load(root)
    // 200 − the 20 rows with k%10==3; the upsert updates key 5 in place
    assert(t.count() === 180)
    // a well-formed value alongside a malformed one still works: the
    // parseable policy stays armed
    SnapshotLog.setTableProps(spark, root, Map(
      "write.data.max-small-files" -> "3",
      "write.data.small-file-bytes" -> "garbage"))
    SnapshotLog.commit(df(200, 300), root, overwrite = false, 5000L, 2)
    assert(rewrites(root) === 1,
      "well-formed threshold next to a malformed byte size did not fire")
  }

  test("commitPartitioned participates and the bin-pack preserves the " +
       "hidden-partition layout") {
    val root = freshRoot("partitioned")
    val d0 = spark.range(0, 300).selectExpr("id AS k", "id % 3 AS seg")
    SnapshotLog.commitPartitioned(d0, root, Seq("seg" -> "identity"),
      overwrite = true, 1000L)
    SnapshotLog.setTableProps(spark, root,
      Map("write.data.max-small-files" -> "3"))
    // 3 live files (one per seg) = at threshold; the next partitioned
    // append crosses it and must auto-bin-pack FROM commitPartitioned
    val d1 = spark.range(300, 400).selectExpr("id AS k", "id % 3 AS seg")
    SnapshotLog.commitPartitioned(d1, root, Seq("seg" -> "identity"),
      overwrite = false, 2000L)
    assert(rewrites(root) === 1,
      "commitPartitioned did not invoke maintenance")
    val head = SnapshotLog.snapshots(spark, root).last
    assert(head.files.size <= 3, s"still ${head.files.size} live files")
    // layout preserved: every surviving file carries a partition tuple
    assert(head.parts.size === head.files.size,
      "compacted files lost their partition tuples")
    val t = spark.read.format("snapshotlog").load(root)
    assert(t.count() === 400)
    assert(t.where(col("seg") === 1).count() ===
      (0L until 400L).count(_ % 3 == 1))
  }

  test("maintenance thresholds hold under a random DML trickle") {
    val root = freshRoot("trickle")
    val rnd = new scala.util.Random(17)
    SnapshotLog.commit(df(0, 1000), root, overwrite = true, 1000L, 2)
    SnapshotLog.setTableProps(spark, root, Map(
      "write.delete.max-files-per-data-file" -> "3",
      "write.data.max-small-files" -> "8"))
    var model = (0L until 1000L).map(k => k -> (k % 7)).toMap
    var nextKey = 1000L
    var ts = 1000L
    def tick(): Long = { ts += 1000; ts }
    for (step <- 0 until 12) {
      rnd.nextInt(3) match {
        case 0 =>
          val rows = (0 until 20).map { _ =>
            nextKey += 1; (nextKey, nextKey % 7) }
          SnapshotLog.commit(rows.toDF("k", "v"), root,
            overwrite = false, tick(), 2)
          model ++= rows
        case 1 =>
          val m = 11 + rnd.nextInt(13); val r = rnd.nextInt(m)
          SnapshotLog.deleteWhereMoR(spark, root,
            col("k") % m === r.toLong, tick())
          model = model.filter { case (k, _) => k % m != r }
        case 2 =>
          val ups = rnd.shuffle(model.keys.toSeq.sorted).take(4)
            .map(k => (k, rnd.nextInt(50).toLong))
          SnapshotLog.upsertEqualityMoR(spark, root,
            ups.toDF("k", "v"), Seq("k"), tick())
          model ++= ups
      }
      val head = SnapshotLog.snapshots(spark, root).last
      // post-commit invariants the policy exists to enforce
      assert(worstPosDels(root) <= 3,
        s"step $step: positional delete files per data file unbounded")
      assert(head.files.size <= 8 + 2,
        s"step $step: ${head.files.size} small files — bin-pack slept")
      val got = spark.read.format("snapshotlog").load(root)
        .as[(Long, Long)].collect().toMap
      assert(got === model, s"step $step: auto-maintenance changed content")
    }
    assert(rewrites(root) >= 1, "the trickle never tripped maintenance")
  }

  test("write.analyze.every-commits keeps stats fresh automatically") {
    val root = freshRoot("auto_analyze")
    def statVersions(): Seq[Int] = {
      val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
      val re = "colstats-v(\\d{5})\\.json".r
      val dir = new Path(root, "_log")
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).map(_.getPath.getName)
        .collect { case re(v) => v.toInt }.toSeq.sorted
    }
    SnapshotLog.commit(df(0, 1000), root, overwrite = true, 1000L)
    SnapshotLog.setTableProps(spark, root,
      Map("write.analyze.every-commits" -> "2"))
    assert(statVersions().isEmpty) // property alone analyzes nothing
    // commit 1 past v1: head=2, lastAnalyzed=0 -> 2 >= 2 trips
    SnapshotLog.commit(df(1000, 2000), root, overwrite = false, 2000L)
    assert(statVersions() === Seq(2))
    // next commit: head=3, lastAnalyzed=2 -> 1 < 2 does NOT trip
    SnapshotLog.commit(df(2000, 3000), root, overwrite = false, 3000L)
    assert(statVersions() === Seq(2))
    // one more: head=4 -> trips again
    SnapshotLog.commit(df(3000, 4000), root, overwrite = false, 4000L)
    assert(statVersions() === Seq(2, 4))
    // the fresh stats are real: planner sees the analyzed NDV
    val (v, n, cols) = SnapshotLog.colStatsFor(spark, root, 4).get
    assert(v === 4 && n === 4000 && cols.contains("k"))
    // malformed value never fails the commit
    SnapshotLog.setTableProps(spark, root,
      Map("write.analyze.every-commits" -> "often"))
    SnapshotLog.commit(df(4000, 4100), root, overwrite = false, 5000L)
    assert(spark.read.format("snapshotlog").load(root).count() === 4100)
  }
}
