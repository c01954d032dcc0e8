package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark
import graft.sources.SnapshotLog

/** WAP MERGE (upsertEqualityMoRBranch) and equality DELETE
  * (deleteEqualityMoRBranch) on a branch — the r19 completion of branch
  * DML parity with mainline: audit-fix with upsert semantics happens
  * PRE-publish, and concurrent branch writers are refused
  * deterministically (test seam), never silently overwritten. */
class SnapshotWapMergeSpec extends AnyFunSuite {
  import spark.implicits._

  private def fresh(tag: String): String = {
    val root = s"/tmp/graft_wapmerge_spec/$tag"
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(root), true)
    root
  }

  private def branchRead(root: String, b: String) =
    spark.read.format("snapshotlog").option("branch", b).load(root)

  test("merge on branch replaces by key + inserts new keys; main is " +
       "untouched until fast_forward publishes as an append") {
    val root = fresh("merge")
    SnapshotLog.commit(
      spark.range(0, 100).selectExpr("id AS k", "id AS v"),
      root, overwrite = true, 1000L)
    SnapshotLog.createBranch(spark, root, "audit", 1)
    SnapshotLog.commitToBranch(spark, root, "audit",
      spark.range(100, 200).selectExpr("id AS k", "id AS v"), 2000L)
    // fix keys 150..159 (v := v + 10000), insert keys 500..504
    val batch = spark.range(150, 160).selectExpr("id AS k", "id + 10000 AS v")
      .unionByName(spark.range(500, 505).selectExpr("id AS k", "id AS v"))
    val mv = SnapshotLog.upsertEqualityMoRBranch(spark, root, "audit",
      batch, Seq("k"), 3000L)
    assert(mv === 3)
    val b = branchRead(root, "audit")
    assert(b.count() === 205)
    assert(b.filter(col("k") === 155).select("v").as[Long].head() === 10155L)
    assert(b.filter(col("k") >= 500).count() === 5)
    // the branch snapshot is a ref-tagged equality upsert
    val sn = SnapshotLog.snapshots(spark, root).find(_.version == 3).get
    assert(sn.branch.contains("audit") && sn.operation === "upsert")
    // main untouched pre-publish
    assert(SnapshotLog.read(spark, root).count() === 100)
    // publish: branch descends from main head → append
    SnapshotLog.fastForward(spark, root, "audit", 4000L)
    val m = SnapshotLog.read(spark, root)
    assert(m.count() === 205)
    assert(m.filter(col("k") === 155).select("v").as[Long].head() === 10155L)
    assert(SnapshotLog.snapshots(spark, root)
      .filter(_.branch.isEmpty).last.operation === "append")
  }

  test("equality delete on branch removes the key set pre-publish; " +
       "misuse refuses (no branch, tag ref)") {
    val root = fresh("eqdel")
    SnapshotLog.commit(
      spark.range(0, 100).selectExpr("id AS k", "id AS v"),
      root, overwrite = true, 1000L)
    SnapshotLog.createBranch(spark, root, "audit", 1)
    SnapshotLog.commitToBranch(spark, root, "audit",
      spark.range(100, 150).selectExpr("id AS k", "id AS v"), 2000L)
    val dv = SnapshotLog.deleteEqualityMoRBranch(spark, root, "audit",
      spark.range(120, 140).selectExpr("id AS k"), 3000L)
    assert(dv === 3)
    assert(branchRead(root, "audit").count() === 130)
    assert(SnapshotLog.read(spark, root).count() === 100)
    // the pre-delete branch state stays time-travelable
    assert(SnapshotLog.read(spark, root, asOfVersion = Some(2)).count() === 150)
    intercept[NoSuchElementException] {
      SnapshotLog.deleteEqualityMoRBranch(spark, root, "nope",
        spark.range(0, 1).selectExpr("id AS k"), 4000L)
    }
    SnapshotLog.createTag(spark, root, "t1", 1)
    intercept[IllegalArgumentException] {
      SnapshotLog.deleteEqualityMoRBranch(spark, root, "t1",
        spark.range(0, 1).selectExpr("id AS k"), 5000L)
    }
  }

  test("concurrent branch-head movement between staging and commit " +
       "REFUSES the merge (deterministic via the test seam) and adopts " +
       "the concurrent writer's head") {
    val root = fresh("race")
    SnapshotLog.commit(
      spark.range(0, 50).selectExpr("id AS k", "id AS v"),
      root, overwrite = true, 1000L)
    SnapshotLog.createBranch(spark, root, "audit", 1)
    SnapshotLog.commitToBranch(spark, root, "audit",
      spark.range(50, 100).selectExpr("id AS k", "id AS v"), 2000L)
    // the seam fires after the merge's staging: a concurrent writer
    // advances the branch ref underneath it
    SnapshotLog.branchDmlAfterStage = () => {
      SnapshotLog.branchDmlAfterStage = () => ()
      SnapshotLog.commitToBranch(spark, root, "audit",
        spark.range(100, 110).selectExpr("id AS k", "id AS v"), 2500L): Unit
    }
    try {
      intercept[SnapshotLog.CommitConflictException] {
        SnapshotLog.upsertEqualityMoRBranch(spark, root, "audit",
          spark.range(60, 70).selectExpr("id AS k", "id + 5000 AS v"),
          Seq("k"), 3000L)
      }
    } finally SnapshotLog.branchDmlAfterStage = () => ()
    // the concurrent writer's snapshot IS the branch head; the refused
    // merge changed nothing (no upsert on the chain, no key rewritten)
    val b = branchRead(root, "audit")
    assert(b.count() === 110)
    assert(b.filter(col("k") === 65).select("v").as[Long].head() === 65L)
    assert(!SnapshotLog.snapshots(spark, root).exists(sn =>
      sn.branch.contains("audit") && sn.operation == "upsert"))
    // the equality-delete flavor refuses through the same seam
    SnapshotLog.branchDmlAfterStage = () => {
      SnapshotLog.branchDmlAfterStage = () => ()
      SnapshotLog.commitToBranch(spark, root, "audit",
        spark.range(110, 115).selectExpr("id AS k", "id AS v"), 3500L): Unit
    }
    try {
      intercept[SnapshotLog.CommitConflictException] {
        SnapshotLog.deleteEqualityMoRBranch(spark, root, "audit",
          spark.range(0, 10).selectExpr("id AS k"), 4000L)
      }
    } finally SnapshotLog.branchDmlAfterStage = () => ()
    assert(branchRead(root, "audit").count() === 115)
    // the WHERE flavors refuse through the same seam (r19 symmetry:
    // every branch DML path is deterministically race-tested)
    SnapshotLog.branchDmlAfterStage = () => {
      SnapshotLog.branchDmlAfterStage = () => ()
      SnapshotLog.commitToBranch(spark, root, "audit",
        spark.range(115, 120).selectExpr("id AS k", "id AS v"), 4500L): Unit
    }
    try {
      intercept[SnapshotLog.CommitConflictException] {
        SnapshotLog.deleteWhereMoRBranch(spark, root, "audit",
          col("k") < 5, 5000L)
      }
    } finally SnapshotLog.branchDmlAfterStage = () => ()
    assert(branchRead(root, "audit").count() === 120)
    SnapshotLog.branchDmlAfterStage = () => {
      SnapshotLog.branchDmlAfterStage = () => ()
      SnapshotLog.commitToBranch(spark, root, "audit",
        spark.range(120, 125).selectExpr("id AS k", "id AS v"), 5500L): Unit
    }
    try {
      intercept[SnapshotLog.CommitConflictException] {
        SnapshotLog.updateWhereMoRBranch(spark, root, "audit",
          col("k") < 5, Map("v" -> (col("v") + 100L)), 6000L)
      }
    } finally SnapshotLog.branchDmlAfterStage = () => ()
    val b2 = branchRead(root, "audit")
    assert(b2.count() === 125)
    assert(b2.filter(col("k") === 2).select("v").as[Long].head() === 2L,
      "the refused update must not have rewritten any row")
  }

  test("the SQL surface (merge_branch CALL) refuses concurrent head " +
       "movement through the same seam") {
    val ns = "wapsql_race"
    val fs = new Path(s"/tmp/graft_snap_warehouse/$ns")
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(s"/tmp/graft_snap_warehouse/$ns"), true)
    spark.sql(s"DROP TABLE IF EXISTS snap.$ns.t")
    spark.sql(s"CREATE TABLE snap.$ns.t AS " +
      "SELECT id AS k, id AS v FROM range(0, 50)")
    val root = s"/tmp/graft_snap_warehouse/$ns/t"
    spark.sql(s"CALL snap.system.create_branch('$ns.t', 'audit', 2)")
    spark.range(50, 60).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("wapsql_race_src")
    SnapshotLog.branchDmlAfterStage = () => {
      SnapshotLog.branchDmlAfterStage = () => ()
      SnapshotLog.commitToBranch(spark, root, "audit",
        spark.range(900, 905).selectExpr("id AS k", "id AS v"),
        SnapshotLog.nextCommitTs(spark, root)): Unit
    }
    val e = try intercept[Exception] {
      spark.sql(s"CALL snap.system.merge_branch('$ns.t', 'audit', " +
        "'wapsql_race_src', 'k')").collect()
    } finally SnapshotLog.branchDmlAfterStage = () => ()
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("advanced during the merge")),
      s"CALL must surface the refusal, got: ${messages(e).mkString(" | ")}")
    // the concurrent writer's rows are the branch state; no upsert landed
    assert(branchRead(root, "audit").count() === 55)
  }

  test("a ref-write race AFTER the snapshot committed surfaces the " +
       "ORPHAN version in the refusal, and deliberate expiry reclaims " +
       "its staged files") {
    val root = fresh("orphan")
    SnapshotLog.commit(
      spark.range(0, 50).selectExpr("id AS k", "id AS v"),
      root, overwrite = true, 1000L)
    SnapshotLog.createBranch(spark, root, "audit", 1)
    SnapshotLog.commitToBranch(spark, root, "audit",
      spark.range(50, 100).selectExpr("id AS k", "id AS v"), 2000L)
    // the narrow window: the commit closure's head check passed, the
    // snapshot is durable — THEN a concurrent writer advances the ref
    // (ts past the in-flight upsert's 3000: the DML snapshot is already
    // durable when this concurrent writer lands)
    SnapshotLog.branchDmlBeforeRefWrite = () => {
      SnapshotLog.branchDmlBeforeRefWrite = () => ()
      SnapshotLog.commitToBranch(spark, root, "audit",
        spark.range(100, 110).selectExpr("id AS k", "id AS v"), 5000L): Unit
    }
    val e = try intercept[SnapshotLog.CommitConflictException] {
      SnapshotLog.upsertEqualityMoRBranch(spark, root, "audit",
        spark.range(60, 70).selectExpr("id AS k", "id + 5000 AS v"),
        Seq("k"), 3000L)
    } finally SnapshotLog.branchDmlBeforeRefWrite = () => ()
    val orphan = e.orphanVersion.getOrElse(
      fail("ref-write refusal must carry the orphan version"))
    // the orphan IS in the log (a durable child of the old head) but is
    // NOT the branch head — the concurrent writer's snapshot is
    val snaps = SnapshotLog.snapshots(spark, root)
    assert(snaps.exists(sn => sn.version == orphan &&
      sn.branch.contains("audit") && sn.operation == "upsert"))
    assert(SnapshotLog.refs(spark, root)("audit") !== orphan)
    assert(branchRead(root, "audit").count() === 110,
      "the branch must serve the concurrent writer's state")
    // the surfaced handle enables deliberate reclamation: expiring below
    // the live head drops the orphan's manifest and its staged files
    val orphanFiles = snaps.find(_.version == orphan).get.files
      .filterNot(snaps.filter(_.version != orphan).flatMap(_.files).toSet)
    assert(orphanFiles.nonEmpty, "the orphan staged new data files")
    SnapshotLog.expireSnapshots(spark, root,
      keepFromVersion = orphan + 1, orphanScan = false)
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    assert(orphanFiles.forall(f => !fs.exists(new Path(f))),
      "expiry below the orphan must reclaim its staged files")
  }
}
