package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark
import graft.sources.SnapshotLog

/** Streaming CDC source (`format("snapshotlog-cdc")`): the changelog as
  * a micro-batch stream with snapshot versions as durable offsets.
  * Pins: full-history first batch, incremental delete/update batches as
  * they commit, exactly-once across a checkpoint restart, compaction
  * silence, and maxVersionsPerTrigger pacing. */
class SnapshotCdcStreamSpec extends AnyFunSuite {
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = s"/tmp/graft_cdc_stream/$tag"
    val fs = new Path(d).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(d), true)
    d
  }

  test("cdc stream: history, live DML batches, exactly-once restart") {
    val root = freshDir("e2e/table")
    val ckpt = freshDir("e2e/ckpt")
    SnapshotLog.commit(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), root,
      overwrite = true, 1000L)
    SnapshotLog.commit(Seq((3L, 30L)).toDF("k", "v"), root,
      overwrite = false, 2000L)

    val seen = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Long, String, Int)]())
    def startQuery() = spark.readStream.format("snapshotlog-cdc")
      .option("fromVersion", "0").load(root)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.select("k", "v", "_change_type", "_commit_version")
          .as[(Long, Long, String, Int)].collect().foreach(seen.add)
        ()
      }
      .option("checkpointLocation", ckpt).start()

    def rows(): Set[(Long, Long, String, Int)] = {
      import scala.jdk.CollectionConverters._
      seen.asScala.toSet
    }

    val q = startQuery()
    try {
      q.processAllAvailable()
      assert(rows() == Set((1L, 10L, "insert", 1), (2L, 20L, "insert", 1),
        (3L, 30L, "insert", 2)))

      // live MoR delete flows through as a delete row
      SnapshotLog.deleteWhereMoR(spark, root, col("k") === 2, 3000L)
      q.processAllAvailable()
      assert(rows().contains((2L, 20L, "delete", 3)))

      // live update flows through as the delete+insert pair
      SnapshotLog.updateWhereMoR(spark, root, col("k") === 1,
        Map("v" -> lit(11L)), 4000L)
      q.processAllAvailable()
      assert(rows().contains((1L, 10L, "delete", 4)))
      assert(rows().contains((1L, 11L, "insert", 4)))

      // compaction contributes NOTHING
      SnapshotLog.rewriteDataFiles(spark, root, commitTsMs = 5000L,
        targetBytes = 1L << 30)
      q.processAllAvailable()
      assert(rows().count(_._4 == 5) == 0)
      assert(seen.size == 6) // exactly once per change so far
    } finally q.stop()

    // restart from the checkpoint: nothing re-emitted; a post-restart
    // commit resumes from the recovered version offset
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      assert(seen.size == 6) // no replayed duplicates
      SnapshotLog.commit(Seq((9L, 90L)).toDF("k", "v"), root,
        overwrite = false, 6000L)
      q2.processAllAvailable()
      assert(rows().contains((9L, 90L, "insert", 6)))
      assert(seen.size == 7)
    } finally q2.stop()
  }

  test("cdc stream: a mid-stream rename keeps feeding the declared column") {
    val root = freshDir("rename/table")
    SnapshotLog.commit(Seq((1L, 10L)).toDF("k", "v"), root,
      overwrite = true, 1000L)
    val seen = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Long, String)]())
    val q = spark.readStream.format("snapshotlog-cdc")
      .option("fromVersion", "0").load(root)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.select("k", "v", "_change_type")
          .as[(Long, Long, String)].collect().foreach(seen.add)
        ()
      }.start()
    try {
      q.processAllAvailable()
      SnapshotLog.renameColumn(spark, root, "v", "w", 2000L)
      SnapshotLog.commit(Seq((2L, 20L)).toDF("k", "w"), root,
        overwrite = false, 3000L)
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      // the post-rename append still lands in the stream-start column 'v'
      assert(seen.asScala.toSet ==
        Set((1L, 10L, "insert"), (2L, 20L, "insert")))
    } finally q.stop()
  }

  test("cdc stream: maxVersionsPerTrigger paces one version per batch") {
    val root = freshDir("rate/table")
    for (i <- 1 to 4)
      SnapshotLog.commit(Seq((i.toLong, i * 10L)).toDF("k", "v"), root,
        overwrite = i == 1, i * 1000L)
    val q = spark.readStream.format("snapshotlog-cdc")
      .option("fromVersion", "0").option("maxVersionsPerTrigger", "1")
      .load(root)
      .writeStream.format("memory").queryName("cdc_rate").start()
    try {
      q.processAllAvailable()
      val batches = spark.table("cdc_rate")
        .select("_commit_version").distinct().count()
      assert(batches == 4)
      val prog = q.recentProgress.filter(_.numInputRows > 0)
      assert(prog.length == 4) // one version per micro-batch
      assert(prog.forall(_.numInputRows == 1))
    } finally q.stop()
  }

  test("identifierColumns streams update images (Delta CDF parity)") {
    val root = freshDir("updimg/table")
    val ckpt = freshDir("updimg/ckpt")
    SnapshotLog.commit(
      spark.range(0, 20).selectExpr("id AS k", "id * 10 AS v"), root,
      overwrite = true, 1000L)
    val q = spark.readStream.format("snapshotlog-cdc")
      .option("fromVersion", "0").option("identifierColumns", "k")
      .load(root)
      .writeStream.format("memory").queryName("cdc_upd")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      // live update: the stream carries paired images, not delete+insert
      SnapshotLog.updateWhereMoR(spark, root, col("k") % 5 === 0,
        Map("v" -> (col("v") + 1L)), 2000L)
      q.processAllAvailable()
      val v2 = spark.table("cdc_upd").filter(col("_commit_version") === 2)
        .select("k", "v", "_change_type")
        .as[(Long, Long, String)].collect().toSet
      val keys = (0L until 20L).filter(_ % 5 == 0)
      assert(v2 === keys.flatMap(k => Seq(
        (k, k * 10, "update_preimage"),
        (k, k * 10 + 1, "update_postimage"))).toSet)
      // v1 history stayed plain inserts
      assert(spark.table("cdc_upd").filter(col("_commit_version") === 1)
        .select("_change_type").distinct().as[String].collect().toSeq ===
        Seq("insert"))
    } finally q.stop()
  }
}
