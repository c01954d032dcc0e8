package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark
import graft.sources.SnapshotLog

/** Dynamic partition pruning on the main DSv2 scan (r16): the scan
  * declares its partition SOURCE columns runtime-filterable
  * (`SupportsRuntimeFiltering`), so a star-schema join against a
  * selectively-filtered dim side injects a DPP subquery whose IN-set
  * prunes fact files BEFORE execution — bucket tuples turn a dim-key
  * probe into opening only the probed buckets. At 100 TB: scan a few
  * buckets, not the fact table. */
class SnapshotDppSpec extends AnyFunSuite {
  import spark.implicits._

  private val wh = "/tmp/graft_snap_warehouse"

  private def freshTable(name: String): String = {
    val root = s"$wh/dpp/$name"
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(root), true)
    root
  }

  test("filter() prunes the live file set through bucket tuples (unit)") {
    val root = freshTable("unit_fact")
    SnapshotLog.commitPartitioned(
      spark.range(0, 4000).selectExpr("id AS k", "id AS v"),
      root, Seq("k" -> "bucket[16]"), overwrite = true, 1000L)
    val snap = SnapshotLog.snapshots(spark, root).last
    val scan = new graft.sources.SnapshotLogScan(snap,
      org.apache.spark.sql.types.StructType(snap.schema.fields),
      Array.empty, snap.files)
    val before = scan.keptFiles.size
    assert(before >= 16, s"expected >=16 bucket files, got $before")
    assert(scan.filterAttributes().map(_.describe()).contains("k"))
    // a 2-key dim IN-set must collapse the scan to <=2 buckets' files
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("k",
        Array(Long.box(17L), Long.box(18L)))))
    val after = scan.keptFiles
    assert(after.size <= before / 4,
      s"runtime IN-set should prune most buckets: $before -> ${after.size}")
    // and the surviving files really hold the probed keys
    val got = SnapshotLog.read(spark, root)
      .filter(col("k").isin(17L, 18L)).count()
    assert(got === 2L)
  }

  test("broadcast star join injects a DPP subquery on the fact scan " +
       "and returns exact rows") {
    val fact = freshTable("fact")
    val dim = freshTable("dim")
    SnapshotLog.commitPartitioned(
      spark.range(0, 20000).selectExpr("id AS k", "id * 3 AS v"),
      fact, Seq("k" -> "bucket[16]"), overwrite = true, 1000L)
    SnapshotLog.commit(
      spark.range(0, 20000, 100)
        .selectExpr("id AS dk", "cast(id % 7 AS int) AS cat"),
      dim, overwrite = true, 1000L)
    val j = spark.table("snap.dpp.fact")
      .join(spark.table("snap.dpp.dim").filter(col("cat") === 3), // selective
        col("k") === col("dk"))
      .select(col("k"), col("v"))
    val rows = j.as[(Long, Long)].collect().toSet
    // dim keys are 100*m with (100*m) % 7 == 3  <=>  m ≡ 5 (mod 7)
    val expect = (500L until 20000L by 700).map(k => (k, k * 3)).toSet
    assert(rows === expect)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a DPP subquery on the fact scan:\n$plan")
  }

  test("DPP composes with SPJ: the co-bucketed join stays exchange-free " +
       "while the fact side prunes at runtime") {
    val fact = freshTable("spjdpp_fact")
    val dim = freshTable("spjdpp_dim")
    val spec = Seq("k" -> "bucket[16]")
    SnapshotLog.commitPartitioned(
      spark.range(0, 20000).selectExpr("id AS k", "id * 2 AS v"),
      fact, spec, overwrite = true, 1000L)
    SnapshotLog.commitPartitioned(
      spark.range(0, 20000, 100)
        .selectExpr("id AS k", "cast(id % 7 AS int) AS cat"),
      dim, spec, overwrite = true, 1000L)
    val olds = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
    try {
      val j = spark.table("snap.dpp.spjdpp_fact")
        .join(spark.table("snap.dpp.spjdpp_dim").filter(col("cat") === 3), "k")
        .select(col("k"), col("v"))
      val rows = j.as[(Long, Long)].collect().toSet
      assert(rows === (500L until 20000L by 700).map(k => (k, k * 2)).toSet)
      val plan = j.queryExecution.executedPlan.toString
      val shuffles = "Exchange".r.findAllIn(plan).size -
        "BroadcastExchange".r.findAllIn(plan).size
      assert(shuffles === 0,
        s"the co-bucketed join must stay storage-partitioned:\n$plan")
      assert(plan.contains("dynamicpruning"),
        s"with reuseBroadcastOnly=false the selective dim filter must " +
          s"inject a runtime pruning subquery on the fact scan:\n$plan")
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("DPP + SPJ + sort-order compose: runtime-pruned, exchange-free AND " +
       "sort-free merge join on cluster-by-compacted tables") {
    val fact = freshTable("spjdpps_fact")
    val dim = freshTable("spjdpps_dim")
    val spec = Seq("k" -> "bucket[8]")
    SnapshotLog.commitPartitioned(
      spark.range(0, 20000).selectExpr("id AS k", "id * 2 AS v"),
      fact, spec, overwrite = true, 1000L)
    SnapshotLog.commitPartitioned(
      spark.range(0, 20000, 100)
        .selectExpr("id AS k", "cast(id % 7 AS int) AS cat"),
      dim, spec, overwrite = true, 1000L)
    // cluster-by compaction: one KEY-SORTED file per bucket on both sides
    SnapshotLog.rewriteDataFiles(spark, fact, 2000L,
      targetBytes = 1L << 30, clusterBy = Seq("k"))
    SnapshotLog.rewriteDataFiles(spark, dim, 2000L,
      targetBytes = 1L << 30, clusterBy = Seq("k"))
    val olds = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
    try {
      val j = spark.table("snap.dpp.spjdpps_fact").hint("merge")
        .join(spark.table("snap.dpp.spjdpps_dim").filter(col("cat") === 3), "k")
        .select(col("k"), col("v"))
      val rows = j.as[(Long, Long)].collect().toSet
      assert(rows === (500L until 20000L by 700).map(k => (k, k * 2)).toSet)
      val plan = j.queryExecution.executedPlan.toString
      val shuffles = "Exchange".r.findAllIn(plan).size -
        "BroadcastExchange".r.findAllIn(plan).size
      assert(shuffles === 0,
        s"the co-bucketed join must stay storage-partitioned:\n$plan")
      assert("\\bSort \\[".r.findAllIn(plan).isEmpty,
        s"co-sorted compacted files must also skip the merge-join Sort:\n$plan")
      assert(plan.contains("dynamicpruning"),
        s"the selective dim filter must still runtime-prune the fact scan:\n$plan")
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime filtering composes with MoR deletes and stays exact") {
    val fact = freshTable("fact_mor")
    val dim = freshTable("dim_mor")
    SnapshotLog.commitPartitioned(
      spark.range(0, 5000).selectExpr("id AS k", "id AS v"),
      fact, Seq("k" -> "bucket[8]"), overwrite = true, 1000L)
    SnapshotLog.deleteWhereMoR(spark, fact, col("k") % 2 === 1, 2000L)
    SnapshotLog.commit(
      spark.range(0, 5000, 500).selectExpr("id AS dk"),
      dim, overwrite = true, 1000L)
    val j = spark.table("snap.dpp.fact_mor")
      .join(spark.table("snap.dpp.dim_mor"), col("k") === col("dk"))
      .select(col("k"))
    // odd keys were MoR-deleted; dim keys are all even multiples of 500
    assert(j.as[Long].collect().toSet === (0L until 5000L by 500).toSet)
  }
}
