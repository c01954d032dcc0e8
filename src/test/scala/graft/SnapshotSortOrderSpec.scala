package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark
import graft.sources.{SnapshotLog, SnapshotSorts}

/** Sort-order metadata + SupportsReportOrdering (r17 — Iceberg sort
  * orders): `rewriteDataFiles(clusterBy)` records each output file's sort
  * columns in an immutable sidecar, and the DSv2 scan reports the
  * ordering when the layout makes per-task order PROVABLE — a co-bucketed
  * co-sorted join then skips BOTH the Exchange (SPJ) and the Sort.
  * Every ineligible layout must degrade to a sorted plan, never mis-join.
  */
class SnapshotSortOrderSpec extends AnyFunSuite {
  import spark.implicits._

  private val wh = "/tmp/graft_snap_warehouse"

  private def freshTable(ns: String, name: String): String = {
    val root = s"$wh/$ns/$name"
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(root), true)
    root
  }

  private def withConfs[A](kv: (String, String)*)(body: => A): A = {
    val olds = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def planStr(df: DataFrame): String = {
    df.collect() // AQE-final plan
    df.queryExecution.executedPlan.toString
  }
  private def sorts(plan: String): Int = "\\bSort \\[".r.findAllIn(plan).size
  private def shuffles(plan: String): Int =
    "Exchange".r.findAllIn(plan).size - "BroadcastExchange".r.findAllIn(plan).size

  private def noBroadcast[A](body: => A): A =
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1")(body)

  /** Two co-bucketed tables; `compact` range-sorts each bucket to one
    * key-sorted file per tuple. */
  private def buildPair(ns: String, compact: Boolean): (String, String) = {
    val l = freshTable(ns, "sorted_l")
    val r = freshTable(ns, "sorted_r")
    val spec = Seq("k" -> "bucket[4]")
    SnapshotLog.commitPartitioned(
      spark.range(0, 2000).selectExpr("id AS k", "id * 2 AS v"),
      l, spec, overwrite = true, 1000L)
    SnapshotLog.commitPartitioned(
      spark.range(0, 2000, 4).selectExpr("id AS k", "id + 7 AS w"),
      r, spec, overwrite = true, 1000L)
    if (compact) {
      SnapshotLog.rewriteDataFiles(spark, l, 2000L, targetBytes = 1L << 30,
        clusterBy = Seq("k"))
      SnapshotLog.rewriteDataFiles(spark, r, 2000L, targetBytes = 1L << 30,
        clusterBy = Seq("k"))
    }
    (s"snap.$ns.sorted_l", s"snap.$ns.sorted_r")
  }

  test("co-bucketed cluster-by-compacted join: ZERO exchanges AND zero sorts") {
    val (lt, rt) = buildPair("sortspj", compact = true)
    noBroadcast {
      val j = spark.table(lt).hint("merge").join(spark.table(rt), "k")
        .select(col("k"), col("v"), col("w"))
      val p = planStr(j)
      assert(shuffles(p) === 0, s"expected SPJ (no exchange):\n$p")
      assert(sorts(p) === 0,
        s"co-sorted files must skip the merge-join Sort:\n$p")
      val got = j.as[(Long, Long, Long)].collect().toSet
      assert(got === (0L until 2000L by 4).map(k => (k, k * 2, k + 7)).toSet)
    }
  }

  test("uncompacted (unsorted) layout keeps the Sort — degrade, never wrong") {
    val (lt, rt) = buildPair("sortspj_un", compact = false)
    noBroadcast {
      val j = spark.table(lt).hint("merge").join(spark.table(rt), "k")
        .select(col("k"), col("v"), col("w"))
      val p = planStr(j)
      assert(shuffles(p) === 0, s"SPJ itself still applies:\n$p")
      assert(sorts(p) > 0,
        s"unsorted files must keep the merge-join Sort:\n$p")
      val got = j.as[(Long, Long, Long)].collect().toSet
      assert(got === (0L until 2000L by 4).map(k => (k, k * 2, k + 7)).toSet)
    }
  }

  test("two sorted files in one bucket: ordering NOT reported (grouped " +
       "concatenation is unsorted) — join sorts and stays correct") {
    val ns = "sortspj_2f"
    val l = freshTable(ns, "sorted_l")
    val r = freshTable(ns, "sorted_r")
    val spec = Seq("k" -> "bucket[4]")
    // two partitioned commits per table; record BOTH commits' files as
    // k-sorted (each file individually is — the hazard is concatenation)
    Seq(l, r).foreach { root =>
      SnapshotLog.commitPartitioned(
        spark.range(0, 1000).selectExpr("id AS k",
          if (root == l) "id * 2 AS v" else "id + 7 AS w"),
        root, spec, overwrite = true, 1000L)
      SnapshotLog.commitPartitioned(
        spark.range(1000, 2000).selectExpr("id AS k",
          if (root == l) "id * 2 AS v" else "id + 7 AS w"),
        root, spec, overwrite = false, 2000L)
      val files = SnapshotLog.snapshots(spark, root).last.files
      SnapshotSorts.record(spark, root, files, Seq("k"))
    }
    noBroadcast {
      val j = spark.table(s"snap.$ns.sorted_l").hint("merge")
        .join(spark.table(s"snap.$ns.sorted_r"), "k")
        .select(col("k"), col("v"), col("w"))
      val p = planStr(j)
      assert(sorts(p) > 0,
        s"multi-file buckets must NOT report ordering (concat breaks it):\n$p")
      assert(j.count() === 2000)
    }
  }

  test("projection pruning the sort column drops the reported ordering") {
    val ns = "sortspj_prj"
    val l = freshTable(ns, "sorted_l")
    SnapshotLog.commitPartitioned(
      spark.range(0, 500).selectExpr("id AS k", "id * 2 AS v"),
      l, Seq("k" -> "bucket[4]"), overwrite = true, 1000L)
    SnapshotLog.rewriteDataFiles(spark, l, 2000L, targetBytes = 1L << 30,
      clusterBy = Seq("k"))
    def orderingOf(df: DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case rel: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          rel.scan.asInstanceOf[graft.sources.SnapshotLogScan]
            .outputOrdering().map(_.toString).toSeq
      }.head
    val full = spark.table(s"snap.$ns.sorted_l")
    assert(orderingOf(full.select("k", "v")).nonEmpty)
    assert(orderingOf(full.select("v")).isEmpty,
      "a scan that pruned the sort column must not claim its ordering")
  }

  test(".sorts metadata table lists recorded-sorted live files") {
    val ns = "sortmeta"
    val l = freshTable(ns, "t")
    spark.sql(s"DROP TABLE IF EXISTS snap.$ns.t")
    spark.sql(s"CREATE TABLE snap.$ns.t AS " +
      "SELECT id AS k, id * 2 AS v FROM range(0, 500)")
    SnapshotLog.rewriteDataFiles(spark, l,
      SnapshotLog.snapshots(spark, l).last.commitTsMs + 1000,
      targetBytes = 1L << 30, smallBytes = Long.MaxValue,
      clusterBy = Seq("k"))
    val rows = spark.sql(s"SELECT * FROM snap.$ns.t.sorts").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("sort_order") == "k"))
    val live = SnapshotLog.snapshots(spark, l).last.files
      .map(_.replaceFirst("^file:/*", "/")).toSet
    assert(rows.map(_.getAs[String]("data_file")).forall(live.contains))
  }

  test("expiry reclaims sort sidecars whose files all died") {
    val ns = "sortexp"
    val l = freshTable(ns, "t")
    SnapshotLog.commit(
      spark.range(0, 500).selectExpr("id AS k", "id * 2 AS v"),
      l, overwrite = true, 1000L, 4)
    SnapshotLog.rewriteDataFiles(spark, l, 2000L, targetBytes = 1L << 30,
      clusterBy = Seq("k"))
    val fs = new Path(l).getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.listStatus(new Path(l, "sorts")).length === 1)
    // overwrite kills the sorted files; expiry reclaims the sidecar
    SnapshotLog.commit(
      spark.range(0, 10).selectExpr("id AS k", "id * 2 AS v"),
      l, overwrite = true, 3000L, 1)
    val head = SnapshotLog.snapshots(spark, l).last.version
    SnapshotLog.expireSnapshots(spark, l, head)
    assert(!fs.exists(new Path(l, "sorts")) ||
      fs.listStatus(new Path(l, "sorts")).isEmpty,
      "dead sort sidecars must be reclaimed by expiry")
  }
}
