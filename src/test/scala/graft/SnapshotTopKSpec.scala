package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark
import graft.sources.SnapshotLog

/** LIMIT and TOP-K (ORDER BY … LIMIT k) file skipping on snapshot scans
  * (r17): partial DSv2 pushdown — Spark keeps its Limit/TakeOrdered, the
  * scan plans only the files that can hold answer rows, using manifest
  * row counts + min/max and the commit-time null-count sidecar
  * (SnapshotNulls, Iceberg null_value_counts analog). */
class SnapshotTopKSpec extends AnyFunSuite {
  import spark.implicits._

  private def fresh(name: String): String = {
    val root = s"/tmp/graft_topk/$name"
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(root), true)
    root
  }

  /** 4 single-file commits with DISJOINT ts ranges (time-clustered — the
    * natural layout of an append-only event table). */
  private def clustered(root: String): Unit =
    for (i <- 0 until 4)
      SnapshotLog.commit(
        spark.range(i * 1000L, i * 1000L + 1000L)
          .selectExpr("id AS ts", "id * 3 AS v"),
        root, overwrite = i == 0, 1000L * (i + 1), 1): Unit

  private def planned(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
          if r.scan.isInstanceOf[graft.sources.SnapshotLogScan] =>
        r.scan.asInstanceOf[graft.sources.SnapshotLogScan].keptFiles.size
    }.head

  test("ORDER BY ts DESC LIMIT k plans only the newest file(s)") {
    val root = fresh("desc")
    clustered(root)
    val t = spark.read.format("snapshotlog").load(root)
    val q = t.orderBy(col("ts").desc).limit(10)
    assert(planned(q) === 1, "10 newest rows live in the newest file")
    assert(q.select("ts").as[Long].collect().toSeq ===
      (3990L to 3999L).reverse)
    // k spanning two files
    val q2 = t.orderBy(col("ts").desc).limit(1500)
    assert(planned(q2) === 2)
    assert(q2.count() === 1500)
  }

  test("ORDER BY ts ASC LIMIT k plans only the oldest file(s)") {
    val root = fresh("asc")
    clustered(root)
    val t = spark.read.format("snapshotlog").load(root)
    val q = t.orderBy(col("ts")).limit(7)
    assert(planned(q) === 1)
    assert(q.select("ts").as[Long].collect().toSeq === (0L to 6L))
  }

  test("multi-key ordering prunes on the first key and stays exact") {
    val root = fresh("multi")
    clustered(root)
    val t = spark.read.format("snapshotlog").load(root)
    val q = t.orderBy(col("ts").desc, col("v")).limit(5)
    assert(planned(q) === 1)
    assert(q.select("ts").as[Long].collect().toSeq ===
      (3995L to 3999L).reverse)
  }

  test("bare LIMIT plans a row-count prefix of files") {
    val root = fresh("limit")
    clustered(root)
    val t = spark.read.format("snapshotlog").load(root)
    val q = t.limit(900)
    assert(planned(q) === 1, "900 rows fit in the first 1000-row file")
    assert(q.count() === 900)
    val q2 = t.limit(2500)
    assert(planned(q2) === 3)
    assert(q2.count() === 2500)
    // limit past the table keeps everything and returns everything
    assert(t.limit(99999).count() === 4000)
  }

  test("null rows: DESC (nulls last) still prunes via sidecar counts; " +
       "ASC (nulls first) must keep null-carrying files") {
    val root = fresh("nulls")
    clustered(root)
    // a 5th file: 500 NULL-ts rows (e.g. unparsed events)
    SnapshotLog.commit(
      spark.range(0, 500).selectExpr("CAST(NULL AS BIGINT) AS ts", "id AS v"),
      root, overwrite = false, 5000L, 1)
    val t = spark.read.format("snapshotlog").load(root)
    val qd = t.orderBy(col("ts").desc).limit(10)
    // nulls sort LAST under desc: the answer is still the newest file's
    // rows, and the all-null file has 0 non-null ts rows to offer
    assert(planned(qd) <= 2,
      s"desc top-k should still prune the older files, planned ${planned(qd)}")
    assert(qd.select("ts").as[Option[Long]].collect().flatten.toSeq ===
      (3990L to 3999L).reverse)
    // asc: nulls sort FIRST — with 500 provable nulls >= k, only
    // null-carrying files need planning
    val qa = t.orderBy(col("ts")).limit(10)
    assert(planned(qa) === 1,
      "k <= provable null count: only the null-carrying file plans")
    assert(qa.select("ts").as[Option[Long]].collect().forall(_.isEmpty))
    // asc with k beyond the nulls: null file + oldest value files
    val qa2 = t.orderBy(col("ts")).limit(600)
    assert(planned(qa2) === 2)
    assert(qa2.count() === 600)
  }

  test("MoR deletes disable a file's count contribution but never " +
       "break correctness") {
    val root = fresh("mor")
    clustered(root)
    // delete most of the newest file's rows
    SnapshotLog.deleteWhereMoR(spark, root, col("ts") >= 3100L, 9000L)
    val t = spark.read.format("snapshotlog").load(root)
    val q = t.orderBy(col("ts").desc).limit(10)
    // the delete-carrying file counts 0 provable rows, so planning must
    // fall back to including enough older files
    assert(q.select("ts").as[Long].collect().toSeq ===
      ((3091L to 3099L).reverse :+ 3090L).map(identity))
    assert(q.select("ts").as[Long].collect().head === 3099L)
  }

  test("missing null-count sidecars degrade to a full scan, not a wrong " +
       "answer") {
    val root = fresh("nosidecar")
    clustered(root)
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(root, "nulls"), true)
    val t = spark.read.format("snapshotlog").load(root)
    val q = t.orderBy(col("ts").desc).limit(10)
    assert(planned(q) === 4, "no sidecar ⇒ no non-null proof ⇒ keep all")
    assert(q.select("ts").as[Long].collect().toSeq ===
      (3990L to 3999L).reverse)
  }

  test(".nulls metadata table inventories recorded (file, column) counts") {
    val ns = "nullmeta"
    val root = s"/tmp/graft_snap_warehouse/$ns/t"
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(root), true)
    spark.sql(s"DROP TABLE IF EXISTS snap.$ns.t")
    spark.sql(s"CREATE TABLE snap.$ns.t AS SELECT id AS k, " +
      "CASE WHEN id % 5 = 0 THEN NULL ELSE id * 2 END AS v FROM range(0, 500)")
    val rows = spark.sql(s"SELECT * FROM snap.$ns.t.nulls").collect()
    assert(rows.nonEmpty)
    val vNulls = rows.filter(_.getAs[String]("column") == "v")
      .map(_.getAs[Long]("null_count")).sum
    assert(vNulls === 100L, s"100 of 500 v values are null, got $vNulls")
    assert(rows.filter(_.getAs[String]("column") == "k")
      .forall(_.getAs[Long]("null_count") == 0L))
  }

  test("non-default null ordering refuses the push and scans everything") {
    val root = fresh("nullorder")
    clustered(root)
    val t = spark.read.format("snapshotlog").load(root)
    val q = t.orderBy(col("ts").desc_nulls_first).limit(10)
    assert(planned(q) === 4)
    assert(q.select("ts").as[Long].collect().toSeq ===
      (3990L to 3999L).reverse)
  }
}
