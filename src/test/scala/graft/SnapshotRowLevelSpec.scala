package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark
import graft.sources.SnapshotLog

/** SQL UPDATE / MERGE INTO / complex DELETE on snapshot tables via the
  * row-level-operation API (group-based copy-on-write): row semantics,
  * file-granular carry of untouched files, and snapshot history. */
class SnapshotRowLevelSpec extends AnyFunSuite {
  import spark.implicits._

  private val wh = "/tmp/graft_snap_warehouse"

  private def graftNorm(p: String): String = p.replaceFirst("^file:/*", "/")

  private def dropNs(ns: String): Unit = {
    val p = new Path(s"$wh/$ns")
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true): Unit
  }

  test("SQL UPDATE: matched rows updated, unmatched preserved, untouched files carried") {
    dropNs("rl1")
    // three disjoint key-range commits -> 3 stats-pruned "groups" of 2
    // files each (INSERT writes numFiles=2 per commit)
    spark.sql("CREATE TABLE snap.rl1.t AS SELECT id AS k, id * 1.0 AS v FROM range(0, 100)")
    spark.sql("INSERT INTO snap.rl1.t SELECT id, id * 1.0 FROM range(100, 200)")
    spark.sql("INSERT INTO snap.rl1.t SELECT id, id * 1.0 FROM range(200, 300)")
    val root = s"$wh/rl1/t"
    val before = SnapshotLog.snapshots(spark, root).last

    spark.sql("UPDATE snap.rl1.t SET v = v + 1000 WHERE k >= 100 AND k < 150")

    val after = SnapshotLog.snapshots(spark, root).last
    assert(after.operation === "update")
    // only the middle slice's files were rewritten; the other slices'
    // files are carried BY REFERENCE (identical paths)
    val beforeSet = before.files.map(graftNorm).toSet
    val carried = after.files.map(graftNorm).count(beforeSet.contains)
    assert(carried >= 4,
      s"expected >=4 untouched files carried by reference, got $carried")

    val t = spark.table("snap.rl1.t")
    assert(t.count() === 300)
    assert(t.filter($"k" >= 100 && $"k" < 150 && $"v" === $"k" + 1000)
      .count() === 50)
    assert(t.filter(($"k" < 100 || $"k" >= 150) && $"v" === $"k" * 1.0)
      .count() === 250)
    // pre-update version still time-travels
    assert(spark.sql(s"SELECT count(*) FROM snap.rl1.t VERSION AS OF ${before.version}")
      .as[Long].head() === 300)
    assert(spark.sql(
      s"SELECT CAST(sum(v) AS DOUBLE) FROM snap.rl1.t VERSION AS OF ${before.version}")
      .as[Double].head() === (0 until 300).map(_.toDouble).sum)
  }

  test("SQL MERGE INTO: update matched, insert not matched, in one snapshot") {
    dropNs("rl2")
    spark.sql("CREATE TABLE snap.rl2.t AS SELECT id AS k, CAST(id AS DOUBLE) AS v FROM range(0, 10)")
    Seq((5L, 500.0), (7L, 700.0), (42L, 4200.0))
      .toDF("k", "v").createOrReplaceTempView("rl2_src")

    spark.sql(
      """MERGE INTO snap.rl2.t AS t USING rl2_src AS s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)

    val t = spark.table("snap.rl2.t").as[(Long, Double)].collect().toMap
    assert(t.size === 11)
    assert(t(5L) === 500.0 && t(7L) === 700.0 && t(42L) === 4200.0)
    assert(t(3L) === 3.0)
    val root = s"$wh/rl2/t"
    assert(SnapshotLog.snapshots(spark, root).last.operation === "merge")
    // the whole statement was ONE snapshot: exactly one version past CTAS
    assert(SnapshotLog.snapshots(spark, root).map(_.version).max === 3)
  }

  test("MERGE with delete clause and null-safe source handling") {
    dropNs("rl3")
    spark.sql("CREATE TABLE snap.rl3.t AS SELECT id AS k, CAST(id AS DOUBLE) AS v FROM range(0, 10)")
    Seq(2L, 4L).toDF("k").createOrReplaceTempView("rl3_del")
    spark.sql(
      """MERGE INTO snap.rl3.t AS t USING rl3_del AS s ON t.k = s.k
        |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(spark.table("snap.rl3.t").select("k").as[Long].collect().sorted
      === Array(0L, 1L, 3L, 5L, 6L, 7L, 8L, 9L))
  }

  test("MERGE runtime group filtering: only files holding touched keys are rewritten") {
    dropNs("rl5")
    // three disjoint key slices, 2 files each; no static MERGE condition
    // could prune them — only the RUNTIME filter over the source's keys can
    spark.sql("CREATE TABLE snap.rl5.t AS SELECT id AS k, CAST(id AS DOUBLE) AS v FROM range(0, 100)")
    spark.sql("INSERT INTO snap.rl5.t SELECT id, CAST(id AS DOUBLE) FROM range(100, 200)")
    spark.sql("INSERT INTO snap.rl5.t SELECT id, CAST(id AS DOUBLE) FROM range(200, 300)")
    val root = s"$wh/rl5/t"
    val before = SnapshotLog.snapshots(spark, root).last

    // source touches ONLY middle-slice keys
    spark.range(120, 140).selectExpr("id AS k", "CAST(9999 AS DOUBLE) AS v")
      .createOrReplaceTempView("rl5_src")
    spark.sql(
      """MERGE INTO snap.rl5.t AS t USING rl5_src AS s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)

    val after = SnapshotLog.snapshots(spark, root).last
    assert(after.operation === "merge")
    val beforeSet = before.files.map(graftNorm).toSet
    val carried = after.files.map(graftNorm).count(beforeSet.contains)
    assert(carried >= 4,
      s"runtime group filtering should carry the untouched slices: $carried carried")
    val t = spark.table("snap.rl5.t")
    assert(t.count() === 300)
    assert(t.filter($"v" === 9999.0).count() === 20)
    assert(t.filter($"k" < 100 && $"v" =!= $"k".cast("double")).count() === 0)
  }

  test("_file metadata column is selectable and names the row's data file") {
    dropNs("rl6")
    spark.sql("CREATE TABLE snap.rl6.t AS SELECT id AS k FROM range(0, 10)")
    spark.sql("INSERT INTO snap.rl6.t SELECT id FROM range(10, 20)")
    val root = s"$wh/rl6/t"
    val files = SnapshotLog.snapshots(spark, root).last.files.map(graftNorm).toSet
    val perFile = spark.sql("SELECT _file, count(*) AS n FROM snap.rl6.t GROUP BY _file")
      .collect().map(r => (graftNorm(r.getString(0)), r.getLong(1))).toMap
    assert(perFile.keySet === files)
    assert(perFile.values.sum === 20L)
    // _file pairs with data columns row-accurately
    val k5 = spark.sql("SELECT _file FROM snap.rl6.t WHERE k = 5").collect()
    assert(k5.length === 1 && files.contains(graftNorm(k5.head.getString(0))))
  }

  test("timestamp and string columns round-trip through the replace writer") {
    dropNs("rl4")
    spark.sql(
      """CREATE TABLE snap.rl4.t AS
        |SELECT id AS k, CONCAT('name_', id) AS s,
        |       TIMESTAMP_NTZ '2024-03-01 10:00:00' + make_interval(0,0,0,0,0,0,id) AS ts
        |FROM range(0, 6)""".stripMargin)
    spark.sql("UPDATE snap.rl4.t SET s = CONCAT(s, '!') WHERE k % 2 = 0")
    val rows = spark.table("snap.rl4.t").orderBy("k")
      .select("s", "ts").collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("name_0!", "name_1", "name_2!", "name_3", "name_4!", "name_5"))
    // timestamps preserved exactly (INT64 µs round-trip)
    assert(rows.map(_.get(1).toString).head === "2024-03-01T10:00")
    // stats survive for later pruning: the update snapshot re-recorded
    // footer stats for the rewritten file
    val root = s"$wh/rl4/t"
    val snap = SnapshotLog.snapshots(spark, root).last
    assert(snap.stats.nonEmpty &&
      snap.files.forall(f => snap.stats.contains(graftNorm(f))))
  }
}
