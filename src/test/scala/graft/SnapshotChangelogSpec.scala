package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark
import graft.sources.SnapshotLog

/** CDC changelog ([[SnapshotLog.changes]]): net row-level change rows
  * between versions — Iceberg create_changelog_view / Delta CDF analog.
  * Pins the per-operation contract (append = inserts, MoR delete =
  * deletes, update = delete+insert pairs, compaction = NOTHING), the
  * touched-files-only cost model's correctness consequences (untouched
  * rows never appear), range bounds, the from=0 genesis read, and
  * schema evolution across the range. */
class SnapshotChangelogSpec extends AnyFunSuite {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val root = s"/tmp/graft_changelog_spec/$tag"
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(root), true)
    root
  }

  /** v1 overwrite evens 0..99, v2 append odds, v3 MoR-delete k%10==3,
    * v4 update k%10==6 (v := v+100), v5 compaction. */
  private lazy val root5: String = {
    val root = freshRoot("mixed")
    val df = spark.range(0, 100).selectExpr("id AS k", "id * 2 AS v")
    SnapshotLog.commit(df.filter($"k" % 2 === 0), root, overwrite = true, 1000L)
    SnapshotLog.commit(df.filter($"k" % 2 === 1), root, overwrite = false, 2000L)
    SnapshotLog.deleteWhereMoR(spark, root, col("k") % 10 === 3, 3000L)
    SnapshotLog.updateWhereMoR(spark, root, col("k") % 10 === 6,
      Map("v" -> (col("v") + 100)), 4000L)
    SnapshotLog.rewriteDataFiles(spark, root, commitTsMs = 5000L,
      targetBytes = 1L << 30)
    root
  }

  test("append transition emits exactly the appended rows as inserts") {
    val ch = SnapshotLog.changes(spark, root5, fromVersion = 1,
      toVersion = Some(2)).collect()
    assert(ch.forall(_.getAs[String]("_change_type") == "insert"))
    assert(ch.forall(_.getAs[Int]("_commit_version") == 2))
    assert(ch.forall(_.getAs[Long]("_commit_ts_ms") == 2000L))
    assert(ch.map(_.getAs[Long]("k")).sorted.toSeq ==
      (1L until 100L by 2).toSeq)
  }

  test("MoR delete emits exactly the suppressed rows as deletes") {
    val ch = SnapshotLog.changes(spark, root5, fromVersion = 2,
      toVersion = Some(3)).collect()
    assert(ch.forall(_.getAs[String]("_change_type") == "delete"))
    assert(ch.map(_.getAs[Long]("k")).sorted.toSeq ==
      (0L until 100L).filter(_ % 10 == 3).toSeq)
  }

  test("update emits a delete+insert pair per matched row, values exact") {
    val ch = SnapshotLog.changes(spark, root5, fromVersion = 3,
      toVersion = Some(4))
      .select("k", "v", "_change_type").as[(Long, Long, String)]
      .collect().toSet
    val matched = (0L until 100L).filter(_ % 10 == 6)
    val expect = matched.map(k => (k, k * 2, "delete")).toSet ++
      matched.map(k => (k, k * 2 + 100, "insert")).toSet
    assert(ch == expect)
  }

  test("compaction emits nothing (rewrite snapshots are skipped wholesale)") {
    assert(SnapshotLog.changes(spark, root5, fromVersion = 4).isEmpty)
  }

  test("full range composes per-transition slices; net state reconciles") {
    val ch = SnapshotLog.changes(spark, root5, fromVersion = 1)
    // replaying the changelog on top of v1 must yield the v5 table
    val v1 = SnapshotLog.read(spark, root5, asOfVersion = Some(1))
      .select("k", "v").as[(Long, Long)].collect().toBuffer
    ch.select("k", "v", "_change_type", "_commit_version")
      .as[(Long, Long, String, Int)].collect()
      .sortBy(_._4).foreach {
        case (k, v, "insert", _) => v1 += ((k, v))
        case (k, v, "delete", _) =>
          val i = v1.indexOf((k, v)); assert(i >= 0); v1.remove(i): Unit
        case other => fail(s"unexpected change row $other")
      }
    val now = SnapshotLog.read(spark, root5).select("k", "v")
      .as[(Long, Long)].collect()
    assert(v1.sorted.toSeq == now.sorted.toSeq)
  }

  test("fromVersion 0 reads genesis as inserts") {
    val ch = SnapshotLog.changes(spark, root5, fromVersion = 0,
      toVersion = Some(1)).collect()
    assert(ch.forall(r => r.getAs[String]("_change_type") == "insert" &&
      r.getAs[Int]("_commit_version") == 1))
    assert(ch.map(_.getAs[Long]("k")).sorted.toSeq ==
      (0L until 100L by 2).toSeq)
  }

  test("empty range returns an empty frame with the changelog schema") {
    val ch = SnapshotLog.changes(spark, root5, fromVersion = 5)
    assert(ch.isEmpty)
    assert(ch.columns.takeRight(3).toSeq ==
      Seq("_change_type", "_commit_version", "_commit_ts_ms"))
  }

  test("schema added mid-range: earlier transitions null-fill, output " +
    "carries the end-of-range schema") {
    val root = freshRoot("evolve")
    SnapshotLog.commit(spark.range(0, 10).selectExpr("id AS k"), root,
      overwrite = true, 1000L)
    SnapshotLog.commit(
      spark.range(10, 20).selectExpr("id AS k", "id * 3 AS extra"), root,
      overwrite = false, 2000L)
    val ch = SnapshotLog.changes(spark, root, fromVersion = 0)
    assert(ch.columns.take(2).toSeq == Seq("k", "extra"))
    val rows = ch.select("k", "extra", "_commit_version")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getInt(2)))
    assert(rows.filter(_._3 == 1).forall(_._2.isEmpty))
    assert(rows.filter(_._3 == 2).forall(r => r._2.contains(r._1 * 3)))
    assert(rows.length == 20)
  }

  test("rename mid-range: earlier transitions resolve through field ids, " +
    "not null-fill") {
    val root = freshRoot("rename")
    SnapshotLog.commit(spark.range(0, 10).selectExpr("id AS k", "id * 2 AS v"),
      root, overwrite = true, 1000L)
    SnapshotLog.renameColumn(spark, root, "v", "w", 2000L)
    SnapshotLog.deleteWhereMoR(spark, root, col("k") === 5, 3000L)
    val ch = SnapshotLog.changes(spark, root, fromVersion = 0)
    assert(ch.columns.take(2).toSeq == Seq("k", "w"))
    val rows = ch.select("k", "w", "_change_type", "_commit_version")
      .as[(Long, Long, String, Int)].collect().toSet
    // v1 inserts carry the ORIGINAL v values under the new name (field-id
    // resolution); the rename snapshot itself (no touched files) is silent
    val expect = (0L until 10L).map(k => (k, k * 2, "insert", 1)).toSet +
      ((5L, 10L, "delete", 3))
    assert(rows == expect)
  }

  test("hidden-partitioned table: changelog reads partitioned files") {
    val root = freshRoot("parts")
    val df = spark.range(0, 40).selectExpr("id AS k", "id % 4 AS seg")
    SnapshotLog.commitPartitioned(df, root,
      Seq(("seg", "identity")), overwrite = true, 1000L)
    SnapshotLog.commitPartitioned(
      spark.range(40, 50).selectExpr("id AS k", "id % 4 AS seg"), root,
      Seq(("seg", "identity")), overwrite = false, 2000L)
    val ch = SnapshotLog.changes(spark, root, fromVersion = 1)
    assert(ch.select("k").as[Long].collect().sorted.toSeq ==
      (40L until 50L).toSeq)
    assert(ch.select("seg").as[Long].collect().toSet == Set(0L, 1L, 2L, 3L))
  }

  test("CALL snap.system.create_changelog_view registers a SQL-queryable " +
    "changelog view") {
    val wh = "/tmp/graft_snap_warehouse"
    val p = new Path(s"$wh/chgproc")
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    spark.sql(
      "CREATE TABLE snap.chgproc.t AS SELECT id AS k, id * 2 AS v FROM range(10)")
    spark.sql("INSERT INTO snap.chgproc.t SELECT id AS k, 0 AS v FROM range(100, 103)")
    // SQL CTAS = v1 "create" (0 files) + v2 data append; INSERT = v3
    val res = spark.sql(
      "CALL snap.system.create_changelog_view(table => 'chgproc.t', " +
        "from_version => 2)").collect().head
    assert(res.getString(0) == "t_changes")
    val rows = spark.sql(
      "SELECT k, _change_type, _commit_version FROM t_changes ORDER BY k")
      .as[(Long, String, Int)].collect().toSeq
    assert(rows == (100L until 103L).map(k => (k, "insert", 3)))
    // explicit view name + full history
    spark.sql(
      "CALL snap.system.create_changelog_view(table => 'chgproc.t', " +
        "view_name => 'all_changes')")
    assert(spark.table("all_changes").count() === 13)
    // net_changes through SQL: delete some of v2's rows, then the net
    // view cancels them while the plain view shows both sides
    SnapshotLog.deleteWhereMoR(spark, s"$wh/chgproc/t", col("k") < 3,
      System.currentTimeMillis()) // SQL CTAS committed at wall-clock ts
    spark.sql(
      "CALL snap.system.create_changelog_view(table => 'chgproc.t', " +
        "view_name => 'net_changes', net_changes => true)")
    val net = spark.table("net_changes")
      .select("k", "_change_type").as[(Long, String)].collect().toSet
    assert(net === ((3L until 10L).map(k => (k, "insert")).toSet ++
      (100L until 103L).map(k => (k, "insert")).toSet),
      "rows inserted then deleted inside the range must cancel in the net view")
  }

  test("upsert surfaces as deletes of old images plus inserts of the batch") {
    val root = freshRoot("upsert")
    val df = spark.range(0, 20).selectExpr("id AS k", "id AS v")
    SnapshotLog.commit(df, root, overwrite = true, 1000L)
    val batch = spark.range(15, 25).selectExpr("id AS k", "id + 1000 AS v")
    SnapshotLog.upsertEqualityMoR(spark, root, batch, Seq("k"), 2000L)
    val ch = SnapshotLog.changes(spark, root, fromVersion = 1)
      .select("k", "v", "_change_type").as[(Long, Long, String)]
      .collect().toSet
    val expect =
      (15L until 20L).map(k => (k, k, "delete")).toSet ++
        (15L until 25L).map(k => (k, k + 1000, "insert")).toSet
    assert(ch == expect)
  }

  test("net_changes collapses intermediate churn to the range's net diff") {
    val root = freshRoot("net")
    val df = spark.range(0, 30).selectExpr("id AS k", "id AS v")
    SnapshotLog.commit(df, root, overwrite = true, 1000L)               // v1
    // k<10: updated twice (v -> v+1 -> v+2): net = one delete(old) +
    // one insert(final); k in [20,30): deleted entirely: net = deletes;
    // k in [10,20): untouched: net = NOTHING
    SnapshotLog.updateWhereMoR(spark, root, col("k") < 10,
      Map("v" -> (col("v") + 1)), 2000L)                                // v2
    SnapshotLog.updateWhereMoR(spark, root, col("k") < 10,
      Map("v" -> (col("v") + 1)), 3000L)                                // v3
    SnapshotLog.deleteWhereMoR(spark, root, col("k") >= 20, 4000L)      // v4
    val net = SnapshotLog.changes(spark, root, fromVersion = 1,
      netChanges = true)
      .select("k", "v", "_change_type", "_commit_version")
      .as[(Long, Long, String, Int)].collect().toSet
    val expect =
      (0L until 10L).map(k => (k, k, "delete", 2)).toSet ++        // old image
        (0L until 10L).map(k => (k, k + 2, "insert", 3)).toSet ++  // final image
        (20L until 30L).map(k => (k, k, "delete", 4)).toSet
    assert(net === expect)
    // intermediate image (v+1) appears nowhere
    assert(!net.exists { case (k, v, _, _) => k < 10 && v == k + 1 })
    // the per-transition changelog DOES carry the intermediate image
    val full = SnapshotLog.changes(spark, root, fromVersion = 1)
    assert(full.filter(col("v") === col("k") + 1).count() > 0)
  }

  test("a user column literally named __tag survives the netting machinery") {
    val root = freshRoot("tagcol")
    val df = spark.range(0, 8).selectExpr("id AS k", "id * 10 AS __tag")
    SnapshotLog.commit(df, root, overwrite = true, 1000L)
    SnapshotLog.commit(
      spark.range(8, 12).selectExpr("id AS k", "id * 10 AS __tag"),
      root, overwrite = false, 2000L)
    val ch = SnapshotLog.changes(spark, root, fromVersion = 0)
      .select("k", "__tag", "_change_type").as[(Long, Long, String)]
      .collect().toSet
    assert(ch === (0L until 12L).map(k => (k, k * 10, "insert")).toSet,
      "__tag data values must pass through, not be overwritten by the tag")
  }

  test("net_changes: rows merely CARRIED through a sibling-row DML keep " +
    "the version that actually changed them") {
    val root = freshRoot("net_carry")
    // one file holds k 0..9; v2 MoR-deletes only the odd half — the even
    // half re-reads as a +1/-1 carried pair at v2 and must still report
    // _commit_version = 1 in the net view
    SnapshotLog.commit(
      spark.range(0, 10).selectExpr("id AS k", "id AS v").repartition(1),
      root, overwrite = true, 1000L, numFiles = 1)
    SnapshotLog.deleteWhereMoR(spark, root, col("k") % 2 === 1, 2000L)
    val net = SnapshotLog.changes(spark, root, fromVersion = 0,
      netChanges = true)
      .select("k", "_change_type", "_commit_version")
      .as[(Long, String, Int)].collect().toSet
    assert(net === (0L until 10L by 2).map(k => (k, "insert", 1)).toSet,
      "carried rows must keep the inserting version, not the file-touch version")
  }

  test("dropping an equality-delete KEY column refuses (the delete would " +
    "detach); compaction folds the deletes and then the drop lands") {
    val root = freshRoot("dropkey")
    SnapshotLog.commit(
      spark.range(0, 10).selectExpr("id AS k", "id AS v", "id % 3 AS x"),
      root, overwrite = true, 1000L)
    SnapshotLog.upsertEqualityMoR(spark, root,
      spark.range(0, 2).selectExpr("id AS k", "id + 50 AS v", "id % 3 AS x"),
      Seq("k"), 2000L)
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.dropColumn(spark, root, "k", 3000L)
    }
    assert(e.getMessage.contains("equality delete"))
    SnapshotLog.rewriteDataFiles(spark, root, commitTsMs = 4000L,
      targetBytes = 1L << 30)
    SnapshotLog.dropColumn(spark, root, "x", 5000L) // folds away, drop ok
    assert(SnapshotLog.read(spark, root).columns.toSeq == Seq("k", "v"))
  }

  test("net_changes: a row inserted then deleted inside the range vanishes") {
    val root = freshRoot("net_cancel")
    SnapshotLog.commit(
      spark.range(0, 5).selectExpr("id AS k", "id AS v"),
      root, overwrite = true, 1000L)
    SnapshotLog.commit(
      spark.range(5, 10).selectExpr("id AS k", "id AS v"),
      root, overwrite = false, 2000L)
    SnapshotLog.deleteWhereMoR(spark, root, col("k") >= 5, 3000L)
    val net = SnapshotLog.changes(spark, root, fromVersion = 1,
      netChanges = true).collect()
    assert(net.isEmpty,
      s"insert+delete inside the range must cancel: ${net.mkString(",")}")
  }

  test("column-reordered append: recorded schema keeps table order, so " +
    "the pre-ALTER positional fid bootstrap never swaps column values") {
    val root = freshRoot("reorder")
    val df = spark.range(0, 10).selectExpr("id AS k", "id * 2 AS v")
    SnapshotLog.commit(df, root, overwrite = true, 1000L)
    // a writer's projection order is not a schema change (Iceberg:
    // writers conform to the table schema) — append (v, k)
    val df2 = spark.range(10, 20).selectExpr("id * 2 AS v", "id AS k")
    SnapshotLog.commit(df2, root, overwrite = false, 2000L)
    val head = SnapshotLog.snapshots(spark, root).last
    assert(head.schema.fieldNames.toSeq == Seq("k", "v"),
      "append must record existing columns in the parent's order")
    // the changelog conforms v1 rows through positional fids — with a
    // reordered recorded schema those ids would swap k and v
    val ch = SnapshotLog.changes(spark, root, fromVersion = 0)
      .select("k", "v").as[(Long, Long)].collect().toSet
    assert(ch == (0L until 20L).map(k => (k, k * 2)).toSet)
    // and the table read itself stays sound
    val all = SnapshotLog.read(spark, root)
      .select("k", "v").as[(Long, Long)].collect().toSet
    assert(all == (0L until 20L).map(k => (k, k * 2)).toSet)
  }

  test("empty version range returns the schema AT toVersion, not the " +
    "head's (a later-added column must not leak into a bounded batch)") {
    val root = freshRoot("emptyrange")
    val df = spark.range(0, 5).selectExpr("id AS k", "id AS v")
    SnapshotLog.commit(df, root, overwrite = true, 1000L)
    val wide = spark.range(5, 10).selectExpr(
      "id AS k", "id AS v", "id AS extra")
    SnapshotLog.commit(wide, root, overwrite = false, 2000L)
    val empty = SnapshotLog.changes(spark, root, fromVersion = 1,
      toVersion = Some(1))
    assert(empty.isEmpty)
    assert(empty.schema.fieldNames.toSeq ==
      Seq("k", "v", "_change_type", "_commit_version", "_commit_ts_ms"))
  }

  test("compute_updates pairs each version's delete+insert of a key into " +
       "update_preimage/update_postimage; unpaired rows keep their tags") {
    val ch = SnapshotLog.changes(spark, root5, fromVersion = 1,
      identifierCols = Seq("k")).collect()
    // v2 appends: pure inserts (no delete to pair)
    val v2 = ch.filter(_.getAs[Int]("_commit_version") == 2)
    assert(v2.forall(_.getAs[String]("_change_type") == "insert"))
    assert(v2.length === 50)
    // v3 deletes: pure deletes
    val v3 = ch.filter(_.getAs[Int]("_commit_version") == 3)
    assert(v3.forall(_.getAs[String]("_change_type") == "delete"))
    assert(v3.map(_.getAs[Long]("k")).forall(_ % 10 == 3))
    // v4 update (k%10==6, v := v+100): every row paired, pre/post exact
    val v4 = ch.filter(_.getAs[Int]("_commit_version") == 4)
    assert(v4.nonEmpty)
    val byK = v4.groupBy(_.getAs[Long]("k"))
    byK.foreach { case (k, rows) =>
      assert(k % 10 === 6)
      assert(rows.map(_.getAs[String]("_change_type")).sorted.toSeq ===
        Seq("update_postimage", "update_preimage"))
      val pre = rows.find(_.getAs[String]("_change_type") == "update_preimage").get
      val post = rows.find(_.getAs[String]("_change_type") == "update_postimage").get
      assert(pre.getAs[Long]("v") === k * 2)
      assert(post.getAs[Long]("v") === k * 2 + 100)
    }
    // schema: same column set as the plain changelog
    assert(SnapshotLog.changes(spark, root5, 1, identifierCols = Seq("k"))
      .schema.fieldNames.toSeq ===
      Seq("k", "v", "_change_type", "_commit_version", "_commit_ts_ms"))
    // total row count preserved: pairing retags, never drops/duplicates
    assert(ch.length ===
      SnapshotLog.changes(spark, root5, fromVersion = 1).count())
  }

  test("compute_updates raises on ambiguous identifiers (two rows share a " +
       "key within one version) instead of guessing pairs") {
    val root = freshRoot("dup_ids")
    val df = spark.range(0, 10).selectExpr("id % 5 AS k", "id AS v") // dup keys
    SnapshotLog.commit(df, root, overwrite = true, 1000L)
    SnapshotLog.deleteWhereMoR(spark, root, col("k") === 2, 2000L) // 2 dels of k=2
    val e = intercept[Exception] {
      SnapshotLog.changes(spark, root, fromVersion = 1,
        identifierCols = Seq("k")).collect()
    }
    assert(e.getMessage.contains("multiple rows share identifier") ||
      Option(e.getCause).exists(_.getMessage.contains(
        "multiple rows share identifier")), s"got: ${e.getMessage}")
  }

  test("compute_updates composes with net_changes refusal and bad columns") {
    intercept[IllegalArgumentException] {
      SnapshotLog.changes(spark, root5, 1, netChanges = true,
        identifierCols = Seq("k"))
    }
    intercept[IllegalArgumentException] {
      SnapshotLog.changes(spark, root5, 1,
        identifierCols = Seq("no_such_col")).collect()
    }
  }

  test("create_changelog_view with identifier_columns yields update images " +
       "through SQL") {
    val wh = "/tmp/graft_snap_warehouse"
    val ns = "chgupd"
    val fs = new Path(s"$wh/$ns").getFileSystem(
      spark.sessionState.newHadoopConf())
    fs.delete(new Path(s"$wh/$ns"), true)
    spark.sql(s"DROP TABLE IF EXISTS snap.$ns.t")
    spark.sql(s"CREATE TABLE snap.$ns.t AS SELECT id AS k, id * 2 AS v " +
      "FROM range(0, 50)")
    spark.sql(s"UPDATE snap.$ns.t SET v = v + 1000 WHERE k % 7 = 0")
    // the UPDATE is the head version; scope the view to just it (CTAS
    // itself may land as more than one snapshot)
    val head = SnapshotLog.snapshots(spark, s"$wh/$ns/t").last.version
    val view = spark.sql(
      s"""CALL snap.system.create_changelog_view(
         |  table => '$ns.t', from_version => ${head - 1},
         |  identifier_columns => 'k')""".stripMargin)
      .head().getString(0)
    val out = spark.table(view)
      .groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nUpd = (0L until 50L).count(_ % 7 == 0)
    assert(out === Map("update_preimage" -> nUpd,
      "update_postimage" -> nUpd))
    // pre/post values exact through SQL
    val sums = spark.sql(
      s"""SELECT _change_type, CAST(sum(v) AS BIGINT) s FROM $view
         |GROUP BY 1""".stripMargin).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keys = (0L until 50L).filter(_ % 7 == 0)
    assert(sums("update_preimage") === keys.map(_ * 2).sum)
    assert(sums("update_postimage") === keys.map(_ * 2 + 1000).sum)
  }
}
