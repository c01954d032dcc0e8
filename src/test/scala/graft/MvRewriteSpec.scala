package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark
import graft.operators.IncrementalMv
import graft.sources.SnapshotLog

/** Transparent MV rewrite (plans/MvRewriteRule): a query re-stating a
  * registered MV's defining aggregate over the base snapshot table is
  * served from the maintained MV — exactly when the base relation's
  * pinned version equals the MV's applied watermark. */
class MvRewriteSpec extends AnyFunSuite {
  import spark.implicits._

  private def fresh(name: String): String = {
    val root = s"/tmp/graft_mvrw/$name"
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(root), true)
    fs.delete(new Path(s"/tmp/graft_snap_warehouse/mvrw_$name"), true)
    root
  }

  private def base(n: Long): DataFrame =
    spark.range(0, n).selectExpr("id AS k", "cast(id % 7 AS int) AS grp",
      "id * 2 AS v")

  private def defAgg(root: String): DataFrame =
    spark.read.format("snapshotlog").load(root)
      .groupBy(col("grp")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))

  private def servedByMv(df: DataFrame, ns: String): Boolean = {
    val noAgg = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.isEmpty
    val mvScan = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
          if r.relation.table.name().contains(ns) => r
    }.nonEmpty
    noAgg && mvScan
  }

  /** Rollup serving keeps an Aggregate (the re-aggregation) but must scan
    * ONLY the MV — the base relation disappears from the plan. */
  private def rolledUpFromMv(df: DataFrame, ns: String): Boolean = {
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
        => r.relation.table.name()
    }
    scans.nonEmpty && scans.forall(_.contains(ns))
  }

  test("fresh MV serves the defining aggregate; results identical") {
    val root = fresh("basic")
    SnapshotLog.commit(base(1000), root, overwrite = true, 1000L)
    IncrementalMv.create(spark, root, "mvrw_basic.mv", "grp", "v")
    try {
      val q = defAgg(root)
      assert(servedByMv(q, "mvrw_basic"), q.queryExecution.optimizedPlan.toString)
      val got = q.as[(Int, Long, Long)].collect().toSet
      val want = (0 until 7).map { g =>
        val ks = (0L until 1000L).filter(_ % 7 == g)
        (g, ks.size.toLong, ks.map(_ * 2).sum)
      }.toSet
      assert(got === want)
    } finally IncrementalMv.unregister(spark, root)
  }

  test("stale MV leaves the aggregate alone; maintain() re-arms it") {
    val root = fresh("stale")
    SnapshotLog.commit(base(500), root, overwrite = true, 1000L)
    IncrementalMv.create(spark, root, "mvrw_stale.mv", "grp", "v")
    try {
      SnapshotLog.commit(base(500).filter(col("k") < 10), root,
        overwrite = false, 2000L)
      val q1 = defAgg(root)
      assert(!servedByMv(q1, "mvrw_stale"),
        "a base commit past the watermark must disable the rewrite")
      // and the un-rewritten result is the TRUE current aggregate
      assert(q1.filter(col("grp") === 0).select("n").as[Long].head() ===
        (0L until 500L).count(_ % 7 == 0) + 2) // k=0 and k=7 re-appended
      IncrementalMv.maintain(spark, root, "mvrw_stale.mv", "grp", "v")
      val q2 = defAgg(root)
      assert(servedByMv(q2, "mvrw_stale"), "maintained to head ⇒ rewrite")
      assert(q2.filter(col("grp") === 0).select("n").as[Long].head() ===
        (0L until 500L).count(_ % 7 == 0) + 2)
    } finally IncrementalMv.unregister(spark, root)
  }

  test("non-defining shapes never rewrite: filter, extra agg, other group") {
    val root = fresh("shapes")
    SnapshotLog.commit(base(300), root, overwrite = true, 1000L)
    IncrementalMv.create(spark, root, "mvrw_shapes.mv", "grp", "v")
    try {
      val t = spark.read.format("snapshotlog").load(root)
      val withFilter = t.filter(col("v") > 100)
        .groupBy(col("grp")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      val withMax = t.groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), max(col("v")).as("m"))
      val otherKey = t.groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      val sumOther = t.groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("s"))
      for (q <- Seq(withFilter, withMax, otherKey, sumOther))
        assert(!servedByMv(q, "mvrw_shapes"),
          q.queryExecution.optimizedPlan.toString)
      // and they still compute correctly (rule must be a no-op, not a bug)
      assert(withMax.count() === 7)
    } finally IncrementalMv.unregister(spark, root)
  }

  test("rewritten output attributes re-bind in parent operators") {
    val root = fresh("parents")
    SnapshotLog.commit(base(700), root, overwrite = true, 1000L)
    IncrementalMv.create(spark, root, "mvrw_parents.mv", "grp", "v")
    try {
      val q = defAgg(root).filter(col("n") > 99L)
        .orderBy(col("s").desc).select(col("grp"), col("s"))
      assert(servedByMv(q, "mvrw_parents"))
      val got = q.as[(Int, Long)].collect().toSeq
      val want = (0 until 7).map { g =>
        val ks = (0L until 700L).filter(_ % 7 == g)
        (g, ks.map(_ * 2).sum, ks.size)
      }.filter(_._3 > 99).sortBy(-_._2).map(t => (t._1, t._2))
      assert(got === want)
    } finally IncrementalMv.unregister(spark, root)
  }

  test("conf kill-switch and unregistration both disable the rewrite") {
    val root = fresh("conf")
    SnapshotLog.commit(base(200), root, overwrite = true, 1000L)
    IncrementalMv.create(spark, root, "mvrw_conf.mv", "grp", "v")
    try {
      spark.conf.set("spark.graft.mv.autoRewrite", "false")
      try assert(!servedByMv(defAgg(root), "mvrw_conf"))
      finally spark.conf.unset("spark.graft.mv.autoRewrite")
      assert(servedByMv(defAgg(root), "mvrw_conf"))
      IncrementalMv.unregister(spark, root)
      assert(!servedByMv(defAgg(root), "mvrw_conf"))
    } finally IncrementalMv.unregister(spark, root)
  }

  test("registration is durable: a fresh process re-hydrates from the " +
       "base table's properties") {
    val root = fresh("durable")
    SnapshotLog.commit(base(300), root, overwrite = true, 1000L)
    IncrementalMv.create(spark, root, "mvrw_durable.mv", "grp", "v")
    try {
      IncrementalMv.forgetInMemory() // simulate a new JVM
      assert(servedByMv(defAgg(root), "mvrw_durable"),
        "the base props must re-arm the rewrite without re-registering")
      // durable unregistration survives the same way
      IncrementalMv.unregister(spark, root)
      IncrementalMv.forgetInMemory()
      assert(!servedByMv(defAgg(root), "mvrw_durable"))
    } finally IncrementalMv.unregister(spark, root)
  }

  test("multi-column group keys rewrite in any grouping order") {
    val root = fresh("multi")
    SnapshotLog.commit(
      spark.range(0, 2000).selectExpr("id AS k",
        "cast(id % 5 AS int) AS day", "cast(id % 3 AS int) AS cc",
        "id * 2 AS v"),
      root, overwrite = true, 1000L)
    IncrementalMv.create(spark, root, "mvrw_multi.mv", Seq("day", "cc"), "v")
    try {
      val t = spark.read.format("snapshotlog").load(root)
      val q1 = t.groupBy(col("day"), col("cc"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      val q2 = t.groupBy(col("cc"), col("day"))
        .agg(sum(col("v")).as("s"))
      assert(servedByMv(q1, "mvrw_multi"))
      assert(servedByMv(q2, "mvrw_multi"),
        "grouping order must not matter")
      val want = (0L until 2000L).groupBy(i => (i % 5, i % 3))
        .map { case ((d, c), is) =>
          (d.toInt, c.toInt, is.size.toLong, is.map(_ * 2).sum) }.toSet
      assert(q1.as[(Int, Int, Long, Long)].collect().toSet === want)
      // a subset of the group columns ROLLS UP over the MV (r18): the
      // plan keeps a (re-)Aggregate but scans only the MV relation
      val q3 = t.groupBy(col("day"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      assert(rolledUpFromMv(q3, "mvrw_multi"),
        q3.queryExecution.optimizedPlan.toString)
      val want3 = (0L until 2000L).groupBy(_ % 5).map { case (d, is) =>
        (d.toInt, is.size.toLong, is.map(_ * 2).sum) }.toSet
      assert(q3.as[(Int, Long, Long)].collect().toSet === want3)
    } finally IncrementalMv.unregister(spark, root)
  }

  test("SQL null semantics survive the rewrite: sum/avg/count(v) over " +
       "null values, and a NULL group key maintains as ONE group") {
    val root = fresh("nullsem")
    // grp 0: mixed null/non-null v; grp 1: ALL null v; grp NULL: values
    SnapshotLog.commit(
      spark.range(0, 300).selectExpr(
        "CASE WHEN id % 10 = 9 THEN NULL ELSE cast(id % 2 AS int) END AS grp",
        "CASE WHEN id % 2 = 1 THEN NULL ELSE id END AS v"),
      root, overwrite = true, 1000L)
    IncrementalMv.create(spark, root, "mvrw_nullsem.mv", "grp", "v")
    try {
      def agg(t: org.apache.spark.sql.DataFrame) =
        t.groupBy(col("grp")).agg(count(lit(1)).as("n"),
          count(col("v")).as("nv"), sum(col("v")).as("s"),
          avg(col("v")).as("a"))
      val t = spark.read.format("snapshotlog").load(root)
      val q = agg(t)
      assert(servedByMv(q, "mvrw_nullsem"))
      val got = q.collect().map(r => (Option(r.get(0)), r.getLong(1),
        r.getLong(2), Option(r.get(3)), Option(r.get(4)))).toSet
      // ground truth with the rewrite off
      spark.conf.set("spark.graft.mv.autoRewrite", "false")
      val want = try agg(t).collect().map(r => (Option(r.get(0)),
        r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4)))).toSet
      finally spark.conf.unset("spark.graft.mv.autoRewrite")
      assert(got === want,
        s"rewritten null semantics must match the direct aggregate")
      // all-null group: sum and avg NULL, count(v) 0 — really exercised?
      assert(want.exists { case (g, _, nv, s, a) =>
        g.contains(1) && nv == 0L && s.isEmpty && a.isEmpty })
      // DML touching the NULL group must UPDATE it, not duplicate it
      SnapshotLog.commit(
        spark.range(1000, 1010).selectExpr(
          "CAST(NULL AS INT) AS grp", "id AS v"),
        root, overwrite = false, 2000L)
      IncrementalMv.maintain(spark, root, "mvrw_nullsem.mv", "grp", "v")
      val q2 = agg(spark.read.format("snapshotlog").load(root))
      assert(servedByMv(q2, "mvrw_nullsem"))
      val nullRows = q2.filter(col("grp").isNull).collect()
      assert(nullRows.length === 1,
        "the NULL group must stay ONE group through the MERGE")
      assert(nullRows.head.getLong(1) === 30L + 10L) // 30 null-grp + 10 new
    } finally IncrementalMv.unregister(spark, root)
  }

  test("SQL procedures drive the whole loop: create_mv + refresh_mv") {
    val ns = "mvrw_proc"
    val root = s"/tmp/graft_snap_warehouse/$ns/base"
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(s"/tmp/graft_snap_warehouse/$ns"), true)
    spark.sql(s"DROP TABLE IF EXISTS snap.$ns.base")
    spark.sql(s"CREATE TABLE snap.$ns.base AS SELECT id AS k, " +
      "cast(id % 4 AS int) AS grp, id * 2 AS v FROM range(0, 400)")
    try {
      val created = spark.sql(
        s"CALL snap.system.create_mv('$ns.base', '$ns.mv', 'grp', 'v')")
        .collect().head
      assert(created.getString(0) === s"$ns.mv")
      spark.sql(s"INSERT INTO snap.$ns.base " +
        "SELECT id, cast(id % 4 AS int), id * 2 FROM range(400, 500)")
      val refreshed = spark.sql(
        s"CALL snap.system.refresh_mv('$ns.base')").collect().head
      assert(refreshed.getInt(1) >
        created.getInt(1), "refresh must advance the watermark")
      val q = spark.table(s"snap.$ns.base").groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      assert(servedByMv(q, s"$ns/mv"))
      assert(q.select(sum(col("n"))).as[Long].head() === 500L)
    } finally IncrementalMv.unregister(spark, root)
  }

  test("continuous maintenance: the version stream keeps the MV fresh " +
       "and the rewrite keeps firing") {
    val root = fresh("stream")
    SnapshotLog.commit(base(200), root, overwrite = true, 1000L)
    IncrementalMv.create(spark, root, "mvrw_stream.mv", "grp", "v")
    val q = graft.streaming.StreamingOps.mvMaintenanceStream(
      spark, root, "mvrw_stream.mv", Seq("grp"), "v",
      checkpoint = Some(s"/tmp/graft_mvrw/stream_ckpt_${System.nanoTime()}"))
    try {
      SnapshotLog.commit(base(200).filter(col("k") < 20), root,
        overwrite = false, 2000L)
      q.processAllAvailable()
      val served = defAgg(root)
      assert(servedByMv(served, "mvrw_stream"),
        "after the trigger the MV must be at the head again")
      assert(served.filter(col("grp") === 0).select("n").as[Long].head() ===
        (0L until 200L).count(_ % 7 == 0) + 3L) // k=0,7,14 duplicated
    } finally {
      q.stop()
      IncrementalMv.unregister(spark, root)
    }
  }

  test("filter on GROUP columns rewrites to the same filter over the MV; " +
       "mixed or non-group predicates never do") {
    val root = fresh("filt")
    SnapshotLog.commit(base(900), root, overwrite = true, 1000L)
    IncrementalMv.create(spark, root, "mvrw_filt.mv", "grp", "v")
    try {
      val t = spark.read.format("snapshotlog").load(root)
      def agg(df: DataFrame): DataFrame = df.groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      val onGroup = agg(t.filter(col("grp") >= 2 && col("grp") =!= 5))
      assert(servedByMv(onGroup, "mvrw_filt"),
        onGroup.queryExecution.optimizedPlan.toString)
      val got = onGroup.as[(Int, Long, Long)].collect().toSet
      val want = (0 until 7).filter(g => g >= 2 && g != 5).map { g =>
        val ks = (0L until 900L).filter(_ % 7 == g)
        (g, ks.size.toLong, ks.map(_ * 2).sum)
      }.toSet
      assert(got === want)
      // non-group and mixed predicates must keep aggregating the base
      val onValue = agg(t.filter(col("v") > 100))
      val mixed = agg(t.filter(col("grp") < 5 && col("v") > 100))
      val onKey = agg(t.filter(col("k") % 2 === 0))
      for (q <- Seq(onValue, mixed, onKey))
        assert(!servedByMv(q, "mvrw_filt"),
          q.queryExecution.optimizedPlan.toString)
      assert(onValue.count() === 7)
    } finally IncrementalMv.unregister(spark, root)
  }

  test("multi-measure MV: one materialization serves every count/sum/avg " +
       "combination over its measure set, null semantics per measure") {
    val root = fresh("mm")
    // v dense, w NULL on every 3rd row
    SnapshotLog.commit(
      spark.range(0, 600).selectExpr("id AS k", "cast(id % 4 AS int) AS grp",
        "id * 2 AS v",
        "CASE WHEN id % 3 = 0 THEN NULL ELSE id % 11 END AS w"),
      root, overwrite = true, 1000L)
    IncrementalMv.create(spark, root, "mvrw_mm.mv", Seq("grp"), Seq("v", "w"))
    try {
      val t = spark.read.format("snapshotlog").load(root)
      def shapes(df: DataFrame): DataFrame = df.groupBy(col("grp")).agg(
        count(lit(1)).as("n"), sum(col("v")).as("sv"), avg(col("v")).as("av"),
        count(col("w")).as("nw"), sum(col("w")).as("sw"),
        avg(col("w")).as("aw"))
      val q = shapes(t)
      assert(servedByMv(q, "mvrw_mm"), q.queryExecution.optimizedPlan.toString)
      def rows(df: DataFrame) = df.collect().map(r =>
        (r.getInt(0), r.getLong(1), Option(r.get(2)), Option(r.get(3)),
          r.getLong(4), Option(r.get(5)), Option(r.get(6)))).toSet
      val got = rows(q)
      spark.conf.set("spark.graft.mv.autoRewrite", "false")
      val want = try rows(shapes(t))
      finally spark.conf.unset("spark.graft.mv.autoRewrite")
      assert(got === want)
      // a SUBSET of the measures is served by the same MV
      val sub = t.groupBy(col("grp")).agg(sum(col("w")).as("sw"))
      assert(servedByMv(sub, "mvrw_mm"))
      // an aggregate over a NON-measure column is not
      val non = t.groupBy(col("grp")).agg(sum(col("k")).as("sk"))
      assert(!servedByMv(non, "mvrw_mm"))
      // maintenance applies per-measure deltas (delete odd keys)
      SnapshotLog.deleteWhereMoR(spark, root, col("k") % 2 === 1, 2000L)
      IncrementalMv.maintain(spark, root, "mvrw_mm.mv", Seq("grp"),
        Seq("v", "w"))
      val q2 = shapes(spark.read.format("snapshotlog").load(root))
      assert(servedByMv(q2, "mvrw_mm"))
      val got2 = rows(q2)
      spark.conf.set("spark.graft.mv.autoRewrite", "false")
      val want2 = try rows(shapes(spark.read.format("snapshotlog").load(root)))
      finally spark.conf.unset("spark.graft.mv.autoRewrite")
      assert(got2 === want2)
    } finally IncrementalMv.unregister(spark, root)
  }

  test("auto-refresh-on-stale: an opted-in MV refreshes inside the rule " +
       "and serves; the version budget and default-off are honored") {
    val root = fresh("autor")
    SnapshotLog.commit(base(400), root, overwrite = true, 1000L)
    IncrementalMv.create(spark, root, "mvrw_autor.mv", "grp", "v")
    val mvRoot = IncrementalMv.registered(root).get.mvRoot
    try {
      // default off: a stale MV leaves the aggregate alone
      SnapshotLog.commit(base(400).filter(col("k") < 10), root,
        overwrite = false, 2000L)
      assert(!servedByMv(defAgg(root), "mvrw_autor"))
      // opt in: the SAME query now refreshes-then-serves
      SnapshotLog.setTableProps(spark, mvRoot,
        Map(IncrementalMv.AutoRefreshProp -> "true"))
      val q = defAgg(root)
      assert(servedByMv(q, "mvrw_autor"),
        q.queryExecution.optimizedPlan.toString)
      assert(q.filter(col("grp") === 0).select("n").as[Long].head() ===
        (0L until 400L).count(_ % 7 == 0) + 2) // k=0, k=7 duplicated
      // and the refresh really advanced the durable watermark
      assert(IncrementalMv.appliedVersion(spark, mvRoot).contains(2))
      // budget 0: one version past the watermark is already too stale
      SnapshotLog.setTableProps(spark, mvRoot,
        Map(IncrementalMv.AutoRefreshBudgetProp -> "0"))
      SnapshotLog.commit(base(400).filter(col("k") < 3), root,
        overwrite = false, 3000L)
      assert(!servedByMv(defAgg(root), "mvrw_autor"),
        "budget 0 must refuse the optimizer-time refresh")
      assert(IncrementalMv.appliedVersion(spark, mvRoot).contains(2),
        "a refused refresh must not advance the watermark")
    } finally IncrementalMv.unregister(spark, root)
  }

  test("rollup: a coarser grouping re-aggregates the MV — counts, sums, " +
       "and the sum/count-composed avg all match the direct aggregate") {
    val root = fresh("roll")
    // two MV keys (day, cc); w NULL on every 3rd row so the rollup's
    // ignore-nulls reconstruction is really exercised; cc=2 has ALL w
    // null within day 0 (ids ≡ 0 mod 5 and ≡ 2 mod 3 and ≡ 0 mod 3 — no
    // such rows; keep it simple and just compare against the direct agg)
    SnapshotLog.commit(
      spark.range(0, 1500).selectExpr("id AS k", "cast(id % 5 AS int) AS day",
        "cast(id % 3 AS int) AS cc", "id * 2 AS v",
        "CASE WHEN id % 3 = 0 THEN NULL ELSE id % 13 END AS w"),
      root, overwrite = true, 1000L)
    IncrementalMv.create(spark, root, "mvrw_roll.mv", Seq("day", "cc"),
      Seq("v", "w"))
    try {
      val t = spark.read.format("snapshotlog").load(root)
      def shapes(df: DataFrame): DataFrame = df.groupBy(col("day")).agg(
        count(lit(1)).as("n"), sum(col("v")).as("sv"), avg(col("v")).as("av"),
        count(col("w")).as("nw"), sum(col("w")).as("sw"),
        avg(col("w")).as("aw"))
      def rows(df: DataFrame) = df.collect().map(r =>
        (r.getInt(0), r.getLong(1), Option(r.get(2)), Option(r.get(3)),
          r.getLong(4), Option(r.get(5)), Option(r.get(6)))).toSet
      val q = shapes(t)
      assert(rolledUpFromMv(q, "mvrw_roll"),
        q.queryExecution.optimizedPlan.toString)
      val got = rows(q)
      spark.conf.set("spark.graft.mv.autoRewrite", "false")
      val want = try rows(shapes(t))
      finally spark.conf.unset("spark.graft.mv.autoRewrite")
      assert(got === want,
        "rollup over the MV must be invisible in the rows — including the " +
        "sum/count-composed avg (a mean-of-means would differ here)")
      // filter on the UNQUERIED MV key commutes with grouping → serves
      val filt = t.filter(col("cc") === 1).groupBy(col("day"))
        .agg(sum(col("v")).as("sv"))
      assert(rolledUpFromMv(filt, "mvrw_roll"),
        filt.queryExecution.optimizedPlan.toString)
      val wantF = (0L until 1500L).filter(_ % 3 == 1).groupBy(_ % 5)
        .map { case (d, is) => (d.toInt, is.map(_ * 2).sum) }.toSet
      assert(filt.as[(Int, Long)].collect().toSet === wantF)
      // the GLOBAL aggregate is the full rollup
      val g = t.agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        avg(col("w")).as("aw"))
      assert(rolledUpFromMv(g, "mvrw_roll"),
        g.queryExecution.optimizedPlan.toString)
      val (gn, gsv, gaw) = g.as[(Long, Long, Double)].head()
      assert(gn === 1500L)
      assert(gsv === (0L until 1500L).map(_ * 2).sum)
      val ws = (0L until 1500L).filter(_ % 3 != 0).map(_ % 13)
      assert(math.abs(gaw - ws.sum.toDouble / ws.size) < 1e-12)
      // count(DISTINCT <unqueried MV key>) rides the rollup: the MV rows
      // enumerate the live (day, cc) groups, distinct-count collapses them
      val dcc = t.groupBy(col("day"))
        .agg(countDistinct(col("cc")).as("ncc"), sum(col("v")).as("sv"))
      assert(rolledUpFromMv(dcc, "mvrw_roll"),
        dcc.queryExecution.optimizedPlan.toString)
      val wantD = (0L until 1500L).groupBy(_ % 5).map { case (d, is) =>
        (d.toInt, is.map(_ % 3).distinct.size.toLong, is.map(_ * 2).sum) }.toSet
      assert(dcc.as[(Int, Long, Long)].collect().toSet === wantD)
      // distinct over a VALUE column or a QUERIED group column refuses
      val dv = t.groupBy(col("day")).agg(countDistinct(col("v")).as("x"))
      val dday = t.groupBy(col("day")).agg(countDistinct(col("day")).as("x"))
      for (neg0 <- Seq(dv, dday))
        assert(!rolledUpFromMv(neg0, "mvrw_roll"),
          neg0.queryExecution.optimizedPlan.toString)
      // negatives: non-MV grouping column, non-group filter, non-count/sum
      // agg, and staleness all keep the base scan
      val byK = t.groupBy(col("k")).agg(count(lit(1)).as("n"))
      val vFilt = t.filter(col("v") > 100).agg(count(lit(1)).as("n"))
      val withMax = t.groupBy(col("day")).agg(max(col("v")).as("m"))
      for (neg <- Seq(byK, vFilt, withMax))
        assert(!rolledUpFromMv(neg, "mvrw_roll"),
          neg.queryExecution.optimizedPlan.toString)
      SnapshotLog.commit(
        spark.range(0, 10).selectExpr("id AS k", "cast(0 AS int) AS day",
          "cast(0 AS int) AS cc", "id AS v", "id AS w"),
        root, overwrite = false, 2000L)
      val stale = spark.read.format("snapshotlog").load(root)
        .groupBy(col("day")).agg(count(lit(1)).as("n"))
      assert(!rolledUpFromMv(stale, "mvrw_roll"),
        "a stale MV must not serve rollups either")
      assert(stale.as[(Int, Long)].collect().toMap.apply(0) === 310L)
    } finally IncrementalMv.unregister(spark, root)
  }

  test("grouping sets / rollup / cube re-aggregate the MV through the " +
       "Expand; non-subset sets and non-servable aggs fall back") {
    val root = fresh("gsets")
    SnapshotLog.commit(
      spark.range(0, 1200).selectExpr("id AS k", "cast(id % 5 AS int) AS day",
        "cast(id % 3 AS int) AS cc", "id * 2 AS v",
        "CASE WHEN id % 3 = 0 THEN NULL ELSE id % 13 END AS w"),
      root, overwrite = true, 1000L)
    IncrementalMv.create(spark, root, "mvrw_gsets.mv", Seq("day", "cc"),
      Seq("v", "w"))
    try {
      val t = spark.read.format("snapshotlog").load(root)
      t.createOrReplaceTempView("gsets_t")
      // IMPORTANT: cmp takes a BUILDER, not a DataFrame — a Dataset
      // caches its QueryExecution, so the rewrite-off comparison must
      // re-plan from scratch or it silently re-reads the rewritten plan
      def cmp(mk: () => DataFrame): Unit = {
        val df = mk()
        assert(rolledUpFromMv(df, "mvrw_gsets"),
          df.queryExecution.optimizedPlan.toString)
        val got = df.collect().map(_.toString).sorted
        spark.conf.set("spark.graft.mv.autoRewrite", "false")
        val want = try mk().collect().map(_.toString).sorted
        finally spark.conf.unset("spark.graft.mv.autoRewrite")
        assert(got.sameElements(want),
          s"got=${got.mkString("|")}\nwant=${want.mkString("|")}")
      }
      // ROLLUP: every set (day,cc) (day) () served by ONE Expand over the
      // MV — counts, masked sums, composed avg, per-measure null handling
      val roll = t.rollup(col("day"), col("cc")).agg(count(lit(1)).as("n"),
        sum(col("v")).as("sv"), count(col("w")).as("nw"),
        avg(col("w")).as("aw"))
      cmp(() => t.rollup(col("day"), col("cc")).agg(count(lit(1)).as("n"),
        sum(col("v")).as("sv"), count(col("w")).as("nw"),
        avg(col("w")).as("aw")))
      // absolute pin (belt and braces over the relative compare): the
      // global set counts every base row, not the MV rows it scans
      assert(roll.filter(col("day").isNull && col("cc").isNull)
        .select("n").as[Long].head() === 1200L)
      // CUBE adds the (cc) set — same machinery
      cmp(() => t.cube(col("day"), col("cc")).agg(sum(col("v")).as("sv")))
      // explicit GROUPING SETS with grouping_id() and count(DISTINCT cc)
      // (servable in EVERY set: over MV rows it collapses to the same
      // per-set distinct count, degenerate 1 where cc is grouped)
      cmp(() => spark.sql(
        """SELECT day, cc, grouping(day) AS gd, grouping_id() AS gidx,
          |  count(*) AS n, sum(v) AS sv, count(DISTINCT cc) AS ncc
          |FROM gsets_t
          |GROUP BY GROUPING SETS ((day), (cc), (day, cc), ())""".stripMargin))
      // group-column filter composes (applied to MV rows below the Expand)
      cmp(() => t.filter(col("day") < 3).rollup(col("day"), col("cc"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv")))
      // negatives: a non-MV-key grouping column, a non-servable agg, a
      // non-group filter — all keep the base scan
      val negK = t.rollup(col("day"), col("k")).agg(count(lit(1)).as("n"))
      val negMax = t.rollup(col("day"), col("cc")).agg(max(col("v")).as("m"))
      val negF = t.filter(col("v") > 100).rollup(col("day"))
        .agg(count(lit(1)).as("n"))
      for (neg <- Seq(negK, negMax, negF))
        assert(!rolledUpFromMv(neg, "mvrw_gsets"),
          neg.queryExecution.optimizedPlan.toString)
      // and staleness refuses gsets exactly like flat shapes
      SnapshotLog.commit(
        spark.range(0, 5).selectExpr("id AS k", "cast(0 AS int) AS day",
          "cast(0 AS int) AS cc", "id AS v", "id AS w"),
        root, overwrite = false, 2000L)
      val stale = spark.read.format("snapshotlog").load(root)
        .rollup(col("day"), col("cc")).agg(count(lit(1)).as("n"))
      assert(!rolledUpFromMv(stale, "mvrw_gsets"))
    } finally IncrementalMv.unregister(spark, root)
  }

  // ---- star-schema (join) MVs ----

  /** fact(k, ck, v): 9 customers referenced, v = k*2; dim(dk, grp, seg):
    * 10 customers (dk 0..9; dk 9 never referenced), grp = dk % 3. */
  private def joinFixture(name: String): (String, String) = {
    val factRoot = fresh(s"${name}_fact")
    val dimRoot = s"/tmp/graft_mvrw/${name}_dim"
    val fs = new Path(dimRoot).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(dimRoot), true)
    SnapshotLog.commit(
      spark.range(0, 10).selectExpr("id AS dk", "cast(id % 3 AS int) AS grp",
        "concat('s', id % 2) AS seg"),
      dimRoot, overwrite = true, 500L)
    SnapshotLog.commit(
      spark.range(0, 900).selectExpr("id AS k", "id % 9 AS ck", "id * 2 AS v"),
      factRoot, overwrite = true, 1000L)
    (factRoot, dimRoot)
  }

  private def joinAgg(factRoot: String, dimRoot: String,
                      dimPin: Option[Int] = None): DataFrame = {
    val f = spark.read.format("snapshotlog").load(factRoot)
    var rd = spark.read.format("snapshotlog")
    dimPin.foreach(v => rd = rd.option("asOfVersion", v))
    val d = rd.load(dimRoot)
    f.join(d, f("ck") === d("dk"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"), avg(col("v")).as("a"))
  }

  test("join MV: fresh fact+dim serves the join-aggregate; results match " +
       "the rewrite-off plan; maintenance through fact DML stays exact") {
    val (factRoot, dimRoot) = joinFixture("j_basic")
    IncrementalMv.createJoin(spark, factRoot, dimRoot, "ck", "dk",
      "mvrw_j_basic.mv", Seq("grp"), Seq("v"))
    try {
      def rows(df: DataFrame) = df.collect().map(r => (r.getInt(0),
        r.getLong(1), Option(r.get(2)), Option(r.get(3)))).toSet
      val q = joinAgg(factRoot, dimRoot)
      assert(servedByMv(q, "mvrw_j_basic"),
        q.queryExecution.optimizedPlan.toString)
      val got = rows(q)
      spark.conf.set("spark.graft.mv.autoRewrite", "false")
      val want = try rows(joinAgg(factRoot, dimRoot))
      finally spark.conf.unset("spark.graft.mv.autoRewrite")
      assert(got === want)
      // fact DML: append + MoR delete; maintain applies deltas THROUGH
      // the join (fact deltas acquire dim attrs via the pinned dim)
      SnapshotLog.commit(
        spark.range(900, 1000).selectExpr("id AS k", "id % 9 AS ck",
          "id * 2 AS v"),
        factRoot, overwrite = false, 2000L)
      SnapshotLog.deleteWhereMoR(spark, factRoot, col("k") % 7 === 3, 3000L)
      assert(!servedByMv(joinAgg(factRoot, dimRoot), "mvrw_j_basic"),
        "a fact commit past the watermark must disable the rewrite")
      IncrementalMv.maintain(spark, factRoot, "mvrw_j_basic.mv",
        Seq("grp"), Seq("v"))
      val q2 = joinAgg(factRoot, dimRoot)
      assert(servedByMv(q2, "mvrw_j_basic"))
      val got2 = rows(q2)
      spark.conf.set("spark.graft.mv.autoRewrite", "false")
      val want2 = try rows(joinAgg(factRoot, dimRoot))
      finally spark.conf.unset("spark.graft.mv.autoRewrite")
      assert(got2 === want2,
        "maintained join MV must equal the from-scratch join aggregate")
    } finally IncrementalMv.unregister(spark, factRoot)
  }

  test("join MV: filter-above and rollup compose with the join shape; " +
       "non-group predicates and bare fact scans refuse") {
    val (factRoot, dimRoot) = joinFixture("j_comp")
    IncrementalMv.createJoin(spark, factRoot, dimRoot, "ck", "dk",
      "mvrw_j_comp.mv", Seq("grp", "seg"), Seq("v"))
    try {
      val f = spark.read.format("snapshotlog").load(factRoot)
      val d = spark.read.format("snapshotlog").load(dimRoot)
      val j = f.join(d, f("ck") === d("dk"))
      // exact group set + filter on a dim group column
      val filt = j.filter(col("grp") < 2).groupBy(col("grp"), col("seg"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      assert(servedByMv(filt, "mvrw_j_comp"),
        filt.queryExecution.optimizedPlan.toString)
      // rollup to a subset of the MV keys keeps only the MV scan
      val roll = j.groupBy(col("seg")).agg(sum(col("v")).as("s"),
        countDistinct(col("grp")).as("ng"))
      assert(rolledUpFromMv(roll, "mvrw_j_comp"),
        roll.queryExecution.optimizedPlan.toString)
      // global aggregate = full rollup
      val glob = j.agg(count(lit(1)).as("n"), avg(col("v")).as("a"))
      assert(rolledUpFromMv(glob, "mvrw_j_comp"),
        glob.queryExecution.optimizedPlan.toString)
      // rows all match the rewrite-off plans — REBUILT (a Dataset caches
      // its QueryExecution; re-collecting the same object would just
      // re-run the rewritten plan)
      def j2 = {
        val f2 = spark.read.format("snapshotlog").load(factRoot)
        val d2 = spark.read.format("snapshotlog").load(dimRoot)
        f2.join(d2, f2("ck") === d2("dk"))
      }
      val builders: Seq[() => DataFrame] = Seq(
        () => j2.filter(col("grp") < 2).groupBy(col("grp"), col("seg"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("s")),
        () => j2.groupBy(col("seg")).agg(sum(col("v")).as("s"),
          countDistinct(col("grp")).as("ng")),
        () => j2.agg(count(lit(1)).as("n"), avg(col("v")).as("a")))
      for (mk <- builders) {
        val got = mk().collect().map(_.toString).sorted
        spark.conf.set("spark.graft.mv.autoRewrite", "false")
        val want = try mk().collect().map(_.toString).sorted
        finally spark.conf.unset("spark.graft.mv.autoRewrite")
        assert(got.sameElements(want),
          s"got=${got.mkString("|")}\nwant=${want.mkString("|")}")
      }
      // a predicate on a fact MEASURE keeps the base join
      val onV = j.filter(col("v") > 100).groupBy(col("grp"), col("seg"))
        .agg(count(lit(1)).as("n"))
      assert(!servedByMv(onV, "mvrw_j_comp") &&
        !rolledUpFromMv(onV, "mvrw_j_comp"))
      // a predicate on the JOIN KEY is not a group column either
      val onKey = j.filter(col("dk") < 5).groupBy(col("grp"), col("seg"))
        .agg(count(lit(1)).as("n"))
      assert(!servedByMv(onKey, "mvrw_j_comp") &&
        !rolledUpFromMv(onKey, "mvrw_j_comp"))
      // a bare fact scan NEVER serves from a join MV (inner join drops
      // fact rows without a dim match — different row set)
      val bare = f.groupBy(col("ck")).agg(count(lit(1)).as("n"))
      assert(!servedByMv(bare, "mvrw_j_comp") &&
        !rolledUpFromMv(bare, "mvrw_j_comp"))
      // a join with the WRONG keys never serves
      val wrongKey = f.join(d, f("ck") === d("grp"))
        .groupBy(col("seg")).agg(count(lit(1)).as("n"))
      assert(!servedByMv(wrongKey, "mvrw_j_comp") &&
        !rolledUpFromMv(wrongKey, "mvrw_j_comp"))
    } finally IncrementalMv.unregister(spark, factRoot)
  }

  test("join MV: a dim change refuses the rewrite until re-created; " +
       "dim reads pinned at the watermark still serve") {
    val (factRoot, dimRoot) = joinFixture("j_dim")
    IncrementalMv.createJoin(spark, factRoot, dimRoot, "ck", "dk",
      "mvrw_j_dim.mv", Seq("grp"), Seq("v"))
    try {
      assert(servedByMv(joinAgg(factRoot, dimRoot), "mvrw_j_dim"))
      // the dim moves: grp re-mapped for dk 0 (would change MV content)
      SnapshotLog.updateWhereMoR(spark, dimRoot, col("dk") === 0,
        Map("grp" -> lit(2)), 2000L)
      val stale = joinAgg(factRoot, dimRoot)
      assert(!servedByMv(stale, "mvrw_j_dim"),
        "a dim commit past the materialized dim version must refuse")
      // and the un-rewritten result reflects the NEW dim
      assert(stale.filter(col("grp") === 0).select("n").as[Long].head() ===
        200L) // dk 0,3,6 each 100 fact rows; dk 0 moved to grp 2
      // a read PINNED at the materialized dim version still serves
      val pinned = joinAgg(factRoot, dimRoot, dimPin = Some(1))
      assert(servedByMv(pinned, "mvrw_j_dim"),
        pinned.queryExecution.optimizedPlan.toString)
      // full refresh: re-create against the new dim re-arms head reads
      IncrementalMv.createJoin(spark, factRoot, dimRoot, "ck", "dk",
        "mvrw_j_dim.mv", Seq("grp"), Seq("v"))
      val fresh2 = joinAgg(factRoot, dimRoot)
      assert(servedByMv(fresh2, "mvrw_j_dim"))
      assert(fresh2.filter(col("grp") === 0).select("n").as[Long].head()
        === 200L)
    } finally IncrementalMv.unregister(spark, factRoot)
  }

  test("join MV: registration is durable and single-table MVs never " +
       "serve join queries") {
    val (factRoot, dimRoot) = joinFixture("j_dur")
    IncrementalMv.createJoin(spark, factRoot, dimRoot, "ck", "dk",
      "mvrw_j_dur.mv", Seq("grp"), Seq("v"))
    try {
      IncrementalMv.forgetInMemory() // simulate a new JVM
      assert(servedByMv(joinAgg(factRoot, dimRoot), "mvrw_j_dur"),
        "the fact props must re-hydrate the JOIN registration")
      // flip the registration to a single-table MV over the fact: the
      // join query must stop serving (and the dim props must be gone)
      IncrementalMv.create(spark, factRoot, "mvrw_j_dur.mv2",
        Seq("ck"), Seq("v"))
      IncrementalMv.forgetInMemory()
      assert(!servedByMv(joinAgg(factRoot, dimRoot), "mvrw_j_dur") &&
        !servedByMv(joinAgg(factRoot, dimRoot), "mvrw_j_dur.mv2"),
        "a single-table registration must not serve the join query")
      val bare = spark.read.format("snapshotlog").load(factRoot)
        .groupBy(col("ck")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      assert(servedByMv(bare, "mvrw_j_dur/mv2"))
    } finally IncrementalMv.unregister(spark, factRoot)
  }

  test("grouping sets compose WITH the join shape: ROLLUP over fact⋈dim " +
       "serves from the join MV through the substituted Expand") {
    val (factRoot, dimRoot) = joinFixture("j_gsets")
    IncrementalMv.createJoin(spark, factRoot, dimRoot, "ck", "dk",
      "mvrw_j_gsets.mv", Seq("grp", "seg"), Seq("v"))
    try {
      def mk() = {
        val f = spark.read.format("snapshotlog").load(factRoot)
        val d = spark.read.format("snapshotlog").load(dimRoot)
        f.join(d, f("ck") === d("dk"))
          .rollup(col("grp"), col("seg"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      }
      val q = mk()
      assert(rolledUpFromMv(q, "mvrw_j_gsets"),
        q.queryExecution.optimizedPlan.toString)
      val got = q.collect().map(_.toString).sorted
      spark.conf.set("spark.graft.mv.autoRewrite", "false")
      val want = try mk().collect().map(_.toString).sorted
      finally spark.conf.unset("spark.graft.mv.autoRewrite")
      assert(got.sameElements(want),
        s"got=${got.mkString("|")}\nwant=${want.mkString("|")}")
      // and the global row really counts JOIN rows (900 fact rows all
      // match a dim row)
      assert(q.filter(col("grp").isNull && col("seg").isNull)
        .select("n").as[Long].head() === 900L)
    } finally IncrementalMv.unregister(spark, factRoot)
  }

  test("SQL procedures drive the star-schema loop: create_join_mv + " +
       "refresh_mv applies fact deltas through the pinned dim") {
    val ns = "mvrw_jproc"
    val fs = new Path(s"/tmp/graft_snap_warehouse/$ns")
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(s"/tmp/graft_snap_warehouse/$ns"), true)
    spark.sql(s"DROP TABLE IF EXISTS snap.$ns.fact")
    spark.sql(s"DROP TABLE IF EXISTS snap.$ns.dim")
    spark.sql(s"CREATE TABLE snap.$ns.dim AS SELECT id AS dk, " +
      "cast(id % 3 AS int) AS grp FROM range(0, 9)")
    spark.sql(s"CREATE TABLE snap.$ns.fact AS SELECT id AS k, " +
      "id % 9 AS ck, id * 2 AS v FROM range(0, 450)")
    val factRoot = s"/tmp/graft_snap_warehouse/$ns/fact"
    try {
      val created = spark.sql(
        s"CALL snap.system.create_join_mv('$ns.fact', '$ns.dim', " +
          s"'ck', 'dk', '$ns.mv', 'grp', 'v')").collect().head
      assert(created.getString(0) === s"$ns.mv")
      // full comma-joined dim-version list (one entry per join step)
      assert(created.getString(2).split(",").forall(_.toInt >= 1),
        "dim version(s) must be watermarked")
      def q() = {
        val f = spark.table(s"snap.$ns.fact")
        val d = spark.table(s"snap.$ns.dim")
        f.join(d, f("ck") === d("dk")).groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      }
      assert(servedByMv(q(), s"$ns/mv"))
      spark.sql(s"INSERT INTO snap.$ns.fact " +
        "SELECT id, id % 9, id * 2 FROM range(450, 500)")
      assert(!servedByMv(q(), s"$ns/mv"), "stale fact must refuse")
      val refreshed = spark.sql(
        s"CALL snap.system.refresh_mv('$ns.fact')").collect().head
      assert(refreshed.getInt(1) > created.getInt(1),
        "refresh must advance the fact watermark")
      val served = q()
      assert(servedByMv(served, s"$ns/mv"))
      assert(served.select(sum(col("n"))).as[Long].head() === 500L)
      // r20: refresh_mv ALSO applies DIM deltas for join MVs — a dim
      // update no longer needs a re-create through the SQL loop
      spark.sql(s"UPDATE snap.$ns.dim SET grp = grp + 5 WHERE dk = 2")
      assert(!servedByMv(q(), s"$ns/mv"), "stale dim must refuse first")
      val refreshed2 = spark.sql(
        s"CALL snap.system.refresh_mv('$ns.fact')").collect().head
      assert(refreshed2.getString(2).split(",").forall(_.toInt >= 2),
        "refresh must advance the dim watermark(s)")
      val served2 = q()
      assert(servedByMv(served2, s"$ns/mv"),
        served2.queryExecution.optimizedPlan.toString)
      assert(served2.filter(col("grp") === 7).select(sum(col("n")))
        .as[Long].head() === 56L) // dk=2's 56 fact rows moved to grp 7
    } finally IncrementalMv.unregister(spark, factRoot)
  }

  test("join MVs compose with refresh-then-serve and the streaming " +
       "maintenance loop (fact deltas apply through the pinned dim)") {
    val (factRoot, dimRoot) = joinFixture("j_auto")
    IncrementalMv.createJoin(spark, factRoot, dimRoot, "ck", "dk",
      "mvrw_j_auto.mv", Seq("grp"), Seq("v"))
    val mvRoot = IncrementalMv.registered(factRoot).get.mvRoot
    try {
      // refresh-then-serve: an opted-in stale join MV refreshes INSIDE
      // the rule (maintain() resolves the dim from the MV's props)
      SnapshotLog.setTableProps(spark, mvRoot,
        Map(IncrementalMv.AutoRefreshProp -> "true"))
      SnapshotLog.commit(
        spark.range(900, 950).selectExpr("id AS k", "id % 9 AS ck",
          "id * 2 AS v"),
        factRoot, overwrite = false, 2000L)
      val q = joinAgg(factRoot, dimRoot)
      assert(servedByMv(q, "mvrw_j_auto"),
        q.queryExecution.optimizedPlan.toString)
      assert(q.select(sum(col("n"))).as[Long].head() === 950L)
      assert(IncrementalMv.appliedVersion(spark, mvRoot).contains(2))
      // streaming maintenance: a fact micro-batch triggers maintain()
      // and the rewrite re-arms without any manual call
      val sq = graft.streaming.StreamingOps.mvMaintenanceStream(
        spark, factRoot, "mvrw_j_auto.mv", Seq("grp"), "v",
        checkpoint = Some(s"/tmp/graft_mvrw/j_auto_ckpt_${System.nanoTime()}"))
      try {
        SnapshotLog.setTableProps(spark, mvRoot,
          Map(IncrementalMv.AutoRefreshProp -> "false"))
        SnapshotLog.commit(
          spark.range(950, 1000).selectExpr("id AS k", "id % 9 AS ck",
            "id * 2 AS v"),
          factRoot, overwrite = false, 3000L)
        sq.processAllAvailable()
        val q2 = joinAgg(factRoot, dimRoot)
        assert(servedByMv(q2, "mvrw_j_auto"),
          "the stream must have maintained the join MV to the head")
        assert(q2.select(sum(col("n"))).as[Long].head() === 1000L)
      } finally sq.stop()
    } finally IncrementalMv.unregister(spark, factRoot)
  }

  test("snowflake MV (fact ⋈ dim ⋈ dim-of-dim): served whichever way the " +
       "query associates the joins; per-dim staleness and join subsets " +
       "refuse; maintenance applies fact deltas through BOTH pinned dims") {
    val factRoot = fresh("snow_fact")
    val d1Root = "/tmp/graft_mvrw/snow_d1"
    val d2Root = "/tmp/graft_mvrw/snow_d2"
    val fs = new Path(d1Root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(d1Root), true)
    fs.delete(new Path(d2Root), true)
    // dim2 (region) keys off DIM1's nk — the snowflake chain
    SnapshotLog.commit(
      spark.range(0, 4).selectExpr("id AS nnk", "concat('r', id) AS region"),
      d2Root, overwrite = true, 300L)
    SnapshotLog.commit(
      spark.range(0, 12).selectExpr("id AS dk", "cast(id % 3 AS int) AS grp",
        "id % 4 AS nk"),
      d1Root, overwrite = true, 500L)
    SnapshotLog.commit(
      spark.range(0, 600).selectExpr("id AS k", "id % 12 AS ck", "id * 2 AS v"),
      factRoot, overwrite = true, 1000L)
    IncrementalMv.createJoins(spark, factRoot,
      Seq((d1Root, "ck", "dk"), (d2Root, "nk", "nnk")),
      "mvrw_snow.mv", Seq("region"), Seq("v"))
    try {
      // fresh reads per query build, captured as vals: `df(col)` must
      // come from the SAME Dataset instance that sits in the join
      def reads() = (spark.read.format("snapshotlog").load(factRoot),
        spark.read.format("snapshotlog").load(d1Root),
        spark.read.format("snapshotlog").load(d2Root))
      def q1() = { // fact-first association
        val (ff, dd1, dd2) = reads()
        ff.join(dd1, ff("ck") === dd1("dk")).join(dd2, dd1("nk") === dd2("nnk"))
          .groupBy(col("region"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      }
      def q2() = { // dims-first association (ReorderJoin's prerogative)
        val (ff, dd1, dd2) = reads()
        dd1.join(dd2, dd1("nk") === dd2("nnk"))
          .join(ff, ff("ck") === dd1("dk"))
          .groupBy(col("region"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      }
      for (mk <- Seq(q1 _, q2 _)) {
        val df = mk()
        assert(servedByMv(df, "mvrw_snow"),
          df.queryExecution.optimizedPlan.toString)
        val got = df.collect().map(_.toString).sorted
        spark.conf.set("spark.graft.mv.autoRewrite", "false")
        val want = try mk().collect().map(_.toString).sorted
        finally spark.conf.unset("spark.graft.mv.autoRewrite")
        assert(got.sameElements(want))
      }
      // rollup: the global aggregate over the 3-way join
      val (gf, gd1, gd2) = reads()
      val glob = gf.join(gd1, gf("ck") === gd1("dk"))
        .join(gd2, gd1("nk") === gd2("nnk"))
        .agg(count(lit(1)).as("n"), avg(col("v")).as("a"))
      assert(rolledUpFromMv(glob, "mvrw_snow"))
      // a SUBSET of the joins (fact ⋈ dim1 only) must refuse — inner
      // joining dim2 drops rows, so the MV's row set differs
      val (ff2, dd, _) = reads()
      val subset = ff2.join(dd, ff2("ck") === dd("dk"))
        .groupBy(col("grp")).agg(count(lit(1)).as("n"))
      assert(!servedByMv(subset, "mvrw_snow") &&
        !rolledUpFromMv(subset, "mvrw_snow"))
      // fact DML maintains through BOTH pinned dims
      SnapshotLog.commit(
        spark.range(600, 700).selectExpr("id AS k", "id % 12 AS ck",
          "id * 3 AS v"),
        factRoot, overwrite = false, 2000L)
      SnapshotLog.deleteWhereMoR(spark, factRoot, col("k") % 9 === 2, 3000L)
      IncrementalMv.maintain(spark, factRoot, "mvrw_snow.mv",
        Seq("region"), Seq("v"))
      val q3 = q1()
      assert(servedByMv(q3, "mvrw_snow"))
      val got3 = q3.collect().map(_.toString).sorted
      spark.conf.set("spark.graft.mv.autoRewrite", "false")
      val want3 = try q1().collect().map(_.toString).sorted
      finally spark.conf.unset("spark.graft.mv.autoRewrite")
      assert(got3.sameElements(want3),
        s"got=${got3.mkString("|")}\nwant=${want3.mkString("|")}")
      // EITHER dim advancing refuses until re-create (per-dim watermark)
      SnapshotLog.commit(
        spark.range(4, 5).selectExpr("id AS nnk", "concat('r', id) AS region"),
        d2Root, overwrite = false, 4000L)
      assert(!servedByMv(q1(), "mvrw_snow"),
        "a dim-of-dim commit past its watermark must refuse")
      IncrementalMv.createJoins(spark, factRoot,
        Seq((d1Root, "ck", "dk"), (d2Root, "nk", "nnk")),
        "mvrw_snow.mv", Seq("region"), Seq("v"))
      assert(servedByMv(q1(), "mvrw_snow"),
        "re-create against the new dim must re-arm")
    } finally IncrementalMv.unregister(spark, factRoot)
  }

  test("min/max measures: served while insert-only (exact, rollup, and " +
       "gsets compose), a delete invalidates ONLY min/max, re-create " +
       "revalidates") {
    val root = fresh("minmax")
    SnapshotLog.commit(
      spark.range(0, 800).selectExpr("id AS k", "cast(id % 5 AS int) AS grp",
        "cast(id % 3 AS int) AS sub", "id * 2 AS v",
        "CASE WHEN id % 7 = 0 THEN NULL ELSE id % 101 END AS w"),
      root, overwrite = true, 1000L)
    IncrementalMv.create(spark, root, "mvrw_minmax.mv", Seq("grp", "sub"),
      Seq("v"), minMaxCols = Seq("v", "w"))
    try {
      def mk() = {
        val t = spark.read.format("snapshotlog").load(root)
        t.groupBy(col("grp"), col("sub")).agg(count(lit(1)).as("n"),
          sum(col("v")).as("sv"), min(col("v")).as("mnv"),
          max(col("v")).as("mxv"), min(col("w")).as("mnw"),
          max(col("w")).as("mxw"))
      }
      def cmp(q: () => DataFrame, served: DataFrame => Boolean): Unit = {
        val df = q()
        assert(served(df), df.queryExecution.optimizedPlan.toString)
        val got = df.collect().map(_.toString).sorted
        spark.conf.set("spark.graft.mv.autoRewrite", "false")
        val want = try q().collect().map(_.toString).sorted
        finally spark.conf.unset("spark.graft.mv.autoRewrite")
        assert(got.sameElements(want),
          s"got=${got.mkString("|")}\nwant=${want.mkString("|")}")
      }
      // exact path (w has nulls; some (grp,sub) groups may be all-null)
      cmp(() => mk(), servedByMv(_, "mvrw_minmax"))
      // rollup composes: min of per-group minima
      cmp(() => spark.read.format("snapshotlog").load(root)
        .groupBy(col("grp")).agg(min(col("v")).as("mnv"),
          max(col("w")).as("mxw")), rolledUpFromMv(_, "mvrw_minmax"))
      // grouping sets compose through the Expand
      cmp(() => spark.read.format("snapshotlog").load(root)
        .rollup(col("grp"), col("sub"))
        .agg(count(lit(1)).as("n"), max(col("v")).as("mxv")),
        rolledUpFromMv(_, "mvrw_minmax"))
      // insert-only maintenance keeps min/max exact (new extrema + new
      // groups arrive)
      SnapshotLog.commit(
        spark.range(800, 1000).selectExpr("id AS k",
          "cast(id % 5 AS int) AS grp", "cast(3 AS int) AS sub",
          "id * 3 AS v", "cast(-5 AS bigint) AS w"),
        root, overwrite = false, 2000L)
      IncrementalMv.maintain(spark, root, "mvrw_minmax.mv",
        Seq("grp", "sub"), Seq("v"))
      cmp(() => mk(), servedByMv(_, "mvrw_minmax"))
      // a DELETE invalidates min/max — the min/max query falls back to
      // the base (correct rows), while count/sum KEEP serving
      SnapshotLog.deleteWhereMoR(spark, root, col("k") % 11 === 3, 3000L)
      IncrementalMv.maintain(spark, root, "mvrw_minmax.mv",
        Seq("grp", "sub"), Seq("v"))
      val mm = mk()
      assert(!servedByMv(mm, "mvrw_minmax") &&
        !rolledUpFromMv(mm, "mvrw_minmax"),
        "min/max after a delete must refuse the MV")
      cmp(() => mk(), _ => true) // rows still correct, just un-served
      val cs = spark.read.format("snapshotlog").load(root)
        .groupBy(col("grp"), col("sub"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      assert(servedByMv(cs, "mvrw_minmax"),
        "count/sum must keep serving after minmax invalidation")
      // full re-create revalidates min/max against the current state
      IncrementalMv.create(spark, root, "mvrw_minmax.mv", Seq("grp", "sub"),
        Seq("v"), minMaxCols = Seq("v", "w"))
      cmp(() => mk(), servedByMv(_, "mvrw_minmax"))
    } finally IncrementalMv.unregister(spark, root)
  }

  test("literal outputs collapsed INTO the aggregate still serve: " +
       "agg(...).withColumn(lit) — the gate/dashboard flag shape") {
    // CollapseProject merges `withColumn(\"flag\", lit(true))` into the
    // Aggregate's output list; a foldable output touches no base rows and
    // must pass through verbatim instead of refusing the whole rewrite
    // (found live: every composite_mv gate's RETURNED plan re-aggregated
    // the base at collect time while its probe boolean said \"served\")
    val root = fresh("fold")
    SnapshotLog.commit(base(400), root, overwrite = true, 1000L)
    IncrementalMv.create(spark, root, "mvrw_fold.mv", "grp", "v")
    try {
      val q = defAgg(root).withColumn("flag", lit(true))
        .withColumn("tag", lit("x"))
      assert(servedByMv(q, "mvrw_fold"),
        q.queryExecution.optimizedPlan.toString)
      assert(q.filter(col("grp") === 0).select("n").as[Long].head() ===
        (0L until 400L).count(_ % 7 == 0))
      // and on the rollup path too
      val r = spark.read.format("snapshotlog").load(root)
        .agg(count(lit(1)).as("n")).withColumn("flag", lit(true))
      assert(rolledUpFromMv(r, "mvrw_fold"),
        r.queryExecution.optimizedPlan.toString)
      assert(r.select("n").as[Long].head() === 400L)
    } finally IncrementalMv.unregister(spark, root)
  }

  // ---- dim-delta maintenance (r20) ----

  test("dim-delta maintenance: dim UPDATE / DELETE / INSERT / key " +
       "re-route all maintain the join MV WITHOUT re-create; the rewrite " +
       "serves the new dim afterwards") {
    val (factRoot, dimRoot) = joinFixture("dimdelta")
    IncrementalMv.createJoin(spark, factRoot, dimRoot, "ck", "dk",
      "mvrw_dimdelta.mv", Seq("grp"), Seq("v"))
    val mvRoot = IncrementalMv.registered(factRoot).get.mvRoot
    try {
      def check(): Unit = {
        val q = joinAgg(factRoot, dimRoot)
        assert(servedByMv(q, "mvrw_dimdelta"),
          q.queryExecution.optimizedPlan.toString)
        val got = q.collect().map(_.toString).sorted
        spark.conf.set("spark.graft.mv.autoRewrite", "false")
        val want = try joinAgg(factRoot, dimRoot).collect()
          .map(_.toString).sorted
        finally spark.conf.unset("spark.graft.mv.autoRewrite")
        assert(got.sameElements(want),
          s"got=${got.mkString("|")}\nwant=${want.mkString("|")}")
      }
      val factW = IncrementalMv.appliedVersion(spark, mvRoot).get
      // 1) dim UPDATE moving groups (the slowly-changing-dim case)
      SnapshotLog.updateWhereMoR(spark, dimRoot, col("dk") % 4 === 1,
        Map("grp" -> (col("grp") + 10)), 1500L)
      assert(!servedByMv(joinAgg(factRoot, dimRoot), "mvrw_dimdelta"),
        "a dim commit past the dim watermark must refuse first")
      IncrementalMv.maintainDims(spark, factRoot, "mvrw_dimdelta.mv",
        Seq("grp"), Seq("v"))
      check()
      // 2) dim DELETE drops its fact rows from the MV
      SnapshotLog.deleteWhereMoR(spark, dimRoot, col("dk") === 2, 2500L)
      IncrementalMv.maintainDims(spark, factRoot, "mvrw_dimdelta.mv",
        Seq("grp"), Seq("v"))
      check()
      // 3) dim INSERT matches previously-dangling fact rows... none
      //    dangle here, so first re-insert dk=2 under a NEW group
      SnapshotLog.commit(
        spark.range(2, 3).selectExpr("id AS dk", "cast(77 AS int) AS grp",
          "'s0' AS seg"),
        dimRoot, overwrite = false, 3500L)
      IncrementalMv.maintainDims(spark, factRoot, "mvrw_dimdelta.mv",
        Seq("grp"), Seq("v"))
      check()
      // 4) dim KEY change re-routes fact rows (delete+insert pair)
      SnapshotLog.updateWhereMoR(spark, dimRoot, col("dk") === 3,
        Map("dk" -> lit(4L)), 4500L) // dk 4 now twice: join multiplies
      IncrementalMv.maintainDims(spark, factRoot, "mvrw_dimdelta.mv",
        Seq("grp"), Seq("v"))
      check()
      // through it all: NO re-create (fact watermark untouched, the MV
      // table was MERGEd, never re-CTAS'd) and maintainDims is idempotent
      assert(IncrementalMv.appliedVersion(spark, mvRoot).contains(factW),
        "dim-delta maintenance must not touch the fact watermark")
      val dimVs = IncrementalMv.appliedDimVersions(spark, mvRoot).get
      assert(IncrementalMv.maintainDims(spark, factRoot, "mvrw_dimdelta.mv",
        Seq("grp"), Seq("v")) === dimVs, "idempotent at the dim head")
      // and fact-side maintenance composes AFTER dim deltas (joins the
      // NEW dim watermark)
      SnapshotLog.commit(
        spark.range(900, 960).selectExpr("id AS k", "id % 9 AS ck",
          "id * 2 AS v"),
        factRoot, overwrite = false, 5500L)
      IncrementalMv.maintain(spark, factRoot, "mvrw_dimdelta.mv",
        Seq("grp"), Seq("v"))
      check()
    } finally IncrementalMv.unregister(spark, factRoot)
  }

  test("dim-delta on a snowflake chain: dim-of-dim AND mid-chain changes " +
       "maintain sequentially; interleaved fact+dim drift composes") {
    val factRoot = fresh("snowdelta_fact")
    val d1Root = s"/tmp/graft_mvrw/snowdelta_d1"
    val d2Root = s"/tmp/graft_mvrw/snowdelta_d2"
    val fs = new Path(d1Root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(d1Root), true)
    fs.delete(new Path(d2Root), true)
    SnapshotLog.commit(
      spark.range(0, 6).selectExpr("id AS nnk", "concat('r', id % 2) AS region"),
      d2Root, overwrite = true, 400L)
    SnapshotLog.commit(
      spark.range(0, 12).selectExpr("id AS dk", "cast(id % 3 AS int) AS grp",
        "id % 6 AS nk"),
      d1Root, overwrite = true, 500L)
    SnapshotLog.commit(
      spark.range(0, 600).selectExpr("id AS k", "id % 12 AS ck", "id * 2 AS v"),
      factRoot, overwrite = true, 1000L)
    IncrementalMv.createJoins(spark, factRoot,
      Seq((d1Root, "ck", "dk"), (d2Root, "nk", "nnk")),
      "mvrw_snowdelta.mv", Seq("region"), Seq("v"))
    try {
      def q() = {
        val ff = spark.read.format("snapshotlog").load(factRoot)
        val dd1 = spark.read.format("snapshotlog").load(d1Root)
        val dd2 = spark.read.format("snapshotlog").load(d2Root)
        ff.join(dd1, ff("ck") === dd1("dk")).join(dd2, dd1("nk") === dd2("nnk"))
          .groupBy(col("region"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      }
      def check(): Unit = {
        val df = q()
        assert(servedByMv(df, "mvrw_snowdelta"),
          df.queryExecution.optimizedPlan.toString)
        val got = df.collect().map(_.toString).sorted
        spark.conf.set("spark.graft.mv.autoRewrite", "false")
        val want = try q().collect().map(_.toString).sorted
        finally spark.conf.unset("spark.graft.mv.autoRewrite")
        assert(got.sameElements(want),
          s"got=${got.mkString("|")}\nwant=${want.mkString("|")}")
      }
      // dim-of-dim (d2) change: region renames (the classic SCD)
      SnapshotLog.updateWhereMoR(spark, d2Root, col("nnk") % 2 === 0,
        Map("region" -> concat(col("region"), lit("_x"))), 1500L)
      // AND mid-chain (d1) change in the same drift window: nk re-route
      SnapshotLog.updateWhereMoR(spark, d1Root, col("dk") === 5,
        Map("nk" -> lit(1L)), 1600L)
      IncrementalMv.maintainDims(spark, factRoot, "mvrw_snowdelta.mv",
        Seq("region"), Seq("v"))
      check()
      // fact delta AFTER the dim deltas: maintain() joins the new
      // watermarks
      SnapshotLog.commit(
        spark.range(600, 660).selectExpr("id AS k", "id % 12 AS ck",
          "id * 3 AS v"),
        factRoot, overwrite = false, 2500L)
      IncrementalMv.maintain(spark, factRoot, "mvrw_snowdelta.mv",
        Seq("region"), Seq("v"))
      check()
    } finally IncrementalMv.unregister(spark, factRoot)
  }

  test("dim-delta min/max: a pure dim INSERT keeps min/max valid; a dim " +
       "DELETE flips validity (count/sum keep serving)") {
    val (factRoot, dimRoot) = joinFixture("dimmm")
    IncrementalMv.createJoin(spark, factRoot, dimRoot, "ck", "dk",
      "mvrw_dimmm.mv", Seq("grp"), Seq("v"), minMaxCols = Seq("v"))
    val mvRoot = IncrementalMv.registered(factRoot).get.mvRoot
    try {
      def mmAgg() = {
        val f = spark.read.format("snapshotlog").load(factRoot)
        val dm = spark.read.format("snapshotlog").load(dimRoot)
        f.join(dm, f("ck") === dm("dk")).groupBy(col("grp"))
          .agg(min(col("v")).as("mnv"), max(col("v")).as("mxv"))
      }
      assert(servedByMv(mmAgg(), "mvrw_dimmm"))
      // dim INSERT (new dk, unmatched by any fact row — and a matched
      // path would also be insert-only): validity holds
      SnapshotLog.commit(
        spark.range(20, 22).selectExpr("id AS dk", "cast(9 AS int) AS grp",
          "'s1' AS seg"),
        dimRoot, overwrite = false, 1500L)
      IncrementalMv.maintainDims(spark, factRoot, "mvrw_dimmm.mv",
        Seq("grp"), Seq("v"))
      assert(IncrementalMv.minMaxValid(spark, mvRoot),
        "a pure dim insert must keep min/max valid")
      val q = mmAgg()
      assert(servedByMv(q, "mvrw_dimmm"),
        q.queryExecution.optimizedPlan.toString)
      // dim DELETE: its fact rows leave the groups — extremum may be gone
      SnapshotLog.deleteWhereMoR(spark, dimRoot, col("dk") === 0, 2500L)
      IncrementalMv.maintainDims(spark, factRoot, "mvrw_dimmm.mv",
        Seq("grp"), Seq("v"))
      assert(!IncrementalMv.minMaxValid(spark, mvRoot),
        "a dim delete must flip min/max validity")
      assert(!servedByMv(mmAgg(), "mvrw_dimmm"))
      val cs = {
        val f = spark.read.format("snapshotlog").load(factRoot)
        val dm = spark.read.format("snapshotlog").load(dimRoot)
        f.join(dm, f("ck") === dm("dk")).groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      }
      assert(servedByMv(cs, "mvrw_dimmm"),
        "count/sum must keep serving after the flip")
      val got = cs.collect().map(_.toString).sorted
      spark.conf.set("spark.graft.mv.autoRewrite", "false")
      val want = try {
        val f = spark.read.format("snapshotlog").load(factRoot)
        val dm = spark.read.format("snapshotlog").load(dimRoot)
        f.join(dm, f("ck") === dm("dk")).groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
          .collect().map(_.toString).sorted
      } finally spark.conf.unset("spark.graft.mv.autoRewrite")
      assert(got.sameElements(want))
    } finally IncrementalMv.unregister(spark, factRoot)
  }

  test("dim refresh-then-serve: an opted-in join MV refreshes DIM deltas " +
       "inside the rule; default-off and budget-exceeded refuse") {
    val (factRoot, dimRoot) = joinFixture("dimauto")
    IncrementalMv.createJoin(spark, factRoot, dimRoot, "ck", "dk",
      "mvrw_dimauto.mv", Seq("grp"), Seq("v"))
    val mvRoot = IncrementalMv.registered(factRoot).get.mvRoot
    try {
      def q() = joinAgg(factRoot, dimRoot)
      // default OFF: a dim commit refuses until manual maintenance
      SnapshotLog.updateWhereMoR(spark, dimRoot, col("dk") === 1,
        Map("grp" -> lit(11)), 1500L)
      assert(!servedByMv(q(), "mvrw_dimauto"),
        "auto-refresh must be opt-in")
      SnapshotLog.setTableProps(spark, mvRoot,
        Map(IncrementalMv.AutoRefreshProp -> "true"))
      val served = q()
      assert(servedByMv(served, "mvrw_dimauto"),
        served.queryExecution.optimizedPlan.toString)
      val got = served.collect().map(_.toString).sorted
      spark.conf.set("spark.graft.mv.autoRewrite", "false")
      val want = try q().collect().map(_.toString).sorted
      finally spark.conf.unset("spark.graft.mv.autoRewrite")
      assert(got.sameElements(want))
      assert(IncrementalMv.appliedDimVersions(spark, mvRoot)
        .contains(Seq(2)), "the rule must have advanced the dim watermark")
      // budget: a gap past mv.auto-refresh-max-versions refuses
      SnapshotLog.setTableProps(spark, mvRoot,
        Map(IncrementalMv.AutoRefreshBudgetProp -> "1"))
      SnapshotLog.updateWhereMoR(spark, dimRoot, col("dk") === 2,
        Map("grp" -> lit(12)), 2500L)
      SnapshotLog.deleteWhereMoR(spark, dimRoot, col("dk") === 9, 3500L)
      assert(!servedByMv(q(), "mvrw_dimauto"),
        "a 2-version dim gap must exceed the budget of 1")
      // and a time-traveled dim read (pin BEHIND the watermark) never
      // triggers a refresh
      val old = joinAgg(factRoot, dimRoot, dimPin = Some(1))
      assert(!servedByMv(old, "mvrw_dimauto"))
      assert(IncrementalMv.appliedDimVersions(spark, mvRoot)
        .contains(Seq(2)), "refused paths must not have refreshed")
    } finally IncrementalMv.unregister(spark, factRoot)
  }

  test("expression keys compose with JOIN MVs: a time-grain key over the " +
       "fact ts, grouped with a dim attribute, creates/maintains/serves") {
    val factRoot = fresh("jgrain_fact")
    val dimRoot = s"/tmp/graft_mvrw/jgrain_dim"
    val fs = new Path(dimRoot).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(dimRoot), true)
    SnapshotLog.commit(
      spark.range(0, 10).selectExpr("id AS dk", "cast(id % 3 AS int) AS grp"),
      dimRoot, overwrite = true, 500L)
    SnapshotLog.commit(
      spark.range(0, 900).selectExpr("id AS k", "id % 9 AS ck",
        "TIMESTAMP'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, CAST(id % 700 AS INT), 0, 0) AS ts",
        "id * 2 AS v"),
      factRoot, overwrite = true, 1000L)
    IncrementalMv.createJoin(spark, factRoot, dimRoot, "ck", "dk",
      "mvrw_jgrain.mv", Seq("grp", "date_trunc('day', ts) AS day"), Seq("v"))
    try {
      def q() = {
        val f = spark.read.format("snapshotlog").load(factRoot)
        val dm = spark.read.format("snapshotlog").load(dimRoot)
        f.join(dm, f("ck") === dm("dk"))
          .groupBy(col("grp"), date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      }
      def check(): Unit = {
        val df = q()
        assert(servedByMv(df, "mvrw_jgrain"),
          df.queryExecution.optimizedPlan.toString)
        val got = df.collect().map(_.toString).sorted
        spark.conf.set("spark.graft.mv.autoRewrite", "false")
        val want = try q().collect().map(_.toString).sorted
        finally spark.conf.unset("spark.graft.mv.autoRewrite")
        assert(got.sameElements(want),
          s"got=${got.mkString("|")}\nwant=${want.mkString("|")}")
      }
      check()
      // fact delta maintains the computed key through the join
      SnapshotLog.commit(
        spark.range(900, 1000).selectExpr("id AS k", "id % 9 AS ck",
          "TIMESTAMP'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, CAST(id % 700 AS INT), 0, 0) AS ts",
          "id * 3 AS v"),
        factRoot, overwrite = false, 2000L)
      IncrementalMv.maintain(spark, factRoot, "mvrw_jgrain.mv",
        Seq("grp", "day"), Seq("v"))
      check()
      // dim delta maintains it too (maintainDims composes with exprs)
      SnapshotLog.updateWhereMoR(spark, dimRoot, col("dk") === 4,
        Map("grp" -> lit(21)), 3000L)
      IncrementalMv.maintainDims(spark, factRoot, "mvrw_jgrain.mv",
        Seq("grp", "day"), Seq("v"))
      check()
      // month rollup over (grp, day-grain) join MV composes
      val mon = {
        val f = spark.read.format("snapshotlog").load(factRoot)
        val dm = spark.read.format("snapshotlog").load(dimRoot)
        f.join(dm, f("ck") === dm("dk"))
          .groupBy(date_trunc("month", col("ts")).as("mon"))
          .agg(sum(col("v")).as("sv"))
      }
      assert(rolledUpFromMv(mon, "mvrw_jgrain"),
        mon.queryExecution.optimizedPlan.toString)
    } finally IncrementalMv.unregister(spark, factRoot)
  }

  test("maintain() reads the changelog ONCE: the minmax validity probe " +
       "and the MERGE both consume the checkpointed group-sized delta") {
    val root = fresh("onepass")
    SnapshotLog.commit(
      spark.range(0, 60000).selectExpr("id AS k", "cast(id % 5 AS int) AS grp",
        "id * 2 AS v"),
      root, overwrite = true, 1000L, numFiles = 4)
    IncrementalMv.create(spark, root, "mvrw_onepass.mv", Seq("grp"),
      Seq("v"), minMaxCols = Seq("v"))
    try {
      // a sizable delta range WITH a delete (the probe-armed path)
      SnapshotLog.commit(
        spark.range(60000, 120000).selectExpr("id AS k",
          "cast(id % 5 AS int) AS grp", "id * 2 AS v"),
        root, overwrite = false, 2000L, numFiles = 4)
      SnapshotLog.deleteWhereMoR(spark, root, col("k") % 3 === 1, 3000L)
      val bytes = new java.util.concurrent.atomic.AtomicLong()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            bytes.addAndGet(e.taskMetrics.inputMetrics.bytesRead): Unit
      }
      def quiesce(): Long = {
        var last = -1L
        var cur = bytes.get()
        while (cur != last) { Thread.sleep(300); last = cur; cur = bytes.get() }
        cur
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        // baseline: ONE explicit changelog pass over the same range
        bytes.set(0L)
        SnapshotLog.changes(spark, root, 1, Some(3), netChanges = true)
          .groupBy(col("grp")).agg(count(lit(1))).collect(): Unit
        val onePass = quiesce()
        assert(onePass > 0L)
        bytes.set(0L)
        IncrementalMv.maintain(spark, root, "mvrw_onepass.mv", Seq("grp"),
          Seq("v"))
        val maintainBytes = quiesce()
        // one changelog pass + the (tiny) MV read for the MERGE — a
        // second changelog pass would land near 2x
        assert(maintainBytes < (onePass * 1.6).toLong,
          s"maintain read $maintainBytes bytes vs $onePass for one pass — " +
            "the changelog is being re-read")
        assert(!IncrementalMv.minMaxValid(spark,
          IncrementalMv.registered(root).get.mvRoot),
          "the delete in range must still flip validity (probe intact)")
      } finally spark.sparkContext.removeSparkListener(listener)
    } finally IncrementalMv.unregister(spark, root)
  }

  // ---- expression group keys / time-grain MVs (r20) ----

  /** base(k, ts, v): hourly timestamps over ~42 days, v with nulls. */
  private def grainBase(n: Long) =
    spark.range(0, n).selectExpr("id AS k",
      "TIMESTAMP'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, CAST(id % 1000 AS INT), 0, 0) AS ts",
      "CASE WHEN id % 9 = 0 THEN NULL ELSE id % 1000 END AS v")

  test("time-grain MV: GROUP BY date_trunc('day', ts) creates, maintains " +
       "through DML, and serves the day query exactly") {
    val root = fresh("grain")
    SnapshotLog.commit(grainBase(2000), root, overwrite = true, 1000L)
    IncrementalMv.create(spark, root, "mvrw_grain.mv",
      Seq("date_trunc('day', ts) AS day"), Seq("v"))
    try {
      def q() = spark.read.format("snapshotlog").load(root)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
          avg(col("v")).as("av"))
      def cmp(mk: () => DataFrame, served: DataFrame => Boolean): Unit = {
        val df = mk()
        assert(served(df), df.queryExecution.optimizedPlan.toString)
        val got = df.collect().map(_.toString).sorted
        spark.conf.set("spark.graft.mv.autoRewrite", "false")
        val want = try mk().collect().map(_.toString).sorted
        finally spark.conf.unset("spark.graft.mv.autoRewrite")
        assert(got.sameElements(want),
          s"got=${got.mkString("|")}\nwant=${want.mkString("|")}")
      }
      cmp(() => q(), servedByMv(_, "mvrw_grain"))
      // SQL spelling too
      spark.read.format("snapshotlog").load(root)
        .createOrReplaceTempView("grain_t")
      cmp(() => spark.sql(
        "SELECT date_trunc('day', ts) AS day, count(*) AS n, " +
          "sum(v) AS sv FROM grain_t GROUP BY 1"),
        servedByMv(_, "mvrw_grain"))
      // maintenance recomputes the expr key on delta rows (append+delete)
      SnapshotLog.commit(grainBase(2600).filter(col("k") >= 2000), root,
        overwrite = false, 2000L)
      SnapshotLog.deleteWhereMoR(spark, root, col("k") % 13 === 5, 3000L)
      assert(!servedByMv(q(), "mvrw_grain"))
      IncrementalMv.maintain(spark, root, "mvrw_grain.mv",
        Seq("day"), Seq("v"))
      cmp(() => q(), servedByMv(_, "mvrw_grain"))
      // durable: a fresh process re-hydrates the expr key from props
      IncrementalMv.forgetInMemory()
      cmp(() => q(), servedByMv(_, "mvrw_grain"))
    } finally IncrementalMv.unregister(spark, root)
  }

  test("time-grain rollup: month / week / year queries re-truncate the " +
       "day MV; group-expr filters fold to the MV key; wrong grains and " +
       "shadowed measures refuse") {
    val root = fresh("grain2")
    SnapshotLog.commit(grainBase(3000), root, overwrite = true, 1000L)
    IncrementalMv.create(spark, root, "mvrw_grain2.mv",
      Seq("date_trunc('day', ts) AS day"), Seq("v"))
    try {
      val t = spark.read.format("snapshotlog").load(root)
      def cmp(mk: () => DataFrame): Unit = {
        val df = mk()
        assert(rolledUpFromMv(df, "mvrw_grain2"),
          df.queryExecution.optimizedPlan.toString)
        val got = df.collect().map(_.toString).sorted
        spark.conf.set("spark.graft.mv.autoRewrite", "false")
        val want = try mk().collect().map(_.toString).sorted
        finally spark.conf.unset("spark.graft.mv.autoRewrite")
        assert(got.sameElements(want),
          s"got=${got.mkString("|")}\nwant=${want.mkString("|")}")
      }
      for (grain <- Seq("month", "week", "year"))
        cmp(() => t.groupBy(date_trunc(grain, col("ts")).as("g"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
            avg(col("v")).as("av")))
      // global rollup still composes
      cmp(() => t.agg(count(lit(1)).as("n"), sum(col("v")).as("sv")))
      // a filter over the registered expression folds to the MV key —
      // served on both the exact and the coarser path
      val filt = t.filter(date_trunc("day", col("ts")) >=
          lit("2024-01-10 00:00:00").cast("timestamp"))
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("v")).as("sv"))
      assert(servedByMv(filt, "mvrw_grain2"),
        filt.queryExecution.optimizedPlan.toString)
      val filtMon = t.filter(date_trunc("day", col("ts")) >=
          lit("2024-01-10 00:00:00").cast("timestamp"))
        .groupBy(date_trunc("month", col("ts")).as("mon"))
        .agg(sum(col("v")).as("sv"))
      assert(rolledUpFromMv(filtMon, "mvrw_grain2"))
      val gotF = filtMon.collect().map(_.toString).sorted
      spark.conf.set("spark.graft.mv.autoRewrite", "false")
      val wantF = try t.filter(date_trunc("day", col("ts")) >=
          lit("2024-01-10 00:00:00").cast("timestamp"))
        .groupBy(date_trunc("month", col("ts")).as("mon"))
        .agg(sum(col("v")).as("sv")).collect().map(_.toString).sorted
      finally spark.conf.unset("spark.graft.mv.autoRewrite")
      assert(gotF.sameElements(wantF))
      // REFUSALS, each still computing correctly: a FINER grain (hour),
      // a different expression over ts, a filter on raw ts, and a
      // shadowed measure (v+1 AS v) must never bind the MV's v
      val hour = t.groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
      val other = t.groupBy(date_format(col("ts"), "yyyy-MM").as("m"))
        .agg(count(lit(1)).as("n"))
      val rawFilt = t.filter(col("ts") >
          lit("2024-01-10 00:00:00").cast("timestamp"))
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val shadow = t.select(col("ts"), (col("v") + 1).as("v"))
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("v")).as("sv"))
      for (bad <- Seq(hour, other, rawFilt, shadow))
        assert(!servedByMv(bad, "mvrw_grain2") &&
          !rolledUpFromMv(bad, "mvrw_grain2"),
          bad.queryExecution.optimizedPlan.toString)
      // and the shadowed-measure result really is the +1 aggregate
      val s1 = shadow.agg(sum(col("sv"))).head().getLong(0)
      val s0 = t.groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("v")).as("sv")).agg(sum(col("sv"))).head().getLong(0)
      assert(s1 === s0 + grainBase(3000)
        .filter(col("v").isNotNull).count())
    } finally IncrementalMv.unregister(spark, root)
  }

  test("a session-tz change after create REFUSES expression-key serving " +
       "and maintenance (date_trunc boundaries are tz-dependent)") {
    val root = fresh("graintz")
    SnapshotLog.commit(grainBase(500), root, overwrite = true, 1000L)
    IncrementalMv.create(spark, root, "mvrw_graintz.mv",
      Seq("date_trunc('day', ts) AS day"), Seq("v"))
    try {
      def q() = spark.read.format("snapshotlog").load(root)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("v")).as("sv"))
      assert(servedByMv(q(), "mvrw_graintz"))
      val tzKey = "spark.sql.session.timeZone"
      val old = spark.conf.get(tzKey)
      spark.conf.set(tzKey, "America/Los_Angeles")
      try {
        assert(!servedByMv(q(), "mvrw_graintz") &&
          !rolledUpFromMv(q(), "mvrw_graintz"),
          "a different session tz must refuse expression-key serving")
        SnapshotLog.commit(grainBase(600).filter(col("k") >= 500), root,
          overwrite = false, 2000L)
        intercept[IllegalArgumentException] {
          IncrementalMv.maintain(spark, root, "mvrw_graintz.mv",
            Seq("day"), Seq("v"))
        }
      } finally spark.conf.set(tzKey, old)
      // back under the create-time tz: maintenance and serving resume
      IncrementalMv.maintain(spark, root, "mvrw_graintz.mv",
        Seq("day"), Seq("v"))
      assert(servedByMv(q(), "mvrw_graintz"))
    } finally IncrementalMv.unregister(spark, root)
  }

  test("create_mv's group_exprs parameter drives the time-grain loop " +
       "from SQL") {
    val ns = "mvrw_tgproc"
    val fs = new Path(s"/tmp/graft_snap_warehouse/$ns")
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(s"/tmp/graft_snap_warehouse/$ns"), true)
    spark.sql(s"DROP TABLE IF EXISTS snap.$ns.base")
    grainBase(1500).createOrReplaceTempView("tgproc_src")
    spark.sql(s"CREATE TABLE snap.$ns.base AS SELECT * FROM tgproc_src")
    val baseRoot = s"/tmp/graft_snap_warehouse/$ns/base"
    try {
      spark.sql(
        s"CALL snap.system.create_mv('$ns.base', '$ns.mv', '', 'v', " +
          s"group_exprs => \"date_trunc('day', ts) AS day\")").collect()
      val q = spark.table(s"snap.$ns.base")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      assert(servedByMv(q, s"$ns/mv"),
        q.queryExecution.optimizedPlan.toString)
      spark.sql(s"INSERT INTO snap.$ns.base SELECT k + 10000, ts, v " +
        "FROM tgproc_src WHERE k % 3 = 0")
      spark.sql(s"CALL snap.system.refresh_mv('$ns.base')").collect()
      val q2 = spark.table(s"snap.$ns.base")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      assert(servedByMv(q2, s"$ns/mv"))
      assert(q2.agg(sum(col("n"))).head().getLong(0) === 2000L)
    } finally IncrementalMv.unregister(spark, baseRoot)
  }

  test("week-grain MV serves week but refuses month/year (weeks don't " +
       "nest); mixed plain+expr keys compose") {
    val root = fresh("grain3")
    SnapshotLog.commit(grainBase(2000)
      .withColumn("cc", col("k") % 5), root, overwrite = true, 1000L)
    IncrementalMv.create(spark, root, "mvrw_grain3.mv",
      Seq("date_trunc('week', ts) AS wk", "cc"), Seq("v"))
    try {
      val t = spark.read.format("snapshotlog").load(root)
      val wk = t.groupBy(date_trunc("week", col("ts")).as("wk"), col("cc"))
        .agg(count(lit(1)).as("n"))
      assert(servedByMv(wk, "mvrw_grain3"),
        wk.queryExecution.optimizedPlan.toString)
      // rollup to just cc (dropping the week key) composes
      val ccOnly = t.groupBy(col("cc")).agg(sum(col("v")).as("sv"))
      assert(rolledUpFromMv(ccOnly, "mvrw_grain3"))
      // month over a week MV must refuse — weeks straddle month bounds
      val mon = t.groupBy(date_trunc("month", col("ts")).as("m"))
        .agg(count(lit(1)).as("n"))
      assert(!servedByMv(mon, "mvrw_grain3") &&
        !rolledUpFromMv(mon, "mvrw_grain3"))
    } finally IncrementalMv.unregister(spark, root)
  }

  test("time-traveled reads rewrite only at the watermark version") {
    val root = fresh("tt")
    SnapshotLog.commit(base(400), root, overwrite = true, 1000L)
    SnapshotLog.commit(base(400).filter(col("k") < 5), root,
      overwrite = false, 2000L)
    IncrementalMv.create(spark, root, "mvrw_tt.mv", "grp", "v") // applied=2
    try {
      def at(v: Int): DataFrame =
        spark.read.format("snapshotlog").option("asOfVersion", v).load(root)
          .groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      assert(!servedByMv(at(1), "mvrw_tt"), "v1 != watermark ⇒ aggregate")
      assert(servedByMv(at(2), "mvrw_tt"), "v2 == watermark ⇒ MV")
      // v1 result stays the un-duplicated aggregate
      assert(at(1).filter(col("grp") === 0).select("n").as[Long].head() ===
        (0L until 400L).count(_ % 7 == 0).toLong)
    } finally IncrementalMv.unregister(spark, root)
  }

  // ---- apply-token crash recovery (r21, ADVICE r20 item 1) ----

  test("fact maintain(): a lost watermark write after the MERGE never " +
       "double-applies (apply token rides the MERGE snapshot)") {
    val root = fresh("crashfact")
    SnapshotLog.commit(base(500), root, overwrite = true, 1000L)
    IncrementalMv.create(spark, root, "mvrw_crashfact.mv", "grp", "v")
    val mvRoot = IncrementalMv.registered(root).get.mvRoot
    try {
      SnapshotLog.commit(base(500).filter(col("k") < 20), root,
        overwrite = false, 2000L)
      IncrementalMv.maintain(spark, root, "mvrw_crashfact.mv", "grp", "v")
      val want = defAgg(root).collect().map(_.toString).sorted
      // simulate the crash window: MERGE landed (token in the MV history),
      // the separate tblprops watermark write did not
      SnapshotLog.setTableProps(spark, mvRoot,
        Map(IncrementalMv.AppliedProp -> "1"))
      val again = IncrementalMv.maintain(
        spark, root, "mvrw_crashfact.mv", "grp", "v")
      assert(again === 2, "recovery must complete the watermark")
      val got = defAgg(root).collect().map(_.toString).sorted
      assert(got.sameElements(want),
        s"delta re-applied (double count)\ngot=${got.mkString("|")}\n" +
          s"want=${want.mkString("|")}")
      assert(servedByMv(defAgg(root), "mvrw_crashfact"))
    } finally IncrementalMv.unregister(spark, root)
  }

  test("maintainDims(): a lost dim-watermark write after the MERGE never " +
       "double-applies the dim delta") {
    val (factRoot, dimRoot) = joinFixture("crashdim")
    IncrementalMv.createJoin(spark, factRoot, dimRoot, "ck", "dk",
      "mvrw_crashdim.mv", Seq("grp"), Seq("v"))
    val mvRoot = IncrementalMv.registered(factRoot).get.mvRoot
    try {
      SnapshotLog.updateWhereMoR(spark, dimRoot, col("dk") % 4 === 1,
        Map("grp" -> (col("grp") + 10)), 1500L)
      val dimVs = IncrementalMv.maintainDims(spark, factRoot,
        "mvrw_crashdim.mv", Seq("grp"), Seq("v"))
      val want = joinAgg(factRoot, dimRoot).collect().map(_.toString).sorted
      // crash window: revert the dim watermark as if the tblprops write
      // was lost right after the MERGE committed
      SnapshotLog.setTableProps(spark, mvRoot,
        Map(IncrementalMv.AppliedDimProp -> "1"))
      assert(IncrementalMv.maintainDims(spark, factRoot, "mvrw_crashdim.mv",
        Seq("grp"), Seq("v")) === dimVs,
        "recovery must restore the dim watermark without re-applying")
      val got = joinAgg(factRoot, dimRoot).collect().map(_.toString).sorted
      assert(got.sameElements(want),
        s"dim delta re-applied (double count)\ngot=${got.mkString("|")}\n" +
          s"want=${want.mkString("|")}")
      assert(servedByMv(joinAgg(factRoot, dimRoot), "mvrw_crashdim"))
    } finally IncrementalMv.unregister(spark, factRoot)
  }

  // ---- symmetric crash recovery (r22, ADVICE r21 medium item): each
  // maintenance entry point must repair BOTH watermark families before
  // pinning either, or the crash window of one side silently drifts the
  // other side's algebra ----

  test("maintain() after a dim-side crash window repairs the dim " +
       "watermark before pinning the dim (no stale-dim join)") {
    val (factRoot, dimRoot) = joinFixture("crashsymf")
    IncrementalMv.createJoin(spark, factRoot, dimRoot, "ck", "dk",
      "mvrw_crashsymf.mv", Seq("grp"), Seq("v"))
    val mvRoot = IncrementalMv.registered(factRoot).get.mvRoot
    try {
      // dim advances and is applied (MV now reflects dim v2)...
      SnapshotLog.updateWhereMoR(spark, dimRoot, col("dk") % 4 === 1,
        Map("grp" -> (col("grp") + 10)), 1500L)
      IncrementalMv.maintainDims(spark, factRoot, "mvrw_crashsymf.mv",
        Seq("grp"), Seq("v"))
      // ...but the watermark write is lost (crash window)
      SnapshotLog.setTableProps(spark, mvRoot,
        Map(IncrementalMv.AppliedDimProp -> "1"))
      // a fact delta arrives; maintain() must join it against the dim the
      // MV CONTENTS reflect (v2), not the stale pinned v1
      SnapshotLog.commit(
        spark.range(900, 1100).selectExpr("id AS k", "id % 9 AS ck",
          "id * 2 AS v"),
        factRoot, overwrite = false, 2000L)
      IncrementalMv.maintain(spark, factRoot, "mvrw_crashsymf.mv",
        Seq("grp"), Seq("v"))
      val want = joinAgg(factRoot, dimRoot).collect().map(_.toString).sorted
      assert(servedByMv(joinAgg(factRoot, dimRoot), "mvrw_crashsymf"),
        "watermarks must both be repaired and current")
      val got = joinAgg(factRoot, dimRoot).collect().map(_.toString).sorted
      assert(got.sameElements(want),
        s"fact delta joined a stale dim (crash-window drift)\n" +
          s"got=${got.mkString("|")}\nwant=${want.mkString("|")}")
    } finally IncrementalMv.unregister(spark, factRoot)
  }

  test("maintainDims() after a fact-side crash window repairs the fact " +
       "watermark before pinning the fact (no stale-fact join)") {
    val (factRoot, dimRoot) = joinFixture("crashsymd")
    IncrementalMv.createJoin(spark, factRoot, dimRoot, "ck", "dk",
      "mvrw_crashsymd.mv", Seq("grp"), Seq("v"))
    val mvRoot = IncrementalMv.registered(factRoot).get.mvRoot
    try {
      // fact advances and is applied (MV now reflects fact v2)...
      SnapshotLog.commit(
        spark.range(900, 1100).selectExpr("id AS k", "id % 9 AS ck",
          "id * 2 AS v"),
        factRoot, overwrite = false, 2000L)
      IncrementalMv.maintain(spark, factRoot, "mvrw_crashsymd.mv",
        Seq("grp"), Seq("v"))
      // ...but the fact watermark write is lost (crash window)
      SnapshotLog.setTableProps(spark, mvRoot,
        Map(IncrementalMv.AppliedProp -> "1"))
      // a dim delta arrives; maintainDims() must join it against the fact
      // the MV CONTENTS reflect (v2), not the stale pinned v1
      SnapshotLog.updateWhereMoR(spark, dimRoot, col("dk") % 4 === 1,
        Map("grp" -> (col("grp") + 10)), 2500L)
      IncrementalMv.maintainDims(spark, factRoot, "mvrw_crashsymd.mv",
        Seq("grp"), Seq("v"))
      val want = joinAgg(factRoot, dimRoot).collect().map(_.toString).sorted
      assert(servedByMv(joinAgg(factRoot, dimRoot), "mvrw_crashsymd"),
        "watermarks must both be repaired and current")
      val got = joinAgg(factRoot, dimRoot).collect().map(_.toString).sorted
      assert(got.sameElements(want),
        s"dim delta joined a stale fact (crash-window drift)\n" +
          s"got=${got.mkString("|")}\nwant=${want.mkString("|")}")
    } finally IncrementalMv.unregister(spark, factRoot)
  }
}
