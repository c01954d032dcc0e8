package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark
import graft.sources.SnapshotLog

/** NDV statistics → planner (r14): ANALYZE writes a Puffin-style
  * sidecar (KMV sketches + null counts); the DSv2 scan surfaces row
  * counts, NDV, and footer min/max through SupportsReportStatistics;
  * Spark's CBO then estimates filter selectivity — and the JOIN
  * STRATEGY provably changes with stats present.
  */
class SnapshotStatsSpec extends AnyFunSuite {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val root = s"/tmp/graft_stats_spec/$tag"
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(root), true)
    root
  }

  // string match: AQE wraps the plan in AdaptiveSparkPlanExec, whose
  // inner plan is not reachable through .collect children
  private def hasBroadcast(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin")

  private def withConfs[A](kv: (String, String)*)(body: => A): A = {
    val olds = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // incompressible-ish payload so parquet sizes track row counts
  private def wide(n: Long) = spark.range(0, n, 1, 2).selectExpr(
    "id AS k", "concat(md5(cast(id AS string)), md5(cast(id + 1 AS string)), " +
      "md5(cast(id + 2 AS string)), md5(cast(id + 3 AS string))) AS pad")

  test("ANALYZE stats flip the join to broadcast via filter selectivity") {
    val bigRoot = freshRoot("big")
    val otherRoot = freshRoot("other")
    SnapshotLog.commit(wide(50000), bigRoot, overwrite = true, 100L, 1)
    SnapshotLog.commit(wide(50000), otherRoot, overwrite = true, 100L, 1)
    val snap = SnapshotLog.snapshots(spark, bigRoot).last
    val tableBytes = snap.sizes.values.sum
    assert(tableBytes > (1 << 20), s"fixture too small: $tableBytes bytes")

    withConfs(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> (1 << 20).toString) {
      // keep the wide pad columns in the join output: with exact row
      // counts (always reported from the manifest) but NO column stats,
      // the filter cannot be estimated selective, so both sides stay
      // ~7MB and neither broadcasts; ANALYZE's min/max/NDV then prove
      // `k < 20` keeps ~20 rows — only that flips the strategy
      def q() = spark.read.format("snapshotlog").load(bigRoot)
        .filter(col("k") < 20)
        .join(spark.read.format("snapshotlog").load(otherRoot)
          .withColumnRenamed("pad", "pad2"), "k")
      assert(!hasBroadcast(q()),
        "without stats the join must not broadcast:\n" +
          q().queryExecution.executedPlan.toString)

      val v = SnapshotLog.analyze(spark, bigRoot)
      assert(v === 1)
      // WITH stats: rowCount + NDV + min/max make `k < 20` provably tiny
      // — the filtered side becomes broadcast-eligible
      val after = q()
      assert(hasBroadcast(after),
        "with ANALYZE stats the filtered side must broadcast:\n" +
          after.queryExecution.executedPlan.toString)
      assert(after.select("k").distinct().count() === 20)
    }
  }

  test("scan reports exact post-prune row counts and per-column NDV") {
    val root = freshRoot("ndv")
    SnapshotLog.commit(
      spark.range(0, 10000).selectExpr("id AS k", "id % 40 AS grp",
        "CASE WHEN id % 10 = 0 THEN NULL ELSE concat('u', id % 500) END AS tag"),
      root, overwrite = true, 100L, 4)
    SnapshotLog.analyze(spark, root)
    val (v, rows, cols) = SnapshotLog.colStatsFor(spark, root, 1).get
    assert(v === 1 && rows === 10000L)
    assert(cols("k").ndv > 9000 && cols("k").ndv < 11000) // KMV estimate
    assert(cols("grp").ndv === 40) // below k: exact
    assert(cols("tag").nulls === 1000)
    assert(cols("tag").ndv > 400 && cols("tag").ndv < 600) // 500 > k: estimate

    val df = spark.read.format("snapshotlog").load(root)
    val stats = df.queryExecution.optimizedPlan.stats
    withConfs("spark.sql.cbo.enabled" -> "true") {
      val s2 = spark.read.format("snapshotlog").load(root)
        .queryExecution.optimizedPlan.stats
      assert(s2.rowCount.contains(BigInt(10000)),
        s"expected exact rowCount, got ${s2.rowCount}")
      assert(s2.attributeStats.nonEmpty, "expected per-attribute NDV stats")
      val grpStat = s2.attributeStats.find(_._1.name == "grp").map(_._2)
      assert(grpStat.exists(_.distinctCount.contains(BigInt(40))))
    }
    assert(stats.sizeInBytes > 0)
  }

  test("stats refer to the analyzed version: later versions still plan, " +
       "pre-analyze pins see no column stats") {
    val root = freshRoot("versions")
    SnapshotLog.commit(spark.range(0, 1000).selectExpr("id AS k"),
      root, overwrite = true, 100L)
    SnapshotLog.commit(spark.range(1000, 2000).selectExpr("id AS k"),
      root, overwrite = false, 200L)
    SnapshotLog.analyze(spark, root) // analyzes v2
    assert(SnapshotLog.colStatsFor(spark, root, 1).isEmpty,
      "a v1 pin must not see stats computed at v2")
    assert(SnapshotLog.colStatsFor(spark, root, 2).exists(_._1 == 2))
    // a later append still reads/plans fine with v2 stats as estimates
    SnapshotLog.commit(spark.range(2000, 2500).selectExpr("id AS k"),
      root, overwrite = false, 300L)
    assert(spark.read.format("snapshotlog").load(root).count() === 2500)
    assert(SnapshotLog.colStatsFor(spark, root, 3).exists(_._1 == 2))
  }

  test("CALL snap.system.analyze_table runs the ANALYZE pass via SQL") {
    val wh = "/tmp/graft_snap_warehouse"
    val fs = new Path(s"$wh/statsns").getFileSystem(
      spark.sessionState.newHadoopConf())
    fs.delete(new Path(s"$wh/statsns"), true)
    spark.sql("DROP TABLE IF EXISTS snap.statsns.t")
    spark.sql("CREATE TABLE snap.statsns.t AS SELECT id AS k, id % 25 AS g FROM range(5000)")
    val r = spark.sql("CALL snap.system.analyze_table('statsns.t')").head()
    assert(r.getInt(0) === 2) // CTAS = create v1 + append v2
    assert(r.getLong(1) === 5000L)
    assert(r.getLong(2) === 2L)
    val (_, _, cols) = SnapshotLog.colStatsFor(spark, s"$wh/statsns/t", 2).get
    assert(cols("g").ndv === 25)
  }

  test("expiry reaps stale ANALYZE sidecars but keeps the newest usable one") {
    val root = freshRoot("expire_stats")
    SnapshotLog.commit(spark.range(0, 100).selectExpr("id AS k"),
      root, overwrite = true, 100L)
    SnapshotLog.analyze(spark, root) // stats at v1
    SnapshotLog.commit(spark.range(100, 200).selectExpr("id AS k"),
      root, overwrite = false, 200L)
    SnapshotLog.analyze(spark, root) // stats at v2
    SnapshotLog.commit(spark.range(200, 300).selectExpr("id AS k"),
      root, overwrite = false, 300L)
    SnapshotLog.expireSnapshots(spark, root, keepFromVersion = 2)
    // v1's sidecar is gone, v2's survives as the best estimate for v2/v3
    assert(SnapshotLog.colStatsFor(spark, root, 3).exists(_._1 == 2))
    val dir = new Path(root, "_log")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val statFiles = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("colstats-"))
    assert(statFiles.toSeq === Seq("colstats-v00002.json"))
  }

  test("kmv_sketch merges across partitions like the live kmv_ndv buffer") {
    val df = spark.range(0, 5000, 1, 8).selectExpr("id % 700 AS v")
    val root = freshRoot("sketch")
    SnapshotLog.commit(df, root, overwrite = true, 100L, 8)
    SnapshotLog.analyze(spark, root, k = 1024)
    val (_, _, cols) = SnapshotLog.colStatsFor(spark, root, 1).get
    assert(cols("v").ndv === 700, "below-k sketch must be exact across 8 partitions")
  }

  test("equi-height histograms fix skewed-filter estimates and the " +
       "join-side choice") {
    val root = freshRoot("hist_skew")
    val other = freshRoot("hist_other")
    // 99% of keys in [0,100), 1% flung to ~1e6: uniform min/max
    // interpolation estimates `k < 100` at ~0.01% when the truth is 99%
    val skew = spark.range(0, 60000, 1, 2).selectExpr(
      "CASE WHEN id % 100 < 99 THEN id % 100 ELSE 1000000 + id % 1000 END AS k",
      "concat(md5(cast(id AS string)), md5(cast(id + 1 AS string)), " +
        "md5(cast(id + 2 AS string)), md5(cast(id + 3 AS string))) AS pad")
    SnapshotLog.commit(skew, root, overwrite = true, 100L, 1)
    SnapshotLog.commit(wide(60000), other, overwrite = true, 100L, 1)

    withConfs(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> (1 << 20).toString) {
      def filtered() = spark.read.format("snapshotlog").load(root)
        .filter(col("k") < 100)
      def estimate() = filtered().queryExecution.optimizedPlan.stats
        .rowCount.map(_.toLong)
      def joined() = filtered()
        .join(spark.read.format("snapshotlog").load(other)
          .withColumnRenamed("pad", "pad2"), "k")

      // NDV + min/max only (histBins = 0): the uniform-range estimate is
      // off by orders of magnitude, and the misestimated-tiny filtered
      // side WRONGLY broadcasts a ~7 MB table
      SnapshotLog.analyze(spark, root, histBins = 0)
      val uniform = estimate()
      assert(uniform.exists(_ < 5000),
        s"expected a wild underestimate without histograms, got $uniform")
      assert(hasBroadcast(joined()),
        "without histograms the misestimated side broadcasts — " +
          "the hazard this test pins")

      // re-ANALYZE with histograms: ~63/64 bins sit inside [0,100), so
      // the estimate lands near the true 99% and the broadcast vanishes
      SnapshotLog.analyze(spark, root, histBins = 64)
      val (_, _, cols) = SnapshotLog.colStatsFor(spark, root, 1).get
      val h = cols("k").hist.getOrElse(fail("no histogram recorded"))
      assert(h.bins.size === 64)
      assert(math.abs(h.height - 60000.0 / 64) < 1.0)
      assert(h.bins.count(b => b._2 < 100) >= 60,
        s"skew must concentrate the equi-height bins below 100: $h")
      val withHist = estimate()
      assert(withHist.exists(_ > 40000),
        s"histogram estimate should approach the true 59400, got $withHist")
      assert(!hasBroadcast(joined()),
        "with histograms the big filtered side must NOT broadcast:\n" +
          joined().queryExecution.executedPlan.toString)
      // ground truth unchanged by stats
      assert(filtered().count() === 59400)
    }
  }

  test("timestamp histograms live in epoch-micros space and fix " +
       "time-skewed range estimates") {
    val root = freshRoot("hist_ts")
    // 99% of events in one hour of 2024-01-01, 1% spread over the year
    val skew = spark.range(0, 40000, 1, 2).selectExpr(
      "id AS k",
      "CASE WHEN id % 100 < 99 " +
        "THEN timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, id % 3600) " +
        "ELSE timestamp'2024-01-01 00:00:00' + make_interval(0,0,0, CAST(id % 365 AS INT)) END AS ts")
    SnapshotLog.commit(skew, root, overwrite = true, 100L, 1)
    withConfs("spark.sql.cbo.enabled" -> "true") {
      SnapshotLog.analyze(spark, root, histBins = 64)
      val (_, _, cols) = SnapshotLog.colStatsFor(spark, root, 1).get
      val h = cols("ts").hist.getOrElse(fail("no timestamp histogram"))
      // bins are epoch MICROS (catalyst's internal timestamp space)
      val epoch2024Micros = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000.0
      assert(h.bins.head._1 >= epoch2024Micros &&
        h.bins.head._1 < epoch2024Micros + 366.0 * 86400 * 1000000,
        s"first bin lo not in 2024 epoch-micros range: ${h.bins.head._1}")
      // equi-height: most bins sit inside the hot hour
      assert(h.bins.count(_._2 <= epoch2024Micros + 3600e6) >= 60,
        "time skew must concentrate the bins in the hot hour")
      // the skewed range probe estimates near its true 99% share
      val est = spark.read.format("snapshotlog").load(root)
        .filter(col("ts") < to_timestamp(lit("2024-01-01 01:00:00")))
        .queryExecution.optimizedPlan.stats.rowCount.map(_.toLong)
      assert(est.exists(_ > 25000),
        s"histogram should push the hot-hour estimate toward 39600, got $est")
    }
  }

  test("NTZ histograms live in WALL-CLOCK micros regardless of session TZ " +
       "(the space FilterEstimation compares NTZ bounds in)") {
    val root = freshRoot("hist_ntz")
    // 1000 NTZ values, one per minute from wall-clock midnight 2021-03-01
    val df = spark.range(0, 1000, 1, 2).selectExpr(
      "id AS k",
      "timestampadd(MINUTE, CAST(id AS int), " +
        "TIMESTAMP_NTZ'2021-03-01 00:00:00') AS t")
    SnapshotLog.commit(df, root, overwrite = true, 100L, 1)
    val wallLo = java.time.LocalDateTime.parse("2021-03-01T00:00:00")
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1e6
    val wallHi = wallLo + 999L * 60 * 1e6
    for (tz <- Seq("UTC", "America/New_York")) {
      withConfs("spark.sql.session.timeZone" -> tz) {
        SnapshotLog.analyze(spark, root, histBins = 8)
        val (_, _, cols) = SnapshotLog.colStatsFor(spark, root, 1).get
        val h = cols("t").hist.getOrElse(fail(s"no NTZ histogram under $tz"))
        assert(math.abs(h.bins.head._1 - wallLo) < 60e6,
          s"under $tz the first endpoint must sit at wall-clock midnight " +
            s"(±1min), got ${h.bins.head._1} want ~$wallLo")
        assert(math.abs(h.bins.last._2 - wallHi) < 60e6,
          s"under $tz the last endpoint must be TZ-independent, " +
            s"got ${h.bins.last._2} want ~$wallHi")
      }
    }
  }

  test("ANALYZE survives a double column containing ±Infinity: the " +
       "non-finite histogram is skipped, every other stat records") {
    val root = freshRoot("hist_inf")
    val df = spark.range(0, 1000, 1, 2).selectExpr(
      "id AS k",
      // a ratio with a zero denominator upstream: real corpora have these
      "CASE WHEN id % 100 = 0 THEN double('Infinity') " +
        "WHEN id % 101 = 0 THEN double('-Infinity') " +
        "ELSE id * 1.5 END AS ratio")
    SnapshotLog.commit(df, root, overwrite = true, 100L, 1)
    SnapshotLog.analyze(spark, root, histBins = 16) // must not throw
    val (_, n, cols) = SnapshotLog.colStatsFor(spark, root, 1).get
    assert(n === 1000L)
    assert(cols("ratio").hist.isEmpty,
      "non-finite endpoints must skip the histogram, not crash ANALYZE")
    assert(cols("k").hist.nonEmpty,
      "the finite column's histogram still records")
  }
}
