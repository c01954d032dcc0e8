package graft

import org.apache.spark.sql.SparkSession

/** Single shared SparkSession factory (SURVEY.md §7.2-M0).
  *
  * Every entry point (Verify, Bench, ScalaTest suites) builds its session
  * here so the engine under test is always the tuned engine: AQE on (runtime
  * re-plan, skew-join splitting), runtime bloom-filter join pruning, CBO,
  * and UTC+ns-as-long session conventions the fixtures require.
  * Mirrors the reference's always-on bloom/runtime-filter behavior
  * (bodo/libs/streaming/_join.h:16 SIMD block bloom;
  * RuntimeJoinFilterProgram.kt) via Spark's built-in equivalents.
  */
object Sessions {
  def build(master: String, shufflePartitions: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      // library extension point: registers the custom Catalyst expressions
      // (jaro_winkler, uuid5) on every session built from this config
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      // Historical fixture generations shipped events.ts as TIMESTAMP(NANOS),
      // which Spark 4 rejects natively; the conf lets that generation read as
      // long (Tables.events dispatches on the result). No-op for the current
      // µs-typed fixtures.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Write standard INT64 TIMESTAMP(MICROS), not legacy INT96: Iceberg
      // forbids INT96, and INT96 carries no usable footer min/max stats —
      // SnapshotLog lifts commit-time stats straight from parquet footers.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // ANSI TIME (Spark 4.1 TimeType, feature-flagged): the TIME kit
      // (fn_time, TIME_FROM_PARTS) serves native time(6) columns; the
      // long-nanos helpers remain as compat aliases (SURVEY §1.2 note
      // predates the type's availability)
      .config("spark.sql.timeType.enabled", "true")
      // AQE: runtime coalescing, skew-join handling, bcast demotion.
      .config("spark.sql.adaptive.enabled", "true")
      // Post-shuffle coalescing: the r21 optimization round A/B'd every
      // posture over the FULL suite (env knobs below, full-bench runs):
      //   - parallelismFirst=true, floor 1m (Spark defaults): 97.4 s
      //   - pf=true, minPartitionSize floor 4m:               101.0 s
      //   - pf=true, floor 8m:                                100.0 s
      //   - pf=false (coalesce to advisory 64m):              108.5 s*
      // Byte-based coalescing cannot see COMPUTE density: floors/advisory
      // help byte-light agg tails (TPC-H family -0.8..-1.2 s) but
      // serialize the compute-dense-per-byte stages — LSH/shingle
      // self-joins whose pair output explodes relative to shuffle bytes
      // (dedup family +1.6 s, composite +0.9 s) — and the advisory
      // posture additionally starved page allocation once under the
      // racing-writers suite (TaskMemoryManager 64 MB allocate-retry
      // loop; bigger partitions = bigger per-task memory, guide §2.2's
      // own caveat). Spark's scale-adaptive default (target =
      // clamp(bytes/parallelism, 1m, advisory)) is the measured best
      // overall and is what ships; the knobs stay for cluster-side A/B.
      // (*advisory run pre-dated two per-query fixes; family deltas are
      // from matched runs.)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("GRAFT_AQE_PARALLELISM_FIRST", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("GRAFT_AQE_ADVISORY", "64m"))
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("GRAFT_AQE_MIN_PARTITION", "1m"))
      // Build-side bloom filter pushed into probe-side scans — the Spark
      // counterpart of the reference's runtime join filters.
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      // SnapshotLog TableCatalog: SQL-surface snapshot tables under `snap.*`
      // with VERSION AS OF / TIMESTAMP AS OF served from the manifest log
      .config("spark.sql.catalog.snap", "graft.sources.SnapshotLogCatalog")
      .config("spark.sql.catalog.snap.warehouse", "/tmp/graft_snap_warehouse")
      // Storage-partitioned joins: honor KeyGroupedPartitioning reported
      // by DSv2 scans — co-bucketed snapshot tables join with NO shuffle
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** local[N] with N shuffle partitions, N from SPARK_GRAFT_CPUS (driver contract). */
  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    build(s"local[$cpus]", cpus.toInt)
  }
}
