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
  def build(master: String, shufflePartitions: Int): SparkSession =
    build(master, shufflePartitions, coalesceToAdvisory = false)

  /** @param coalesceToAdvisory post-shuffle AQE coalescing posture:
    *   `true` sets `coalescePartitions.parallelismFirst=false`, i.e.
    *   coalesce to the ADVISORY size (guide §2.2 "fewer, larger reduce
    *   partitions" — the Spark-documented busy-cluster recommendation;
    *   measured r21: TPC-H battery 15.6 -> 13.9 s on local[32]/sf0.1).
    *   The batch entrypoints (Bench/Verify, [[local]]) use it. The shared
    *   TEST session keeps the fragment-per-core default (`false` here):
    *   the suite races concurrent DML writers on a 4-core/8 GB session
    *   where larger coalesced partitions raised peak per-task execution
    *   memory enough to starve page allocation once (observed r21:
    *   TaskMemoryManager 64 MB allocate-retry loop in the racing-writers
    *   property suite under the full-suite cumulative cache state) —
    *   sequential bench queries never see that interaction. */
  def build(master: String, shufflePartitions: Int,
            coalesceToAdvisory: Boolean): SparkSession = {
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
      // Post-shuffle coalescing posture — see the scaladoc above. At
      // 100 TB the two settings coincide everywhere except the reduced
      // tail stages, where fragment-per-core partitioning only adds
      // scheduling and fetch overhead. Measured r21 on local[32]/sf0.1:
      // TPC-H battery 15.6 s -> 13.9 s (q9 1.20->0.77, q20 1.36->0.86),
      // dedup family neutral. Env-overridable for A/B; the advisory size
      // stays at the 64m default, raise via env for huge-shuffle
      // deployments.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("GRAFT_AQE_PARALLELISM_FIRST",
          (!coalesceToAdvisory).toString))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("GRAFT_AQE_ADVISORY", "64m"))
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

  /** local[N] with N shuffle partitions, N from SPARK_GRAFT_CPUS (driver
    * contract). Batch entrypoint: coalesces post-shuffle partitions to
    * the advisory size (see [[build]]). */
  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    build(s"local[$cpus]", cpus.toInt, coalesceToAdvisory = true)
  }
}
