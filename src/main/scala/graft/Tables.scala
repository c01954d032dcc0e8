package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Each loader is a plain parquet scan; Catalyst pushes filters/projections
  * into the scan (verified via `.explain` — `PushedFilters`/`ReadSchema`),
  * so at 100 TB these behave as pruned columnar reads, not full scans.
  */
object Tables {
  /** Inferred parquet schema per fixture path — a catalog in miniature.
    * `spark.read.parquet(path)` re-infers the schema from file footers on
    * EVERY call (driver-side I/O); the fixtures are immutable for a
    * process lifetime, and a real deployment reads the schema from its
    * catalog (Iceberg/HMS) exactly once. Caching the StructType (never
    * data, never results) removes that per-query driver stall — the
    * r21-measured cost was ~5-15 ms per table() call across the whole
    * 300-query bench. Keyed by full path, so mixed-SF runs stay correct. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Kill switch for the schema cache (ADVICE r21): a harness that rewrites
    * a fixture path with a DIFFERENT schema inside one JVM would silently
    * read through the stale cached schema — set `-Dgraft.schema.cache=false`
    * (or the env var GRAFT_SCHEMA_CACHE=false) to fall back to per-call
    * footer inference. Default on: fixtures are process-immutable. */
  private val cacheEnabled: Boolean =
    sys.props.get("graft.schema.cache")
      .orElse(sys.env.get("GRAFT_SCHEMA_CACHE"))
      .forall(v => !v.equalsIgnoreCase("false"))

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    if (!cacheEnabled) return spark.read.parquet(path)
    val schema = schemaCache.computeIfAbsent(path, p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  /** If a fixture generation ships a wall-clock column as TIMESTAMP(NANOS),
    * the session's nanosAsLong conf surfaces it as epoch-ns LongType; convert
    * with the exact integral `div` (same policy as events.ts). A native
    * timestamp column (µs, NTZ or LTZ) passes through untouched — oracles are
    * written against that representation. */
  private def nsFallback(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df) { (acc, c) =>
      acc.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType =>
          acc.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
        case _ => acc
      }
    }

  def orders(s: SparkSession, d: String): DataFrame =
    nsFallback(table(s, d, "orders"), "o_orderdate")
  def lineitem(s: SparkSession, d: String): DataFrame =
    nsFallback(table(s, d, "lineitem"), "l_shipdate")
  /** `events.ts` has shipped as both TIMESTAMP(NANOS) (historical fixtures;
    * Spark 4 rejects it unless read as long via the legacy conf) and plain
    * TIMESTAMP(µs) (current fixtures). Dispatch on the read schema so either
    * generation loads: LongType means the legacy conf turned a ns column into
    * epoch-nanos — exact integral `div 1000` (not `/`, which loses ulps at
    * epoch-ns magnitude) to µs; a timestamp type (NTZ or LTZ) just casts to
    * the session-zone TimestampType, value-identical under the UTC session.
    * Oracle SQL writes `CAST(ts AS TIMESTAMP)`, correct under DuckDB's µs
    * read in both generations.
    *
    * The legacy conf stays set session-globally: it is a no-op for non-ns
    * columns, and parquet scan planning re-reads SQLConf at action time, so a
    * set/restore around the read would break execution of the ns path.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Timestamp literal evaluated in the session time zone (UTC). */
  def ts(v: String): Column = to_timestamp(lit(v))

  /** Register every fixture as a temp view so queries can use spark.sql —
    * the SQL surface (BodoSQLContext.sql equivalent) is part of the engine.
    * Idempotent; re-registered per call because the sf dir varies. */
  def registerViews(s: SparkSession, d: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => table(s, d, t).createOrReplaceTempView(t))
    events(s, d).createOrReplaceTempView("events")
  }
}
