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
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark 4 rejects.
    * Read nanos as long (legacy conf) and convert to a µs TimestampType via
    * exact integral division (`div`, not `/` — float division loses ulps at
    * epoch-ns magnitude). DuckDB keeps ns when it reads this column, so any
    * oracle SQL that exposes `ts` must cast it to µs (`CAST(ts AS TIMESTAMP)`)
    * to match (FIXTURES.md ns policy).
    *
    * The legacy conf is session-global by design: parquet scan planning
    * re-reads SQLConf at action time, so a set/restore around the read would
    * break execution. `events` is the only ns-typed fixture, and the session
    * builders in Verify/Bench/tests also set it up front.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
