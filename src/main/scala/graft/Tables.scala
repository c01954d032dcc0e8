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
    * Read nanos as long (legacy conf) and convert to a µs TimestampType —
    * integer floor-division, the same truncation DuckDB applies when it
    * casts ns → µs, so oracle comparisons agree (FIXTURES.md ns policy).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Timestamp literal evaluated in the session time zone (UTC). */
  def ts(v: String): Column = to_timestamp(lit(v))
}
