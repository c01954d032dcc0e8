package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** TIMESTAMPTZ offset-retention kit (SURVEY §1.2; ref
  * bodo/hiframes/timestamptz_ext.py:47,157 — the reference's TimestampTZ
  * value stores a UTC timestamp plus a UTC-offset in minutes). Spark's
  * TimestampType is instant-only, so the kit models TIMESTAMPTZ as
  * struct<utc: timestamp, offset_min: smallint>: comparison/join/sort use
  * the UTC instant (a total order, unlike wall clocks), while the retained
  * offset reconstructs the original wall clock for extraction and display.
  * Every helper is a pure codegen'd column expression — no UDF, no state.
  */
object TimestampTz {

  /** Construct from a local wall-clock timestamp and its UTC offset
    * (minutes east of UTC): utc = wall - offset. */
  def make(wall: Column, offsetMin: Column): Column =
    struct(
      timestamp_add("MINUTE", negate(offsetMin.cast("int")), wall).as("utc"),
      offsetMin.cast("smallint").as("offset_min"))

  /** The UTC instant — the comparison/ordering key. */
  def utc(tz: Column): Column = tz.getField("utc")

  /** The retained offset in minutes. */
  def offsetMin(tz: Column): Column = tz.getField("offset_min")

  /** The original wall clock (utc + offset) — what the writer observed. */
  def wall(tz: Column): Column =
    timestamp_add("MINUTE", offsetMin(tz).cast("int"), utc(tz))

  /** Canonical display form 'yyyy-MM-dd HH:mm:ss±HH:MM' — the offset
    * survives round-trips, which is the whole point of the type. */
  def show(tz: Column): Column = {
    val off = offsetMin(tz).cast("int")
    val a = abs(off)
    concat(
      date_format(wall(tz), "yyyy-MM-dd HH:mm:ss"),
      when(off < 0, lit("-")).otherwise(lit("+")),
      lpad((a / 60).cast("int").cast("string"), 2, "0"), lit(":"),
      lpad((a % 60).cast("string"), 2, "0"))
  }
}
