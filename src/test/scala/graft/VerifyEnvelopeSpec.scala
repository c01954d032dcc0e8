package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark
import org.apache.spark.sql.types._

/** Canary guard on the Verify dump envelope (VERDICT r12 item 2).
  *
  * The r12 regression: Sessions sets
  * `spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS` (needed by
  * SnapshotLog footer stats), which writes TimestampType as INT64 micros
  * with isAdjustedToUTC=true — DuckDB reads that back as TIMESTAMP WITH
  * TIME ZONE while the oracle SQL computes plain TIMESTAMP, flipping 22
  * gates red on schema/hash. Verify.normalizeForOracle casts every
  * TimestampType (top-level and nested) to TIMESTAMP_NTZ before the dump
  * (session TZ is UTC, so values are bit-identical).
  *
  * This spec writes a canary frame with timestamp / date / decimal /
  * nested-timestamp columns through the exact dump path and asserts the
  * parquet round-trips with NO instant-semantics (TimestampType) column —
  * i.e. DuckDB will see plain TIMESTAMP. If anyone changes the session
  * write envelope (or removes the normalization), this fails loudly
  * instead of silently flipping a third of CORRECTNESS.
  */
class VerifyEnvelopeSpec extends AnyFunSuite {

  test("dump envelope: timestamp/date/decimal round-trip as oracle-comparable types") {
    val df = spark.sql(
      """SELECT timestamp'2024-03-01 12:34:56.789' AS ts,
        |       date'2024-03-01'                    AS d,
        |       CAST(12345.67 AS DECIMAL(12,2))     AS dec,
        |       named_struct('t', timestamp'2024-01-01 00:00:01') AS s,
        |       array(timestamp'2024-01-02 03:04:05')             AS arr
        |""".stripMargin)

    val out = java.nio.file.Files.createTempDirectory("graft_envelope").toString
    Verify.normalizeForOracle(df).coalesce(1).write.mode("overwrite").parquet(out)

    val back = spark.read.parquet(out)

    def hasInstant(dt: DataType): Boolean = dt match {
      case TimestampType       => true
      case ArrayType(e, _)     => hasInstant(e)
      case MapType(k, v, _)    => hasInstant(k) || hasInstant(v)
      case StructType(fs)      => fs.exists(f => hasInstant(f.dataType))
      case _                   => false
    }
    val bad = back.schema.fields.filter(f => hasInstant(f.dataType)).map(_.name)
    assert(bad.isEmpty,
      s"dump contains instant-semantics timestamps (DuckDB reads TIMESTAMPTZ): ${bad.mkString(", ")}")

    // Values survived the cast bit-identically (session TZ is UTC).
    val row = back.selectExpr(
      "cast(ts as string)", "cast(d as string)", "cast(dec as string)",
      "cast(s.t as string)", "cast(arr[0] as string)").head()
    assert(row.getString(0) == "2024-03-01 12:34:56.789")
    assert(row.getString(1) == "2024-03-01")
    assert(row.getString(2) == "12345.67")
    assert(row.getString(3) == "2024-01-01 00:00:01")
    assert(row.getString(4) == "2024-01-02 03:04:05")

    // Date and decimal keep their logical types (oracle compares them natively).
    assert(back.schema("d").dataType == DateType)
    assert(back.schema("dec").dataType == DecimalType(12, 2))
  }
}
