package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** The session writes INT64 TIMESTAMP_MICROS with isAdjustedToUTC=true
    * (required by SnapshotLog footer stats), which DuckDB reads back as
    * TIMESTAMP WITH TIME ZONE while the oracle SQL computes plain
    * TIMESTAMP — schema/hash mismatch on every timestamp-bearing result
    * (the r12 regression). The session time zone is pinned UTC, so casting
    * to TIMESTAMP_NTZ is bit-identical and dumps as plain TIMESTAMP.
    * This is a dump-envelope normalization only — engine results unchanged. */
  private def ntz(dt: DataType): DataType = dt match {
    case TimestampType      => TimestampNTZType
    case ArrayType(e, n)    => ArrayType(ntz(e), n)
    case MapType(k, v, n)   => MapType(ntz(k), ntz(v), n)
    case StructType(fields) => StructType(fields.map(f => f.copy(dataType = ntz(f.dataType))))
    case other              => other
  }

  def normalizeForOracle(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    if (fields.forall(f => ntz(f.dataType) == f.dataType)) df
    else df.select(fields.map { f =>
      val t = ntz(f.dataType)
      if (t == f.dataType) df(f.name) else df(f.name).cast(t).as(f.name)
    }.toSeq: _*)
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional dev-only name-substring filter (driver passes 2 args)
    val flt = if (args.length > 2) args(2) else ""
    val spark = Sessions.local()
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(_._1.contains(flt)).foreach { case (name, fn) =>
      try normalizeForOracle(fn(spark, sfDir)).coalesce(1).write
        .mode("overwrite").parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
