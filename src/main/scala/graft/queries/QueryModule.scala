package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One group of SURVEY.md §2 operators, exposed through the driver contract:
  * a named DataFrame query plus (when SQL-expressible) a DuckDB oracle query
  * over the same parquet tables. Column names/types must match exactly —
  * the driver sorts columns by name and hash-compares values.
  */
trait QueryModule {
  type QueryFn = (SparkSession, String) => DataFrame
  def queries: Map[String, QueryFn]
  def oracle: Map[String, String]
}
