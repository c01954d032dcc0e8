package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's named queries + DuckDB oracle SQL.
  * Each SURVEY.md §2 operator appears as one `queries` entry; oracle SQL
  * is provided wherever the semantics are ANSI-SQL-expressible in DuckDB.
  */
object SparkEntry {
  /** Modules in SURVEY.md §2 inventory order. */
  private val modules: Seq[QueryModule] = Seq(
    TpchQueries,
    TpchQueries2,
    RelationalQueries,
    AggQueries,
    AggQueries2,
    WindowQueries,
    TextQueries,
    PipelineQueries,
    DedupQueries,
    SimQueries,
    MultimodalQueries,
    FnStringQueries,
    FnScalarQueries,
    FnSemiQueries,
    FnLongTailQueries,
    PandasQueries,
    LateralQueries,
    AsofQueries,
    IoQueries,
    DdlQueries,
    CompositeQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("tpch_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    uniq(modules.flatMap(_.queries), "queries")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    uniq(modules.flatMap(_.oracle), "oracleSql")

  /** A duplicate name across modules would silently pair one module's query
    * with another's oracle SQL — fail fast instead. */
  private def uniq[V](kvs: Seq[(String, V)], what: String): Map[String, V] = {
    val dups = kvs.groupBy(_._1).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate $what name(s): ${dups.mkString(", ")}")
    kvs.toMap
  }
}
