package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._

/** DDL & catalog surface (SURVEY.md §2.11): CTAS into the session catalog,
  * DESCRIBE, SHOW TABLES.
  *
  * Reference: com/bodosql/calcite/ddl/DDLExecutor.kt,
  * BodoPhysicalTableCreate.kt (CTAS). Iceberg DDL (IcebergDDLExecutor.kt)
  * is out of reach offline — no iceberg-spark-runtime jar ships in
  * /opt/spark/jars (verified; noted in SURVEY) — so the catalog surface is
  * exercised against the built-in session catalog over parquet, which is
  * the same code path a catalog plugin would hit.
  */
object DdlQueries extends QueryModule {

  private val fixtures = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete(): Unit
  }

  override def queries: Map[String, QueryFn] = Map(
    // CTAS: CREATE TABLE ... USING PARQUET AS SELECT, then query the new
    // catalog table.
    "ddl_ctas" -> ((s, d) => {
      registerViews(s, d)
      s.sql("DROP TABLE IF EXISTS graft_ctas_nation")
      // InMemoryCatalog forgets tables across sessions but the managed
      // files persist — clear the location so CTAS can't hit a stale dir.
      deleteRec(new java.io.File("/tmp/graft_warehouse/graft_ctas_nation"))
      s.sql(
        """CREATE TABLE graft_ctas_nation USING PARQUET AS
          |SELECT n.n_name, count(*) AS n_cust, round(sum(c.c_acctbal), 2) AS sum_bal
          |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
          |GROUP BY n.n_name""".stripMargin)
      s.sql("SELECT n_name, n_cust, sum_bal FROM graft_ctas_nation")
    }),

    // ANALYZE TABLE ... COMPUTE STATISTICS — the offline analog of the
    // reference's Iceberg Puffin/theta NDV sketches (bodo/io/iceberg/
    // theta.py): table + column stats land in the catalog and feed CBO.
    // Output = the recorded row count and the o_orderstatus NDV read back
    // from catalog metadata (HLL++ is exact at this cardinality, so the
    // DuckDB oracle can check values, not just presence).
    "ddl_analyze" -> ((s, d) => {
      registerViews(s, d)
      s.sql("DROP TABLE IF EXISTS graft_stats_orders")
      deleteRec(new java.io.File("/tmp/graft_warehouse/graft_stats_orders"))
      s.sql(
        """CREATE TABLE graft_stats_orders USING PARQUET AS
          |SELECT o_orderkey, o_custkey, o_orderstatus FROM orders""".stripMargin)
      s.sql("ANALYZE TABLE graft_stats_orders COMPUTE STATISTICS FOR COLUMNS o_orderstatus")
      val meta = s.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("graft_stats_orders"))
      val rowCount = meta.stats.flatMap(_.rowCount).map(_.toLong).getOrElse(-1L)
      val ndv = meta.stats.map(_.colStats).flatMap(_.get("o_orderstatus"))
        .flatMap(_.distinctCount).map(_.toLong).getOrElse(-1L)
      import s.implicits._
      Seq((rowCount, ndv)).toDF("row_count", "ndv_status")
    }),

    // DESCRIBE: schema rows of the lineitem view (name + type only —
    // deterministic).
    "ddl_describe" -> ((s, d) => {
      registerViews(s, d)
      s.sql("DESCRIBE TABLE lineitem")
        .select(col("col_name"), col("data_type"))
    }),

    // SHOW TABLES filtered to the fixture views (other queries may add
    // tables to the shared session; the IN-list keeps output deterministic).
    "ddl_show_tables" -> ((s, d) => {
      registerViews(s, d)
      s.sql("SHOW TABLES")
        .select(col("tableName"))
        .filter(col("tableName").isin(fixtures: _*))
    })
  )

  override def oracle: Map[String, String] = Map(
    "ddl_ctas" ->
      """SELECT n.n_name, count(*) AS n_cust, round(sum(c.c_acctbal), 2) AS sum_bal
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name""".stripMargin,

    "ddl_analyze" ->
      """SELECT count(*) AS row_count,
        |  count(DISTINCT o_orderstatus) AS ndv_status
        |FROM orders""".stripMargin,

    // The fixture schema is static (FIXTURES.md) — literal expected rows.
    "ddl_describe" ->
      """SELECT * FROM (VALUES
        |  ('l_orderkey', 'bigint'), ('l_partkey', 'bigint'), ('l_suppkey', 'bigint'),
        |  ('l_linenumber', 'int'), ('l_quantity', 'double'), ('l_extendedprice', 'double'),
        |  ('l_discount', 'double'), ('l_tax', 'double'), ('l_returnflag', 'string'),
        |  ('l_linestatus', 'string'), ('l_shipdate', 'timestamp_ntz')
        |) t(col_name, data_type)""".stripMargin,

    "ddl_show_tables" ->
      """SELECT * FROM (VALUES ('region'), ('nation'), ('customer'), ('supplier'),
        |  ('part'), ('orders'), ('lineitem'), ('events'), ('documents'), ('embeddings')
        |) t(tableName)""".stripMargin
  )
}
