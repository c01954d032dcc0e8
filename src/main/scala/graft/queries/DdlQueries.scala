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
    }),

    // Snapshot/time-travel table semantics over the SnapshotLog format —
    // the offline analog of Iceberg snapshot reads + AS-OF travel
    // (IcebergDDLExecutor.kt, bodo/io/iceberg/): v1 overwrite, v2 append,
    // v3 copy-on-write upsert (MERGE-shaped: double the price of every
    // key ≡ 0 mod 20). Reads pin v1/v2 by version, v2 again by AS-OF
    // timestamp (travel rule: largest commit ts ≤ asked ts), and the
    // current table; each must see exactly its manifest's files.
    "ddl_timetravel" -> ((s, d) => {
      import graft.sources.SnapshotLog
      val root = s"/tmp/graft_snaplog/${d.replaceAll("[^a-zA-Z0-9]", "_")}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val o = orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      SnapshotLog.commit(o.filter(col("o_orderkey") % 10 === 0), root,
        overwrite = true, commitTsMs = 1000L)
      SnapshotLog.commit(o.filter(col("o_orderkey") % 10 === 5), root,
        overwrite = false, commitTsMs = 2000L)
      val cur = SnapshotLog.read(s, root)
      val src = o.filter(col("o_orderkey") % 20 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val merged = cur
        .join(src.select(col("o_orderkey").as("sk")),
          col("o_orderkey") === col("sk"), "left_anti")
        .unionByName(src)
      SnapshotLog.commit(merged, root, overwrite = true, commitTsMs = 3000L)
      Seq(
        ("v1", SnapshotLog.read(s, root, asOfVersion = Some(1))),
        ("v2", SnapshotLog.read(s, root, asOfVersion = Some(2))),
        ("asof_2500", SnapshotLog.read(s, root, asOfTsMs = Some(2500L))),
        ("v3_current", SnapshotLog.read(s, root)))
        .map { case (label, df) =>
          df.agg(count(lit(1)).as("n_rows"),
            round(sum("o_totalprice"), 2).as("sum_price"))
            .withColumn("snap", lit(label))
        }
        .reduce(_ unionByName _)
        .select("snap", "n_rows", "sum_price")
    }),

    // DESCRIBE HISTORY + copy-on-write MERGE INTO on the snapshot table
    // (Iceberg history metadata table + merge_into.py): v1 overwrite, v2
    // append, v3 = MERGE (update bal for keys ≡ 0 mod 6, insert the ≡ 2
    // mod 6 rows, keep unmatched target rows). The history output pins
    // version/operation/commit-ts/file-count; the merge's row effects are
    // covered by merge_into_parquet and SnapshotLogSpec.
    "ddl_history" -> ((s, d) => {
      import graft.sources.SnapshotLog
      val root = s"/tmp/graft_history/${d.replaceAll("[^a-zA-Z0-9]", "_")}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val c = customer(s, d)
        .select(col("c_custkey"), col("c_acctbal").as("bal"))
      SnapshotLog.commit(c.filter(col("c_custkey") % 3 === 0), root,
        overwrite = true, commitTsMs = 1000L)
      SnapshotLog.commit(c.filter(col("c_custkey") % 3 === 1), root,
        overwrite = false, commitTsMs = 2000L)
      SnapshotLog.mergeCommit(root,
        c.filter(col("c_custkey") % 6 === 2).withColumn("bal", col("bal") + 100),
        "c_custkey", Seq("bal"),
        whenMatched = cn => col(s"s_$cn"),
        whenNotMatched = cn => col(s"s_$cn"),
        deleteNotMatchedBySource = false, commitTsMs = 3000L)
      SnapshotLog.history(s, root)
    }),

    // Manifest-stats data skipping (Iceberg lower_bounds/upper_bounds →
    // file pruning): four key-range slices committed as separate appends
    // (2 files each, min/max recorded per file at commit), then a range
    // probe that intersects exactly one slice. files_scanned comes from
    // the planned scan's file list — the assertion that the probe opened
    // 2 of 8 files from MANIFEST METADATA alone is part of the gated
    // output, not just a unit test.
    "ddl_stats_pruning" -> ((s, d) => {
      import graft.sources.SnapshotLog
      val root = s"/tmp/graft_pruning/${d.replaceAll("[^a-zA-Z0-9]", "_")}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val c = customer(s, d).select(col("c_custkey"), col("c_acctbal"))
      val bounds = Seq((1L, 375L), (376L, 750L), (751L, 1125L), (1126L, 100000000L))
      bounds.zipWithIndex.foreach { case ((lo, hi), i) =>
        SnapshotLog.commit(
          c.filter(col("c_custkey") >= lo && col("c_custkey") <= hi), root,
          overwrite = i == 0, commitTsMs = 100L * (i + 1))
      }
      val total = SnapshotLog.snapshots(s, root).last.files.size
      val pr = SnapshotLog.readPruned(s, root, "c_custkey", 400L, 500L)
      val scanned = pr.inputFiles.length
      pr.agg(count(lit(1)).as("n_rows"),
        round(sum(col("c_acctbal")), 2).as("sum_bal"))
        .withColumn("files_scanned", lit(scanned.toLong))
        .withColumn("files_total", lit(total.toLong))
    }),

    // EXTERNAL_TABLE_FILES analog (TableFunctionOperatorTable.java:158 /
    // Iceberg `files` metadata table): the per-snapshot file inventory
    // from MANIFEST METADATA (one FS stat per file, no data scan), joined
    // against distributed per-file row counts (input_file_name groupBy) to
    // prove the inventory matches what a scan actually reads. File names
    // are uuid'd, so the checked output is the per-version rollup.
    "ddl_table_files" -> ((s, d) => {
      import graft.sources.SnapshotLog
      val root = s"/tmp/graft_tablefiles/${d.replaceAll("[^a-zA-Z0-9]", "_")}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val c = customer(s, d).select(col("c_custkey"), col("c_acctbal"))
      SnapshotLog.commit(c.filter(col("c_custkey") % 4 === 1), root,
        overwrite = true, commitTsMs = 1000L)
      SnapshotLog.commit(c.filter(col("c_custkey") % 4 === 2), root,
        overwrite = false, commitTsMs = 2000L)
      def norm(p: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        regexp_replace(p, "^file:/*", "/")
      val meta = Seq(1, 2)
        .map(v => SnapshotLog.tableFiles(s, root, Some(v)))
        .reduce(_ unionByName _)
        .withColumn("file_path", norm(col("file_path")))
      val perFile = SnapshotLog.read(s, root)
        .groupBy(norm(input_file_name()).as("file_path"))
        .agg(count(lit(1)).as("file_rows"))
      meta.join(perFile, "file_path")
        .groupBy(col("version"))
        .agg(count(lit(1)).as("n_files"),
          sum(col("file_rows")).as("n_rows"),
          (min(col("size_bytes")) > 0).as("all_nonempty"))
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
        |) t(tableName)""".stripMargin,

    "ddl_timetravel" ->
      """WITH base AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
        |v1 AS (SELECT CAST(count(*) AS BIGINT) n, round(sum(p), 2) sp
        |       FROM base WHERE k % 10 = 0),
        |v2 AS (SELECT CAST(count(*) AS BIGINT) n, round(sum(p), 2) sp
        |       FROM base WHERE k % 10 IN (0, 5)),
        |v3 AS (SELECT CAST(count(*) AS BIGINT) n,
        |       round(sum(CASE WHEN k % 20 = 0 THEN p * 2 ELSE p END), 2) sp
        |       FROM base WHERE k % 10 IN (0, 5))
        |SELECT 'v1' AS snap, n AS n_rows, sp AS sum_price FROM v1
        |UNION ALL SELECT 'v2', n, sp FROM v2
        |UNION ALL SELECT 'asof_2500', n, sp FROM v2
        |UNION ALL SELECT 'v3_current', n, sp FROM v3""".stripMargin,

    "ddl_history" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS INT), 'overwrite', CAST(1000 AS BIGINT), CAST(2 AS BIGINT)),
        |  (CAST(2 AS INT), 'append',    CAST(2000 AS BIGINT), CAST(4 AS BIGINT)),
        |  (CAST(3 AS INT), 'overwrite', CAST(3000 AS BIGINT), CAST(2 AS BIGINT))
        |) t(version, operation, commit_ts_ms, n_files)""".stripMargin,

    "ddl_stats_pruning" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  round(sum(c_acctbal), 2) AS sum_bal,
        |  CAST(2 AS BIGINT) AS files_scanned,
        |  CAST(8 AS BIGINT) AS files_total
        |FROM customer WHERE c_custkey BETWEEN 400 AND 500""".stripMargin,

    "ddl_table_files" ->
      """SELECT CAST(1 AS INT) AS version, CAST(2 AS BIGINT) AS n_files,
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer WHERE c_custkey % 4 = 1) AS n_rows,
        |  TRUE AS all_nonempty
        |UNION ALL
        |SELECT CAST(2 AS INT), CAST(4 AS BIGINT),
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer WHERE c_custkey % 4 IN (1, 2)),
        |  TRUE""".stripMargin
  )
}
