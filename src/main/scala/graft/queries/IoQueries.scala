package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Non-parquet I/O as first-class operators (SURVEY.md §2.1): CSV and
  * JSON-lines write + read-back, and partitioned parquet write with
  * partition-pruned read.
  *
  * Reference: bodo/ir/csv_ext.py:49 (CsvReader), bodo/ir/json_ext.py:32
  * (JsonReader), bodo/io/_csv_json_reader.cpp, parquet_write.cpp
  * (partitioned dirs). Each query round-trips fixture data through the
  * format and aggregates the read-back side; the oracle computes the same
  * aggregate from the original table, so the round-trip must preserve
  * values exactly. Explicit read schemas (no inferSchema scan) — at 100 TB
  * an inference pre-pass is a second full read.
  */
object IoQueries extends QueryModule {

  private def tmp(d: String, tag: String): String =
    s"/tmp/graft_io/${tag}_${d.replaceAll("[^a-zA-Z0-9]", "_")}"

  /** SF-scoped bucketed-table names (shared with the plan-shape test). */
  def bucketTables(d: String): (String, String) = {
    val tag = d.replaceAll("[^a-zA-Z0-9]", "_")
    (s"graft_bkt_orders_$tag", s"graft_bkt_cust_$tag")
  }

  override def queries: Map[String, QueryFn] = Map(
    "csv_roundtrip" -> ((s, d) => {
      val path = tmp(d, "csv")
      documents(s, d).select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").option("header", "true").csv(path)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("source", StringType), StructField("n_chars", LongType)))
      s.read.schema(schema).option("header", "true").csv(path)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("sum_chars"),
          min("doc_id").as("min_id"), max("source").as("max_src"))
    }),

    // ORC round-trip: the other columnar format Spark ships natively
    // (vectorized reader, predicate pushdown, column pruning — same scan
    // machinery as parquet). Written snappy-compressed; read back with a
    // pushed filter so the format's min/max stripe stats are exercised.
    "orc_roundtrip" -> ((s, d) => {
      val path = tmp(d, "orc")
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"))
        .write.mode("overwrite").orc(path)
      s.read.orc(path)
        .filter(col("l_quantity") > 25.0)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"),
          min(col("l_orderkey")).as("min_ok"))
    }),

    "json_roundtrip" -> ((s, d) => {
      val path = tmp(d, "json")
      events(s, d).select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .write.mode("overwrite").json(path)
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("event_type", StringType), StructField("value", DoubleType)))
      s.read.schema(schema).json(path)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("value").as("sum_v"),
          min("event_id").as("min_id"))
    }),

    // Generic JDBC (read_sql / to_sql): round-trip through an embedded
    // Derby database — the same spark.read.jdbc/write.jdbc path a
    // Snowflake/Postgres URL would take (ref bodo/ir/sql_ext.py:140), with
    // a partitioned parallel read (partitionColumn + bounds).
    "jdbc_roundtrip" -> ((s, d) => {
      val url = s"jdbc:derby:/tmp/graft_derby/db_${d.replaceAll("[^a-zA-Z0-9]", "_")};create=true"
      val props = new java.util.Properties()
      props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
        .write.mode("overwrite").jdbc(url, "graft_customer", props)
      s.read
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .option("partitionColumn", "c_custkey")
        .option("lowerBound", "0")
        .option("upperBound", "100000")
        .option("numPartitions", "4")
        .jdbc(url, "graft_customer", props)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("c_acctbal")).as("sum_bal"),
          max(col("c_nationkey")).as("max_nk"))
    }),

    // MERGE INTO semantics over parquet (Iceberg's copy-on-write MERGE,
    // catalog-free): target snapshot = customers with key % 3 = 0, source =
    // key % 2 = 0. Matched rows update (balance + 100, segment from
    // source), source-only rows insert, target-only rows delete. The merged
    // result is committed (rewritten) and read back, so the query output is
    // the post-merge table state, not just the merge plan.
    "merge_into_parquet" -> ((s, d) => {
      val tgtPath = tmp(d, "merge_tgt")
      val outPath = tmp(d, "merge_out")
      val snap = customer(s, d)
        .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
      snap.filter(col("c_custkey") % 3 === 0)
        .write.mode("overwrite").parquet(tgtPath)
      val source = snap.filter(col("c_custkey") % 2 === 0)
      val merged = graft.operators.MergeInto.merge(
        s.read.parquet(tgtPath), source, "c_custkey",
        cols = Seq("c_acctbal", "c_mktsegment"),
        whenMatched = {
          case "c_acctbal" => col("s_c_acctbal") + 100
          case c           => col(s"s_$c")
        },
        whenNotMatched = c => col(s"s_$c"),
        deleteNotMatchedBySource = true)
      merged.write.mode("overwrite").parquet(outPath)
      s.read.parquet(outPath)
    }),

    // JDBC predicate pushdown: the filter must reach the remote database as
    // SQL (PushedFilters on the JDBC scan — plan-asserted in PlanShapeSpec),
    // standing in for the Snowflake adapter's filter/projection pushdown
    // (ref BodoSQL adapter/snowflake/). Only matching rows cross the wire.
    "jdbc_pushdown" -> ((s, d) => {
      val url = s"jdbc:derby:/tmp/graft_derby/db_${d.replaceAll("[^a-zA-Z0-9]", "_")};create=true"
      val props = new java.util.Properties()
      props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      customer(s, d)
        .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
        .write.mode("overwrite").jdbc(url, "graft_cust_pd", props)
      s.read
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .jdbc(url, "graft_cust_pd", props)
        .filter(col("c_acctbal") > 5000.0)
        .select(col("c_custkey"), col("c_acctbal"))
    }),

    // JDBC AGGREGATE pushdown (r17): the DSv2 JDBC catalog compiles the
    // whole GROUP BY + COUNT/SUM/MIN/MAX into remote SQL
    // (SupportsPushDownAggregates -> PushedAggregates in the scan), so
    // only the aggregated groups cross the wire — the Snowflake-adapter
    // win the reference gets from pushing agg into the warehouse
    // (ref BodoSQL adapter/snowflake/). Plan-asserted into the gated
    // output: agg_pushed = the scan's own PushedAggregates claim.
    "jdbc_agg_pushdown" -> ((s, d) => {
      val url = s"jdbc:derby:/tmp/graft_derby/db_${d.replaceAll("[^a-zA-Z0-9]", "_")};create=true"
      val props = new java.util.Properties()
      props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
          col("c_mktsegment"))
        .write.mode("overwrite")
        // Derby maps StringType to CLOB by default, and CLOB cannot GROUP
        // BY — pin a comparable VARCHAR so the remote aggregation is legal
        .option("createTableColumnTypes", "c_mktsegment VARCHAR(32)")
        .jdbc(url, "graft_cust_v2agg", props)
      val cat = "gjdbc_" + d.replaceAll("[^a-zA-Z0-9]", "_")
      s.conf.set(s"spark.sql.catalog.$cat",
        "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.url", url)
      s.conf.set(s"spark.sql.catalog.$cat.driver",
        "org.apache.derby.jdbc.EmbeddedDriver")
      s.conf.set(s"spark.sql.catalog.$cat.pushDownAggregate", "true")
      val q = s.sql(
        s"""SELECT c_mktsegment, COUNT(*) AS n,
           |  MIN(c_nationkey) AS min_nk, MAX(c_nationkey) AS max_nk
           |FROM $cat.APP.GRAFT_CUST_V2AGG
           |GROUP BY c_mktsegment""".stripMargin)
      // complete pushdown: the optimized plan has NO Aggregate node left —
      // the remote database computed the groups and the scan returns them
      val hasScan = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }.nonEmpty
      val noLocalAgg = q.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.isEmpty
      q.withColumn("agg_pushed", lit(hasScan && noLocalAgg))
    }),

    // Bucketed co-located join (the §2.3 pre-shuffled join story): both
    // sides written bucketed + sorted on the join key, so the sort-merge
    // join reads bucket-aligned splits with NO exchange on either side
    // (plan-asserted in PlanShapeSpec; an in-partition linear sort remains
    // because post-3.0 Spark ignores sortBy order without the legacy
    // bucketedTableScan.outputOrdering conf). At 100 TB this is how
    // a fact-fact join escapes its shuffle: pay the partitioning once at
    // write time, join for free forever after — Spark's bucketing is the
    // direct analog of the reference's table-distribution hints. The merge
    // hint keeps the demo honest (broadcast would also skip the shuffle,
    // but only because the fixture's build side is small).
    "bucketed_join" -> ((s, d) => {
      val (ot, ct) = bucketTables(d)
      // the in-memory catalog is fresh per JVM but /tmp/graft_warehouse
      // persists — drop any stale catalog entry AND leftover location, or
      // CTAS refuses the existing directory
      for (t <- Seq(ot, ct)) {
        s.sql(s"DROP TABLE IF EXISTS $t")
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(s"/tmp/graft_warehouse/$t"))
      }
      // repartition(numBuckets, key) aligns task partitions with bucket ids
      // (same murmur3 pmod), so each bucket gets exactly ONE file — without
      // it every task writes a file per bucket (tiny-file explosion) and
      // multi-file buckets force the join to re-sort.
      orders(s, d).select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .repartition(8, col("o_custkey"))
        .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable(ot)
      customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
        .repartition(8, col("c_custkey"))
        .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable(ct)
      // sum exact integer cents: floor(x*100) operates on the IEEE binary
      // value identically in Spark and DuckDB, unlike double->decimal casts
      // (Spark rounds the shortest decimal string, DuckDB the binary value,
      // so per-row cents can differ by 1 on .005 ties and flip the hash)
      s.table(ot).hint("merge")
        .join(s.table(ct), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * lit(100)).cast("long")).as("sum_cents"))
    }),

    // Z-order data layout (the OPTIMIZE ZORDER BY analog): interleave the
    // bits of two cluster keys, range-bucket rows on the interleaved key,
    // and report per-bucket min/max of BOTH dimensions. Each 4096-cell
    // z-bucket is a 64x64 tile of the (x, y) grid, so both columns' spans
    // are ~64 out of 1024 — parquet row-group min/max stats then skip
    // ~15/16 of files for a predicate on EITHER column, which is the
    // whole point of z-ordering a 100-TB table that gets filtered on two
    // keys (a plain sort on x makes y spans useless). The interleave is
    // pure integer bit-math, codegen'd, replayed exactly by the oracle.
    "layout_zorder" -> ((s, d) => {
      val bits = 10
      def z(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        (0 until bits).map { j =>
          shiftright(x, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j)) +
            shiftright(y, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j + 1))
        }.reduce(_ + _)
      orders(s, d)
        .select((col("o_custkey") % 1024).as("x"), (col("o_orderkey") % 1024).as("y"))
        .withColumn("file_bucket", shiftright(z(col("x"), col("y")), 12))
        .groupBy(col("file_bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
    }),

    // Partitioned parquet write; read-back filters one partition value so
    // the scan is partition-pruned (directory-level, no data read).
    // The write hash-distributes on the partition column first (r21) —
    // the Iceberg write.distribution-mode=hash posture (guide §6): without
    // it EVERY write task opens a file in EVERY partition directory (the
    // small-files explosion at 100 TB: tasks x partitions files), and on
    // the single-split fixture the whole encode ran on one core.
    "parquet_partitioned" -> ((s, d) => {
      val path = tmp(d, "pq")
      // COMPOSITE write distribution (r22, VERDICT r21 item 5): hashing on
      // the partition column alone (r21) bounded files-per-partition at 1
      // but serialized the encode — 3 distinct l_returnflag values = <=3
      // active writer tasks regardless of cluster size (~33 TB per task at
      // 100 TB). A deterministic intra-partition splitter (guide §2.5 —
      // never rand()) fans each partition value across `splits` tasks:
      // files per partition stay bounded at `splits` (each (flag, split)
      // lands in exactly one task), writers scale with the cluster. The
      // split count is conf-driven (`graft.write.partition.splits`, local
      // default 4 ≈ cores/partitions); a 100 TB deploy sizes it to
      // partition-bytes / target-file-size.
      val splits = s.conf.getOption("graft.write.partition.splits")
        .flatMap(_.toIntOption).getOrElse(4)
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .repartition(col("l_returnflag"),
          pmod(xxhash64(col("l_orderkey")), lit(splits)))
        .write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
      s.read.parquet(path)
        .filter(col("l_returnflag") === "R")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "csv_roundtrip" ->
      """SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id, max(source) AS max_src
        |FROM documents GROUP BY lang""".stripMargin,

    "json_roundtrip" ->
      """SELECT event_type, count(*) AS n, sum(value) AS sum_v,
        |  min(event_id) AS min_id
        |FROM events GROUP BY event_type""".stripMargin,

    "orc_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty,
        |  min(l_orderkey) AS min_ok
        |FROM lineitem WHERE l_quantity > 25.0
        |GROUP BY l_returnflag""".stripMargin,

    "parquet_partitioned" ->
      """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem WHERE l_returnflag = 'R'
        |GROUP BY l_returnflag""".stripMargin,

    "jdbc_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS n, sum(c_acctbal) AS sum_bal,
        |  max(c_nationkey) AS max_nk
        |FROM customer GROUP BY c_mktsegment""".stripMargin,

    // Post-merge table state: matched (key % 6 = 0) updated, source-only
    // inserted, target-only deleted -> all key % 2 = 0 rows survive.
    "merge_into_parquet" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 6 = 0 THEN c_acctbal + 100
        |       ELSE c_acctbal END AS c_acctbal,
        |  c_mktsegment
        |FROM customer WHERE c_custkey % 2 = 0""".stripMargin,

    "jdbc_pushdown" ->
      """SELECT c_custkey, c_acctbal
        |FROM customer WHERE c_acctbal > 5000""".stripMargin,

    "jdbc_agg_pushdown" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |  min(c_nationkey) AS min_nk, max(c_nationkey) AS max_nk,
        |  true AS agg_pushed
        |FROM customer GROUP BY c_mktsegment""".stripMargin,


    "layout_zorder" -> {
      val z = (0 until 10).map { j =>
        s"((x >> $j) & 1) * ${1L << (2 * j)} + ((y >> $j) & 1) * ${1L << (2 * j + 1)}"
      }.mkString(" + ")
      s"""WITH t AS (
         |  SELECT o_custkey % 1024 AS x, o_orderkey % 1024 AS y FROM orders),
         |b AS (SELECT x, y, ($z) >> 12 AS file_bucket FROM t)
         |SELECT file_bucket, count(*) AS n_rows,
         |  min(x) AS min_x, max(x) AS max_x,
         |  min(y) AS min_y, max(y) AS max_y
         |FROM b GROUP BY file_bucket""".stripMargin
    },

    "bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin
  )
}
