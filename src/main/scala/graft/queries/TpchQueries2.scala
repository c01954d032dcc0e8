package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** The remaining TPC-H queries (q2, q8, q9, q11, q13, q15, q16, q17, q20,
  * q21, q22), adapted to the fixture schema — there is no partsupp table and
  * no commitdate/receiptdate/shipmode/phone columns, so each query keeps the
  * ORIGINAL operator shape (correlated scalar subqueries, IN / NOT IN
  * subqueries, EXISTS / NOT EXISTS double-correlation, CTE reuse, scalar
  * thresholds over derived views) re-targeted at available columns.
  *
  * Reference behavior: bodo-ai/Bodo runs all 22 TPC-H queries as correctness
  * tests (BodoSQL/bodosql/tests/test_tpch_first_half.py / second_half.py).
  *
  * Half of these run through spark.sql over temp views: the SQL surface is
  * the BodoSQL-equivalent entry point, and correlated subqueries exercise
  * Catalyst's decorrelation (RewriteCorrelatedScalarSubquery,
  * RewritePredicateSubquery) — the same rewrites Bodo gets from Calcite's
  * SubQueryRemoveRule. The rest use the DataFrame DSL with explicit
  * broadcast hints on dimension tables.
  *
  * Scale notes: every subquery here decorrelates to a join (verified via
  * explain — no per-row subquery execution); dimension sides broadcast; the
  * only shuffles are fact-table aggregations on their group keys.
  */
object TpchQueries2 extends QueryModule {

  private def revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Queries whose Spark SQL and DuckDB SQL are the same ANSI text. */
  private val shared: Map[String, String] = Map(
    // Q2: min-cost supplier — correlated scalar MIN subquery (acctbal is the
    // supply-cost proxy; supplied-by = appears in lineitem for the part).
    "tpch_q2" ->
      """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
        |FROM part, supplier, lineitem, nation, region
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND p_size = 15
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE'
        |  AND s_acctbal = (SELECT min(s_acctbal)
        |      FROM supplier s2, lineitem l2, nation n2, region r2
        |      WHERE p_partkey = l2.l_partkey AND s2.s_suppkey = l2.l_suppkey
        |        AND s2.s_nationkey = n2.n_nationkey
        |        AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    // Q11: important parts by value — HAVING against a scalar subquery.
    "tpch_q11" ->
      // Single-PHYSICAL-scan form: the global threshold is a scalar
      // aggregate over the per-partkey CTE. Catalyst inlines the CTE into
      // two logical branches, but both sit on an identical shuffle subtree
      // (scan -> partial agg -> Exchange hash(l_partkey)), so AQE stage
      // reuse / ReuseExchange runs the lineitem scan ONCE — asserted in
      // PlanShapeSpec. Unlike the previous sum(value) OVER () form this
      // never moves the n_partkey-row aggregate to a single partition
      // (the only single-partition work is the 1-row total), so it holds
      // at 100x partkey cardinality. Sum of group sums == direct total;
      // the oracle runs the same text so float association matches.
      """WITH agg AS (
        |  SELECT l_partkey, sum(l_extendedprice * l_quantity) AS value
        |  FROM lineitem, supplier, nation
        |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND n_name = 'NATION_7'
        |  GROUP BY l_partkey),
        |t AS (SELECT sum(value) AS total FROM agg)
        |SELECT l_partkey, value
        |FROM agg, t
        |WHERE value > total * 0.002
        |ORDER BY round(value, 2) DESC, l_partkey""".stripMargin,

    // Q15: top supplier — CTE referenced twice + scalar MAX subquery.
    "tpch_q15" ->
      // Textbook shape, single PHYSICAL scan: both CTE references inline
      // onto the same scan -> partial agg -> Exchange hash(l_suppkey)
      // subtree, which AQE stage reuse dedupes (asserted in
      // PlanShapeSpec). max_rev joins back as a broadcast 1-row equi-join,
      // so no single-partition window over the supplier aggregate.
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |    AND l_suppkey IS NOT NULL
        |  GROUP BY l_suppkey),
        |m AS (SELECT max(total_revenue) AS max_rev FROM revenue)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier, revenue, m
        |WHERE s_suppkey = supplier_no AND total_revenue = max_rev
        |ORDER BY s_suppkey""".stripMargin,

    // Q16: supplier count per brand/type/size — NOT IN subquery +
    // count(DISTINCT) (negative-acctbal suppliers stand in for the original
    // complaint-comment filter).
    "tpch_q16" ->
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM part, lineitem
        |WHERE p_partkey = l_partkey AND p_brand <> 'Brand#5'
        |  AND p_type <> 'PROMO' AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    // Q17: small-quantity-order revenue — correlated AVG subquery. The
    // threshold is exact across engines: l_quantity is integer-valued, so
    // sum (and thus avg) carries no float summation-order error.
    "tpch_q17" ->
      """SELECT sum(l_extendedprice) / 7.0 AS avg_yearly
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND p_brand = 'Brand#3'
        |  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,

    // Q20: suppliers with excess shipped volume — IN subquery over a
    // grouped HAVING (availqty proxy: total shipped quantity of PROMO parts).
    "tpch_q20" ->
      """SELECT s_name, s_acctbal
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem, part
        |  WHERE l_partkey = p_partkey AND p_type = 'PROMO'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY l_suppkey HAVING sum(l_quantity) > 300)
        |ORDER BY s_name""".stripMargin,

    // Q22: global sales opportunity — uncorrelated scalar AVG threshold +
    // anti-join via NOT EXISTS (country code := nationkey mod 10; "inactive"
    // := no urgent orders, since every fixture customer has some order).
    "tpch_q22" ->
      """SELECT CAST(c_nationkey % 10 AS INT) AS cntrycode,
        |       count(*) AS numcust, sum(c_acctbal) AS totacctbal
        |FROM customer
        |WHERE c_nationkey % 10 IN (1, 3, 5, 7)
        |  AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
        |                   WHERE c_acctbal > 0.0 AND c_nationkey % 10 IN (1, 3, 5, 7))
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY cntrycode
        |ORDER BY cntrycode""".stripMargin
  )

  private def viaSql(name: String): (String, QueryFn) =
    name -> ((s: SparkSession, d: String) => {
      registerViews(s, d)
      s.sql(shared(name))
    })

  override def queries: Map[String, QueryFn] = Map(
    viaSql("tpch_q2"),
    viaSql("tpch_q11"),
    viaSql("tpch_q15"),
    viaSql("tpch_q16"),
    viaSql("tpch_q17"),
    viaSql("tpch_q20"),
    viaSql("tpch_q22"),

    // Q8: national market share — 8-way join, conditional share per year.
    "tpch_q8" -> ((s, d) => {
      val n1 = nation(s, d).select(col("n_nationkey").as("cust_nk"), col("n_regionkey").as("cust_rk"))
      val n2 = nation(s, d).select(col("n_nationkey").as("supp_nk"), col("n_name").as("nation"))
      val o = orders(s, d)
        .filter(col("o_orderdate").between(ts("1996-01-01"), ts("1997-12-31")))
      lineitem(s, d)
        .join(broadcast(part(s, d).filter(col("p_type") === "ECONOMY")),
          col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("c_nationkey") === col("cust_nk"))
        .join(broadcast(region(s, d).filter(col("r_name") === "AMERICA")),
          col("cust_rk") === col("r_regionkey"))
        .join(broadcast(n2), col("s_nationkey") === col("supp_nk"))
        .select(year(col("o_orderdate")).cast("int").as("o_year"),
          revenue.as("volume"), col("nation"))
        .groupBy(col("o_year"))
        .agg((sum(when(col("nation") === "NATION_3", col("volume")).otherwise(0.0)) /
          sum(col("volume"))).as("mkt_share"))
        .orderBy(col("o_year"))
    }),

    // Q9: product-type profit by nation/year (supply cost proxied by
    // 0.6 * p_retailprice — partsupp is absent from the fixture).
    "tpch_q9" -> ((s, d) => {
      lineitem(s, d)
        .join(broadcast(part(s, d).filter(col("p_name").like("%bolt%"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("int").as("o_year"),
          (revenue - lit(0.6) * col("p_retailprice") * col("l_quantity")).as("amount"))
        .groupBy(col("nation"), col("o_year"))
        .agg(sum(col("amount")).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // Q13: customer order-count distribution — left outer join with an
    // extra ON predicate, then a second aggregation over the first.
    "tpch_q13" -> ((s, d) => {
      val o = orders(s, d)
      customer(s, d)
        .join(o, col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "5-LOW", "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), col("c_count").desc)
    }),

    // Q21: suppliers who kept orders waiting — semi join (another supplier
    // exists in the order) + anti join (no OTHER supplier was late), with
    // lateness intrinsic to the line so the correlation stays equi-join.
    "tpch_q21" -> ((s, d) => {
      val cutoff = ts("2000-01-01")
      val l1 = lineitem(s, d).filter(col("l_shipdate") > cutoff)
      val base = l1
        .join(orders(s, d).filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d).filter(col("n_name") === "NATION_4")),
          col("s_nationkey") === col("n_nationkey"))
      val l2 = lineitem(s, d) // fresh scan: unambiguous attribute ids
      val l3 = lineitem(s, d).filter(col("l_shipdate") > cutoff)
      base
        .join(l2, base("l_orderkey") === l2("l_orderkey") &&
          base("l_suppkey") =!= l2("l_suppkey"), "left_semi")
        .join(l3, base("l_orderkey") === l3("l_orderkey") &&
          base("l_suppkey") =!= l3("l_suppkey"), "left_anti")
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), col("s_name"))
        .limit(100)
    })
  )

  override def oracle: Map[String, String] = shared ++ Map(
    "tpch_q8" ->
      """SELECT o_year,
        | sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) / sum(volume) AS mkt_share
        |FROM (SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |             l_extendedprice * (1 - l_discount) AS volume,
        |             n2.n_name AS nation
        |      FROM part, supplier, lineitem, orders, customer,
        |           nation n1, nation n2, region
        |      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        |        AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
        |        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        |        AND p_type = 'ECONOMY') all_nations
        |GROUP BY o_year ORDER BY o_year""".stripMargin,

    "tpch_q9" ->
      """SELECT nation, o_year, sum(amount) AS sum_profit
        |FROM (SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |             l_extendedprice * (1 - l_discount)
        |               - 0.6 * p_retailprice * l_quantity AS amount
        |      FROM part, supplier, lineitem, orders, nation
        |      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        |        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        |        AND p_name LIKE '%bolt%') profit
        |GROUP BY nation, o_year ORDER BY nation, o_year DESC""".stripMargin,

    "tpch_q13" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |      GROUP BY c_custkey) c_orders
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "tpch_q21" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > TIMESTAMP '2000-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > TIMESTAMP '2000-01-01')
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_4'
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin
  )
}
