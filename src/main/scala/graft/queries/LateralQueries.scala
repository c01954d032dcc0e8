package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._

/** Lateral / table-function surface (SURVEY.md §2.9): FLATTEN with
  * SEQ/INDEX/VALUE outputs, SPLIT_TO_TABLE, GENERATOR(ROWCOUNT), in-memory
  * scan, and parameterized SQL.
  *
  * Reference: bodo/libs/_lateral.cpp:957 (flatten), BodoSQL/bodosql/
  * kernels/lateral.py:92, string_array_kernels.py:1897 (strtok_to_array →
  * flatten), TableFunctionOperatorTable.java:105 (GENERATOR),
  * bodo/pandas/plan.py:486 (in-memory scan), context.py:504-560 (named SQL
  * params). Spark-first: explode/posexplode are Catalyst Generators —
  * pipelined, no shuffle; spark.range is a parallelized source, not a
  * driver loop.
  */
object LateralQueries extends QueryModule {

  override def queries: Map[String, QueryFn] = Map(
    // FLATTEN of the word array: SEQ = input row id, INDEX = 0-based
    // position, VALUE = element (Snowflake FLATTEN column set).
    "lateral_flatten" -> ((s, d) => {
      documents(s, d).filter(col("doc_id") % 25 === 0)
        .select(col("doc_id").as("seq"),
          posexplode(split(col("text"), " ")).as(Seq("idx", "value")))
    }),

    // SPLIT_TO_TABLE(p_name, ' '): 1-based part numbers per Snowflake.
    "split_to_table" -> ((s, d) => {
      part(s, d).filter(col("p_partkey") % 7 === 0)
        .select(col("p_partkey"),
          posexplode(split(col("p_name"), " ")).as(Seq("pn", "token")))
        .select(col("p_partkey"), (col("pn") + 1).as("part_num"), col("token"))
    }),

    // GENERATOR(ROWCOUNT => 1000): distributed range source + projections.
    "generator_rowcount" -> ((s, _) => {
      s.range(1000).select(
        col("id"),
        (col("id") * 2 + 1).as("odd"),
        (col("id") % 7).as("m7"),
        md5(col("id").cast("string")).as("h"))
    }),

    // In-memory scan: client-side rows -> distributed DataFrame.
    "inmem_scan" -> ((s, _) => {
      import s.implicits._
      Seq((1L, "alpha", 10.5), (2L, "beta", 20.25), (3L, "gamma", -3.75),
        (4L, "alpha", 4.0), (5L, "beta", 0.5))
        .toDF("id", "tag", "v")
        .groupBy("tag")
        .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
    }),

    // Parameterized SQL (named args; Spark 3.4+ parameterized spark.sql).
    "param_sql" -> ((s, d) => {
      registerViews(s, d)
      s.sql(
        """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
          |FROM lineitem WHERE l_quantity > :qmin AND l_shipdate >= :dmin
          |GROUP BY l_returnflag""".stripMargin,
        Map("qmin" -> 45, "dmin" -> "1996-01-01"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "lateral_flatten" ->
      """SELECT doc_id AS seq,
        |  CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INTEGER) AS idx,
        |  unnest(string_split(text, ' ')) AS value
        |FROM documents WHERE doc_id % 25 = 0""".stripMargin,

    "split_to_table" ->
      """SELECT p_partkey,
        |  CAST(generate_subscripts(string_split(p_name, ' '), 1) AS INTEGER) AS part_num,
        |  unnest(string_split(p_name, ' ')) AS token
        |FROM part WHERE p_partkey % 7 = 0""".stripMargin,

    "generator_rowcount" ->
      """SELECT range AS id, range * 2 + 1 AS odd, range % 7 AS m7,
        |  md5(CAST(range AS VARCHAR)) AS h
        |FROM range(1000)""".stripMargin,

    "inmem_scan" ->
      """SELECT tag, count(*) AS n, sum(CAST(v AS DOUBLE)) AS sum_v
        |FROM (VALUES (1, 'alpha', 10.5), (2, 'beta', 20.25), (3, 'gamma', -3.75),
        |             (4, 'alpha', 4.0), (5, 'beta', 0.5)) t(id, tag, v)
        |GROUP BY tag""".stripMargin,

    "param_sql" ->
      """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '1996-01-01'
        |GROUP BY l_returnflag""".stripMargin
  )
}
