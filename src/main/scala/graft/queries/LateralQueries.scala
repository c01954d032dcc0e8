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

    // FLATTEN with the FULL Snowflake column set SEQ/KEY/PATH/INDEX/VALUE/
    // THIS (ref BodoReturnTypes.java:111, _lateral.cpp:957): an object of
    // arrays is flattened two levels — level 1 emits each member (KEY set,
    // INDEX null, PATH = key, THIS = the object, VALUE = the member as
    // JSON), level 2 recursively flattens each member array with
    // OUTER=>TRUE (PATH = key[idx], THIS = the array; empty arrays keep
    // their parent row with null INDEX/VALUE and PATH = key). VALUE/THIS
    // are JSON strings — the VariantType stand-in shared with fn_variant.
    // Both levels are Catalyst Generators: pipelined, shuffle-free.
    "lateral_flatten_full" -> ((s, d) => {
      val ws = split(col("text"), " ")
      val obj = map(
        lit("head"), slice(ws, 1, 3),
        lit("tail"), when(col("doc_id") % 7 === 0, array().cast("array<string>"))
          .otherwise(slice(ws, 4, 2)))
      val base = documents(s, d).filter(col("doc_id") % 25 === 0)
        .select(col("doc_id").as("seq"), obj.as("obj"))
      val lvl1 = base.select(col("seq"), to_json(col("obj")).as("pj"),
        explode(col("obj")).as(Seq("key", "arr")))
      val l1 = lvl1.select(col("seq"), col("key"), col("key").as("path"),
        lit(null).cast("int").as("idx"), to_json(col("arr")).as("value"),
        col("pj").as("this"))
      val l2 = lvl1
        .select(col("seq"), col("key"), col("arr"),
          posexplode_outer(col("arr")).as(Seq("idx", "value")))
        .select(col("seq"), col("key"),
          when(col("idx").isNotNull,
            concat(col("key"), lit("["), col("idx").cast("string"), lit("]")))
            .otherwise(col("key")).as("path"),
          col("idx"), col("value"), to_json(col("arr")).as("this"))
      l1.unionByName(l2)
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

    "lateral_flatten_full" ->
      """WITH t AS (
        |  SELECT doc_id AS seq, string_split(text, ' ') AS ws
        |  FROM documents WHERE doc_id % 25 = 0),
        |o AS (
        |  SELECT seq, ws[1:3] AS head_arr,
        |    CASE WHEN seq % 7 = 0 THEN []::VARCHAR[] ELSE ws[4:5] END AS tail_arr
        |  FROM t),
        |j AS (
        |  SELECT seq, head_arr, tail_arr,
        |    CAST(to_json(struct_pack("head" := head_arr, "tail" := tail_arr)) AS VARCHAR) AS pj
        |  FROM o),
        |lvl1 AS (
        |  SELECT seq, 'head' AS "key", head_arr AS arr, pj FROM j
        |  UNION ALL
        |  SELECT seq, 'tail', tail_arr, pj FROM j),
        |l1 AS (
        |  SELECT seq, "key", "key" AS path, CAST(NULL AS INTEGER) AS idx,
        |    CAST(to_json(arr) AS VARCHAR) AS "value", pj AS "this"
        |  FROM lvl1),
        |l2p AS (
        |  SELECT seq, "key", arr,
        |    CAST(CASE WHEN len(arr) = 0 THEN NULL
        |         ELSE generate_subscripts(CASE WHEN len(arr) = 0 THEN [NULL] ELSE arr END, 1) - 1
        |         END AS INTEGER) AS idx,
        |    unnest(CASE WHEN len(arr) = 0 THEN [NULL] ELSE arr END) AS "value"
        |  FROM lvl1),
        |l2 AS (
        |  SELECT seq, "key",
        |    CASE WHEN idx IS NULL THEN "key"
        |         ELSE "key" || '[' || idx || ']' END AS path,
        |    idx, "value", CAST(to_json(arr) AS VARCHAR) AS "this"
        |  FROM l2p)
        |SELECT * FROM l1 UNION ALL SELECT * FROM l2""".stripMargin,

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
