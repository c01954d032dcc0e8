package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.{sf, spark}

/** Pins the loader-level (post-dispatch) schema of every fixture.
  *
  * The test environment has regenerated /root/testdata between rounds with a
  * different physical encoding (events.ts went TIMESTAMP(NANOS) →
  * TIMESTAMP(µs) between r9 and r10, erroring 75 queries at analysis time).
  * This suite makes any future drift fail ONE named test with the observed
  * schema in the message, instead of failing every downstream query
  * anonymously. Assertions target what queries actually consume: the schema
  * AFTER Tables' dispatch, not the raw parquet footer. Wall-clock timestamp
  * columns accept both TimestampType and TimestampNTZType — under the UTC
  * session the two are value-identical and both generations of fixtures have
  * shipped them; events.ts specifically must come out as TimestampType
  * because Tables.events normalizes it.
  */
class FixtureSchemaSpec extends AnyFunSuite {

  private def anyTs(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  private def check(name: String, df: DataFrame, expect: Seq[(String, DataType => Boolean, String)]): Unit = {
    val got = df.schema.fields.toSeq
    assert(got.map(_.name) == expect.map(_._1),
      s"$name columns drifted: got ${got.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
    for ((f, (_, ok, want)) <- got.zip(expect))
      assert(ok(f.dataType), s"$name.${f.name} is ${f.dataType.simpleString}, expected $want — " +
        "fixture regeneration changed the physical type; fix the Tables loader dispatch")
  }

  private def exact(n: String, t: DataType) = (n, (d: DataType) => d == t, t.simpleString)
  private def wallTs(n: String) = (n, anyTs _, "timestamp or timestamp_ntz")

  test("region schema") {
    check("region", Tables.region(spark, sf),
      Seq(exact("r_regionkey", IntegerType), exact("r_name", StringType)))
  }

  test("nation schema") {
    check("nation", Tables.nation(spark, sf),
      Seq(exact("n_nationkey", IntegerType), exact("n_name", StringType), exact("n_regionkey", IntegerType)))
  }

  test("customer schema") {
    check("customer", Tables.customer(spark, sf),
      Seq(exact("c_custkey", LongType), exact("c_name", StringType), exact("c_nationkey", IntegerType),
        exact("c_acctbal", DoubleType), exact("c_mktsegment", StringType)))
  }

  test("supplier schema") {
    check("supplier", Tables.supplier(spark, sf),
      Seq(exact("s_suppkey", LongType), exact("s_name", StringType), exact("s_nationkey", IntegerType),
        exact("s_acctbal", DoubleType)))
  }

  test("part schema") {
    check("part", Tables.part(spark, sf),
      Seq(exact("p_partkey", LongType), exact("p_name", StringType), exact("p_brand", StringType),
        exact("p_type", StringType), exact("p_size", IntegerType), exact("p_retailprice", DoubleType)))
  }

  test("orders schema") {
    check("orders", Tables.orders(spark, sf),
      Seq(exact("o_orderkey", LongType), exact("o_custkey", LongType), exact("o_orderstatus", StringType),
        exact("o_totalprice", DoubleType), wallTs("o_orderdate"), exact("o_orderpriority", StringType)))
  }

  test("lineitem schema") {
    check("lineitem", Tables.lineitem(spark, sf),
      Seq(exact("l_orderkey", LongType), exact("l_partkey", LongType), exact("l_suppkey", LongType),
        exact("l_linenumber", IntegerType), exact("l_quantity", DoubleType), exact("l_extendedprice", DoubleType),
        exact("l_discount", DoubleType), exact("l_tax", DoubleType), exact("l_returnflag", StringType),
        exact("l_linestatus", StringType), wallTs("l_shipdate")))
  }

  test("events schema (ts normalized to session TimestampType)") {
    check("events", Tables.events(spark, sf),
      Seq(exact("event_id", LongType), exact("ts", TimestampType), exact("user_id", LongType),
        exact("event_type", StringType), exact("value", DoubleType), exact("props", StringType)))
  }

  test("documents schema") {
    check("documents", Tables.documents(spark, sf),
      Seq(exact("doc_id", LongType), exact("text", StringType), exact("lang", StringType),
        exact("source", StringType), exact("n_chars", LongType)))
  }

  test("embeddings schema") {
    check("embeddings", Tables.embeddings(spark, sf),
      Seq(exact("vec_id", LongType), exact("embedding", ArrayType(FloatType)), exact("label", IntegerType)))
  }

  test("events loads and is non-empty at every local sf") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val ev = Tables.events(spark, d)
      assert(ev.schema("ts").dataType == TimestampType, s"dispatch failed at $d")
      assert(ev.limit(1).count() == 1, s"events empty at $d")
    }
  }
}
