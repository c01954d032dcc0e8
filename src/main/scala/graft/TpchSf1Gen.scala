package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scale-up probe data generator (r20): the 2x bench bar has only
  * ever been proved at sf0.1 — this synthesizes an sf1-SIZED TPC-H-ish
  * dataset by unioning 10 key-shifted copies of the driver's sf0.1
  * tables (custkey/orderkey/partkey/suppkey offset per copy so join
  * fan-outs stay exactly TPC-H-shaped: every copy joins only within
  * itself; region/nation stay shared dims). Row counts land at true
  * sf1 (1.5M customers, 15M orders, 60M lineitems); value distributions
  * are sf0.1's repeated 10x, which is fine for a PLAN-SCALING probe —
  * this is a one-off study input, never an oracle input.
  *
  * Writes /tmp/graft_sf1/<table>.parquet; run the battery with
  * SPARK_GRAFT_SF_DIR=/tmp/graft_sf1. */
private[graft] object TpchSf1Gen {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val src = "/root/testdata/sf0.1"
    // r21: parameterized so the same generator scales the probe further
    // (sf10 = 100 copies -> 600M lineitems, the spill checkpoint)
    val copies = sys.env.getOrElse("GRAFT_SF_COPIES", "10").toInt
    val out = sys.env.getOrElse("GRAFT_SF_OUT", "/tmp/graft_sf1")

    def shifted(df: DataFrame, keyShifts: Map[String, Long]): DataFrame =
      (0 until copies).map { i =>
        keyShifts.foldLeft(df) { case (d, (c, shift)) =>
          d.withColumn(c, col(c) + lit(shift * i))
        }
      }.reduce(_ unionByName _)

    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1L

    val customer = Tables.customer(spark, src)
    val orders = Tables.orders(spark, src)
    val lineitem = Tables.lineitem(spark, src)
    val part = Tables.part(spark, src)
    val supplier = Tables.supplier(spark, src)
    val ck = maxOf(customer, "c_custkey")
    val ok = maxOf(orders, "o_orderkey")
    val pk = maxOf(part, "p_partkey")
    val sk = maxOf(supplier, "s_suppkey")

    def write(name: String, df: DataFrame, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")

    // file counts scale with the copy count so per-file sizes stay flat
    val sc = math.max(1, copies / 10)
    write("customer", shifted(customer, Map("c_custkey" -> ck)), 8 * sc)
    write("orders", shifted(orders,
      Map("o_orderkey" -> ok, "o_custkey" -> ck)), 16 * sc)
    write("lineitem", shifted(lineitem,
      Map("l_orderkey" -> ok, "l_partkey" -> pk, "l_suppkey" -> sk)), 48 * sc)
    write("part", shifted(part, Map("p_partkey" -> pk)), 8 * sc)
    write("supplier", shifted(supplier, Map("s_suppkey" -> sk)), 2 * sc)
    // shared dims + the non-TPCH tables, copied verbatim (the tpch
    // battery needs region/nation; the rest keep the dir loadable)
    for (t <- Seq("region", "nation", "events", "documents", "embeddings"))
      spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
    for (t <- Seq("customer", "orders", "lineitem", "part", "supplier"))
      println(s"$t: " + spark.read.parquet(s"$out/$t.parquet").count())
    spark.stop()
  }
}
