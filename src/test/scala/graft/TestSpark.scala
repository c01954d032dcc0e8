package graft

import org.apache.spark.sql.SparkSession

/** One shared tuned session for all suites (same factory the driver uses). */
object TestSpark {
  lazy val spark: SparkSession = Sessions.build("local[4]", 4)
  val sf: String = "/root/testdata/sf0.001"
}
