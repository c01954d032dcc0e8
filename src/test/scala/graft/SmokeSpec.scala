package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.{sf, spark}

/** Every driver-contract query must plan and execute at sf0.001, and every
  * query name must have either an oracle entry or a documented reason not
  * to (mirrors the reference's parameterized per-operator pytest breadth).
  */
class SmokeSpec extends AnyFunSuite {

  // Queries whose semantics are engine-nondeterministic (rows-only checks).
  private val noOracleAllowed = Set("sample_fraction")

  test("oracle map covers every query (or is explicitly rows-only)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- noOracleAllowed
    assert(missing.isEmpty, s"queries without oracle: ${missing.mkString(", ")}")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: ${orphans.mkString(", ")}")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name executes at sf0.001") {
      val n = SparkEntry.queries(name)(spark, sf).count()
      assert(n >= 0)
    }
  }
}
