package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark.spark
import graft.plans.Asof

/** Edge-case unit tests for the native as-of join operator
  * (plans/AsofJoin.scala + AsofJoinExec.scala): crafted inputs exercising
  * the merge's boundary conditions across multiple partitions — the cases
  * a fixture sweep can't isolate.
  */
class AsofJoinSpec extends AnyFunSuite {
  import spark.implicits._

  private def probes(rows: (java.lang.Long, java.lang.Long, Long)*) =
    rows.toDF("k", "t", "pid").repartition(4)
  private def quotes(rows: (java.lang.Long, java.lang.Long, String)*) =
    rows.toDF("qk", "qt", "qv").repartition(3)

  private def run(p: org.apache.spark.sql.DataFrame, q: org.apache.spark.sql.DataFrame) =
    Asof.join(p, q, "k", "qk", "t", "qt")
      .select(col("pid"), col("qt"), col("qv"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2)))
      .sortBy(_._1)

  test("backward inclusive match picks the latest quote at-or-before each probe") {
    val out = run(
      probes((1L, 10L, 1L), (1L, 20L, 2L), (1L, 5L, 3L), (2L, 10L, 4L)),
      quotes((1L, 5L, "a"), (1L, 10L, "b"), (1L, 15L, "c"), (2L, 99L, "z")))
    assert(out === Seq(
      (1L, 10L, "b"),   // t=10: equal timestamp is inclusive
      (2L, 15L, "c"),   // t=20: latest <= 20
      (3L, 5L, "a"),    // t=5: exact
      (4L, null, null)) // key 2's only quote is later -> no match
      .sortBy(_._1))
  }

  test("probes with no quotes for their key, and keys only on the right") {
    val out = run(
      probes((7L, 10L, 1L), (8L, 10L, 2L)),
      quotes((8L, 1L, "x"), (9L, 1L, "y")))
    assert(out === Seq((1L, null, null), (2L, 1L, "x")))
  }

  test("empty quote side leaves all probes unmatched (LEFT semantics)") {
    val out = run(
      probes((1L, 1L, 1L), (2L, 2L, 2L)),
      quotes())
    assert(out === Seq((1L, null, null), (2L, null, null)))
  }

  test("null keys and null times never match (SQL equality semantics)") {
    val out = run(
      probes((null, 10L, 1L), (1L, null, 2L), (1L, 10L, 3L)),
      quotes((null, 5L, "nk"), (1L, null, "nt"), (1L, 5L, "ok")))
    assert(out === Seq(
      (1L, null, null), // null probe key
      (2L, null, null), // null probe time
      (3L, 5L, "ok")))  // null-key/null-time quotes skipped, real one matches
  }

  test("forward direction matches the earliest quote at-or-after, shared across probes") {
    val out = Asof.join(
      probes((1L, 10L, 1L), (1L, 12L, 2L), (1L, 20L, 3L), (2L, 5L, 4L)),
      quotes((1L, 15L, "f"), (1L, 25L, "g"), (2L, 1L, "h")),
      "k", "qk", "t", "qt", direction = "forward")
      .select(col("pid"), col("qt"), col("qv")).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2)))
      .sortBy(_._1)
    assert(out === Seq(
      (1L, 15L, "f"),   // first quote >= 10
      (2L, 15L, "f"),   // same head serves the next probe (not consumed)
      (3L, 25L, "g"),   // 15 dropped once probe passes it
      (4L, null, null)) // key 2's quote is earlier -> no forward match
      .sortBy(_._1))
  }

  test("tolerance nulls out matches beyond the bound, keeps nearer ones") {
    val out = Asof.join(
      probes((1L, 100L, 1L), (1L, 107L, 2L), (2L, 100L, 3L)),
      quotes((1L, 98L, "near"), (2L, 10L, "far")),
      "k", "qk", "t", "qt", tolerance = Some(5L))
      .select(col("pid"), col("qv")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      .sortBy(_._1)
    assert(out === Seq(
      (1L, "near"),   // diff 2 <= 5
      (2L, null),     // diff 9 > 5 -> nulled, not dropped
      (3L, null)))    // diff 90 > 5
  }

  test("many probes share one late quote; candidate resets across keys") {
    val out = run(
      probes((1L, 100L, 1L), (1L, 200L, 2L), (2L, 100L, 3L), (3L, 100L, 4L)),
      quotes((1L, 50L, "q1"), (3L, 60L, "q3")))
    assert(out === Seq(
      (1L, 50L, "q1"), (2L, 50L, "q1"),
      (3L, null, null), // key 2 has no quotes; key 1's candidate must not leak
      (4L, 60L, "q3")))
  }

  test("nearest picks the closer side, backward on ties, and honors tolerance") {
    def runNearest(tol: Option[Long]) = Asof.join(
      probes((1L, 10L, 1L), (1L, 14L, 2L), (1L, 16L, 3L), (2L, 5L, 4L), (3L, 5L, 5L)),
      quotes((1L, 8L, "b"), (1L, 20L, "f"), (2L, 50L, "far_fwd")),
      "k", "qk", "t", "qt", direction = "nearest", tolerance = tol)
      .select(col("pid"), col("qv")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      .sortBy(_._1)
    assert(runNearest(None) === Seq(
      (1L, "b"),       // dist 2 back vs 10 fwd
      (2L, "b"),       // tie (6 vs 6) -> backward wins
      (3L, "f"),       // dist 8 back vs 4 fwd
      (4L, "far_fwd"), // only a forward quote exists
      (5L, null)))     // key 3 has no quotes
    assert(runNearest(Some(5L)) === Seq(
      (1L, "b"),
      (2L, null),      // nearest side is 6 away, beyond tolerance 5
      (3L, "f"),
      (4L, null),      // forward dist 45 > tolerance 5
      (5L, null)))
  }

  test("multi-column by-groups via struct-packed keys (merge_asof by=[a, b])") {
    // pandas merge_asof accepts multiple by columns; the operator's key is
    // one attribute, so compound keys pack into a struct — RowOrdering
    // orders structs field-by-field, which is exactly the compound-key
    // ordering the merge needs.
    val p = Seq((1L, "x", 10L, 1L), (1L, "y", 10L, 2L), (2L, "x", 10L, 3L))
      .toDF("u", "g", "t", "pid")
      .select(struct(col("u"), col("g")).as("k"), col("t"), col("pid"))
      .repartition(3)
    val q = Seq((1L, "x", 5L, "ux"), (1L, "y", 6L, "uy"), (2L, "z", 1L, "uz"))
      .toDF("qu", "qg", "qt", "qv")
      .select(struct(col("qu"), col("qg")).as("qk"), col("qt"), col("qv"))
      .repartition(2)
    val out = Asof.join(p, q, "k", "qk", "t", "qt")
      .select(col("pid"), col("qv")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      .sortBy(_._1)
    assert(out === Seq(
      (1L, "ux"),  // (1, x) matches its own group's quote
      (2L, "uy"),  // (1, y) must not see (1, x)'s quote
      (3L, null))) // (2, x) has no quote — (2, z) is a different group
  }
}
