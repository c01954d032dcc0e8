package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark.spark
import graft.plans.Interval

/** Edge-case unit tests for the native point-in-interval join
  * (plans/IntervalJoin.scala + IntervalJoinExec.scala): nested and
  * touching intervals, bound inclusivity, null handling, and empty
  * builds — the boundary conditions of the binary-search + prefix-max
  * walk, across multiple partitions.
  */
class IntervalJoinSpec extends AnyFunSuite {
  import spark.implicits._

  private def points(rows: (java.lang.Long, Long)*) =
    rows.toDF("pt", "pid").repartition(4)
  private def intervals(rows: (java.lang.Long, java.lang.Long, String)*) =
    rows.toDF("t0", "t1", "iv").repartition(3)

  private def run(p: org.apache.spark.sql.DataFrame, i: org.apache.spark.sql.DataFrame,
                  si: Boolean = true, ei: Boolean = false) =
    Interval.join(p, i, "pt", "t0", "t1", startInclusive = si, endInclusive = ei)
      .select(col("pid"), col("iv")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy(identity)

  test("half-open [t0, t1): boundary points match start, not end") {
    val out = run(
      points((10L, 1L), (20L, 2L), (15L, 3L)),
      intervals((10L, 20L, "a"), (20L, 30L, "b")))
    assert(out === Seq((1L, "a"), (2L, "b"), (3L, "a")).sortBy(identity))
  }

  test("nested and overlapping intervals all match (prefix-max walk does not stop early)") {
    // outer [0,100) contains inner [40,60); disjoint [10,20) sits between
    // them in start order with a SMALL end — the prefix max must carry the
    // outer interval's end past it.
    val out = run(
      points((50L, 1L), (15L, 2L), (99L, 3L)),
      intervals((0L, 100L, "outer"), (10L, 20L, "tiny"), (40L, 60L, "inner")))
    assert(out === Seq((1L, "outer"), (1L, "inner"), (2L, "outer"), (2L, "tiny"),
      (3L, "outer")).sortBy(identity))
  }

  test("inclusive end and exclusive start variants") {
    val p = points((10L, 1L), (20L, 2L))
    val i = intervals((10L, 20L, "a"))
    assert(run(p, i, si = false, ei = true) === Seq((2L, "a")))
    assert(run(p, i, si = true, ei = true) === Seq((1L, "a"), (2L, "a")))
  }

  test("null points and null-bounded intervals never match; empty build emits nothing") {
    val p = Seq((null.asInstanceOf[java.lang.Long], 1L), (java.lang.Long.valueOf(5L), 2L))
      .toDF("pt", "pid")
    val i = intervals((null, 10L, "n0"), (0L, null, "n1"), (0L, 10L, "ok"))
    assert(run(p, i) === Seq((2L, "ok")))
    assert(run(p, intervals()) === Seq())
  }

  test("points before all starts and after all ends match nothing") {
    val out = run(
      points((1L, 1L), (99L, 2L)),
      intervals((10L, 20L, "a"), (30L, 40L, "b")))
    assert(out === Seq())
  }

  test("overlap probe: touching, containing, contained, and disjoint ranges") {
    val pr = Seq((0L, 5L, 1L), (20L, 30L, 2L), (12L, 13L, 3L), (50L, 60L, 4L))
      .toDF("p0", "p1", "pid").repartition(3)
    val iv = intervals((5L, 10L, "a"), (10L, 40L, "b"))
    val out = Interval.joinOverlap(pr, iv, "p0", "p1", "t0", "t1")
      .select(col("pid"), col("iv")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(identity)
    // pid 1 [0,5] touches a at 5 (inclusive) and misses b; pid 2 [20,30]
    // and pid 3 [12,13] sit inside b; pid 4 [50,60] is disjoint from both.
    assert(out === Seq((1L, "a"), (2L, "b"), (3L, "b")).sortBy(identity))
  }

  test("left outer: unmatched probes emit once with a null interval side") {
    val p = points((10L, 1L), (25L, 2L), (5L, 3L), (null, 4L))
    val i = intervals((10L, 20L, "a"), (8L, 12L, "b"))
    val out = Interval.join(p, i, "pt", "t0", "t1", joinType = "left")
      .select(col("pid"), col("iv")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_.toString)
    // pid 1 matches both; 2, 3 and the null-point 4 emit once with null
    assert(out === Seq((1L, Some("a")), (1L, Some("b")), (2L, None),
      (3L, None), (4L, None)).sortBy(_.toString))
    // and against an EMPTY build side every probe survives
    val empty = intervals().filter(lit(false))
    val out2 = Interval.join(points((1L, 9L)), empty, "pt", "t0", "t1",
      joinType = "left").select(col("pid"), col("iv")).collect()
    assert(out2.map(r => (r.getLong(0), r.isNullAt(1))).toSeq === Seq((9L, true)))
  }

  test("left outer matches Spark's own left join row-for-row on random data") {
    val rnd = new scala.util.Random(20260813)
    val p = (1 to 400).map(i => (rnd.nextInt(1000).toLong, i.toLong))
      .toDF("pt", "pid").repartition(5)
    val iv = (1 to 60).map { i =>
      val s = rnd.nextInt(1000).toLong
      (s, s + rnd.nextInt(80).toLong, s"iv$i")
    }.toDF("t0", "t1", "iv").repartition(3)
    val native = Interval.join(p, iv, "pt", "t0", "t1", joinType = "left")
      .select("pid", "iv").collect().map(r => (r.getLong(0), Option(r.getString(1))))
      .sortBy(_.toString).toSeq
    val composed = p.join(iv, col("pt") >= col("t0") && col("pt") < col("t1"), "left")
      .select("pid", "iv").collect().map(r => (r.getLong(0), Option(r.getString(1))))
      .sortBy(_.toString).toSeq
    assert(native === composed)
  }

  test("implicit method syntax delegates to the same operators") {
    import GraftImplicits._
    val viaImplicit = points((15L, 1L))
      .intervalJoin(intervals((10L, 20L, "a")), "pt", "t0", "t1")
      .select(col("pid"), col("iv")).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(viaImplicit === Array((1L, "a")))
    val ov = Seq((0L, 100L, 9L)).toDF("p0", "p1", "pid")
      .intervalOverlapJoin(intervals((10L, 20L, "a")), "p0", "p1", "t0", "t1")
    assert(ov.count() === 1)
  }
}
