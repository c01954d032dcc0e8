package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark.spark
import graft.text.TextKernels

/** Property-style checks of the hand-rolled distributed algorithms against
  * trivially-correct in-memory references: whatever invariant the Spark
  * implementation claims, a brute-force Scala implementation must agree on
  * arbitrary inputs — not just the fixture. Inputs are drawn from a seeded
  * RNG so failures reproduce.
  */
class PropertySpec extends AnyFunSuite {

  // -- ConnectedComponents vs brute-force union-find ------------------------

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map((0L until n.toLong).map(i => i -> i): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    for ((a, b) <- edges) parent(find(a)) = find(b)
    val byRoot = (0L until n.toLong).groupBy(find)
    byRoot.values.flatMap(ids => ids.map(_ -> ids.min)).toMap
  }

  test("ConnectedComponents agrees with union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 6) {
      val n = 1 + rnd.nextInt(24)
      val m = rnd.nextInt(31)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val nodes = (0L until n.toLong).toDF("id")
      val e = if (edges.isEmpty) Seq((0L, 0L)) else edges // self-loop stands in for empty
      val got = graft.operators.ConnectedComponents
        .run(nodes, e.toDF("src", "dst")).as[(Long, Long)].collect().toMap
      assert(got === unionFind(n, edges), s"n=$n edges=$edges")
    }
  }

  // -- shingles() vs naive sliding window -----------------------------------

  test("shingles() matches the naive sliding window for any token list") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "bb", "ccc", "dd", "ff")
    for (_ <- 1 to 10) {
      val k = rnd.nextInt(13)
      val ws = Seq.fill(k)(vocab(rnd.nextInt(vocab.size)))
      val n = 1 + rnd.nextInt(4)
      val got = Seq(ws.mkString(" "))
        .toDF("text")
        .select(TextKernels.shingles(split(col("text"), " "), n).as("g"))
        .as[Seq[String]].head()
      // "" splits to [""] — a 1-token list of the empty string, not 0 tokens
      val ref =
        if (ws.isEmpty) { if (n == 1) Seq("") else Seq.empty[String] }
        else if (ws.size < n) Seq.empty[String]
        else ws.sliding(n).map(_.mkString(" ")).toSeq
      assert(got === ref, s"ws=$ws n=$n")
    }
  }

  // -- sorted-run max == max element frequency (text_repetition kernel) -----

  test("longest equal-run of a sorted array equals the max element frequency") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("x", "y", "z", "w", "u")
    for (_ <- 1 to 10) {
      val items = Seq.fill(rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
      val expected =
        if (items.isEmpty) 0L
        else items.groupBy(identity).values.map(_.size).max.toLong
      val run = (acc: org.apache.spark.sql.Column, x: org.apache.spark.sql.Column) =>
        when(x === acc.getField("prev"), acc.getField("run") + 1).otherwise(lit(1L))
      val got = Seq(items).toDF("g")
        .select(aggregate(
          array_sort(col("g")),
          struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
          (acc, x) => struct(
            x.as("prev"), run(acc, x).as("run"),
            greatest(acc.getField("best"), run(acc, x)).as("best"))
        ).getField("best").as("best"))
        .as[Long].head()
      assert(got === expected, s"items=$items")
    }
  }
}
