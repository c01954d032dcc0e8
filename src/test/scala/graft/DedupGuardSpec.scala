package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark
import graft.text.TextKernels.{md5Long, shingles, words}

/** The df-cap guard must actually FIRE, not just exist in the plan: the
  * fixture corpus has max shingle df 7, so DFCAP=64 never triggers there
  * (VERDICT r7). Here a synthetic corpus where 70 documents share one
  * boilerplate phrase (df = 70 > 64) pins that:
  *   - hot shingles are anti-joined out of the capped shingle set,
  *   - per-doc sizes are reduced by exactly the doc's hot-shingle count,
  *   - the jaccard pair generator stays sane — no candidate pairs driven
  *     only by the boilerplate bucket (which uncapped would contribute
  *     70·69/2 ≈ 2.4k pairs from one phrase).
  */
class DedupGuardSpec extends AnyFunSuite {

  private val boiler = "all rights reserved by the archive mirror"

  private def fixtureDir(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dedup_guard").toString
    // 70 docs share the boilerplate; each carries 8 unique words so no
    // real near-dup pairs exist beyond the boilerplate overlap.
    val rows = (0 until 70).map { i =>
      val unique = (0 until 8).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, s"$boiler $unique", "en", "src", 0L)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("hot shingles (df > DFCAP) are anti-joined out and sizes shrink accordingly") {
    val dir = fixtureDir()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val all = docs
      .select(col("doc_id"), explode(shingles(words(col("text")), 3)).as("s"))
      .select(col("doc_id"), md5Long(col("s")).as("sh")).distinct()
    val hot = all.groupBy("sh").count()
      .filter(col("count") > graft.queries.DedupQueries.DFCAP)
    // the boilerplate really is hot: its 3-gram shingles hit all 70 docs
    assert(hot.count() >= 5, "expected the shared phrase to produce hot shingles")

    val capped = graft.queries.DedupQueries.cappedShingles(spark, dir)
    // 1. no hot shingle survives the guard
    val leaked = capped.join(hot, Seq("sh"), "left_semi").count()
    assert(leaked == 0, s"$leaked hot-shingle rows leaked past the df-cap anti-join")
    // 2. capped per-doc size = total distinct shingles - hot ones
    val expected = all.join(hot, Seq("sh"), "left_anti")
      .groupBy("doc_id").count()
    val mismatches = capped.select(col("doc_id"), col("n")).distinct()
      .join(expected, Seq("doc_id"))
      .filter(col("n") =!= col("count")).count()
    assert(mismatches == 0, "capped sizes disagree with post-cap shingle counts")
  }

  test("jaccard pair generator emits no boilerplate-only candidate pairs") {
    val dir = fixtureDir()
    val pairs = SparkEntry.queries("dedup_docs_jaccard")(spark, dir)
    // docs share ONLY the capped boilerplate -> zero qualifying pairs
    // (uncapped, the shared bucket alone would yield 70*69/2 candidates
    // and nonzero jaccard denominator-distorted scores)
    assert(pairs.count() == 0)
  }
}
