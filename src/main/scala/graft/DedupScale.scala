package graft

import org.apache.spark.sql.functions._

/** Empirical scale-bound check for the dedup/ANN family (VERDICT r7
  * item 3): synthesize an N× documents corpus, run the five dedup
  * candidate generators + connected components, and print per-scale
  * timings so runtime-vs-corpus-size is measured, not argued.
  *
  * Corpus construction — the two properties a real scale-up has:
  *   - NEW content per replica: every word of replica r>0 gets an `rN`
  *     suffix, so replicas occupy disjoint shingle spaces and the
  *     within-replica duplicate structure repeats instead of multiplying
  *     (naive duplication would grow the pair graph quadratically — a
  *     measurement artifact, not pipeline cost).
  *   - A SHARED boilerplate header on every document across all
  *     replicas: its shingles reach df = 5000·N >> DFCAP, so the
  *     hot-shingle anti-join guard (DedupQueries.DFCAP) actually fires —
  *     without the cap this one header would create Σ bucket² = (5000·N)²
  *     candidate pairs and quadratic blowup; with it, measured runtime
  *     should stay ~linear in N.
  *
  * Timing is min-of-2 passes per query per scale (VERDICT r8 item 3 /
  * r9 item 4): this host shows multi-second waves of external CPU
  * contention, and a single pass at the largest scale can read a
  * contention spike as a super-linear slope. Min is the right statistic
  * for purely-additive interference (same rationale as Bench.scala).
  *
  * Usage: runMain graft.DedupScale <sfDir> <scales e.g. 1,2,4,8,16> [query-substring] */
object DedupScale {
  private val Boiler =
    "terms of service apply to all content in this corpus archive mirror"

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val scales = (if (args.length > 1) args(1) else "1,2,4")
      .split(",").map(_.trim.toInt)
    val flt = if (args.length > 2) args(2) else ""
    val spark = Sessions.local()
    val queries = Seq("dedup_docs_exact", "dedup_docs_fingerprint",
      "dedup_docs_jaccard", "dedup_docs_minhash", "dedup_docs_simhash",
      "dedup_docs_embedding", "dedup_cluster_cc").filter(_.contains(flt))
    val results = scales.map { n =>
      val dir = s"/tmp/graft_scale/x$n"
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
      val scaled = base.crossJoin(spark.range(n).toDF("rep"))
        .select(
          (col("doc_id") + col("rep") * 10000000L).as("doc_id"),
          concat(lit(Boiler), lit(" "),
            when(col("rep") === 0, col("text"))
              .otherwise(array_join(
                transform(split(col("text"), " "),
                  w => concat(w, lit("r"), col("rep"))), " "))).as("text"),
          col("lang"), col("source"), col("n_chars"))
      scaled.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = spark.read.parquet(s"$dir/documents.parquet").count()
      def onePass(q: String): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val times = queries.map(q => q -> math.min(onePass(q), onePass(q)))
      (n, rows, times)
    }
    results.foreach { case (n, rows, times) =>
      val qs = times.map { case (q, t) => f""""$q":$t%.2f""" }.mkString(",")
      val tot = times.map(_._2).sum
      println(f"""{"scale":$n,"docs":$rows,"total_s":$tot%.2f,$qs}""")
    }
    spark.stop()
  }
}
