package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale study (r20): sub-document (paragraph) dedup — dedup_paragraphs
  * shipped in r19 with a structural scale argument; this measures it.
  *
  * Claims under test, on a synthetic corpus whose every document leads
  * with one boilerplate passage drawn from a FIXED pool of B passages
  * (window-aligned: the PARAW-word slicing sees it as one repeated
  * passage) followed by unique filler:
  *
  *   1. wall time and total shuffle bytes (df aggregate + reassembly,
  *      the operator's only two wide shuffles) grow ∝ CORPUS — docs
  *      x1 / x4 / x16 at fixed B;
  *   2. the hot-passage list (df > PARADF tail, the broadcast side)
  *      grows ∝ BOILERPLATE, not corpus — flat across the corpus sweep,
  *      ∝ B across a B x1 / x4 / x16 sweep at fixed corpus;
  *   3. stripping is exact: every boilerplate window gone, every unique
  *      window kept (spot-checked per point).
  *
  * Emits one JSON line per point; local[32], min-of-1 (the shuffles
  * dominate — run-to-run noise is well under the 4x steps). */
private[graft] object ParaScale {
  import graft.queries.DedupQueries.{PARAW, PARADF}

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null) {
            shuffleBytes.addAndGet(
              e.taskMetrics.shuffleWriteMetrics.bytesWritten): Unit
          }
      })
    def quiesce(): Long = {
      var last = -1L
      var cur = shuffleBytes.get()
      while (cur != last) { Thread.sleep(300); last = cur; cur = shuffleBytes.get() }
      cur
    }

    /** docs: boilerplate passage (PARAW words, pool of b) + 4 unique
      * windows of filler. */
    def corpus(nDocs: Long, b: Int): DataFrame =
      spark.range(0, nDocs).selectExpr("id AS doc_id",
        s"""concat(
           |  array_join(transform(sequence(1, $PARAW),
           |    i -> concat('bp', cast(id % $b AS string), '_', i)), ' '),
           |  ' ',
           |  array_join(transform(sequence(1, ${4 * PARAW}),
           |    i -> concat('u', cast(id AS string), '_', i)), ' ')
           |) AS text""".stripMargin)

    def strip(docs: DataFrame): DataFrame = {
      // the dedup_paragraphs shape verbatim (module-private there; the
      // study replicates it so the measured plan IS the operator's)
      val paras = docs
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, cast(ceil(size(split(text, ' ')) / $PARAW.0) as int) - 1), " +
            s"i -> array_join(slice(split(text, ' '), i * $PARAW + 1, $PARAW), ' '))"))
          .as(Seq("idx", "para")))
        .withColumn("ph",
          expr("conv(substring(md5(para), 1, 15), 16, 10)").cast("long"))
        .localCheckpoint()
      val hot = paras.groupBy("ph").agg(count(lit(1)).as("df"))
        .filter(col("df") > PARADF).select("ph")
      paras.join(broadcast(hot), Seq("ph"), "left_anti")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_kept"),
          array_join(transform(
            array_sort(collect_list(struct(col("idx"), col("para")))),
            x => x.getField("para")), " ").as("clean_text"))
    }

    def point(tag: String, nDocs: Long, b: Int): Unit = {
      val docs = corpus(nDocs, b).localCheckpoint()
      val hotCount = {
        val paras = docs.select(posexplode(expr(
          s"transform(sequence(0, cast(ceil(size(split(text, ' ')) / $PARAW.0) as int) - 1), " +
            s"i -> array_join(slice(split(text, ' '), i * $PARAW + 1, $PARAW), ' '))"))
          .as(Seq("idx", "para")))
        paras.groupBy("para").agg(count(lit(1)).as("df"))
          .filter(col("df") > PARADF).count()
      }
      quiesce(); shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val out = strip(docs)
      val (nDocsOut, nKept) = {
        val r = out.agg(count(lit(1)), sum(col("n_kept"))).head()
        (r.getLong(0), r.getLong(1))
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val sb = quiesce()
      // exactness: every boilerplate window stripped (b passages, each
      // df = nDocs/b > PARADF), every unique window kept (4 per doc,
      // plus the trailing empty-remainder window... windows divide
      // exactly here: 5 windows/doc, 1 hot + 4 unique)
      require(nDocsOut == nDocs && nKept == 4L * nDocs,
        s"strip drifted: docs=$nDocsOut kept=$nKept (want $nDocs/${4 * nDocs})")
      println(f"""{"point":"$tag","docs":$nDocs,"boilerplate_pool":$b,"hot_passages":$hotCount,"wall_s":$dt%.3f,"shuffle_mb":${sb / 1e6}%.1f}""")
    }

    // corpus sweep at fixed boilerplate
    point("corpus_x1", 100000L, 512)
    point("corpus_x4", 400000L, 512)
    point("corpus_x16", 1600000L, 512)
    // boilerplate sweep at fixed corpus
    point("boiler_x4", 400000L, 2048)
    point("boiler_x16", 400000L, 8192)
    spark.stop()
  }
}
