package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.Sessions

/** r19 KNOB STUDY: gram size (3 vs 4) × bloom bits (2^19..2^23) for the
  * trigram-bloom substring-skipping sidecars, at the NEXT file decade
  * above the r18 study (640 data files, 100k docs of 60 hex-word synthetic
  * text — the r18 run topped out at 65 files).
  *
  * What it measures, per (gram, bits) cell:
  *   - sidecar bytes per file (the storage knob being tuned),
  *   - MISS keep-rate by needle length (4 / 8 / 16 / 32 chars): of 640
  *     covered files, how many does the planner KEEP for a needle that
  *     matches nothing? False keeps compound as ~fpp^m over the needle's
  *     m grams — the study quantifies how small the bloom can go before
  *     short-needle probes degrade, and how much longer needles buy.
  *   - HIT discipline: the marker needle must keep its one file (sound
  *     by construction; asserted, not reported).
  *
  * Method notes: one corpus build per gram size (the bloom BITS knob only
  * affects sidecar size/fpp, so each bits level is a fresh property +
  * rebuild_file_indexes backfill over the same data — no data rewrite);
  * keep rates come from the planner's own kept-file count (filesPlanned),
  * the same number the ddl_ngram_pruning gate pins. */
private[sources] object NgramScale2 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val docs = 100000L
    val files = 640
    // needles that match nothing in the corpus, by code-point length
    val missNeedles = Seq(
      4 -> "qqzx",
      8 -> "qqzxvvkj",
      16 -> "qqzxvvkjmmppwwrr",
      32 -> "qqzxvvkjmmppwwrrqqzxvvkjmmppwwss")
    for (gram <- Seq(3, 4)) {
      val root = s"/tmp/graft_ngram_scale2/g$gram"
      val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new Path(root), true)
      // HIGH-diversity text (hex words): the r18 study's 18-word vocab
      // yields only ~250 distinct trigrams — every bloom level prunes
      // perfectly and the knob shows nothing. Hex words saturate the
      // 16^3 ≈ 4.1k trigram (16^4 ≈ 65k 4-gram) space per file, so the
      // bits axis crosses a REAL saturation knee.
      val df = spark.range(0, docs).selectExpr(
        "id",
        s"""concat(
           array_join(transform(sequence(1, 60), i ->
             lower(hex(xxhash64(id * 100 + i)))), ' '),
           CASE WHEN id = ${docs / 2} THEN ' zebraquuxmarker' ELSE '' END)
           AS text""")
      SnapshotLog.commit(df, root, overwrite = true, 100L, files)
      val t = spark.read.format("snapshotlog").load(root)
      // corpus-distinct gram count, to read each cell as bits-per-item:
      // with a uniform vocab every file carries nearly the full set
      val distinctGrams = t.selectExpr(
        s"explode(transform(sequence(1, greatest(length(text) - ${gram - 1}, 0)), " +
          s"i -> substring(text, i, $gram))) AS g")
        .distinct().count()
      def filesPlanned(df2: org.apache.spark.sql.DataFrame): Int =
        df2.queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            r.scan.asInstanceOf[SnapshotLogScan].keptFiles.size
        }.head
      // 2^13..2^17 crosses the saturation knee for this corpus's ~10^3.5
      // distinct grams per file; 2^19/2^21 bracket the safe plateau (the
      // r18 run already showed the 2^21 default never false-keeps here)
      for (bitsLog <- Seq(13, 14, 15, 16, 17, 19, 21)) {
        // re-index the SAME corpus under this (gram, bits) cell
        fs.delete(new Path(root, "ngrams"), true)
        SnapshotLog.setTableProps(spark, root, Map(
          "write.ngrambloom.columns" -> "text",
          "write.ngrambloom.gram" -> gram.toString,
          "write.ngrambloom.bits" -> (1L << bitsLog).toString))
        val t0 = System.nanoTime()
        val (_, built) = SnapshotLog.rebuildFileIndexes(spark, root)
        val buildS = (System.nanoTime() - t0) / 1e9
        require(built == files, s"backfill built $built of $files")
        val sidecarBytes =
          fs.listStatus(new Path(root, "ngrams")).map(_.getLen).sum
        val keeps = missNeedles.map { case (len, ndl) =>
          s""""miss_keep_len$len":${
            filesPlanned(t.filter(col("text").contains(ndl)))}"""
        }.mkString(",")
        val hitKept = filesPlanned(
          t.filter(col("text").contains("zebraquuxmarker")))
        require(hitKept >= 1, "the hit needle must keep its file")
        println(s"""{"gram":$gram,"bits_log2":$bitsLog,"files":$files,""" +
          s""""docs":$docs,"distinct_grams":$distinctGrams,""" +
          s""""sidecar_bytes":$sidecarBytes,""" +
          f""""build_s":$buildS%.1f,$keeps,"hit_kept":$hitKept}""")
      }
      fs.delete(new Path(root), true)
    }
    spark.stop()
  }
}
