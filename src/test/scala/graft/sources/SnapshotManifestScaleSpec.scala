package graft.sources

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark

/** Driver-side manifest planning cost at large file counts.
  *
  * The manifest is O(files) JSON parsed on the driver — the known
  * scaling ceiling of this single-manifest design (SURVEY §2.11 records
  * the manifest-LIST sharding design that lifts it, à la Iceberg). This
  * spec pins the measured constant: at 10⁴ files (≈ a 1-10 TB table at
  * healthy 128 MB-1 GB file sizes), parse + full stats-prune must stay
  * well under a second — planning is metadata-bound, never a data scan.
  */
class SnapshotManifestScaleSpec extends AnyFunSuite {

  test("10k-file manifest: parse + stats-prune well under a second") {
    val root = "/tmp/graft_snaplog_spec/manifest10k"
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(root), true)

    val n = 10000
    val files = (0 until n).map(i => f"$root/data/synth/part-$i%05d.parquet")
    // disjoint per-file key ranges: [1000i, 1000i+999]
    val stats = files.zipWithIndex.map { case (f, i) =>
      SnapshotLog.norm(f) -> Map[String, (Any, Any)](
        "k" -> (Long.box(i * 1000L), Long.box(i * 1000L + 999L)))
    }.toMap
    val sizes = files.map(f => SnapshotLog.norm(f) -> (128L << 20)).toMap
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType))).json
    SnapshotLog.commitManifest(SnapshotLog.fsFor(spark, new Path(root)),
      root, 1, "append", 1000L, schemaJson, files, stats, sizes)

    // cold parse
    val t0 = System.nanoTime()
    val snap = SnapshotLog.snapshots(spark, root).last
    val parseS = (System.nanoTime() - t0) / 1e9
    assert(snap.files.size === n)

    // full prune pass over all 10⁴ file stats
    val t1 = System.nanoTime()
    val kept = SnapshotLogScanBuilder.prune(snap, snap.files,
      Array(org.apache.spark.sql.sources.And(
        org.apache.spark.sql.sources.GreaterThanOrEqual("k", 5000000L),
        org.apache.spark.sql.sources.LessThan("k", 5010000L))))
    val pruneS = (System.nanoTime() - t1) / 1e9
    assert(kept.size === 10, s"expected 10 of $n files kept, got ${kept.size}")

    info(f"manifest10k: parse=$parseS%.3fs prune=$pruneS%.3fs")
    assert(parseS < 1.0, f"manifest parse took $parseS%.2fs at $n files")
    assert(pruneS < 1.0, f"stats prune took $pruneS%.2fs at $n files")
  }
}
