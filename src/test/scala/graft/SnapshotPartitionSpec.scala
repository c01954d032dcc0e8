package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark
import graft.sources.{SnapshotLog, SnapshotPartition}

/** Hidden partitioning ([[SnapshotPartition]]): writer-side layout,
  * manifest-recorded partition tuples, and planner-side pruning for the
  * predicate shapes each transform soundly covers — including the case
  * min/max stats can NEVER prune (equality probes on hash-distributed
  * keys, via bucket[N]).
  */
class SnapshotPartitionSpec extends AnyFunSuite {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val root = s"/tmp/graft_snappart_spec/$tag"
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(root), true)
    root
  }

  private def planned(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan.asInstanceOf[graft.sources.SnapshotLogScan].keptFiles.size
    }.head

  test("bucket[N]: equality probe on a hash-distributed key prunes to one bucket") {
    val root = freshRoot("bucket")
    // keys 0..199 are interleaved across every file by construction, so
    // min/max stats span the whole range in every file — stats alone can
    // prune NOTHING; only the bucket transform can
    val df = (0L until 200L).map(k => (k, s"v$k")).toDF("k", "s")
    SnapshotLog.commitPartitioned(df, root,
      Seq("k" -> "bucket[8]"), overwrite = true, commitTsMs = 100L)
    val snap = SnapshotLog.snapshots(spark, root).last
    assert(snap.spec === Seq("k" -> "bucket[8]"))
    // one file per NON-EMPTY bucket (murmur3 mod 8 of 0..199 need not hit
    // all 8); write-side layout and scan-side literal hashing must agree
    val nBuckets = df.select(pmod(hash(col("k")), lit(8))).distinct().count()
    assert(snap.files.size.toLong === nBuckets)
    assert(snap.parts.size === snap.files.size)

    val t = spark.read.format("snapshotlog").load(root)
    val probe = t.filter(col("k") === 42L)
    assert(planned(probe) === 1, "equality probe must open exactly one bucket")
    assert(probe.select("s").as[String].collect() === Array("v42"))

    // IN-list: union of the probed keys' buckets
    val in = t.filter(col("k").isin(1L, 2L, 3L))
    assert(planned(in) <= 3)
    assert(in.count() === 3)
    // a range probe CANNOT use a hash bucket — but the per-file min/max
    // STATS still prune buckets that happen to hold no key >= 190 (the two
    // prunings compose); every bucket holding a matching key must survive
    val range = t.filter(col("k") >= 190L)
    val needed = df.filter(col("k") >= 190L)
      .select(pmod(hash(col("k")), lit(8))).distinct().count()
    assert(planned(range) >= needed.toInt &&
      planned(range) <= snap.files.size)
    assert(range.count() === 10)
  }

  test("day transform: time-range probe prunes to the covered days") {
    val root = freshRoot("day")
    val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    val rows = (0 until 96).map { h =>
      (base.plusHours(h.toLong), h.toLong) // 4 days x 24 hourly events
    }
    val df = rows.toDF("ts", "v")
    SnapshotLog.commitPartitioned(df, root,
      Seq("ts" -> "day"), overwrite = true, commitTsMs = 100L)
    val snap = SnapshotLog.snapshots(spark, root).last
    assert(snap.files.size === 4, "one file per day expected")

    val t = spark.read.format("snapshotlog").load(root)
    val oneDay = t.filter(col("ts") >= lit("2024-01-02 00:00:00").cast("timestamp_ntz") &&
      col("ts") < lit("2024-01-03 00:00:00").cast("timestamp_ntz"))
    assert(planned(oneDay) <= 2, "a one-day probe must prune to ~1 day file")
    assert(oneDay.count() === 24)
    val eq = t.filter(col("ts") === lit("2024-01-04 05:00:00").cast("timestamp_ntz"))
    assert(planned(eq) === 1)
    assert(eq.select("v").as[Long].collect() === Array(77L))
  }

  test("truncate[W] on strings: prefix buckets prune equality and range probes") {
    val root = freshRoot("trunc")
    val df = Seq("alpha", "alder", "beta", "birch", "cedar", "cactus")
      .zipWithIndex.map { case (s, i) => (s, i.toLong) }.toDF("name", "v")
    SnapshotLog.commitPartitioned(df, root,
      Seq("name" -> "truncate[1]"), overwrite = true, commitTsMs = 100L)
    assert(SnapshotLog.snapshots(spark, root).last.files.size === 3)
    val t = spark.read.format("snapshotlog").load(root)
    val eq = t.filter(col("name") === "beta")
    assert(planned(eq) === 1)
    assert(eq.count() === 1)
    val range = t.filter(col("name") >= "c")
    assert(planned(range) === 1)
    assert(range.count() === 2)
  }

  test("same-spec appends prune one bucket per commit; spec CHANGE is evolution") {
    val root = freshRoot("speclock")
    val df = (0L until 10L).map(k => (k, k * 2)).toDF("k", "v")
    SnapshotLog.commitPartitioned(df, root,
      Seq("k" -> "bucket[4]"), overwrite = true, commitTsMs = 100L)
    // same spec appends fine; pruning spans both commits
    SnapshotLog.commitPartitioned(df, root,
      Seq("k" -> "bucket[4]"), overwrite = false, commitTsMs = 300L)
    val t = spark.read.format("snapshotlog").load(root)
    val probe = t.filter(col("k") === 3L)
    assert(planned(probe) === 2, "one bucket per commit")
    assert(probe.count() === 2)
    // an append under a DIFFERENT spec is no longer refused: it records a
    // spec-evolution entry and each generation prunes under its own spec
    // (full semantics in SnapshotLogSpec "partition spec evolution")
    SnapshotLog.commitPartitioned(df, root,
      Seq("k" -> "bucket[8]"), overwrite = false, commitTsMs = 400L)
    val s = SnapshotLog.snapshots(spark, root).last
    assert(s.specs.size === 2 && s.spec === Seq("k" -> "bucket[8]"))
    val probe2 = spark.read.format("snapshotlog").load(root)
      .filter(col("k") === 3L)
    assert(planned(probe2) === 3, "one bucket per commit across BOTH specs")
    assert(probe2.count() === 3)
  }

  test("compaction on a partitioned table PRESERVES the layout and pruning") {
    val root = freshRoot("compact_part")
    val df = (0L until 200L).map(k => (k % 4, k)).toDF("k", "v")
    // 3 appends under bucket[4]: 12 small files (one per tuple per commit)
    for (i <- 0 until 3)
      SnapshotLog.commitPartitioned(df, root, Seq("k" -> "identity"),
        overwrite = i == 0, commitTsMs = 100L * (i + 1))
    val before = SnapshotLog.snapshots(spark, root).last
    assert(before.files.size === 12)

    val v = SnapshotLog.rewriteDataFiles(spark, root,
      commitTsMs = 1000L, targetBytes = 1L << 30)
    val after = SnapshotLog.snapshots(spark, root).last
    assert(v === after.version && after.operation === "rewrite")
    assert(after.files.size === 4, // one compacted file per tuple
      s"expected per-tuple compaction, got ${after.files.size} files")
    // every compacted file carries a partition tuple — pruning still works
    def norm(p: String) = p.replaceFirst("^file:/*", "/")
    assert(after.files.forall(f => after.parts.contains(norm(f))))
    val probe = spark.read.format("snapshotlog").load(root)
      .filter(col("k") === 2L)
    assert(planned(probe) === 1,
      "equality probe must prune to ONE compacted file")
    assert(probe.count() === 150) // 50 rows x 3 appends for k=2
  }

  test("null partition values are never pruned; non-partition predicates untouched") {
    val root = freshRoot("nulls")
    val df = Seq((java.lang.Long.valueOf(1L), "a"),
      (null.asInstanceOf[java.lang.Long], "b")).toDF("k", "s")
    SnapshotLog.commitPartitioned(df, root,
      Seq("k" -> "identity"), overwrite = true, commitTsMs = 100L)
    val t = spark.read.format("snapshotlog").load(root)
    // the null-partition file must survive any probe (conservative)
    assert(t.filter(col("k").isNull).count() === 1)
    assert(t.filter(col("s") === "b").count() === 1)
    val eq = t.filter(col("k") === 1L)
    assert(eq.count() === 1)
  }
}
