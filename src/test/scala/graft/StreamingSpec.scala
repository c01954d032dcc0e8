package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark.{sf, spark}
import graft.streaming.StreamingOps

/** Structured Streaming shapes: file-source ingestion + watermark window
  * agg, and mapGroupsWithState sessionization, both checked against the
  * equivalent batch computation over the same fixture.
  */
class StreamingSpec extends AnyFunSuite {

  test("watermarked windowed counts match the batch equivalent") {
    val q = StreamingOps.windowedCounts(StreamingOps.eventsStream(spark, sf))
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // append mode only emits windows the watermark has closed; compare
    // those against the batch aggregation restricted to the same windows.
    val streamed = spark.table("win_counts")
      .select(col("w_start"), col("event_type"), col("n"), col("sum_v"))
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_v"))
    assert(streamed.count() > 0, "no closed windows emitted")
    val joined = streamed.as("s").join(batch.as("b"),
      Seq("w_start", "event_type"))
    assert(joined.filter(col("s.n") =!= col("b.n")).count() === 0,
      "streamed window counts diverge from batch")
  }

  test("streaming dedup within watermark matches batch distinct on the fixture") {
    val q = StreamingOps.dedupWithinWatermark(
        StreamingOps.eventsStream(spark, sf), Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // the fixture arrives as one micro-batch, so every duplicate is within
    // the watermark and the result must equal batch distinct-on-keys.
    val streamed = spark.table("dedup_stream").count()
    val batch = Tables.events(spark, sf)
      .dropDuplicates(Seq("user_id", "event_type")).count()
    assert(streamed === batch,
      s"streaming dedup kept $streamed rows, batch distinct has $batch")
  }

  test("stream-stream interval join matches the batch range join") {
    val q = StreamingOps.purchaseClickJoin(StreamingOps.eventsStream(spark, sf))
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ss_join").count()
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val batch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"))
      .count()
    assert(streamed === batch,
      s"stream-stream join emitted $streamed rows, batch range join has $batch")
  }

  test("streaming session_window agg matches the batch session_window agg") {
    val q = StreamingOps.sessionWindowAgg(StreamingOps.eventsStream(spark, sf))
      .writeStream.format("memory").queryName("sess_win")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sess_win")
    // append emits only watermark-closed sessions; every emitted session
    // must match the batch computation exactly (same grouping expression)
    val batch = StreamingOps.sessionWindowAgg(Tables.events(spark, sf))
    assert(streamed.count() > 0, "no closed sessions emitted")
    val joined = streamed.as("s")
      .join(batch.as("b"), Seq("s_start", "user_id"))
    assert(joined.count() === streamed.count(),
      "streamed session missing from batch result")
    assert(joined.filter(col("s.n") =!= col("b.n") ||
      col("s.s_end") =!= col("b.s_end")).count() === 0,
      "streamed session bounds/counts diverge from batch")
  }

  test("idempotent foreachBatch sink: replayed batches do not duplicate rows") {
    val out = s"/tmp/graft_stream_sink/${System.nanoTime()}"
    val src = StreamingOps.eventsStream(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
    val q = StreamingOps.idempotentParquetSink(src, out)
    try q.processAllAvailable() finally q.stop()
    val once = spark.read.parquet(out)
    val expected = Tables.events(spark, sf).count()
    assert(once.count() === expected)
    // simulate a replay of batch 0: same batch id -> same directory ->
    // overwrite, not append
    val replay = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
    replay.write.mode("overwrite").parquet(s"$out/batch=0")
    assert(spark.read.parquet(out).count() === expected,
      "replayed batch duplicated rows — sink is not idempotent")
  }

  test("snapshotLogSink: each micro-batch is a transactional append; replays skip") {
    import graft.sources.SnapshotLog
    val root = s"/tmp/graft_stream_snap/${System.nanoTime()}"
    val src = StreamingOps.eventsStream(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
    val q = StreamingOps.snapshotLogSink(src, root)
    try q.processAllAvailable() finally q.stop()
    val expected = Tables.events(spark, sf).count()
    assert(SnapshotLog.read(spark, root).count() === expected)
    val snaps = SnapshotLog.snapshots(spark, root)
    assert(snaps.nonEmpty && snaps.forall(_.operation == "append"))
    assert(snaps.forall(_.props.contains("streaming.batchId")))
    val lastV = snaps.last.version

    // replaying an already-committed batch id is recognized and SKIPPED —
    // no new snapshot, no duplicate rows (exactly-once from the table log)
    val replay = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
    assert(!StreamingOps.commitStreamBatch(replay, root, batchId = 0L))
    assert(SnapshotLog.snapshots(spark, root).last.version === lastV)
    assert(SnapshotLog.read(spark, root).count() === expected)
    // a genuinely new batch still lands
    assert(StreamingOps.commitStreamBatch(replay.limit(1), root,
      batchId = snaps.flatMap(_.props.get("streaming.batchId")).map(_.toLong).max + 1))
    assert(SnapshotLog.read(spark, root).count() === expected + 1)
    // and the streamed table time-travels like any snapshot table
    assert(SnapshotLog.read(spark, root, asOfVersion = Some(lastV)).count() === expected)
  }

  test("upsert sink: per-batch atomic equality-delete + append, last-write-wins") {
    import graft.sources.SnapshotLog
    import spark.implicits._
    val root = s"/tmp/graft_stream_upsert/${System.nanoTime()}"

    // batch 0: initial keys; batch 1: updates k=1,2 + inserts k=5
    assert(StreamingOps.commitStreamUpsert(
      Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).toDF("k", "s", "v"),
      root, Seq("k"), batchId = 0L))
    assert(StreamingOps.commitStreamUpsert(
      Seq((1L, "a2", 10.0), (2L, "b2", 20.0), (5L, "e", 5.0)).toDF("k", "s", "v"),
      root, Seq("k"), batchId = 1L))

    val cur = SnapshotLog.read(spark, root)
    assert(cur.count() === 4) // 1,2,3,5 — upsert, not append
    assert(cur.filter(col("k") === 1L).select("s").as[String].head() === "a2")
    assert(cur.filter(col("k") === 3L).select("v").as[Double].head() === 3.0)
    // the DSv2 path agrees (row reader equality filtering)
    assert(spark.read.format("snapshotlog").load(root).count() === 4)
    // the upsert snapshot recorded both the op and the batch id
    val s2 = SnapshotLog.snapshots(spark, root).last
    assert(s2.operation === "upsert")
    assert(s2.props.get("streaming.batchId").contains("1"))

    // replayed batch id: recognized, skipped — exactly-once
    assert(!StreamingOps.commitStreamUpsert(
      Seq((9L, "x", 9.0)).toDF("k", "s", "v"), root, Seq("k"), batchId = 1L))
    assert(SnapshotLog.read(spark, root).count() === 4)

    // time travel to batch 0's state
    assert(SnapshotLog.read(spark, root, asOfVersion = Some(1))
      .filter(col("k") === 1L).select("s").as[String].head() === "a")

    // compaction folds the upsert residue
    SnapshotLog.rewriteDataFiles(spark, root,
      SnapshotLog.nextCommitTs(spark, root), targetBytes = 1L << 30)
    assert(SnapshotLog.snapshots(spark, root).last.dels.isEmpty)
    assert(SnapshotLog.read(spark, root).count() === 4)
    assert(SnapshotLog.read(spark, root)
      .filter(col("k") === 2L).select("s").as[String].head() === "b2")
  }

  test("snapshotlog streaming source: table-as-a-stream, exactly-once end to end") {
    import graft.sources.SnapshotLog
    import spark.implicits._
    val srcRoot = s"/tmp/graft_stream_src/${System.nanoTime()}"
    val dstRoot = s"/tmp/graft_stream_dst/${System.nanoTime()}"
    SnapshotLog.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
      srcRoot, overwrite = true, 100L)
    SnapshotLog.commit(Seq((3L, "c")).toDF("id", "s"),
      srcRoot, overwrite = false, 200L)
    // snapshot table -> stream -> snapshot table: versions are the offsets,
    // the sink's batch-id props are the replay guard — exactly-once on both
    // edges of the loop
    val stream = spark.readStream.format("snapshotlog").load(srcRoot)
    val q = StreamingOps.snapshotLogSink(stream, dstRoot)
    try {
      q.processAllAvailable()
      assert(SnapshotLog.read(spark, dstRoot).as[(Long, String)].collect().toSet
        === Set((1L, "a"), (2L, "b"), (3L, "c")))
      // a new source commit flows through incrementally: the next batch
      // reads ONLY v3's files
      SnapshotLog.commit(Seq((4L, "d")).toDF("id", "s"),
        srcRoot, overwrite = false, 300L)
      q.processAllAvailable()
      assert(SnapshotLog.read(spark, dstRoot).count() === 4)
      assert(SnapshotLog.read(spark, dstRoot).as[(Long, String)].collect().toSet
        === Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    } finally q.stop()
    // restart from the durable checkpoint: nothing new -> no duplicate rows
    val q2 = StreamingOps.snapshotLogSink(
      spark.readStream.format("snapshotlog").load(srcRoot), dstRoot)
    try q2.processAllAvailable() finally q2.stop()
    assert(SnapshotLog.read(spark, dstRoot).count() === 4)
  }

  test("snapshotlog streaming source: maxFilesPerTrigger bounds each micro-batch") {
    import graft.sources.SnapshotLog
    import spark.implicits._
    val srcRoot = s"/tmp/graft_stream_rate/${System.nanoTime()}"
    // 4 versions x 2 files each = 8 pending files
    for (i <- 0 until 4)
      SnapshotLog.commit(Seq(i * 2L, i * 2L + 1).toDF("x"), srcRoot,
        overwrite = i == 0, commitTsMs = 100L * (i + 1))
    val q = spark.readStream.format("snapshotlog")
      .option("maxFilesPerTrigger", 2).load(srcRoot)
      .writeStream.format("memory").queryName("rate_limited")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("rate_limited").as[Long].collect().sorted
        === (0L until 8L).toArray)
      // the catch-up split into multiple bounded batches, not one big one
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
        s"expected >=3 bounded micro-batches, got " +
          q.recentProgress.map(_.numInputRows).mkString(","))
    } finally q.stop()
  }

  test("mapGroupsWithState sessionization produces per-user sessions") {
    import spark.implicits._
    val clicks = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("userId"), unix_micros(col("ts")).as("tsUs"))
      .as[StreamingOps.Click]
    val sessions = StreamingOps.sessionize(clicks).collect()
    assert(sessions.nonEmpty)
    assert(sessions.forall(s => s.nEvents >= 1 && s.firstUs <= s.lastUs))
    val users = clicks.select("userId").distinct().count()
    assert(sessions.map(_.userId).distinct.length === users)
  }
}
