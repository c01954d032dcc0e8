package graft

import java.nio.file.{Files, Paths}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark
import graft.sources.SnapshotLog

/** Publish-protocol robustness (r16): the hard-link fallback for mounts
  * without link(2), the torn-but-fresh retry grace that lets a writer
  * reclaim a crashed publish instead of exhausting millisecond backoffs
  * inside the window, and the reader-side bounded re-read that hides a
  * transient torn manifest from `snapshots()`. */
class SnapshotPublishSpec extends AnyFunSuite {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val root = s"/tmp/graft_publish_spec/$tag"
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(root), true)
    root
  }

  private def withGrace[T](ms: Long)(body: => T): T = {
    val key = "graft.snapshotlog.tornGraceMs"
    val old = System.getProperty(key)
    System.setProperty(key, ms.toString)
    try body finally {
      if (old == null) System.clearProperty(key)
      else System.setProperty(key, old)
    }
  }

  test("claimFileDest falls back to O_EXCL create when link(2) is " +
       "unsupported, and still detects conflicts") {
    val dir = Files.createTempDirectory("graft_claim")
    val dest = dir.resolve("v00001.json")
    val payload = """{"hello":1}""".getBytes("UTF-8")
    val noLink = (_: java.nio.file.Path, _: java.nio.file.Path) =>
      throw new UnsupportedOperationException("no hard links on this mount")
    SnapshotLog.claimFileDest(dest, payload, noLink)
    assert(Files.readAllBytes(dest).sameElements(payload))
    // no temp litter
    assert(Files.list(dir).toArray.length === 1)
    // a second claim on the SAME destination must surface the conflict
    intercept[java.nio.file.FileAlreadyExistsException] {
      SnapshotLog.claimFileDest(dest, "other".getBytes, noLink)
    }
    // the default (hard-link) path also conflicts on an occupied slot
    intercept[java.nio.file.FileAlreadyExistsException] {
      SnapshotLog.claimFileDest(dest, "other".getBytes)
    }
  }

  test("writer hitting a FRESH torn publish waits out the grace and " +
       "reclaims (no hard-fail inside the window)") {
    withGrace(1500L) {
      val root = freshRoot("torn_reclaim")
      SnapshotLog.commit(Seq((1L, "a")).toDF("k", "v"), root,
        overwrite = true, 100L, 1)
      // simulate a crashed writer: a fresh, unparseable v00002 claim
      val torn = Paths.get(s"$root/_log/v00002.json")
      Files.write(torn, "{\"version\": 2, \"files\": [".getBytes("UTF-8"))
      val t0 = System.currentTimeMillis()
      // the append's publish collides with the torn slot; it must sleep
      // past the grace, reclaim, and LAND — not exhaust retries
      SnapshotLog.commit(Seq((2L, "b")).toDF("k", "v"), root,
        overwrite = false, 200L, 1)
      val took = System.currentTimeMillis() - t0
      assert(took >= 1000L, s"reclaimed before the grace opened (${took}ms)")
      val t = spark.read.format("snapshotlog").load(root)
      assert(t.count() === 2)
      assert(SnapshotLog.snapshots(spark, root).map(_.version) === Seq(1, 2))
    }
  }

  test("reader re-reads a torn NON-TRAILING manifest while a slow " +
       "publish completes (no transient corruption surfaced)") {
    withGrace(8000L) {
      val root = freshRoot("torn_reader")
      SnapshotLog.commit(Seq((1L, "a")).toDF("k", "v"), root,
        overwrite = true, 100L, 1)
      SnapshotLog.commit(Seq((2L, "b")).toDF("k", "v"), root,
        overwrite = false, 200L, 1)
      SnapshotLog.commit(Seq((3L, "c")).toDF("k", "v"), root,
        overwrite = false, 300L, 1)
      val v2 = Paths.get(s"$root/_log/v00002.json")
      val full = Files.readAllBytes(v2)
      // tear v2 mid-payload (as an hdfs-like slow publish would look),
      // then restore it from a background thread shortly after
      Files.write(v2, full.take(full.length / 2))
      val restorer = new Thread(() => {
        Thread.sleep(600L)
        Files.write(v2, full)
      })
      restorer.start()
      val snaps = SnapshotLog.snapshots(spark, root)
      restorer.join()
      assert(snaps.map(_.version) === Seq(1, 2, 3),
        "reader surfaced a transient torn manifest")
    }
  }

  test("a torn non-trailing manifest PAST the grace is genuine " +
       "corruption and fails fast") {
    withGrace(300L) {
      val root = freshRoot("torn_corrupt")
      SnapshotLog.commit(Seq((1L, "a")).toDF("k", "v"), root,
        overwrite = true, 100L, 1)
      SnapshotLog.commit(Seq((2L, "b")).toDF("k", "v"), root,
        overwrite = false, 200L, 1)
      val v1 = Paths.get(s"$root/_log/v00001.json")
      Files.write(v1, "not json".getBytes("UTF-8"))
      Thread.sleep(400L) // age it past the grace
      val e = intercept[IllegalStateException] {
        SnapshotLog.snapshots(spark, root)
      }
      assert(e.getMessage.contains("corrupt non-trailing manifest"))
    }
  }
}
