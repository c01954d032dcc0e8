package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Scale probe with SPILL accounting (r21, guide §5): run the TPC-H
  * battery (or a name-filtered subset) against SPARK_GRAFT_SF_DIR and
  * report, per query, wall seconds plus the executor task metrics the
  * 100-TB posture turns on — memory/disk bytes spilled, shuffle bytes
  * read/written, peak execution memory. The sf1 probe (r20) proved every
  * query SUBLINEAR but never spilled; this tool exists to run the same
  * battery at sf10 (TpchSf1Gen with GRAFT_SF_COPIES=100), where
  * UnsafeExternalSorter spill and AQE coalescing start to matter, and to
  * attribute any superlinear query to its spilling stage instead of
  * guessing.
  *
  * One timed pass after one warm pass (min-of-2 is the bench's job; the
  * probe wants metrics attribution, and spill behavior is stable across
  * passes). Output: one JSON line per query + a total line.
  */
private[graft] object SpillProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val flt = if (args.nonEmpty) args(0) else "tpch_"
    val spark = Sessions.local()
    val memSpill = new AtomicLong(0L)
    val diskSpill = new AtomicLong(0L)
    val shufRead = new AtomicLong(0L)
    val shufWrite = new AtomicLong(0L)
    val peakExec = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          peakExec.updateAndGet(p => math.max(p, m.peakExecutionMemory)): Unit
        }
      }
    }
    val queries = SparkEntry.queries.filter(_._1.contains(flt)).toSeq.sortBy(_._1)
    // warm pass: codegen + file listing off the clock
    queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    spark.sparkContext.addSparkListener(listener)
    var totalS = 0.0
    queries.foreach { case (name, fn) =>
      memSpill.set(0); diskSpill.set(0); shufRead.set(0); shufWrite.set(0)
      peakExec.set(0)
      spark.sparkContext.setJobDescription(s"spillprobe: $name")
      val t0 = System.nanoTime()
      val ok = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      } catch { case _: Throwable => false }
      val s = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; give the bus a beat
      // (listenerBus is private[spark] — a short sleep is enough here,
      // metric attribution tolerates the tail)
      Thread.sleep(200)
      if (ok) totalS += s
      println(f"""{"q":"$name","s":${if (ok) f"$s%.3f" else "-1"},"spill_mem_mb":${memSpill.get / 1048576},"spill_disk_mb":${diskSpill.get / 1048576},"shuffle_read_mb":${shufRead.get / 1048576},"shuffle_write_mb":${shufWrite.get / 1048576},"peak_exec_mb":${peakExec.get / 1048576}}""")
    }
    println(f"""{"metric":"spillprobe_total","value":$totalS%.3f,"unit":"sec","n":${queries.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
