package graft

/** Phase-timing probe for the snapshot commit pipeline (r22, guide §1 —
  * measure first). Runs a name-filtered subset of SparkEntry queries (the
  * ddl/mv gates are the intended targets) with `graft.commit.timings`
  * enabled, one warm pass then one timed pass, and prints the per-phase
  * breakdown accumulated inside SnapshotLog/SnapshotBlooms/
  * SnapshotNgramBlooms — how much of the gates' wall time is the data
  * write vs the footer walk vs the sidecar passes vs manifest/props
  * metadata I/O. Usage:
  *
  *   sbt -Dgraft.commit.timings=true "runMain graft.CommitProbe ddl_"
  */
object CommitProbe {
  def main(args: Array[String]): Unit = {
    val flt = if (args.nonEmpty) args(0) else "ddl_"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (!graft.sources.CommitTimings.enabled)
      println("[commitprobe] WARNING: -Dgraft.commit.timings=true not set; " +
        "phase sums will be empty")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    // job accounting: how many Spark jobs does each gate launch, and how
    // much wall time do the jobs themselves cover? (wall - jobs = driver-
    // side work + scheduling gaps; many tiny jobs = action-bound gate)
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val jobNanos = new java.util.concurrent.atomic.AtomicLong
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); starts.put(e.jobId, System.nanoTime()): Unit
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(e.jobId)
        if (t0 != 0L) jobNanos.addAndGet(System.nanoTime() - t0): Unit
      }
    })
    val queries = SparkEntry.queries.filter(_._1.contains(flt)).toSeq
    def run(): Seq[(String, Double, Long, Double)] = queries.map { case (name, fn) =>
      val (j0, jn0) = (jobs.get(), jobNanos.get())
      val t0 = System.nanoTime()
      val ok = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      } catch { case _: Throwable => false }
      // listener events are async — small settle so job-end times land
      Thread.sleep(30)
      (name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0,
        jobs.get() - j0, (jobNanos.get() - jn0) / 1e9)
    }
    run() // warm
    graft.sources.CommitTimings.reset()
    val timed = run()
    val total = timed.collect { case (_, v, _, _) if v >= 0 => v }.sum
    val totalJobs = timed.map(_._3).sum
    println(f"[commitprobe] ${timed.size} queries, wall total $total%.2f s, $totalJobs jobs")
    timed.sortBy(-_._2).take(16).foreach { case (n, v, j, js) =>
      println(f"[commitprobe]   $n%-28s $v%7.3f s  $j%3d jobs ($js%6.3f s in jobs)")
    }
    println("[commitprobe] phase breakdown (timed pass only):")
    graft.sources.CommitTimings.snapshot().foreach { case (phase, sec, calls) =>
      println(f"[commitprobe]   $phase%-16s $sec%8.3f s  ($calls%5d calls)")
    }
    spark.stop()
  }
}
