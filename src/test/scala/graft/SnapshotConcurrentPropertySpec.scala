package graft

import java.util.concurrent.{CountDownLatch, CyclicBarrier, Executors, TimeUnit}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark
import graft.sources.SnapshotLog

/** MODEL-BASED MULTI-WRITER PROPERTY TEST (r16): each round races 2-3
  * writers, each performing one random DML statement, from a common
  * barrier against the same table. The oracle is SERIALIZABILITY: the
  * table's state after the round must equal the result of applying the
  * statements that SUCCEEDED in some serial order to the pre-round
  * state (refusals — CommitConflictException, or the entry-time
  * "must advance" guard — apply nothing). This is the net for
  * interleavings no directed race covers: merge-on-read deletes folding
  * onto moved heads, upserts racing appends and each other, compactions
  * racing row-level work. 3 seeds × 34 rounds = 102 random interleaved
  * sequences.
  */
class SnapshotConcurrentPropertySpec extends AnyFunSuite {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val root = s"/tmp/graft_concprop_spec/$tag"
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(root), true)
    root
  }

  private def race[T](thunks: Seq[() => T]): Seq[Either[Throwable, T]] = {
    val pool = Executors.newFixedThreadPool(thunks.size)
    val barrier = new CyclicBarrier(thunks.size)
    val done = new CountDownLatch(thunks.size)
    val out = new Array[Either[Throwable, T]](thunks.size)
    thunks.zipWithIndex.foreach { case (t, i) =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          try { barrier.await(60, TimeUnit.SECONDS); out(i) = Right(t()) }
          catch { case e: Throwable => out(i) = Left(e) }
          finally done.countDown()
        }
      })
    }
    assert(done.await(300, TimeUnit.SECONDS), "racing writers timed out")
    pool.shutdown()
    out.toSeq
  }

  private def stateOf(root: String): Map[Long, Long] =
    spark.read.format("snapshotlog").load(root)
      .as[(Long, Long)].collect().toMap

  /** One writer's statement: how it mutates the MODEL when it lands,
    * and the real call. */
  private case class Op(name: String,
                        modelFn: Map[Long, Long] => Map[Long, Long],
                        run: Long => Int)

  /** A refusal that provably applied nothing: the typed conflict, or the
    * entry-time timestamp guard (another writer finished before this
    * one's entry read). Anything else is a real failure. */
  private def cleanRefusal(e: Throwable): Boolean = e match {
    case _: SnapshotLog.CommitConflictException => true
    case ise: IllegalStateException
        if ise.getMessage != null &&
          ise.getMessage.contains("lost the commit race") => true
    case iae: IllegalArgumentException
        if iae.getMessage != null &&
          iae.getMessage.contains("must advance") => true
    case _ => false
  }

  // the maintain=true row additionally ARMS commit-time auto-maintenance
  // (maybeMaintain) for the whole run: the delete-fold and bin-pack then
  // ride inside the racing commits, and the serializability oracle
  // proves they are content-neutral even while racing other writers
  for ((seed, maintain) <- Seq((11, false), (29, false), (53, false),
         (77, true))) {
    test(s"2-3 racing writers always leave a serializable state (seed $seed" +
         (if (maintain) ", auto-maintenance armed" else "") + ")") {
      val rnd = new scala.util.Random(seed)
      val root = freshRoot(s"mix_$seed")
      var nextKey = 0L
      def freshKeys(n: Int): Seq[Long] = {
        val ks = (0 until n).map(i => nextKey + i)
        nextKey += n
        ks
      }
      val seedRows = freshKeys(40).map(k => k -> (k % 7))
      SnapshotLog.commit(seedRows.toDF("k", "v"), root,
        overwrite = true, 1000L, 2)
      if (maintain) SnapshotLog.setTableProps(spark, root, Map(
        "write.delete.max-files-per-data-file" -> "3",
        "write.data.max-small-files" -> "10"))
      var model: Map[Long, Long] = seedRows.toMap
      var ts = 1000L

      def randomOp(): Op = {
        val existing = model.keys.toSeq.sorted
        rnd.nextInt(10) match {
          case 0 | 1 => // append fresh keys (disjoint per writer)
            val rows = freshKeys(4 + rnd.nextInt(6)).map(k => k -> (k % 5))
            Op(s"append(${rows.head._1}..)",
              m => m ++ rows,
              t => SnapshotLog.commit(rows.toDF("k", "v"), root,
                overwrite = false, t, 1))
          case 2 | 3 => // positional delete by predicate
            val m0 = 7 + rnd.nextInt(9); val r = rnd.nextInt(m0)
            Op(s"posDelete(%$m0==$r)",
              m => m.filter { case (k, _) => k % m0 != r },
              t => SnapshotLog.deleteWhereMoR(spark, root,
                col("k") % m0.toLong === r.toLong, t))
          case 4 => // equality delete of sampled keys
            val victims = rnd.shuffle(existing).take(2 + rnd.nextInt(3))
            Op(s"eqDelete(${victims.mkString(",")})",
              m => m -- victims,
              t => SnapshotLog.deleteEqualityMoR(spark, root,
                victims.toDF("k"), t))
          case 5 | 6 => // merge-on-read update
            val m0 = 5 + rnd.nextInt(7); val r = rnd.nextInt(m0)
            val d = 1 + rnd.nextInt(50)
            Op(s"morUpdate(%$m0==$r,+$d)",
              m => m.map { case (k, v) =>
                k -> (if (k % m0 == r) v + d else v) },
              t => SnapshotLog.updateWhereMoR(spark, root,
                col("k") % m0.toLong === r.toLong,
                Map("v" -> (col("v") + d.toLong)), t))
          case 7 | 8 => // upsert: some existing + some fresh keys
            val ups = rnd.shuffle(existing).take(2)
              .map(k => k -> rnd.nextInt(100).toLong)
            val ins = freshKeys(2).map(k => k -> rnd.nextInt(100).toLong)
            val batch = ups ++ ins
            Op(s"upsert(${batch.map(_._1).mkString(",")})",
              m => m ++ batch,
              t => SnapshotLog.upsertEqualityMoR(spark, root,
                batch.toDF("k", "v"), Seq("k"), t))
          case 9 => // compaction: content-neutral
            Op("rewrite",
              m => m,
              t => SnapshotLog.rewriteDataFiles(spark, root, t,
                targetBytes = 1L << 30))
        }
      }

      for (round <- 0 until 34) {
        val nWriters = 2 + rnd.nextInt(2)
        val ops = Seq.fill(nWriters)(randomOp())
        val pre = model
        val baseTs = ts
        val results = race(ops.zipWithIndex.map { case (op, i) =>
          () => op.run(baseTs + (i + 1) * 1000L)
        })
        val hard = results.collect {
          case Left(e) if !cleanRefusal(e) => e
        }
        assert(hard.isEmpty,
          s"seed=$seed round=$round ops=${ops.map(_.name).mkString(" | ")}: " +
            s"non-refusal failure: ${hard.map(_.toString).mkString("; ")}")
        val landed = ops.zip(results).collect { case (op, Right(_)) => op }
        val actual = stateOf(root)
        // serializability oracle: actual must equal SOME serial order of
        // the landed statements applied to the pre-round state
        val outcomes = landed.permutations
          .map(_.foldLeft(pre)((m, op) => op.modelFn(m))).toSet
        if (!outcomes.contains(actual)) {
          val snaps = SnapshotLog.snapshots(spark, root)
          val dump = snaps.takeRight(6).map(s =>
            s"v${s.version} ${s.operation} files=${s.files.size} " +
              s"delfiles=${s.dels.values.map(_.size).sum}").mkString("\n  ")
          fail(
            s"seed=$seed round=$round landed=${landed.map(_.name).mkString(" | ")}" +
              s" refused=${results.count(_.isLeft)}: state matches NO serial order" +
              s" (actual size ${actual.size}, outcome sizes ${outcomes.map(_.size)})\n" +
              s"  results=${results.map(_.fold(e => s"L(${e.getClass.getSimpleName})", v => s"R($v)")).mkString(",")}\n  " +
              dump)
        }
        model = actual
        ts = baseTs + nWriters * 1000L + 5000L
      }
      // CDC under concurrency: whatever serialization won, replaying the
      // changelog from genesis must reconstruct exactly the final state
      // (the changelog is derived from the committed snapshot chain, so a
      // lost update or duplicated row would surface here even if the
      // table read happened to look serializable)
      {
        val net = scala.collection.mutable.Map.empty[(Long, Long), Long]
        SnapshotLog.changes(spark, root, fromVersion = 0).collect().foreach { r =>
          val key = (r.getAs[Long]("k"), r.getAs[Long]("v"))
          val d = if (r.getAs[String]("_change_type") == "insert") 1L else -1L
          net(key) = net.getOrElse(key, 0L) + d
        }
        val replayed = net.collect { case ((k, v), 1L) => k -> v }.toMap
        assert(net.values.forall(c => c == 0L || c == 1L) &&
          replayed === model,
          s"seed=$seed: changelog replay diverged from the raced-in state")
      }
      // the table stays fully consistent for a final fold + read
      SnapshotLog.rewriteDataFiles(spark, root, ts + 1000L, targetBytes = 1L << 30)
      assert(stateOf(root) === model)
    }
  }
}
