package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotLog

/** Empirical scale check for the snapshot-table DML path: does the cost
  * of a FIXED-SIZE mutation stay flat while the TABLE grows? That is the
  * whole promise of file-granular copy-on-write (touched files rewritten,
  * untouched carried by reference) plus `_file` runtime group filtering —
  * this harness measures it instead of asserting it.
  *
  * Per scale n: the orders table is committed n times with disjoint key
  * ranges (replica r's keys offset by r·10⁹), 2 files per commit — a 2n-
  * file table whose slices are stats-prunable. Timed statements (table
  * REBUILT before every pass, min-of-2 — host shows contention waves):
  *
  *   - update_slice:  UPDATE one fixed key range inside replica 0
  *   - merge_trickle: MERGE a fixed 200-key source into replica 0
  *   - delete_slice:  DELETE a fixed key range (SupportsDelete path)
  *   - scan_agg:      full-table aggregate — the control that SHOULD
  *                    grow linearly (proves the table actually scales)
  *
  * Each mutation also records files_rewritten (manifest diff) — the
  * file-granularity evidence: it must stay constant as n grows.
  *
  * Usage: runMain graft.DmlScale <sfDir> <scales e.g. 1,2,4,8> */
object DmlScale {
  private def dmlNorm(p: String): String = p.replaceFirst("^file:/*", "/")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val scales = (if (args.length > 1) args(1) else "1,2,4")
      .split(",").map(_.trim.toInt)
    val spark = Sessions.local()
    val ns = "dmlscale"
    val wh = "/tmp/graft_snap_warehouse"

    def rebuild(n: Int): String = {
      val root = s"$wh/$ns/t"
      val p = new org.apache.hadoop.fs.Path(s"$wh/$ns")
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_totalprice"))
      for (r <- 0 until n)
        SnapshotLog.commit(
          o.select((col("o_orderkey") + lit(r * 1000000000L)).as("k"),
            col("o_totalprice").as("v")),
          root, overwrite = r == 0, commitTsMs = 1000L * (r + 1))
      root
    }

    // fixed-size targets, all inside replica 0
    val (lo, hi) = (1000L, 2000L)
    def statements(root: String): Seq[(String, () => Unit)] = Seq(
      // delete-free control, measured FIRST (the trailing scan_agg runs
      // after the MoR mutations): scan_agg ≈ scan_agg_clean is the
      // delete-aware vectorized read evidence — before r14 any MoR
      // delete demoted every file of the scan to the row reader
      "scan_agg_clean" -> (() =>
        spark.sql(s"SELECT sum(v), count(*) FROM snap.$ns.t").collect(): Unit),
      "update_slice" -> (() =>
        spark.sql(s"UPDATE snap.$ns.t SET v = v * 2 WHERE k BETWEEN $lo AND $hi"): Unit),
      "merge_trickle" -> { () =>
        spark.range(0, 200).selectExpr("id * 16 + 1 AS k", "CAST(1 AS DOUBLE) AS v")
          .createOrReplaceTempView("dml_scale_src")
        spark.sql(
          s"""MERGE INTO snap.$ns.t AS t USING dml_scale_src AS s ON t.k = s.k
             |WHEN MATCHED THEN UPDATE SET v = t.v + s.v""".stripMargin): Unit
      },
      "delete_slice" -> (() =>
        spark.sql(s"DELETE FROM snap.$ns.t WHERE k BETWEEN ${hi + 1} AND ${hi + 1000}"): Unit),
      // merge-on-read variant of the same fixed-size delete: writes a
      // KB-scale positional delete file, rewrites NOTHING — at scale this
      // must be both flat AND an order cheaper than the CoW rewrite
      "delete_slice_mor" -> (() =>
        SnapshotLog.deleteWhereMoR(spark, root,
          col("k").between(hi + 2000, hi + 3000),
          SnapshotLog.nextCommitTs(spark, root)): Unit),
      // merge-on-read UPDATE: delete file + one appended fragment —
      // cost ∝ matched rows, files_rewritten stays 0
      "update_slice_mor" -> (() =>
        SnapshotLog.updateWhereMoR(spark, root,
          col("k").between(hi + 4000, hi + 5000),
          Map("v" -> (col("v") + 1.0)),
          SnapshotLog.nextCommitTs(spark, root)): Unit),
      // SQL row-level statements under merge-on-read mode (SupportsDelta):
      // position deletes + insert fragments instead of file rewrites —
      // the flat-AND-cheap regime for trickle DML at 100 TB
      "update_slice_sqlmor" -> { () =>
        SnapshotLog.setTableProps(spark, root, Map(
          "write.update.mode" -> "merge-on-read",
          "write.merge.mode" -> "merge-on-read"))
        spark.sql(s"UPDATE snap.$ns.t SET v = v * 2 " +
          s"WHERE k BETWEEN ${hi + 6000} AND ${hi + 7000}"): Unit
      },
      "merge_trickle_sqlmor" -> { () =>
        spark.range(0, 200).selectExpr("id * 16 + 5 AS k", "CAST(1 AS DOUBLE) AS v")
          .createOrReplaceTempView("dml_scale_src_mor")
        spark.sql(
          s"""MERGE INTO snap.$ns.t AS t USING dml_scale_src_mor AS s ON t.k = s.k
             |WHEN MATCHED THEN UPDATE SET v = t.v + s.v""".stripMargin): Unit
      },
      "scan_agg" -> (() =>
        spark.sql(s"SELECT sum(v), count(*) FROM snap.$ns.t").collect(): Unit),
      // LARGE (25% of the whole table) merge-on-read delete: staging is
      // range-partitioned per task (r14) — this row grows with the table
      // but must scale with parallelism, files_rewritten stays 0, and the
      // read after it shows the delete-aware vectorized path under a
      // non-trickle delete load
      "delete_bulk_mor" -> (() =>
        SnapshotLog.deleteWhereMoR(spark, root, col("k") % 4 === 0,
          SnapshotLog.nextCommitTs(spark, root)): Unit),
      "scan_agg_after_bulk" -> (() =>
        spark.sql(s"SELECT sum(v), count(*) FROM snap.$ns.t").collect(): Unit))

    val results = scales.map { n =>
      // one untimed pass warms codegen; each timed pass runs on a FRESH
      // table so every pass mutates identical state
      def pass(): Seq[(String, Double, Long)] = {
        val root = rebuild(n)
        statements(root).map { case (name, fn) =>
          val before = SnapshotLog.snapshots(spark, root).last
            .files.map(dmlNorm).toSet
          val t0 = System.nanoTime()
          fn()
          val dt = (System.nanoTime() - t0) / 1e9
          val after = SnapshotLog.snapshots(spark, root).last
            .files.map(dmlNorm)
          val rewritten = after.count(f => !before.contains(f))
          (name, dt, rewritten.toLong)
        }
      }
      pass() // warm
      val (p1, p2) = (pass(), pass())
      val merged = p1.zip(p2).map { case ((q, t1, fr), (_, t2, _)) =>
        (q, math.min(t1, t2), fr)
      }
      val files = 2L * n
      (n, files, merged)
    }
    results.foreach { case (n, files, times) =>
      val qs = times.map { case (q, t, fr) =>
        f""""$q":{"s":$t%.2f,"files_rewritten":$fr}""" }.mkString(",")
      println(s"""{"scale":$n,"table_files":$files,$qs}""")
    }
    spark.stop()
  }
}
