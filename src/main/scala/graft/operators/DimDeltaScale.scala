package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.sources.SnapshotLog

/** Scale study (r20): dim-delta maintenance for join MVs — the claim is
  * that maintaining a star MV through a SLOWLY-CHANGING DIM costs ∝ the
  * dim delta (and the fact rows it touches), never the fact table:
  *
  *   - fact grows 1x -> 4x -> 16x (1M -> 16M rows), ck-clustered on
  *     disk (write.sort.order=ck) so the changed-key IN filter can
  *     file-skip;
  *   - the dim delta is FIXED (200 of 10k dim rows re-grouped);
  *   - measured per fact size: maintainDims wall time (pruned), the
  *     same with key pushdown DISABLED (graft.mv.dimDeltaKeyCap=0 — the
  *     ablation), the planner's kept-file count for the pushed IN
  *     filter, and the full createJoin re-create this path replaces.
  *
  * Expected shape: pruned maintainDims time and kept files stay
  * near-flat while re-create (and the unpruned ablation) grow with the
  * fact.
  * Times are min of 2 (each over its own fresh dim change — maintainDims
  * is idempotent at the head), local[32]. */
private[graft] object DimDeltaScale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val dimN = 10000L
    val baseRows = 1000000L
    for (mult <- Seq(1, 4, 16, 64)) {
      val root = s"/tmp/graft_dimdelta_scale/m$mult"
      val ns = s"dimdelta_m$mult"
      val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new Path(root), true)
      fs.delete(new Path(s"/tmp/graft_snap_warehouse/$ns"), true)
      val n = baseRows * mult
      val factRoot = s"$root/fact"
      val dimRoot = s"$root/dim"
      SnapshotLog.commit(
        spark.range(0, dimN).selectExpr("id AS dk",
          "cast(id % 37 AS int) AS grp"),
        dimRoot, overwrite = true, 100L)
      // ck-clustered fact files (sort-on-write) so changed-key pruning
      // has ranges to skip — the layout a real star schema maintains
      SnapshotLog.commit(
        spark.range(0, 1000).selectExpr("id AS k", s"id % $dimN AS ck",
          "id % 1000 AS v"),
        factRoot, overwrite = true, 200L, 1)
      SnapshotLog.setTableProps(spark, factRoot,
        Map("write.sort.order" -> "ck"))
      SnapshotLog.commit(
        spark.range(1000, n).selectExpr("id AS k", s"id % $dimN AS ck",
          "id % 1000 AS v"),
        factRoot, overwrite = false, 300L, math.max(8, (n / 125000L).toInt))
      val recreateS = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        IncrementalMv.createJoin(spark, factRoot, dimRoot, "ck", "dk",
          s"$ns.mv", Seq("grp"), Seq("v"))
        (System.nanoTime() - t0) / 1e9
      }.min
      // fixed-size dim delta per measurement round: 200 keys re-grouped
      var round = 0
      def oneDimDelta(pushdown: Boolean): Double = {
        val lo = round * 200L
        round += 1
        SnapshotLog.updateWhereMoR(spark, dimRoot,
          col("dk") >= lo && col("dk") < lo + 200L,
          Map("grp" -> (col("grp") + 37)), 10000L + round * 100L)
        // the study measures the pushdown ablation on purpose: force the
        // probe ON for the "pruned" arm (the r21 cost switch would skip
        // it below 64 fact files) and OFF via cap=0 for the ablation
        if (!pushdown) System.setProperty("graft.mv.dimDeltaKeyCap", "0")
        System.setProperty("graft.mv.dimDeltaPruneMinFiles", "0")
        try {
          val t0 = System.nanoTime()
          IncrementalMv.maintainDims(spark, factRoot, s"$ns.mv",
            Seq("grp"), Seq("v")): Unit
          (System.nanoTime() - t0) / 1e9
        } finally {
          System.clearProperty("graft.mv.dimDeltaKeyCap")
          System.clearProperty("graft.mv.dimDeltaPruneMinFiles")
        }
      }
      val prunedS = Seq(oneDimDelta(true), oneDimDelta(true)).min
      val unprunedS = oneDimDelta(false)
      // the SHIPPED behavior (r21 cost switch): prune only when the fact
      // has >= graft.mv.dimDeltaPruneMinFiles live files — measures that
      // the small-fact points no longer pay the probe's 2-3x penalty
      val autoS = {
        val lo = round * 200L
        round += 1
        SnapshotLog.updateWhereMoR(spark, dimRoot,
          col("dk") >= lo && col("dk") < lo + 200L,
          Map("grp" -> (col("grp") + 37)), 10000L + round * 100L)
        val t0 = System.nanoTime()
        IncrementalMv.maintainDims(spark, factRoot, s"$ns.mv",
          Seq("grp"), Seq("v")): Unit
        (System.nanoTime() - t0) / 1e9
      }
      // the fact-scan pruning DECISION, read from the planner: the same
      // changed-key IN filter maintainDims pushes, over the pinned fact
      val keys = ((round - 1) * 200L until round * 200L).map(Long.box)
      val probe = spark.read.format("snapshotlog").load(factRoot)
        .filter(col("ck").isin(keys: _*))
      val kept = probe.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan.asInstanceOf[graft.sources.SnapshotLogScan].keptFiles.size
      }.head
      val total = SnapshotLog.snapshots(spark, factRoot)
        .filter(_.branch.isEmpty).last.files.size
      // sanity: the maintained MV equals the from-scratch join aggregate
      val f = spark.read.format("snapshotlog").load(factRoot)
      val dm = spark.read.format("snapshotlog").load(dimRoot)
      spark.conf.set("spark.graft.mv.autoRewrite", "false")
      val want = f.join(dm, f("ck") === dm("dk")).groupBy(col("grp"))
        .agg(count(lit(1)).as("n")).agg(sum(col("n"))).head().getLong(0)
      spark.conf.unset("spark.graft.mv.autoRewrite")
      val got = spark.read.format("snapshotlog")
        .load(s"/tmp/graft_snap_warehouse/$ns/mv")
        .agg(sum(col("n"))).head().getLong(0)
      require(got == want, s"MV drifted: $got != $want")
      println(f"""{"mult":$mult,"fact_rows":$n,"dim_delta_rows":200,"maintain_pruned_s":$prunedS%.3f,"maintain_unpruned_s":$unprunedS%.3f,"maintain_auto_s":$autoS%.3f,"recreate_s":$recreateS%.3f,"fact_files_kept":$kept,"fact_files_total":$total}""")
      IncrementalMv.unregister(spark, factRoot)
      fs.delete(new Path(root), true)
    }
    spark.stop()
  }
}
