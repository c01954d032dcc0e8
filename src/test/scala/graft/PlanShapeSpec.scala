package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.{sf, spark}

/** Plan-shape assertions (SURVEY §7.2-M10, VERDICT r2 item 4): the claims
  * the query comments make — broadcasts fire, window-group-limit fires,
  * filters reach the scan, repeated subplans reuse exchanges, candidate
  * generation never degenerates to a cross product — pinned as tests.
  */
class PlanShapeSpec extends AnyFunSuite {

  private def physical(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // materialize so AQE settles on the final plan
    df.queryExecution.executedPlan.toString
  }

  private def optimized(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan.toString

  test("q3/q5 star joins broadcast their dimension sides") {
    assert(physical("tpch_q3").contains("BroadcastHashJoin"))
    assert(physical("tpch_q5").contains("BroadcastHashJoin"))
  }

  test("win_qualify plans a WindowGroupLimit (QUALIFY row_number fusion)") {
    assert(optimized("win_qualify").contains("WindowGroupLimit"))
  }

  test("win_percentile buffers no whole-partition window (two-phase agg + broadcast back)") {
    // r8 VERDICT "what's wrong" #1: OVER (PARTITION BY event_type) on a
    // low-cardinality key buffers giant partitions at scale. The entry now
    // computes the per-key percentiles as a grouped agg joined back via
    // broadcast; the only WindowExec left is the bounded ±5-row frame.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    val df = SparkEntry.queries("win_percentile")(spark, sf)
    df.collect()
    // AQE hides stage subtrees from collect() — flatten across the
    // adaptive root AND materialized query-stage boundaries
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(flatten)
    }
    val nodes = flatten(df.queryExecution.executedPlan)
    val windows = nodes.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "frame variant should still be a WindowExec")
    // a whole-partition window prints specifiedwindowframe(RowFrame,
    // unboundedpreceding$(), unboundedfollowing$()); the bounded frame
    // variant prints concrete offsets (RowFrame, -5, 5)
    for (w <- windows; we <- w.windowExpression) {
      val s = we.toString.toLowerCase
      assert(!s.contains("unboundedfollowing"),
        s"whole-partition (unbounded) frame survived: $s")
    }
    assert(nodes.mkString("\n").contains("BroadcastHashJoin"),
      "per-key percentiles must join back via broadcast")
  }

  test("win_topn_per_group plans a WindowGroupLimit") {
    assert(optimized("win_topn_per_group").contains("WindowGroupLimit"))
  }

  test("scan_pushdown pushes predicates and prunes columns at the scan") {
    val plan = physical("scan_pushdown")
    assert(plan.contains("PushedFilters: ["))
    assert(!plan.matches("(?s).*PushedFilters: \\[\\].*"),
      "PushedFilters is empty — predicates did not reach the parquet scan")
    assert(plan.contains("l_orderkey"), "pruned read schema missing")
    assert(!plan.contains("l_extendedprice"),
      "read schema includes unprojected columns — pruning failed")
  }

  test("q11/q15 run one physical lineitem scan via exchange reuse, no global window") {
    // The scalar-threshold CTE inlines into two logical branches, so the
    // single-scan property is PHYSICAL: both branches sit on an identical
    // scan -> partial agg -> Exchange subtree that ReuseExchange (static)
    // / AQE stage reuse (runtime) dedupes. Asserted with AQE off so the
    // executed plan is a concrete tree we can traverse; ReusedExchangeExec
    // is a leaf, so the reused branch's scan is not double-counted.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (q <- Seq("tpch_q11", "tpch_q15")) {
        val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan
        val scans = plan.collect {
          case f: FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains("lineitem")) => f
        }
        assert(scans.size == 1, s"$q plans ${scans.size} lineitem scans; expected 1")
        assert(plan.collect { case r: ReusedExchangeExec => r }.nonEmpty,
          s"$q does not reuse the aggregate exchange for the scalar threshold")
        assert(plan.collect { case w: WindowExec => w }.isEmpty,
          s"$q still plans a WindowExec (single-partition global window)")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("ddl_spj_join: the co-bucketed join plans with ZERO shuffle " +
    "(storage-partitioned join through KeyGroupedPartitioning)") {
    val df = SparkEntry.queries("ddl_spj_join")(spark, sf)
    df.collect() // finalize AQE
    val s = df.queryExecution.executedPlan.toString
    val shuffles = "Exchange".r.findAllIn(s).size -
      "BroadcastExchange".r.findAllIn(s).size
    assert(s.contains("SortMergeJoin"), s"expected the hinted SMJ:\n$s")
    assert(shuffles === 0,
      s"co-bucketed snapshot tables must join without an exchange:\n$s")
  }

  test("LSH candidate generation is equi-join bucketed, never a cross product") {
    for (q <- Seq("dedup_docs_minhash", "dedup_docs_simhash", "dedup_docs_jaccard", "ann_lsh")) {
      val plan = physical(q)
      assert(!plan.contains("CartesianProduct"), s"$q plans a CartesianProduct")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join")
    }
  }

  test("jdbc_pushdown pushes the predicate into the JDBC scan") {
    // the filter must execute remotely (as SQL in the source database), not
    // in Spark after a full-table fetch — the Snowflake-adapter pushdown
    // story, demonstrated on the Derby path.
    val plan = physical("jdbc_pushdown")
    assert(plan.contains("JDBCRelation"), "no JDBC scan in the plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThan\\(C_ACCTBAL,5000\\.0\\).*") ||
      plan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThan\\(c_acctbal,5000\\.0\\).*"),
      s"predicate did not reach the JDBC scan: $plan")
  }

  test("dedup_docs_jaccard guards candidate buckets with a shingle df-cap") {
    // the scale guard: hot shingles (df > cap) must be anti-joined away
    // before the self-join, bounding every candidate bucket at DFCAP².
    // Asserted on cappedShingles — the pre-localCheckpoint subplan the
    // self-join consumes (the checkpoint collapses it to a LogicalRDD in
    // the full query's plan).
    val plan = graft.queries.DedupQueries.cappedShingles(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains(s"> ${graft.queries.DedupQueries.DFCAP}"),
      "no document-frequency cap filter ahead of the jaccard self-join")
    assert(plan.contains("LeftAnti"),
      "hot-shingle set is not removed via an anti join")
    // and no window anywhere: per-doc sizes must come from size(shs) at
    // collect_set time, not a post-hoc shuffle+sort of the shingle set.
    assert(!plan.contains("Window"),
      "jaccard set sizes regressed to a window over the shingle set")
  }

  test("pipeline_pack_sequences windows over (lang, shard), never a single partition") {
    // the shard key exists precisely so the packing window parallelizes;
    // a SinglePartition exchange would mean the corpus serializes through
    // one task at scale.
    assert(!physical("pipeline_pack_sequences").contains("SinglePartition"),
      "packing window collapsed to a single partition")
  }

  test("layout_zorder and orc_roundtrip aggregate map-side before the shuffle") {
    assert(physical("layout_zorder").contains("partial_count"),
      "no partial aggregation ahead of the z-bucket shuffle")
    assert(physical("orc_roundtrip").contains("partial_count"),
      "no partial aggregation ahead of the roundtrip agg shuffle")
  }

  test("orc_roundtrip pushes the filter into the ORC scan") {
    val plan = physical("orc_roundtrip")
    assert(plan.contains("PushedFilters: ["), "no pushed filters on the ORC scan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThan\\(l_quantity,25\\.0\\).*"),
      "l_quantity predicate did not reach the ORC scan")
  }

  test("sample_stratified is a narrow filter + one aggregation (no join/window)") {
    val plan = optimized("sample_stratified")
    assert(!plan.contains("Join"), "stratified sample plans a join")
    assert(!plan.contains("Window"), "stratified sample plans a window")
  }

  test("pipeline_split_holdout is a narrow hash split + one aggregation (no join/window)") {
    val plan = optimized("pipeline_split_holdout")
    assert(!plan.contains("Join"), "hash split plans a join")
    assert(!plan.contains("Window"), "hash split plans a window")
  }

  test("text_repetition is per-row narrow work (no join/window/aggregation)") {
    // the only allowed exchange is the round-robin split of the single-file
    // fixture; the signals themselves must stay per-row expressions.
    val plan = optimized("text_repetition")
    assert(!plan.contains("Join"), "repetition signals plan a join")
    assert(!plan.contains("Window"), "repetition signals plan a window")
    assert(!plan.contains("Aggregate"), "repetition signals plan an aggregation")
  }

  test("text_repetition null-propagates a null document (UDF must not NPE)") {
    import spark.implicits._
    // reference-typed Scala UDF args are NOT null-short-circuited; the
    // replaced Catalyst-expression form returned null metrics for null text
    Seq(("d1", "a a a"), ("d2", null)).toDF("doc_id", "text")
      .createOrReplaceTempView("__rep_null_docs")
    val rep = graft.queries.PipelineQueries.repetitionSignals(
      spark.table("__rep_null_docs")).collect()
    val nullRow = rep.find(_.getAs[String]("doc_id") == "d2").get
    assert(nullRow.isNullAt(nullRow.fieldIndex("n_words")))
    val ok = rep.find(_.getAs[String]("doc_id") == "d1").get
    assert(ok.getAs[Long]("n_words") == 3L)
  }

  test("pipeline_mixture_resample broadcasts the per-lang count table") {
    assert(physical("pipeline_mixture_resample").contains("BroadcastHashJoin"),
      "mixture acceptance join did not broadcast the counts side")
  }

  test("pipeline_decontaminate broadcasts eval shingles, never a cross product") {
    val plan = physical("pipeline_decontaminate")
    assert(plan.contains("BroadcastHashJoin"),
      "eval-shingle overlap join did not broadcast")
    assert(!plan.contains("CartesianProduct"), "decontamination planned a cross product")
  }

  test("text_unigram_logprob broadcasts the vocabulary side") {
    assert(physical("text_unigram_logprob").contains("BroadcastHashJoin"),
      "token->vocabulary join did not broadcast")
  }

  test("pipeline_quality_gate broadcasts the per-lang median table") {
    assert(physical("pipeline_quality_gate").contains("BroadcastHashJoin"),
      "median-threshold join did not broadcast")
  }

  test("ann_topk broadcasts the query-vector side") {
    // brute-force baseline: the 8-vector query set is broadcast; the corpus
    // streams (BroadcastNestedLoopJoin is the intended plan here).
    assert(physical("ann_topk").contains("Broadcast"))
  }

  test("topk plans TakeOrderedAndProject (no global sort)") {
    assert(physical("topk").contains("TakeOrderedAndProject"))
    assert(physical("sample_fixed_n").contains("TakeOrderedAndProject"))
  }

  test("q2 correlated MIN subquery decorrelates (no per-row subquery)") {
    val plan = optimized("tpch_q2")
    assert(!plan.contains("ScalarSubquery"),
      "q2 still carries a correlated scalar subquery after optimization")
  }

  test("parquet_partitioned read-back prunes partitions at the directory level") {
    val plan = physical("parquet_partitioned")
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      "partition filter did not reach the partitioned scan")
  }

  test("parquet_partitioned write bounds files per partition at the split " +
       "count (composite hash distribution, r22)") {
    // physical() above already ran the query fn, so the write exists
    physical("parquet_partitioned")
    val splits = spark.conf.getOption("graft.write.partition.splits")
      .flatMap(_.toIntOption).getOrElse(4)
    val base = new java.io.File(s"/tmp/graft_io/pq_${sf.replaceAll("[^a-zA-Z0-9]", "_")}")
    val dirs = Option(base.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("l_returnflag="))
    assert(dirs.nonEmpty, s"no partition dirs under $base")
    dirs.foreach { dir =>
      val n = dir.listFiles().count(_.getName.endsWith(".parquet"))
      assert(n >= 1 && n <= splits,
        s"${dir.getName}: $n files, expected 1..$splits")
    }
  }

  test("runtime bloom filter injects on a selective shuffle join (M0 session conf)") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions._
      val o = Tables.orders(spark, sf).filter(col("o_totalprice") > 450000.0)
      val l = Tables.lineitem(spark, sf)
      val plan = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).count()
        .queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("bloomfilter"),
        "no runtime bloom filter injected into the probe side")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot partition of the deliberately skewed join") {
    // 70% of events land on one key; with broadcast off and thresholds
    // scaled to fixture bytes, OptimizeSkewedJoin must mark the sort-merge
    // join skew=true — the same runtime re-plan that rescues a hot key at
    // 100 TB without manual salting.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "512b",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256b",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions._
      // repartition(8) stands in for the many input splits a real scan has:
      // AQE splits a skewed reduce partition by MAPPER ranges, so a
      // single-split fixture scan (one mapper) would leave nothing to split.
      val ev = Tables.events(spark, sf).repartition(8).withColumn("sk",
        when(col("user_id") % 10 < 7, 0L).otherwise(col("user_id") % 100))
      val dim = Tables.events(spark, sf).repartition(8)
        .select((col("user_id") % 100).as("sk2"), col("value").as("dim_v"))
      val df = ev.join(dim, col("sk") === col("sk2"))
        .select(col("sk"), col("value"), col("dim_v"))
      df.collect() // let AQE settle on the final plan
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"no skew-split in the final AQE plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("custom expressions stay inside whole-stage codegen (fn_string battery)") {
    // jaro_winkler and the bounded levenshtein are projection columns in
    // fn_string; with doGenCode implemented the scan->project pipeline
    // must compile into a whole-stage-codegen span — the `*(n)` star
    // marker on Project (a CodegenFallback expression would print a
    // bare, interpreted Project).
    val plan = physical("fn_string")
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project.*"),
      s"fn_string projection is not whole-stage compiled:\n$plan")
  }

  test("join_asof composition plans a single shuffle per side (window, not NLJ)") {
    val plan = physical("join_asof")
    assert(plan.contains("Window"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("bucketed_join: bucket-aligned sort-merge join with zero exchanges") {
    physical("bucketed_join") // runs the entry -> bucketed tables exist
    import org.apache.spark.sql.functions.col
    val (ot, ct) = graft.queries.IoQueries.bucketTables(sf)
    val j = spark.table(ot).hint("merge")
      .join(spark.table(ct), col("o_custkey") === col("c_custkey"))
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    // the claim: ZERO exchanges — the join runs on bucket-aligned splits.
    // (An in-partition Sort remains: post-3.0 Spark ignores sortBy file
    // order unless spark.sql.legacy.bucketedTableScan.outputOrdering is
    // set; that sort is linear and shuffle-free, so the scale story —
    // no data movement — is intact.)
    assert(!plan.contains("Exchange"),
      s"bucketed sides must join without any exchange:\n$plan")
  }

  test("join_interval_binned: keyless range join runs as a bin-equi hash join, no NLJ") {
    val plan = physical("join_interval_binned")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"binned interval join degenerated to a product:\n$plan")
  }

  test("join_asof_native plans the custom AsofJoinExec operator, no window, no NLJ") {
    val plan = physical("join_asof_native")
    assert(plan.contains("AsofJoin"),
      s"custom strategy did not plan AsofJoinExec:\n$plan")
    assert(!plan.contains("Window"), "native path must not fall back to the window composition")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("join_interval_native plans IntervalJoinExec behind a BroadcastExchange, no NLJ") {
    val plan = physical("join_interval_native")
    assert(plan.contains("IntervalJoin"),
      s"custom strategy did not plan IntervalJoinExec:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      "interval build side must arrive via a broadcast exchange")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("native interval join matches the bin-equi rewrite row-for-row") {
    val native = SparkEntry.queries("join_interval_native")(spark, sf)
      .orderBy("iv_id").collect().map(_.toString)
    val binned = SparkEntry.queries("join_interval_binned")(spark, sf)
      .orderBy("iv_id").collect().map(_.toString)
    assert(native.length === binned.length)
    assert(native.sameElements(binned))
  }

  test("kmv_ndv sketch partial-aggregates (map-side combine, not a raw-key shuffle)") {
    val plan = physical("agg_kmv_ndv")
    // TypedImperativeAggregate plans as ObjectHashAggregate; partial +
    // final instances = the sketch state (≤ K longs) is what shuffles,
    // never the raw hashed keys
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final ObjectHashAggregate pair:\n$plan")
  }

  test("bitmap NDV pipeline keeps hash aggregation at every level") {
    val plan = physical("agg_bitmap_ndv")
    assert(plan.contains("HashAggregate"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("composite entries keep their fused plan shape (no extra shuffles)") {
    // r9 VERDICT item 1 'done' criterion: composing >=3 operator families
    // into one plan must not introduce shuffles beyond what the fused plan
    // needs. Ceilings measured from the actual executed plans at sf0.01
    // (PlanProbe run, 2026-08-13); a regression that adds an exchange —
    // e.g. a lost broadcast hint or a dedup that re-partitions — trips the
    // ceiling. Broadcast exchanges are free of shuffle cost and counted
    // separately via the required-node column.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      p +: kids.flatMap(flatten)
    }
    // name -> (max shuffle exchanges, substrings the plan must contain)
    val shape: Seq[(String, Int, Seq[String])] = Seq(
      // session window + distinct-agg two-phase + pivot agg
      ("composite_gate_session_pivot", 4, Seq("BroadcastHashJoin")),
      // session window + distinct + join-on-dedup (exchange reuse) + agg
      // r22: pair generation via per-session collect_set + explode — ONE
      // sessionize pipeline (the r21 self-join planned it twice), the
      // session agg reuses the window's user_id partitioning, so the only
      // shuffles are the window exchange and the tiny pair-count exchange
      ("composite_session_pair_affinity", 2, Seq("ObjectHashAggregate")),
      // union + user_id running window + dow agg
      ("composite_funnel_conversion", 3, Seq("Window")),
      // star join (AQE broadcasts small sides at this SF) + agg
      ("composite_case_ladder", 3, Seq("BroadcastHashJoin")),
      // custkey agg + top-k (never a global sort) + broadcast join back
      ("composite_spend_trend", 2, Seq("TakeOrderedAndProject", "BroadcastHashJoin")),
      // doc_k agg broadcast + rank filter fused to WindowGroupLimit
      ("composite_doc_engagement_rank", 2, Seq("WindowGroupLimit", "BroadcastHashJoin")),
      // gate + dedup window + broadcast join + weekly pivot
      ("composite_dedup_gate_weekly", 3, Seq("BroadcastHashJoin")))
    for ((name, maxShuffles, required) <- shape) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val nodes = flatten(df.queryExecution.executedPlan)
      val plan = df.queryExecution.executedPlan.toString
      val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles <= maxShuffles,
        s"$name plans $shuffles shuffles, fused-plan ceiling is $maxShuffles")
      for (r <- required)
        assert(nodes.exists(_.toString.contains(r)) || plan.contains(r),
          s"$name plan lost required node $r")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$name degenerated to a cross/nested-loop join")
    }
  }

  test("dedup_paragraphs: two wide shuffles, hot-passage list broadcast") {
    // the r19 sub-document dedup contract: ONE passage-df aggregate and
    // ONE reassembly aggregate are the only wide shuffles (the passage
    // rows are localCheckpoint'd, so the fixture repartition is not in
    // this plan); the df>PARADF hot list joins back as a BROADCAST
    // anti-join — a shuffled strip join would move the whole passage set
    // a third time at corpus scale.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      p +: kids.flatMap(flatten)
    }
    val df = SparkEntry.queries("dedup_paragraphs")(spark, sf)
    df.collect()
    val nodes = flatten(df.queryExecution.executedPlan)
    val plan = df.queryExecution.executedPlan.toString
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
    assert(shuffles <= 2,
      s"dedup_paragraphs plans $shuffles shuffles; the contract is 2 " +
        "(passage-df aggregate + order-preserving reassembly)")
    assert(plan.contains("BroadcastHashJoin"),
      "hot-passage strip must be a broadcast anti-join")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("native as-of join matches the window composition row-for-row") {
    // two independent implementations of the same semantics must agree —
    // the strongest in-repo oracle (the DuckDB ASOF check runs driver-side).
    val native = SparkEntry.queries("join_asof_native")(spark, sf)
      .orderBy("event_id").collect().map(_.toString)
    val windowed = SparkEntry.queries("join_asof")(spark, sf)
      .orderBy("event_id").collect().map(_.toString)
    assert(native.length === windowed.length)
    assert(native.sameElements(windowed))
  }

  test("snapshotlog DSv2 scan: PushedFilters reach the scan and prune files") {
    // VERDICT r11 item 1 done-criterion: the format's pushed predicates
    // must be visible in the plan and must shrink the planned file set
    // from manifest metadata. The ddl_stats_pruning gate pins the values;
    // this pins the PLAN evidence.
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    val df = SparkEntry.queries("ddl_stats_pruning")(spark, sf)
    df.collect()
    // the underlying probe: re-plan it directly to inspect the scan
    val root = s"/tmp/graft_snapfix/sliced_customer_${sf.replaceAll("[^a-zA-Z0-9]", "_")}"
    val probe = spark.read.format("snapshotlog").load(root)
      .filter(org.apache.spark.sql.functions.col("c_custkey").between(400L, 500L))
    val scan = probe.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation =>
        r.scan.asInstanceOf[graft.sources.SnapshotLogScan]
    }.head
    assert(scan.description().contains("PushedFilters"),
      "pushed filters must be explain-visible on the scan node")
    assert(scan.description().contains("GreaterThanOrEqual") ||
      scan.description().contains("LessThanOrEqual"), scan.description())
    val total = graft.sources.SnapshotLog.snapshots(spark, root).last.files.size
    assert(scan.keptFiles.size < total,
      s"scan planned ${scan.keptFiles.size} of $total files — no pruning happened")
    // explain("formatted") surfaces the same evidence to a user
    val formatted = probe.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("snapshotlog"), formatted.take(500))
  }
}
