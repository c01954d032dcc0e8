package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark
import graft.sources.SnapshotLog

/** DYNAMIC FILE PRUNING (r17): runtime join filters consulting the
  * per-file BLOOM sidecars. DPP (SnapshotDppSpec) prunes through the
  * partition spec; this is the complement for the join key that is
  * neither partition nor sort anchor — an unsorted high-cardinality
  * column whose per-file min/max span the key space. The scan now
  * declares bloom-covered columns runtime-filterable, so the build side
  * of a star join feeds its IN-set into [[SnapshotLogScan.filter]],
  * which drops every file whose bloom provably lacks ALL probed keys.
  * At 100 TB: a needle-join against a filtered dim opens a handful of
  * fact files instead of the table. (Reference ecosystem analog:
  * Databricks dynamic file pruning / Iceberg Puffin-assisted skipping;
  * reference bloom machinery bodo/libs/streaming/_join.h:16.) */
class SnapshotDfpSpec extends AnyFunSuite {
  import spark.implicits._

  private val wh = "/tmp/graft_snap_warehouse"

  private def freshTable(name: String): String = {
    val root = s"$wh/dfp/$name"
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(root), true)
    root
  }

  /** 1 pre-property commit (2 uncovered files) + 3 bloom-covered commits
    * (2 files each): unpartitioned, md5-string keys — min/max stats and
    * partition tuples can prune NOTHING here. */
  private def buildFact(root: String): Unit = {
    val df = spark.range(0, 8000).selectExpr(
      "md5(cast(id AS string)) AS k", "id AS v")
    SnapshotLog.commit(df.filter("v % 4 = 0"), root, overwrite = true, 100L, 2)
    SnapshotLog.setTableProps(spark, root, Map("write.bloom.columns" -> "k"))
    for (i <- 1 to 3)
      SnapshotLog.commit(df.filter(s"v % 4 = $i"), root, overwrite = false,
        100L * (i + 1), 2): Unit
  }

  test("bloom-covered columns are runtime-filterable; an IN-set prunes " +
       "covered files through the blooms (unit)") {
    val root = freshTable("unit")
    buildFact(root)
    val snap = SnapshotLog.snapshots(spark, root).last
    val scan = new graft.sources.SnapshotLogScan(snap,
      org.apache.spark.sql.types.StructType(snap.schema.fields),
      Array.empty, snap.files, root)
    assert(scan.filterAttributes().map(_.describe()).toSet == Set("k", "v"),
      "bloom column + stat-typed columns are the runtime anchors")
    val before = scan.keptFiles.size
    assert(before === 8)
    // 2 present keys: keep the <=2 covered files containing them + the 2
    // uncovered v1 files (conservative)
    val keys = Seq(4001L, 4002L).map(i =>
      org.apache.commons.codec.digest.DigestUtils.md5Hex(i.toString))
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("k", keys.toArray[Any])))
    assert(scan.keptFiles.size <= 4,
      s"runtime IN-set should bloom-prune covered files: " +
        s"$before -> ${scan.keptFiles.size}")
  }

  test("an over-wide runtime IN-set is ignored (probe cost cap)") {
    val root = freshTable("cap")
    buildFact(root)
    val snap = SnapshotLog.snapshots(spark, root).last
    val scan = new graft.sources.SnapshotLogScan(snap,
      org.apache.spark.sql.types.StructType(snap.schema.fields),
      Array.empty, snap.files, root)
    val wide = (0 until graft.sources.SnapshotLogScan.maxRuntimeKeys + 1)
      .map(i => s"key-$i": Any).toArray
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("k", wide)))
    assert(scan.keptFiles.size === 8,
      "a build side wider than dfp.maxKeys must not be probed")
  }

  test("star join on an unpartitioned bloom key injects runtime pruning " +
       "and opens only the containing files") {
    val fact = freshTable("fact")
    val dim = freshTable("dim")
    buildFact(fact)
    // small dim: key + category; only cat=1 rows survive the filter
    SnapshotLog.commit(
      spark.range(4000, 4200).selectExpr(
        "md5(cast(id AS string)) AS dk", "cast(id % 100 AS int) AS cat"),
      dim, overwrite = true, 100L)
    val j = spark.read.format("snapshotlog").load(fact)
      .join(spark.read.format("snapshotlog").load(dim)
          .filter(col("cat") === 1), // 2 keys: 4001, 4101
        col("k") === col("dk"))
      .select(col("v"))
    // collect through j ITSELF so the inspected QueryExecution is the
    // one that ran (a .as[Long] view would re-plan a fresh Scan instance)
    val rows = j.collect().map(_.getLong(0)).toSet
    assert(rows === Set(4001L, 4101L))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a runtime pruning subquery on the fact scan:\n$plan")
    // post-execution: the scan's live kept set reflects the bloom prune.
    // AQE hides scans inside QueryStageExec wrappers (not `children`),
    // so walk the finalized plan explicitly.
    def scansIn(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[graft.sources.SnapshotLogScan] = {
      val here = p match {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
            if b.scan.isInstanceOf[graft.sources.SnapshotLogScan] &&
               b.scan.readSchema().fieldNames.contains("v") =>
          Seq(b.scan.asInstanceOf[graft.sources.SnapshotLogScan])
        case _ => Seq.empty
      }
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case _ => p.children
      }
      here ++ kids.flatMap(scansIn)
    }
    val scans = scansIn(j.queryExecution.executedPlan)
    assert(scans.nonEmpty, s"fact scan not found:\n$plan")
    val kept = scans.head.keptFiles.size
    assert(kept <= 4,
      s"2 dim keys should open <=2 covered fact files + 2 uncovered, " +
        s"got $kept/8")
  }

  test("zone-map DFP: a runtime IN-set on a CLUSTERED key prunes via " +
       "manifest min/max, no blooms needed") {
    val fact = freshTable("zonemap_fact")
    val dim = freshTable("zonemap_dim")
    // 8 single-file commits with disjoint ts ranges — a time-clustered
    // fact table; NO bloom property, NO partition spec
    for (i <- 0 until 8)
      SnapshotLog.commit(
        spark.range(i * 1000L, i * 1000L + 1000L)
          .selectExpr("id AS ts", "id * 3 AS v"),
        fact, overwrite = i == 0, 100L * (i + 1), 1)
    SnapshotLog.commit(
      spark.range(0, 8000, 40).selectExpr("id AS dts",
        "cast(id / 40 % 100 AS int) AS cat"),
      dim, overwrite = true, 100L)
    val j = spark.read.format("snapshotlog").load(fact)
      .join(spark.read.format("snapshotlog").load(dim)
          .filter(col("cat") === 80), // keys 3200, 7200 — 2 of 8 ranges
        col("ts") === col("dts"))
      .select(col("v"))
    val rows = j.collect().map(_.getLong(0)).toSet
    assert(rows === Set(3200L * 3, 7200L * 3))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a runtime pruning subquery on the clustered fact:\n$plan")
    def scansIn(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[graft.sources.SnapshotLogScan] = {
      val here = p match {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
            if b.scan.isInstanceOf[graft.sources.SnapshotLogScan] &&
               b.scan.readSchema().fieldNames.contains("v") =>
          Seq(b.scan.asInstanceOf[graft.sources.SnapshotLogScan])
        case _ => Seq.empty
      }
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case _ => p.children
      }
      here ++ kids.flatMap(scansIn)
    }
    val kept = scansIn(j.queryExecution.executedPlan).map(_.keptFiles.size)
    assert(kept.nonEmpty && kept.head <= 2,
      s"2 surviving dim keys in 2 ranges should keep 2 of 8 files, " +
        s"got ${kept.headOption}")
  }

  test("CompiledIn: binary-search range probe and precomputed bloom " +
       "hashes agree with the per-value path (unit)") {
    import graft.sources.SnapshotLogScanBuilder.{compileIn => comp}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("x", LongType)))
    val in = org.apache.spark.sql.sources.In("x",
      (0L to 200L by 4).map(Long.box).toArray[Any])
    val p = comp(in, schema)
    // boundaries and gaps
    assert(p.statsMayMatch(Map("x" -> (0L, 0L))))      // exact min
    assert(p.statsMayMatch(Map("x" -> (199L, 300L))))  // 200 inside
    assert(p.statsMayMatch(Map("x" -> (-5L, -0L))))    // 0 at edge
    assert(!p.statsMayMatch(Map("x" -> (201L, 999L)))) // past the set
    assert(!p.statsMayMatch(Map("x" -> (1L, 3L))))     // inside a gap
    assert(p.statsMayMatch(Map.empty))                 // no stats: keep
    // null value in the set ⇒ keep always
    val withNull = org.apache.spark.sql.sources.In("x",
      (Array[Any](null) ++ (0L to 100L).map(Long.box)))
    assert(comp(withNull, schema).statsMayMatch(Map("x" -> (900L, 999L))))
  }

  test("runtime bloom pruning never drops rows: randomized keys, " +
       "exact join result") {
    val fact = freshTable("rand_fact")
    val dim = freshTable("rand_dim")
    buildFact(fact)
    val picks = Seq(17L, 940L, 2003L, 4001L, 7999L, 12345L) // last absent
    SnapshotLog.commit(
      picks.toDF("id").selectExpr("md5(cast(id AS string)) AS dk", "id AS want"),
      dim, overwrite = true, 100L)
    val j = spark.read.format("snapshotlog").load(fact)
      .join(spark.read.format("snapshotlog").load(dim),
        col("k") === col("dk"))
      .select(col("v"))
    assert(j.as[Long].collect().toSet ===
      picks.filter(_ < 8000L).toSet)
  }
}
