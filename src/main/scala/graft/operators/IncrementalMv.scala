package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.SnapshotLog

/** INCREMENTAL MATERIALIZED-VIEW MAINTENANCE — the classic CDC composition
  * (Iceberg changelog → MERGE loop; the reference ecosystem's dynamic-table
  * / incremental-refresh analog): a downstream COUNT/SUM aggregate table is
  * kept EXACT by merging each version range's `net_changes` delta, never by
  * re-scanning the base.
  *
  * Why this is the right 100-TB shape: the changelog read costs one shuffle
  * over the range's TOUCHED rows only (SnapshotLog.changes), the per-group
  * delta is a map-side-combined aggregate of those rows, and the MERGE is
  * file-granular copy-on-write on the (small) MV table — refresh cost is
  * proportional to the CHANGE, not the base table. A full MV rebuild scans
  * 100 TB; this scans the delta.
  *
  * Count-sum aggregates are SELF-MAINTAINABLE (insert adds, delete
  * subtracts, a group whose count reaches zero is deleted) — the textbook
  * incremental-view-maintenance algebra. SQL null semantics are preserved
  * the textbook way too: the MV carries `n` (rows), `nv` (rows with a
  * NON-NULL value) and `s` (sum over those, 0 when none), so
  * `sum(v)` reconstructs as `IF(nv = 0, NULL, s)` and `avg(v)` as
  * `s / nv` — exactly SQL's ignore-nulls aggregation, maintained
  * incrementally. Group keys join NULL-SAFELY (`<=>`) so a NULL group is
  * one group, as GROUP BY defines it. The applied watermark rides the
  * MV's own table properties, so refresh is idempotent and restartable:
  * re-running maintain() applies exactly the unapplied suffix. */
object IncrementalMv {
  /** Watermark property on the MV table: highest base version applied. */
  val AppliedProp = "mv.applied-base-version"

  /** Create the MV `SELECT groups…, count(*) n, count(v) nv,
    * coalesce(sum(v), 0) s FROM base GROUP BY groups…` at the base's
    * current version, recording the watermark. `mvTable` is a `snap`
    * catalog name (ns.t). */
  def create(spark: SparkSession, baseRoot: String, mvTable: String,
             groupCols: Seq[String], valueCol: String): Int = {
    require(groupCols.nonEmpty && !groupCols.contains(valueCol),
      s"IncrementalMv: bad definition (groups=$groupCols value=$valueCol)")
    val baseV = SnapshotLog.snapshots(spark, baseRoot)
      .filter(_.branch.isEmpty).last.version
    val base = spark.read.format("snapshotlog").load(baseRoot)
    spark.sql(s"DROP TABLE IF EXISTS snap.$mvTable")
    // coalesce needs a typed zero — cast 0 to the sum's own result type
    val seed = base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), count(col(valueCol)).as("nv"),
        sum(col(valueCol)).as("__s"))
    val sType = seed.schema("__s").dataType.sql
    val seeded = seed.withColumn("s",
      coalesce(col("__s"), expr(s"CAST(0 AS $sType)"))).drop("__s")
    seeded.createOrReplaceTempView("__mv_seed")
    spark.sql(s"CREATE TABLE snap.$mvTable AS SELECT * FROM __mv_seed")
    spark.catalog.dropTempView("__mv_seed")
    SnapshotLog.setTableProps(spark, mvRoot(spark, mvTable),
      Map(AppliedProp -> baseV.toString))
    register(spark, baseRoot, mvTable, groupCols, valueCol)
    baseV
  }

  /** Single-group convenience overload. */
  def create(spark: SparkSession, baseRoot: String, mvTable: String,
             groupCol: String, valueCol: String): Int =
    create(spark, baseRoot, mvTable, Seq(groupCol), valueCol)

  /** Apply every unapplied base version to the MV: ONE net_changes read
    * over (applied, head], one per-group delta aggregate, one MERGE.
    * Returns the new watermark (== old when nothing to do). */
  def maintain(spark: SparkSession, baseRoot: String, mvTable: String,
               groupCols: Seq[String], valueCol: String): Int = {
    val root = mvRoot(spark, mvTable)
    val applied = SnapshotLog.tableProps(spark, root)
      .getOrElse(AppliedProp, throw new IllegalStateException(
        s"IncrementalMv: $mvTable has no $AppliedProp — create() it first"))
      .toInt
    val head = SnapshotLog.snapshots(spark, baseRoot)
      .filter(_.branch.isEmpty).last.version
    if (head <= applied) return applied
    // net_changes: intermediate churn inside the range cancels — the MV
    // sees one ±row per net-changed row, regardless of how many versions
    // the range spans
    val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
    val v = col(valueCol)
    val delta = SnapshotLog.changes(spark, baseRoot, applied, Some(head),
        netChanges = true)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(sign).as("dn"),
        coalesce(sum(when(v.isNotNull, sign).otherwise(0L)), lit(0L))
          .as("dnv"),
        sum(when(v.isNotNull, when(col("_change_type") === "insert", v)
          .otherwise(-v))).as("__ds"))
    val dsType = delta.schema("__ds").dataType.sql
    val deltaZ = delta
      .withColumn("ds", coalesce(col("__ds"), expr(s"CAST(0 AS $dsType)")))
      .drop("__ds")
      .filter(col("dn") =!= 0L || col("dnv") =!= 0L || col("ds") =!= 0L)
    val view = "__mv_delta_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    deltaZ.createOrReplaceTempView(view)
    // NULL-SAFE key equality: GROUP BY treats NULL as one group, so the
    // MERGE must too — plain `=` would re-insert the null group forever
    val on = groupCols.map(c => s"t.$c <=> s.$c").mkString(" AND ")
    val gList = groupCols.mkString(", ")
    val gVals = groupCols.map(c => s"s.$c").mkString(", ")
    try spark.sql(
      s"""MERGE INTO snap.$mvTable t USING $view s ON $on
         |WHEN MATCHED AND t.n + s.dn = 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET n = t.n + s.dn, nv = t.nv + s.dnv,
         |  s = t.s + s.ds
         |WHEN NOT MATCHED THEN INSERT ($gList, n, nv, s)
         |  VALUES ($gVals, s.dn, s.dnv, s.ds)""".stripMargin)
    finally spark.catalog.dropTempView(view)
    SnapshotLog.setTableProps(spark, root, Map(AppliedProp -> head.toString))
    head
  }

  /** Single-group convenience overload. */
  def maintain(spark: SparkSession, baseRoot: String, mvTable: String,
               groupCol: String, valueCol: String): Int =
    maintain(spark, baseRoot, mvTable, Seq(groupCol), valueCol)

  private def mvRoot(spark: SparkSession, mvTable: String): String = {
    val wh = spark.conf.getOption("spark.sql.catalog.snap.warehouse")
      .getOrElse("/tmp/graft_snap_warehouse")
    s"$wh/" + mvTable.replace('.', '/')
  }

  // ---- MV registry (feeds the transparent query-rewrite rule) ----

  /** One registered MV: `SELECT groups…, count(*) n, count(v) nv,
    * sum-with-zero s FROM <baseRoot> GROUP BY groups…`, materialized at
    * `mvRoot`. */
  final case class MvDef(baseRoot: String, mvRoot: String,
                         groupCols: Seq[String], valueCol: String)

  /** DURABLE registration: the BASE table's properties carry its
    * materialization's location and defining columns, so a fresh engine
    * process (new JVM, new session) keeps rewriting without re-running
    * create() — the registration lives with the data, like everything
    * else in the snapshot log. */
  val BaseMvRootProp = "mv.materialization-root"
  val BaseMvGroupProp = "mv.materialization-group-col"
  val BaseMvValueProp = "mv.materialization-value-col"

  /** In-memory view of registrations: definitive entries written by
    * register(), plus a TTL cache of property hydrations (positive AND
    * negative — a base table with no MV must not pay an FS read per
    * optimized query). Freshness is still re-proved against the MV's
    * durable watermark on every use, so staleness here can never produce
    * wrong answers — only a (bounded) missed or attempted rewrite. */
  private val registry =
    scala.collection.concurrent.TrieMap[String, MvDef]()
  private val hydrated =
    scala.collection.concurrent.TrieMap[String, (Long, Option[MvDef])]()

  private def hydrateTtlMs: Long =
    java.lang.Long.getLong("graft.mv.hydrateTtlMs", 30000L)

  private def normRoot(r: String): String = r.stripSuffix("/")

  /** Register `mvTable` as the materialization of the canonical
    * group/count/sum aggregate over `baseRoot` — [[create]] calls this;
    * exposed for MVs maintained by external loops. Durable: recorded in
    * the base table's properties (group columns comma-joined). */
  def register(spark: SparkSession, baseRoot: String, mvTable: String,
               groupCols: Seq[String], valueCol: String): Unit = {
    val d = MvDef(normRoot(baseRoot), mvRoot(spark, mvTable),
      groupCols, valueCol)
    // a self-referential registration would let the rewrite serve the
    // MV's own defining aggregate FROM ITSELF without aggregating
    require(normRoot(d.mvRoot) != d.baseRoot,
      s"IncrementalMv: mv table must differ from its base ($baseRoot)")
    try SnapshotLog.setTableProps(spark, baseRoot, Map(
      BaseMvRootProp -> d.mvRoot,
      BaseMvGroupProp -> groupCols.mkString(","),
      BaseMvValueProp -> valueCol))
    catch { case scala.util.control.NonFatal(_) => () } // in-memory still works
    hydrated.remove(d.baseRoot)
    registry.put(d.baseRoot, d): Unit
  }

  def register(spark: SparkSession, baseRoot: String, mvTable: String,
               groupCol: String, valueCol: String): Unit =
    register(spark, baseRoot, mvTable, Seq(groupCol), valueCol)

  /** Remove the registration durably (base props) and in-memory. */
  def unregister(spark: SparkSession, baseRoot: String): Unit = {
    try SnapshotLog.setTableProps(spark, baseRoot, Map.empty,
      unset = Seq(BaseMvRootProp, BaseMvGroupProp, BaseMvValueProp))
    catch { case scala.util.control.NonFatal(_) => () }
    hydrated.remove(normRoot(baseRoot))
    registry.remove(normRoot(baseRoot)): Unit
  }

  /** Test hook: drop all in-memory registration state (the durable
    * base-table properties survive) — simulates a fresh engine process. */
  private[graft] def forgetInMemory(): Unit = {
    registry.clear(); hydrated.clear()
  }

  private[graft] def registered(baseRoot: String): Option[MvDef] = {
    val key = normRoot(baseRoot)
    registry.get(key).orElse {
      val now = System.nanoTime() / 1000000L
      hydrated.get(key) match {
        case Some((ts, v)) if now - ts < hydrateTtlMs => v
        case _ =>
          val v: Option[MvDef] =
            try {
              val props = SnapshotLog.tableProps(SparkSession.active, key)
              for {
                mvRoot <- props.get(BaseMvRootProp)
                g <- props.get(BaseMvGroupProp)
                vc <- props.get(BaseMvValueProp)
              } yield MvDef(key, mvRoot,
                g.split(",").map(_.trim).filter(_.nonEmpty).toSeq, vc)
            } catch { case scala.util.control.NonFatal(_) => None }
          if (hydrated.size > 4096) hydrated.clear()
          hydrated.put(key, (now, v))
          v
      }
    }
  }

  /** The base version the MV at `mvRoot` has applied, from its durable
    * table properties — the rewrite rule's freshness anchor. */
  private[graft] def appliedVersion(spark: SparkSession,
                                    mvRoot: String): Option[Int] =
    try SnapshotLog.tableProps(spark, mvRoot).get(AppliedProp).map(_.toInt)
    catch { case scala.util.control.NonFatal(_) => None }
}
