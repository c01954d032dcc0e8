package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType, TimestampNTZType, TimestampType}

import scala.jdk.CollectionConverters._

/** A minimal snapshot/transaction-log table format — the offline,
  * Spark-first analog of the reference's Iceberg surface (snapshot reads,
  * time travel, additive schema evolution, append/overwrite commits;
  * bodo/io/iceberg/ and IcebergDDLExecutor.kt). The real
  * iceberg-spark-runtime jar is unavailable in this environment (no egress;
  * SURVEY §2.1 note), so the SEMANTICS are provided over plain parquet plus
  * a JSON manifest log, the same two-layer design Iceberg itself uses:
  *
  *   <root>/data/<uuid>/part-*.parquet   immutable data files
  *   <root>/_log/v00001.json             manifest: exact file list + schema
  *
  * Readers never list `data/` — they read the manifest and open exactly the
  * files it names, so a reader pinned to version N is isolated from any
  * concurrent commit (snapshot isolation), and old versions stay readable
  * until a (not implemented) vacuum. Commits publish the next manifest by
  * atomic rename (file:/hdfs:; on S3A the log object is small enough that
  * the copy+delete window is a single PUT — the same caveat documented on
  * VectorIndex.ensure applies). All filesystem traffic goes through Hadoop
  * `FileSystem`, so file:/hdfs:/s3a: roots all work.
  *
  * At 100 TB the manifest holds file PATHS, not data: a commit is one
  * distributed parquet write plus one small JSON PUT, a version read plans
  * exactly the manifest's files (no directory listing storm), and time
  * travel is manifest selection — O(versions) driver-side metadata, never a
  * data scan.
  */
object SnapshotLog {

  final case class Snapshot(
      version: Int,
      operation: String,
      commitTsMs: Long,
      schemaJson: String,
      files: Seq[String],
      // per-file column stats: file -> col -> (min, max) as JSON scalars
      // (numbers for numeric cols, strings for string cols); absent for
      // files committed without stats — readers must treat a missing
      // entry as "may match" (conservative, like Iceberg's nullable
      // lower_bounds/upper_bounds)
      stats: Map[String, Map[String, (Any, Any)]] = Map.empty)

  private val om = new ObjectMapper()

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def logDir(root: String) = new Path(root, "_log")

  private def manifestPath(root: String, v: Int) =
    new Path(logDir(root), f"v$v%05d.json")

  /** All committed snapshots, oldest first (ignores foreign/tmp files). */
  def snapshots(spark: SparkSession, root: String): Seq[Snapshot] = {
    val dir = logDir(root)
    val fs = fsFor(spark, dir)
    if (!fs.exists(dir)) return Seq.empty
    val names = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.matches("v\\d{5}\\.json")).sorted
    names.map { n =>
      val in = fs.open(new Path(dir, n))
      try {
        val t = om.readTree(in)
        val stats: Map[String, Map[String, (Any, Any)]] =
          Option(t.get("stats")).map { sn =>
            sn.fields().asScala.map { fe =>
              fe.getKey -> fe.getValue.fields().asScala.map { ce =>
                ce.getKey -> (scalar(ce.getValue.get("min")),
                  scalar(ce.getValue.get("max")))
              }.toMap
            }.toMap
          }.getOrElse(Map.empty)
        Snapshot(
          t.get("version").asInt(),
          t.get("operation").asText(),
          t.get("commitTsMs").asLong(),
          t.get("schema").asText(),
          t.get("files").elements().asScala.map(_.asText()).toSeq,
          stats)
      } finally in.close()
    }.toSeq
  }

  private def scalar(n: com.fasterxml.jackson.databind.JsonNode): Any =
    if (n.isIntegralNumber) n.asLong()
    else if (n.isFloatingPointNumber) n.asDouble()
    else n.asText()

  /** Scheme-insensitive path identity (file:/ vs file:/// vs bare). */
  private def norm(p: String): String = p.replaceFirst("^file:/*", "/")

  /** Commit `df` as the next version. `overwrite` replaces the table
    * contents; append unions the parent's files with the new ones (data
    * files are immutable — append never rewrites). `commitTsMs` is caller-
    * supplied so tests and replays are deterministic; production callers
    * pass the wall clock. Returns the committed version number. */
  def commit(df: DataFrame, root: String, overwrite: Boolean,
             commitTsMs: Long, numFiles: Int = 2): Int = {
    val spark = df.sparkSession
    val rootP = new Path(root)
    val fs = fsFor(spark, rootP)
    val prior = snapshots(spark, root)
    val next = prior.lastOption.map(_.version + 1).getOrElse(1)
    require(prior.forall(_.commitTsMs < commitTsMs),
      s"commitTsMs $commitTsMs must advance past the last snapshot")

    // one immutable data dir per commit; repartition bounds the file count
    // (a 100 TB commit sizes this to target-file-size, not a constant)
    val dataDir = new Path(new Path(rootP, "data"),
      java.util.UUID.randomUUID().toString.take(12))
    df.repartition(numFiles).write.parquet(dataDir.toString)
    val newFiles = fs.listStatus(dataDir).map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .map(_.toString).sorted.toSeq

    val files = (if (overwrite) Seq.empty else prior.lastOption.map(_.files)
      .getOrElse(Seq.empty)) ++ newFiles
    // file-level min/max stats for every numeric/string column of the NEW
    // files (appended files keep the parent's recorded stats) — the
    // data-skipping metadata Iceberg keeps in manifests. One distributed
    // agg over the just-written files, one row per file on the driver.
    // (Iceberg reads these from parquet footers at commit for free; doing
    // the same footer walk here is the known optimization.)
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.{col => fcol, min => fmin, max => fmax, input_file_name, unix_micros}
    // timestamp columns record epoch-µs long bounds (JSON-scalar friendly,
    // and what readPruned's time-range probes compare against)
    val statCols: Seq[(String, Boolean)] = df.schema.fields.collect {
      case f if Seq(IntegerType, LongType, FloatType, DoubleType, StringType)
        .contains(f.dataType) => (f.name, false)
      case f if f.dataType == TimestampType || f.dataType == TimestampNTZType =>
        (f.name, true)
    }.toSeq
    val newStats: Map[String, Map[String, (Any, Any)]] =
      if (statCols.isEmpty) Map.empty
      else {
        val aggs = statCols.flatMap { case (c, isTs) =>
          val base = if (isTs) unix_micros(fcol(c).cast("timestamp")) else fcol(c)
          Seq(fmin(base), fmax(base))
        }
        spark.read.parquet(newFiles: _*)
          .groupBy(input_file_name().as("__f"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map { r =>
            val per = statCols.zipWithIndex.flatMap { case ((c, _), i) =>
              val (mn, mx) = (r.get(1 + 2 * i), r.get(2 + 2 * i))
              if (mn == null || mx == null) None else Some(c -> (mn, mx))
            }.toMap
            norm(r.getString(0)) -> per
          }.toMap
      }
    val stats =
      (if (overwrite) Map.empty[String, Map[String, (Any, Any)]]
       else prior.lastOption.map(_.stats).getOrElse(Map.empty)) ++ newStats

    val node = om.createObjectNode()
    node.put("version", next)
    node.put("operation", if (overwrite) "overwrite" else "append")
    node.put("commitTsMs", commitTsMs)
    node.put("schema", df.schema.json)
    val arr = node.putArray("files")
    files.foreach(arr.add)
    val statsNode = node.putObject("stats")
    stats.foreach { case (f, cols) =>
      val fNode = statsNode.putObject(f)
      cols.foreach { case (c, (mn, mx)) =>
        val cNode = fNode.putObject(c)
        def putScalar(key: String, v: Any): Unit = v match {
          case l: java.lang.Long    => cNode.put(key, l.longValue())
          case i: java.lang.Integer => cNode.put(key, i.longValue())
          case d: java.lang.Double  => cNode.put(key, d.doubleValue())
          case fl: java.lang.Float  => cNode.put(key, fl.doubleValue())
          case s: String            => cNode.put(key, s)
          case other                => cNode.put(key, other.toString)
        }
        putScalar("min", mn)
        putScalar("max", mx)
      }
    }

    val dest = manifestPath(root, next)
    fs.mkdirs(dest.getParent)
    val tmp = new Path(dest.getParent,
      s".tmp_${dest.getName}_${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, false)
    try out.write(om.writeValueAsBytes(node)) finally out.close()
    // atomic publish: the manifest appears complete or not at all; losing
    // a rename race to a concurrent commit is a real conflict — surface it
    // rather than silently dropping either commit (Iceberg retries the
    // whole commit; callers here can do the same)
    if (!fs.rename(tmp, dest)) {
      fs.delete(tmp, true)
      throw new IllegalStateException(
        s"SnapshotLog: concurrent commit won version $next at $root")
    }
    next
  }

  private def pick(spark: SparkSession, root: String,
                   asOfVersion: Option[Int], asOfTsMs: Option[Long]): Snapshot = {
    val snaps = snapshots(spark, root)
    require(snaps.nonEmpty, s"SnapshotLog: no snapshots at $root")
    (asOfVersion, asOfTsMs) match {
      case (Some(v), _) =>
        snaps.find(_.version == v).getOrElse(
          throw new NoSuchElementException(s"SnapshotLog: no version $v at $root"))
      case (None, Some(ts)) =>
        snaps.filter(_.commitTsMs <= ts).lastOption.getOrElse(
          throw new NoSuchElementException(
            s"SnapshotLog: no snapshot at or before ts $ts at $root"))
      case _ => snaps.last
    }
  }

  /** Read a snapshot: the latest, a pinned version, or AS-OF a timestamp
    * (largest commitTsMs <= asOfTsMs — Iceberg's timestamp-travel rule).
    * mergeSchema unions the column sets across data files, so versions
    * written before an additive schema change read the new column as null
    * — the reference's schema-evolution read semantics. */
  def read(spark: SparkSession, root: String,
           asOfVersion: Option[Int] = None,
           asOfTsMs: Option[Long] = None): DataFrame = {
    val snap = pick(spark, root, asOfVersion, asOfTsMs)
    if (snap.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        DataType.fromJson(snap.schemaJson).asInstanceOf[StructType])
    else
      spark.read.option("mergeSchema", "true").parquet(snap.files: _*)
  }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String) => x.compareTo(y)
    case _ =>
      val dx = a match { case n: Number => n.doubleValue(); case _ => a.toString.toDouble }
      val dy = b match { case n: Number => n.doubleValue(); case _ => b.toString.toDouble }
      java.lang.Double.compare(dx, dy)
  }

  /** Stats-pruned range read: open only the files whose recorded
    * [min, max] for `colName` intersects [lo, hi], then apply the exact
    * residual filter — Iceberg's manifest-level data skipping. Files
    * without a recorded stat for the column are kept (conservative). For
    * a timestamp column, pass `lo`/`hi` as epoch-MICROSECOND longs (the
    * unit the manifest records); the residual filter compares real
    * timestamps so Catalyst still pushes it into the kept scans. At
    * 100 TB this is THE scan-pruning mechanism: a time- or key-clustered
    * table answers a range probe by opening a handful of files, decided
    * entirely from driver-side manifest metadata — the "shard keyless
    * interval joins by time range" routing from the events scale study is
    * exactly a probe of this form. */
  def readPruned(spark: SparkSession, root: String, colName: String,
                 lo: Any, hi: Any, asOfVersion: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, timestamp_micros}
    val snap = pick(spark, root, asOfVersion, None)
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val isTs = schema.find(_.name == colName).exists(f =>
      f.dataType == TimestampType || f.dataType == TimestampNTZType)
    val kept = snap.files.filter { f =>
      snap.stats.get(norm(f)).flatMap(_.get(colName)) match {
        case Some((mn, mx)) => cmp(mx, lo) >= 0 && cmp(mn, hi) <= 0
        case None => true
      }
    }
    val base =
      if (kept.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.option("mergeSchema", "true").parquet(kept: _*)
    if (isTs) {
      val c = col(colName).cast("timestamp")
      base.filter(c >= timestamp_micros(lit(lo)) && c <= timestamp_micros(lit(hi)))
    } else
      base.filter(col(colName) >= lit(lo) && col(colName) <= lit(hi))
  }

  /** Expire snapshots older than `keepFromVersion`: delete their
    * manifests, then delete every data file referenced ONLY by expired
    * snapshots (Iceberg's expire_snapshots + orphan cleanup in one step —
    * append commits share files across versions, so liveness is computed
    * against the union of surviving manifests, never per-snapshot).
    * Time travel to an expired version then fails by construction; the
    * kept versions are untouched. Returns (manifests, dataFiles) deleted.
    * Driver-side metadata work only — file counts, not data volume. */
  def expireSnapshots(spark: SparkSession, root: String,
                      keepFromVersion: Int): (Int, Int) = {
    val snaps = snapshots(spark, root)
    val (dead, live) = snaps.partition(_.version < keepFromVersion)
    require(live.nonEmpty, s"SnapshotLog: expiring every snapshot at $root")
    if (dead.isEmpty) return (0, 0)
    val fs = fsFor(spark, new Path(root))
    val liveFiles = live.flatMap(_.files).map(norm).toSet
    val orphaned = dead.flatMap(_.files).map(norm).distinct
      .filterNot(liveFiles.contains)
    orphaned.foreach(f => fs.delete(new Path(f), false))
    dead.foreach(s => fs.delete(manifestPath(root, s.version), false))
    (dead.size, orphaned.size)
  }

  /** DESCRIBE HISTORY analog: the snapshot log itself as a DataFrame
    * (version, operation, commit_ts_ms, n_files) — metadata only. */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    snapshots(spark, root)
      .map(s => (s.version, s.operation, s.commitTsMs, s.files.size.toLong))
      .toDF("version", "operation", "commit_ts_ms", "n_files")
  }

  /** MERGE INTO a snapshot table (Iceberg's copy-on-write MERGE): run the
    * MergeInto row semantics against the CURRENT snapshot and commit the
    * result as the next overwrite snapshot. The read is manifest-pinned,
    * so a concurrent commit between read and publish surfaces as the
    * commit conflict rather than silently merging into stale data. */
  def mergeCommit(root: String, source: DataFrame, key: String,
                  cols: Seq[String],
                  whenMatched: String => org.apache.spark.sql.Column,
                  whenNotMatched: String => org.apache.spark.sql.Column,
                  deleteNotMatchedBySource: Boolean,
                  commitTsMs: Long): Int = {
    val spark = source.sparkSession
    val merged = graft.operators.MergeInto.merge(
      read(spark, root), source, key, cols,
      whenMatched, whenNotMatched, deleteNotMatchedBySource)
    commit(merged, root, overwrite = true, commitTsMs)
  }

  /** EXTERNAL_TABLE_FILES analog (reference
    * TableFunctionOperatorTable.java:158): the file inventory of a snapshot
    * as a DataFrame — metadata only (manifest + one FS stat per file), no
    * data scan. Columns: file_path, size_bytes, version. */
  def tableFiles(spark: SparkSession, root: String,
                 asOfVersion: Option[Int] = None): DataFrame = {
    val snap = pick(spark, root, asOfVersion, None)
    val fs = fsFor(spark, new Path(root))
    val rows = snap.files.map { f =>
      (f, fs.getFileStatus(new Path(f)).getLen, snap.version)
    }
    import spark.implicits._
    rows.toDF("file_path", "size_bytes", "version")
  }
}
