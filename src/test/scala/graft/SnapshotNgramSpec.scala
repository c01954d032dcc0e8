package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark
import graft.sources.{SnapshotLog, SnapshotNgramBlooms}

/** Per-file character-trigram blooms for SUBSTRING-search file skipping
  * (the ClickHouse ngrambf_v1 idea as snapshot-log sidecars).
  *
  * The scenario neither min/max stats nor value blooms can serve:
  * `WHERE contains(text, 'needle')` — the needle is a substring of a
  * cell, not a cell value, so equality machinery proves nothing. The
  * trigram bloom proves "no cell in this file contains the needle" when
  * any trigram of the needle is absent. */
class SnapshotNgramSpec extends AnyFunSuite {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val root = s"/tmp/graft_ngram_spec/$tag"
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(root), true)
    root
  }

  private def filesPlanned(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan.asInstanceOf[graft.sources.SnapshotLogScan].keptFiles.size
    }.head

  /** 4 commits × 2 files of synthetic prose; docs 7 and 4003 carry rare
    * marker substrings (one per commit quadrant). */
  private def buildCorpus(root: String, withNgrams: Boolean): Unit = {
    val df = spark.range(0, 8000).selectExpr(
      "id",
      """concat('alpha beta gamma delta text number ', cast(id AS string),
         CASE WHEN id = 7 THEN ' zebraquuxmarker' ELSE '' END,
         CASE WHEN id = 4003 THEN ' höllenwörter' ELSE '' END) AS text""")
    SnapshotLog.commit(df.filter("id % 4 = 0"), root, overwrite = true, 100L, 2)
    if (withNgrams)
      SnapshotLog.setTableProps(spark, root,
        Map("write.ngrambloom.columns" -> "text"))
    for (i <- 1 to 3)
      SnapshotLog.commit(df.filter(s"id % 4 = $i"), root, overwrite = false,
        100L * (i + 1), 2)
  }

  test("contains() prunes files whose trigram bloom lacks a needle trigram") {
    val root = freshRoot("contains")
    buildCorpus(root, withNgrams = true)
    val t = spark.read.format("snapshotlog").load(root)
    assert(t.count() === 8000)

    // miss: a needle whose trigrams exist nowhere — all 6 covered files
    // pruned, only the 2 property-less v1 files stay (conservative)
    val miss = t.filter(col("text").contains("qqqzzzvvv"))
    assert(filesPlanned(miss) <= 2,
      s"miss should prune all covered files, planned ${filesPlanned(miss)}/8")
    assert(miss.count() === 0)

    // hit: the marker lives in ONE file of commit 4 (7 % 4 = 3) — that
    // file plus the 2 uncovered v1 files survive
    val hit = t.filter(col("text").contains("zebraquuxmarker"))
    assert(filesPlanned(hit) <= 3,
      s"hit should keep ~1 covered file, planned ${filesPlanned(hit)}")
    assert(hit.select("id").as[Long].collect().toSeq === Seq(7L))

    // control: same layout without the property keeps every file
    val root2 = freshRoot("contains_ctl")
    buildCorpus(root2, withNgrams = false)
    val ctl = spark.read.format("snapshotlog").load(root2)
      .filter(col("text").contains("qqqzzzvvv"))
    assert(filesPlanned(ctl) === 8,
      "without ngram blooms a substring probe keeps every file")
  }

  test("LIKE / startsWith / endsWith / equality shapes all prune; short " +
       "needles and non-covered columns keep everything") {
    val root = freshRoot("shapes")
    buildCorpus(root, withNgrams = true)
    val t = spark.read.format("snapshotlog").load(root)

    // LIKE '%x%' reaches the scan as StringContains
    assert(filesPlanned(t.filter(col("text").like("%qqqzzzvvv%"))) <= 2)
    // prefix / suffix / equality: the literal is a substring of any match
    assert(filesPlanned(t.filter(col("text").startsWith("qqqzzzvvv"))) <= 2)
    assert(filesPlanned(t.filter(col("text").endsWith("qqqzzzvvv"))) <= 2)
    assert(filesPlanned(t.filter(col("text") === "qqqzzzvvv absent row")) <= 2)
    // a 2-char needle carries no trigram evidence — keep all files
    assert(filesPlanned(t.filter(col("text").contains("qq"))) === 8)
    // substring probe on an untagged column keeps all files
    assert(filesPlanned(t.filter(col("id").cast("string").contains("999"))) === 8)
    // AND composes (either side may prune); OR needs both sides to prune
    assert(filesPlanned(t.filter(col("text").contains("qqqzzzvvv") &&
      col("id") > 0)) <= 2)
    assert(filesPlanned(t.filter(col("text").contains("qqqzzzvvv") ||
      col("text").contains("zebraquuxmarker"))) <= 3)
  }

  test("matching is exact-case and code-point-based (multi-byte needles)") {
    val root = freshRoot("unicode")
    buildCorpus(root, withNgrams = true)
    val t = spark.read.format("snapshotlog").load(root)
    // multi-byte marker: build windows count code points; probe must agree
    val hit = t.filter(col("text").contains("höllenwörter"))
    assert(filesPlanned(hit) <= 3,
      s"unicode hit planned ${filesPlanned(hit)}")
    assert(hit.select("id").as[Long].collect().toSeq === Seq(4003L))
    // contains() is case-sensitive: the upper-case probe finds nothing,
    // and the trigram bloom (built raw) prunes it as a miss
    val cased = t.filter(col("text").contains("ZEBRAQUUXMARKER"))
    assert(filesPlanned(cased) <= 2)
    assert(cased.count() === 0)
    // probe windows really are code-point windows
    assert(SnapshotNgramBlooms.probeGrams("höllo").map(_.toString) ===
      Seq("höl", "öll", "llo"))
  }

  test("sidecars survive DML and time travel; expiry reclaims dead ones") {
    val root = freshRoot("dml")
    buildCorpus(root, withNgrams = true)
    // MoR delete of the marker row: the file keeps its bloom (false
    // positives are fine — the residual filter applies)
    SnapshotLog.deleteWhereMoR(spark, root, col("id") === 7L, 1000L)
    val t = spark.read.format("snapshotlog").load(root)
    val gone = t.filter(col("text").contains("zebraquuxmarker"))
    assert(gone.count() === 0, "deleted row must not resurface")
    // time travel to before the delete still finds it, still pruned
    val v4 = spark.read.format("snapshotlog").option("asOfVersion", 4)
      .load(root).filter(col("text").contains("zebraquuxmarker"))
    assert(filesPlanned(v4) <= 3)
    assert(v4.select("id").as[Long].collect().toSeq === Seq(7L))
    // overwrite everything, expire: the old files' sidecars are reclaimed
    val v6 = SnapshotLog.commit(spark.range(0, 10).selectExpr("id",
      "concat('fresh ', cast(id AS string)) AS text"),
      root, overwrite = true, 2000L)
    SnapshotLog.expireSnapshots(spark, root, keepFromVersion = v6)
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val left = fs.listStatus(new Path(root, "ngrams"))
      .count(_.getPath.getName.endsWith(".json"))
    assert(left === 1,
      s"expiry must reclaim sidecars of dead files (left $left; the " +
        "overwrite commit's own sidecar survives)")
  }

  test("property: pruning never changes results — 30 random present " +
       "needles return exactly the control rows, 10 absent return none") {
    val root = freshRoot("prop")
    val rnd = new scala.util.Random(181818L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "query", "table",
      "window", "merge", "vector", "stream", "filter", "batch", "höllen",
      "数据", "café")
    val docs = (0 until 4000).map { i =>
      (i.toLong, (0 until 12).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    val df = spark.createDataFrame(docs).toDF("id", "text")
    SnapshotLog.commit(df.filter(col("id") % 2 === 0), root,
      overwrite = true, 100L, 4)
    SnapshotLog.setTableProps(spark, root,
      Map("write.ngrambloom.columns" -> "text"))
    SnapshotLog.commit(df.filter(col("id") % 2 === 1), root,
      overwrite = false, 200L, 4)
    val t = spark.read.format("snapshotlog").load(root)
    // present needles: random substrings of random docs (any length 3-12,
    // arbitrary alignment — including multi-byte and cross-word slices)
    val present = (0 until 30).map { _ =>
      val d = docs(rnd.nextInt(docs.size))._2
      val a = rnd.nextInt(math.max(1, d.length - 4))
      d.substring(a, math.min(d.length, a + 3 + rnd.nextInt(10)))
    }
    for (needle <- present) {
      val got = t.filter(col("text").contains(needle))
        .select("id").as[Long].collect().toSet
      val want = docs.filter(_._2.contains(needle)).map(_._1).toSet
      assert(got === want, s"needle '$needle' lost rows through pruning")
      assert(want.nonEmpty)
    }
    // absent needles: random strings over an alphabet disjoint enough to
    // never occur — count must be 0 (and pruning must not throw)
    for (_ <- 0 until 10) {
      val needle = (0 until 5 + rnd.nextInt(6))
        .map(_ => ('0' + rnd.nextInt(10)).toChar).mkString("q", "", "z")
      assert(t.filter(col("text").contains(needle)).count() === 0L)
    }
  }

  test("gram knob (write.ngrambloom.gram=4): 4-gram sidecars build, " +
       "probe per-sidecar gram, and mixed-gram histories stay sound") {
    val root = freshRoot("gram4")
    val df = spark.range(0, 4000).selectExpr(
      "id",
      """concat('alpha beta gamma delta text number ', cast(id AS string),
         CASE WHEN id = 7 THEN ' zebraquuxmarker' ELSE '' END) AS text""")
    // v1 files: default trigram sidecars
    SnapshotLog.commit(df.filter("id % 2 = 0"), root, overwrite = true, 100L, 2)
    SnapshotLog.setTableProps(spark, root,
      Map("write.ngrambloom.columns" -> "text"))
    // backfill v1 under gram 3, then switch the knob: LATER files carry
    // gram-4 sidecars while v1 keeps its gram-3 ones — per-sidecar gram
    SnapshotLog.rebuildFileIndexes(spark, root)
    SnapshotLog.setTableProps(spark, root,
      Map("write.ngrambloom.gram" -> "4"))
    SnapshotLog.commit(df.filter("id % 2 = 1"), root, overwrite = false,
      200L, 2)
    val entries = SnapshotNgramBlooms.ngramsAt(root)("text")
    assert(entries.values.map(_._1).toSet === Set(3, 4),
      "history must carry BOTH gram sizes after the knob change")
    val t = spark.read.format("snapshotlog").load(root)
    // a long miss needle prunes EVERY covered file under both grams
    val miss = t.filter(col("text").contains("qqqzzzvvvwww"))
    assert(filesPlanned(miss) === 0, s"planned ${filesPlanned(miss)}")
    // the hit needle keeps its one file (id=7 is odd... id=7 % 2 = 1 →
    // second commit, gram-4 covered)
    val hit = t.filter(col("text").contains("zebraquuxmarker"))
    assert(filesPlanned(hit) <= 2)
    assert(hit.count() === 1)
    // a 3-char needle carries no evidence for gram-4 files (kept) but
    // still prunes gram-3 files lacking it: results stay exact
    val short3 = t.filter(col("text").contains("xqz"))
    assert(short3.count() === 0)
    assert(filesPlanned(short3) <= 2,
      "gram-3 sidecars must still prune the 3-char miss; only gram-4 " +
        s"files are kept (planned ${filesPlanned(short3)})")
    // property: random present needles keep their rows under mixed grams
    val sample = df.selectExpr("substring(text, 14, 9) AS ndl").limit(5)
      .collect().map(_.getString(0))
    for (n <- sample)
      assert(t.filter(col("text").contains(n)).count() ===
        df.filter(col("text").contains(n)).count())
  }

  test("the .ngrams metadata table inventories live (file, column) blooms") {
    val ns = "ngram_meta"
    spark.sql(s"DROP TABLE IF EXISTS snap.$ns.t")
    val fs = new Path("/tmp/graft_snap_warehouse")
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(s"/tmp/graft_snap_warehouse/$ns"), true)
    spark.sql(s"CREATE TABLE snap.$ns.t AS " +
      "SELECT id, concat('doc text ', cast(id AS string)) AS text " +
      "FROM range(0, 100)")
    val root = s"/tmp/graft_snap_warehouse/$ns/t"
    SnapshotLog.setTableProps(spark, root,
      Map("write.ngrambloom.columns" -> "text"))
    spark.sql(s"INSERT INTO snap.$ns.t " +
      "SELECT id, concat('doc text ', cast(id AS string)) FROM range(100, 200)")
    val rows = spark.table(s"snap.$ns.t.ngrams").collect()
    assert(rows.nonEmpty, "the INSERT's files must carry ngram blooms")
    assert(rows.forall(_.getString(1) == "text"))
    assert(rows.forall(_.getLong(2) >= 64L))
  }

  test("bits=auto sizes from measured gram diversity: same pruning as " +
       "the fixed default at 16x+ smaller sidecars on a low-diversity " +
       "column") {
    // low diversity: a small closed vocabulary — a few hundred distinct
    // trigrams, for which the 2^21-bit default is ~64x oversized
    def corpus = spark.range(0, 8000).selectExpr(
      "id",
      """concat('alpha beta gamma delta ', cast(id % 7 AS string),
         CASE WHEN id = 7 THEN ' zebraquuxmarker' ELSE '' END) AS text""")
    def build(root: String, bits: String): Unit = {
      SnapshotLog.commit(corpus.filter("id % 2 = 0"), root,
        overwrite = true, 100L, 2)
      SnapshotLog.setTableProps(spark, root,
        Map("write.ngrambloom.columns" -> "text",
          "write.ngrambloom.bits" -> bits))
      SnapshotLog.commit(corpus.filter("id % 2 = 1"), root,
        overwrite = false, 200L, 2)
    }
    val rootA = freshRoot("auto"); build(rootA, "auto")
    val rootF = freshRoot("auto_ctl"); build(rootF, (1L << 21).toString)
    def sidecarBytes(root: String): Long = {
      val dir = new Path(root, "ngrams")
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      fs.listStatus(dir).map(_.getLen).sum
    }
    val (aB, fB) = (sidecarBytes(rootA), sidecarBytes(rootF))
    assert(aB * 16 <= fB,
      s"auto sidecars must be >=16x smaller ($aB vs $fB bytes)")
    // identical pruning decisions on misses AND hits, identical results
    for (needle <- Seq("qqqzzzvvv", "zebraquuxmarker", "alpha beta")) {
      def probe(root: String) = spark.read.format("snapshotlog").load(root)
        .filter(col("text").contains(needle))
      assert(filesPlanned(probe(rootA)) === filesPlanned(probe(rootF)),
        s"auto and fixed must prune identically for '$needle'")
      assert(probe(rootA).count() === probe(rootF).count())
    }
    // and a HIGH-diversity column auto-sizes UP (>= 2^18 bits), so auto
    // never quietly under-sizes real text (hex is NOT diverse — 16^3 =
    // 4096 possible trigrams; base64's 64-char alphabet is)
    val rootH = freshRoot("auto_high")
    def soup = "concat(base64(unhex(md5(cast(id AS string)))), " +
      "base64(unhex(md5(cast(id * 7 AS string))))) AS text"
    SnapshotLog.commit(
      spark.range(0, 4000).selectExpr("id", soup),
      rootH, overwrite = true, 100L, 1)
    SnapshotLog.setTableProps(spark, rootH,
      Map("write.ngrambloom.columns" -> "text",
        "write.ngrambloom.bits" -> "auto"))
    SnapshotLog.commit(
      spark.range(4000, 8000).selectExpr("id", soup),
      rootH, overwrite = false, 200L, 1)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val dirH = new Path(rootH, "ngrams")
    val fsH = dirH.getFileSystem(spark.sessionState.newHadoopConf())
    val bitsH = fsH.listStatus(dirH).map { st =>
      val in = fsH.open(st.getPath)
      val buf = new Array[Byte](st.getLen.toInt)
      try in.readFully(0, buf) finally in.close()
      om.readTree(buf).get("colBits").get("text").asLong()
    }.max
    assert(bitsH >= (1L << 18),
      s"hex-soup text must auto-size up, got $bitsH bits")
  }
}
