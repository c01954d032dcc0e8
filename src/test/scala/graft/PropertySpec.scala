package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark.spark
import graft.text.TextKernels

/** Property-style checks of the hand-rolled distributed algorithms against
  * trivially-correct in-memory references: whatever invariant the Spark
  * implementation claims, a brute-force Scala implementation must agree on
  * arbitrary inputs — not just the fixture. Inputs are drawn from a seeded
  * RNG so failures reproduce.
  */
class PropertySpec extends AnyFunSuite {

  // -- ConnectedComponents vs brute-force union-find ------------------------

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map((0L until n.toLong).map(i => i -> i): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    for ((a, b) <- edges) parent(find(a)) = find(b)
    val byRoot = (0L until n.toLong).groupBy(find)
    byRoot.values.flatMap(ids => ids.map(_ -> ids.min)).toMap
  }

  test("ConnectedComponents agrees with union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 6) {
      val n = 1 + rnd.nextInt(24)
      val m = rnd.nextInt(31)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val nodes = (0L until n.toLong).toDF("id")
      val e = if (edges.isEmpty) Seq((0L, 0L)) else edges // self-loop stands in for empty
      val got = graft.operators.ConnectedComponents
        .run(nodes, e.toDF("src", "dst")).as[(Long, Long)].collect().toMap
      assert(got === unionFind(n, edges), s"n=$n edges=$edges")
    }
  }

  // -- shingles() vs naive sliding window -----------------------------------

  test("shingles() matches the naive sliding window for any token list") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "bb", "ccc", "dd", "ff")
    for (_ <- 1 to 10) {
      val k = rnd.nextInt(13)
      val ws = Seq.fill(k)(vocab(rnd.nextInt(vocab.size)))
      val n = 1 + rnd.nextInt(4)
      val got = Seq(ws.mkString(" "))
        .toDF("text")
        .select(TextKernels.shingles(split(col("text"), " "), n).as("g"))
        .as[Seq[String]].head()
      // "" splits to [""] — a 1-token list of the empty string, not 0 tokens
      val ref =
        if (ws.isEmpty) { if (n == 1) Seq("") else Seq.empty[String] }
        else if (ws.size < n) Seq.empty[String]
        else ws.sliding(n).map(_.mkString(" ")).toSeq
      assert(got === ref, s"ws=$ws n=$n")
    }
  }

  test("ConnectedComponents collapses a 200-node path within the round budget") {
    // diameter 199 >> maxIter: only the pointer-doubling step makes this
    // converge (O(log n) rounds); without it the loop would silently
    // mislabel the tail of the chain.
    import spark.implicits._
    val n = 200L
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val got = graft.operators.ConnectedComponents.run(nodes, edges)
      .as[(Long, Long)].collect()
    assert(got.length === n)
    assert(got.forall(_._2 == 0L), "path did not collapse to a single component")
  }

  // -- native as-of join vs brute force on random series --------------------

  test("AsofJoinExec matches brute force for all directions and tolerance") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val probes = Seq.fill(60)(
        (rnd.nextInt(4).toLong, rnd.nextInt(200).toLong)).zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
      val quotes = Seq.fill(40)((rnd.nextInt(4).toLong, rnd.nextInt(200).toLong))
        .distinct.map { case (k, t) => (k, t, k * 1000 + t) }
      val pDf = probes.toDF("pid", "pk", "pt").repartition(5)
      val qDf = quotes.toDF("qk", "qt", "qv").repartition(3)
      for (dir <- Seq("backward", "forward", "nearest");
           tol <- Seq(None, Some(15L))) {
        val got = graft.plans.Asof
          .join(pDf, qDf, "pk", "qk", "pt", "qt", dir, tol)
          .select(col("pid"), col("qv")).collect()
          .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
          .toMap
        val expected = probes.map { case (pid, pk, pt) =>
          val cand = quotes.filter(_._1 == pk)
          val pick = dir match {
            case "backward" => cand.filter(_._2 <= pt).sortBy(_._2).lastOption
            case "forward"  => cand.filter(_._2 >= pt).sortBy(_._2).headOption
            case "nearest"  =>
              val b = cand.filter(_._2 <= pt).sortBy(_._2).lastOption
              val f = cand.filter(_._2 >= pt).sortBy(_._2).headOption
              (b, f) match {
                case (Some(x), Some(y)) =>
                  if (pt - x._2 <= y._2 - pt) Some(x) else Some(y) // backward wins ties
                case (x, y) => x.orElse(y)
              }
          }
          val kept = pick.filter(q => tol.forall(tl => math.abs(q._2 - pt) <= tl))
          pid -> kept.map(_._3)
        }.toMap
        assert(got === expected, s"trial=$trial dir=$dir tol=$tol")
      }
    }
  }

  test("AsofJoinExec multi-column by-groups match brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      val probes = Seq.fill(60)(
        (rnd.nextInt(3).toLong, rnd.nextInt(3).toLong, rnd.nextInt(200).toLong))
        .zipWithIndex.map { case ((k1, k2, t), i) => (i.toLong, k1, k2, t) }
      val quotes = Seq.fill(50)(
        (rnd.nextInt(3).toLong, rnd.nextInt(3).toLong, rnd.nextInt(200).toLong))
        .distinct.map { case (k1, k2, t) => (k1, k2, t, k1 * 10000 + k2 * 1000 + t) }
      val pDf = probes.toDF("pid", "pk1", "pk2", "pt").repartition(5)
      val qDf = quotes.toDF("qk1", "qk2", "qt", "qv").repartition(3)
      for (dir <- Seq("backward", "forward", "nearest"); tol <- Seq(None, Some(20L))) {
        val got = graft.plans.Asof
          .joinBy(pDf, qDf, Seq("pk1", "pk2"), Seq("qk1", "qk2"), "pt", "qt", dir, tol)
          .select(col("pid"), col("qv")).collect()
          .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
          .toMap
        val expected = probes.map { case (pid, pk1, pk2, pt) =>
          val cand = quotes.filter(q => q._1 == pk1 && q._2 == pk2)
          val pick = dir match {
            case "backward" => cand.filter(_._3 <= pt).sortBy(_._3).lastOption
            case "forward"  => cand.filter(_._3 >= pt).sortBy(_._3).headOption
            case "nearest"  =>
              val b = cand.filter(_._3 <= pt).sortBy(_._3).lastOption
              val f = cand.filter(_._3 >= pt).sortBy(_._3).headOption
              (b, f) match {
                case (Some(x), Some(y)) =>
                  if (pt - x._3 <= y._3 - pt) Some(x) else Some(y)
                case (x, y) => x.orElse(y)
              }
          }
          val kept = pick.filter(q => tol.forall(tl => math.abs(q._3 - pt) <= tl))
          pid -> kept.map(_._4)
        }.toMap
        assert(got === expected, s"trial=$trial dir=$dir tol=$tol")
      }
    }
  }

  // -- native interval join vs brute force on random ranges -----------------

  test("sfFormatToSpark: random token/literal mixes format piecewise-correctly") {
    // Build random Snowflake formats from tokens (random case) and
    // double-quoted literals (incl. ""-escapes and apostrophes), translate,
    // format a fixed instant through java.time, and compare against the
    // concatenation of each piece formatted independently — the definition
    // of a correct translation. Unrecognized bare letters must throw.
    import java.time.LocalDateTime
    import java.time.format.DateTimeFormatter
    import java.util.Locale
    import graft.functions.SnowflakeFns.sfFormatToSpark
    val t = LocalDateTime.of(1997, 3, 9, 14, 7, 5)
    val pieces: Seq[(String, String)] = Seq( // sf token -> expected rendering
      "YYYY" -> "1997", "YY" -> "97", "MMMM" -> "March", "MON" -> "Mar",
      "MM" -> "03", "DD" -> "09", "DY" -> "Sun", "HH24" -> "14",
      "HH12" -> "02", "MI" -> "07", "SS" -> "05", "AM" -> "PM", "PM" -> "PM")
    val literals = Seq("year" -> "year", "it's" -> "it's", "q\"\"x" -> "q\"x",
      " - " -> " - ", "" -> "", "T" -> "T", "123" -> "123")
    val rnd = new scala.util.Random(7)
    def randCase(s: String) =
      s.map(c => if (rnd.nextBoolean()) c.toLower else c.toUpper)
    for (_ <- 1 to 40) {
      val parts = Seq.fill(1 + rnd.nextInt(6)) {
        if (rnd.nextBoolean()) {
          val (tok, out) = pieces(rnd.nextInt(pieces.length))
          (randCase(tok), out)
        } else {
          val (raw, out) = literals(rnd.nextInt(literals.length))
          ("\"" + raw + "\"", out)
        }
      }
      // separate adjacent tokens so concatenation can't form a longer token
      // (e.g. MM + MM must not re-parse as MMMM)
      val fmt = parts.map(_._1).mkString(":")
      val expected = parts.map(_._2).mkString(":")
      val got = DateTimeFormatter.ofPattern(sfFormatToSpark(fmt), Locale.US).format(t)
      assert(got === expected, s"fmt='$fmt' -> pattern='${sfFormatToSpark(fmt)}'")
    }
    intercept[IllegalArgumentException](sfFormatToSpark("YYYY-Q"))
    intercept[IllegalArgumentException](sfFormatToSpark("\"unterminated"))
  }

  test("FROM_PARTS rollover matches java.time arithmetic on random parts") {
    import spark.implicits._
    import graft.functions.SnowflakeFns._
    val rnd = new scala.util.Random(20260813)
    val rows = Seq.fill(300)((
      1980 + rnd.nextInt(50), rnd.nextInt(71) - 30, rnd.nextInt(301) - 100,
      rnd.nextInt(151) - 50, rnd.nextInt(501) - 200, rnd.nextInt(201) - 100,
      rnd.nextLong() % 300000000000000L))
    val df = rows.toDF("y", "mo", "d", "h", "mi", "s", "ns").repartition(4)
    val got = df.select(
      col("y"), col("mo"), col("d"), col("h"), col("mi"), col("s"), col("ns"),
      dateFromParts(col("y"), col("mo"), col("d")).cast("string").as("dfp"),
      timestampFromParts(col("y"), col("mo"), col("d"), col("h"), col("mi"),
        col("s")).cast("string").as("tfp"),
      timeFromPartsNs(col("h"), col("mi"), col("s"), col("ns")).as("tns"))
      .collect()
    for (r <- got) {
      val (y, mo, d, h, mi, s, ns) = (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getInt(4), r.getInt(5), r.getLong(6))
      // reference semantics (date_from_parts_util:2192): months carry into
      // years from January of y, then days offset from the 1st
      val date = java.time.LocalDate.of(y, 1, 1)
        .plusMonths(mo - 1L).plusDays(d - 1L)
      assert(r.getString(7) === date.toString, s"dfp($y,$mo,$d)")
      val ts = date.atStartOfDay()
        .plusSeconds(h * 3600L + mi * 60L + s)
      // Spark renders "yyyy-MM-dd HH:mm:ss"; LocalDateTime "yyyy-MM-ddTHH:mm[:ss]"
      val expTs = f"${ts.toLocalDate}%s ${ts.getHour}%02d:${ts.getMinute}%02d:${ts.getSecond}%02d"
      assert(r.getString(8) === expTs, s"tfp($y,$mo,$d,$h,$mi,$s)")
      val expNs = java.lang.Math.floorMod(
        (h * 3600L + mi * 60L + s) * 1000000000L + ns, 86400000000000L)
      assert(r.getLong(9) === expNs, s"tns($h,$mi,$s,$ns)")
    }
  }

  test("ns-grain kernels (fn_datetime8) match java.time on random timestamps") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814)
    // ~63 years of epoch-µs, non-negative (the query's % contract)
    val rows = Seq.fill(300)(math.abs(rnd.nextLong() % 2000000000000000L))
    val df = rows.toDF("us").repartition(4)
    val got = df.select(col("us"),
      expr("pmod(unix_micros(timestamp_micros(us)), 1000000) div 1000").as("gms"),
      expr("pmod(unix_micros(timestamp_micros(us)), 1000000)").as("gus"),
      expr("timestampdiff(MICROSECOND, timestamp_micros(us), " +
        "timestamp'1995-06-17 00:00:00') * 1000").as("dns"),
      expr("cast((1995 * 4 + 2) - (year(timestamp_micros(us)) * 4 " +
        "+ quarter(timestamp_micros(us))) as long)").as("dq"))
      .collect()
    val refUs = java.time.LocalDateTime.of(1995, 6, 17, 0, 0)
      .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L
    for (r <- got) {
      val us = r.getLong(0)
      val ldt = java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
      assert(r.getLong(1) === ldt.getNano / 1000000L, s"get_ms($us)")
      assert(r.getLong(2) === ldt.getNano / 1000L, s"get_us($us)")
      assert(r.getLong(3) === (refUs - us) * 1000L, s"diff_ns($us)")
      // Snowflake DATEDIFF(quarter) counts quarter-boundary crossings =
      // difference of (year*4 + quarter) ordinals
      val dq = (1995 * 4 + 2) - (ldt.getYear * 4 + ((ldt.getMonthValue - 1) / 3 + 1))
      assert(r.getLong(4) === dq.toLong, s"diff_q($us)")
    }
  }

  test("IntervalJoinExec matches brute force on random points and intervals") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val points = Seq.fill(50)(rnd.nextInt(100).toLong).zipWithIndex
        .map { case (t, i) => (t, i.toLong) }
      val ivs = Seq.fill(20) {
        val a = rnd.nextInt(100).toLong; val b = a + 1 + rnd.nextInt(30)
        (a, b, s"iv${rnd.nextInt(1000)}")
      }.distinct
      val pDf = points.toDF("pt", "pid").repartition(4)
      val iDf = ivs.toDF("t0", "t1", "iv").repartition(3)
      for (si <- Seq(true, false); ei <- Seq(true, false)) {
        val got = graft.plans.Interval
          .join(pDf, iDf, "pt", "t0", "t1", si, ei)
          .select(col("pid"), col("iv")).collect()
          .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
        val expected = (for {
          (t, pid) <- points
          (a, b, iv) <- ivs
          if (if (si) t >= a else t > a) && (if (ei) t <= b else t < b)
        } yield (pid, iv)).sorted
        assert(got === expected, s"trial=$trial si=$si ei=$ei")
      }
    }
  }

  // -- MergeInto vs brute-force merge on random tables ----------------------

  test("MergeInto matches a brute-force merge on random target/source tables") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    for (trial <- 1 to 4; del <- Seq(true, false)) {
      val target = Seq.fill(30)((rnd.nextInt(40).toLong, rnd.nextInt(100).toLong))
        .distinctBy(_._1)
      val source = Seq.fill(20)((rnd.nextInt(40).toLong, rnd.nextInt(100).toLong))
        .distinctBy(_._1)
      val got = graft.operators.MergeInto.merge(
          target.toDF("k", "v").repartition(4),
          source.toDF("k", "v").repartition(3),
          "k", Seq("v"),
          whenMatched = c => col(s"s_$c") + col(s"t_$c"), // update: sum both sides
          whenNotMatched = c => col(s"s_$c"),             // insert: source value
          deleteNotMatchedBySource = del)
        .as[(Long, Long)].collect().sorted.toSeq
      val tm = target.toMap
      val sm = source.toMap
      val expected = ((tm.keySet ++ sm.keySet).toSeq.flatMap { k =>
        (tm.get(k), sm.get(k)) match {
          case (Some(tv), Some(sv)) => Some(k -> (tv + sv)) // matched: update
          case (None, Some(sv))     => Some(k -> sv)        // source-only: insert
          case (Some(tv), None)     => if (del) None else Some(k -> tv)
          case (None, None)         => None
        }
      }).sorted
      assert(got === expected, s"trial=$trial delete=$del")
    }
  }

  test("MergeInto raises on ambiguous source keys") {
    import spark.implicits._
    val target = Seq((1L, 10L)).toDF("k", "v")
    val dupSource = Seq((1L, 1L), (1L, 2L)).toDF("k", "v")
    val ex = intercept[Exception] {
      graft.operators.MergeInto.merge(target, dupSource, "k", Seq("v"),
        c => col(s"s_$c"), c => col(s"s_$c"), deleteNotMatchedBySource = false)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("multiple source rows match")),
      s"unexpected error: ${messages(ex).mkString(" | ")}")
  }

  // -- Misra-Gries candidate guarantee on random skewed streams -------------

  test("mg_topk_candidates contains every item above the N/(cap+1) guarantee") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    for (trial <- 1 to 4) {
      // zipf-ish stream over a vocabulary larger than the sketch capacity
      val vocabN = 40
      val items = Seq.fill(3000) {
        val r = rnd.nextDouble()
        val id = if (r < 0.3) 0 else if (r < 0.45) 1 else rnd.nextInt(vocabN)
        s"tok$id"
      }
      val cap = 8
      val n = items.size
      val exact = items.groupBy(identity).view.mapValues(_.size).toMap
      val mustFind = exact.filter { case (_, c) => c > n / (cap + 1) }.keySet
      val cands = items.toDF("w").repartition(7)
        .selectExpr(s"mg_topk_candidates(w, $cap) AS c")
        .as[Seq[String]].head().toSet
      assert(cands.size <= cap, s"trial=$trial sketch overflowed: ${cands.size}")
      assert(mustFind.subsetOf(cands),
        s"trial=$trial missed guaranteed heavy hitters: ${mustFind -- cands}")
    }
  }

  // -- sorted-run max == max element frequency (text_repetition kernel) -----

  test("longest equal-run of a sorted array equals the max element frequency") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("x", "y", "z", "w", "u")
    for (_ <- 1 to 10) {
      val items = Seq.fill(rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
      val expected =
        if (items.isEmpty) 0L
        else items.groupBy(identity).values.map(_.size).max.toLong
      val run = (acc: org.apache.spark.sql.Column, x: org.apache.spark.sql.Column) =>
        when(x === acc.getField("prev"), acc.getField("run") + 1).otherwise(lit(1L))
      val got = Seq(items).toDF("g")
        .select(aggregate(
          array_sort(col("g")),
          struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
          (acc, x) => struct(
            x.as("prev"), run(acc, x).as("run"),
            greatest(acc.getField("best"), run(acc, x)).as("best"))
        ).getField("best").as("best"))
        .as[Long].head()
      assert(got === expected, s"items=$items")
    }
  }

  test("hidden-partition pruning is result-invariant for random probes") {
    // the DSv2 scan may SKIP files via bucket/truncate/day tuples, never
    // change results: for random data and random predicates, the pruned
    // read must equal the same predicate over a plain in-memory copy
    import spark.implicits._
    import graft.sources.SnapshotLog
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 4) {
      val spec = Seq(
        Seq("k" -> s"bucket[${2 + rnd.nextInt(6)}]"),
        Seq("k" -> s"truncate[${1 + rnd.nextInt(30)}]"),
        Seq("s" -> "truncate[1]"),
        Seq("k" -> "identity"))(trial - 1)
      val root = s"/tmp/graft_prop_part/t$trial"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val rows = (0 until 300).map { _ =>
        (rnd.nextInt(100).toLong, ('a' + rnd.nextInt(5)).toChar.toString +
          rnd.nextInt(10))
      }
      val df = rows.toDF("k", "s")
      SnapshotLog.commitPartitioned(df, root, spec, overwrite = true, 100L)
      val t = spark.read.format("snapshotlog").load(root)
      for (_ <- 1 to 8) {
        val (a, b) = (rnd.nextInt(100).toLong, rnd.nextInt(100).toLong)
        val preds = Seq(
          col("k") === a,
          col("k").isin(a, b),
          col("k") >= math.min(a, b) && col("k") <= math.max(a, b),
          col("s") === ('a' + rnd.nextInt(5)).toChar.toString + rnd.nextInt(10),
          col("s") >= "c")
        val p = preds(rnd.nextInt(preds.length))
        val got = t.filter(p).as[(Long, String)].collect().sorted.toSeq
        val want = df.filter(p).as[(Long, String)].collect().sorted.toSeq
        assert(got === want, s"trial=$trial spec=$spec pred=$p")
      }
    }
  }
}
