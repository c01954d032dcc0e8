package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark.spark
import graft.functions.{JaroWinkler, ProductAgg, Uuid5}
import graft.llm.{EchoBackend, LlmFunctions}

/** Unit tests for the custom expressions and the LLM operator surface. */
class FunctionsSpec extends AnyFunSuite {

  test("ConnectedComponents labels chains transitively and keeps isolated nodes") {
    import spark.implicits._
    // 1-2-3-4 chain (1~3 never emitted), 5-6 pair, 7 isolated
    val nodes = (1L to 7L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("src", "dst")
    val got = graft.operators.ConnectedComponents.run(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("JaroWinkler matches reference values (incl. floor-halved transpositions)") {
    val cases = Seq(
      ("small ring", "small ring", 1.0),
      ("red widget", "small ring", 0.5333333333333333),
      ("old anvil", "small ring", 0.6444444444444444), // odd t -> floor
      ("small gizmo", "small ring", 0.8804545454545455), // winkler boost
      ("martha", "marhta", 0.9611111111111111),
      ("ax", "az", 0.6666666666666666), // jaro <= 0.7 -> no boost
      ("", "", 0.0),
      ("a", "", 0.0))
    for ((a, b, exp) <- cases)
      assert(JaroWinkler.similarity(a, b) === exp, s"jw($a, $b)")
  }

  test("jaro_winkler registers and evaluates as a column expression") {
    JaroWinkler.register(spark)
    import spark.implicits._
    val out = Seq(("martha", "marhta")).toDF("a", "b")
      .select(expr("jaro_winkler(a, b)")).as[Double].head()
    assert(out === 0.9611111111111111)
  }

  test("uuid5 matches RFC-4122 vectors (CPython uuid.uuid5 ground truth)") {
    // DuckDB 1.0 cannot oracle uuid5 — correctness is pinned here instead
    // (same precedent as JaroWinkler's value tests).
    val cases = Seq(
      (Uuid5.NamespaceDns, "www.example.com", "2ed6657d-e927-568b-95e1-2665a8aea6a2"),
      (Uuid5.NamespaceDns, "python.org", "886313e1-3b8a-5372-9b90-0c9aee199e5d"),
      (Uuid5.NamespaceUrl, "http://www.example.com/", "fcde3c85-2270-590f-9e7c-ee003d65e0e2"),
      (Uuid5.NamespaceOid, "1.2.3.4", "67448b45-6d15-536b-bef7-8a78c3d10ac6"),
      (Uuid5.NamespaceX500, "cn=Doe", "645b7e0a-1951-56b2-a1af-e6a4f476bee4"),
      (Uuid5.NamespaceDns, "", "4ebd0208-8328-5d69-8c44-ec50939c0967"))
    for ((ns, name, exp) <- cases)
      assert(Uuid5.uuid5(ns, name) === exp, s"uuid5($ns, $name)")
  }

  test("GraftExtensions injects jaro_winkler and uuid5 into plain SQL") {
    // the session under test is built by Sessions (spark.sql.extensions =
    // graft.GraftExtensions) — no register() call anywhere in this test.
    val row = spark.sql(
      s"""SELECT jaro_winkler('martha', 'marhta') AS jw,
         |  uuid5('${Uuid5.NamespaceDns}', 'www.example.com') AS u5""".stripMargin).head()
    assert(row.getDouble(0) === 0.9611111111111111)
    assert(row.getString(1) === "2ed6657d-e927-568b-95e1-2665a8aea6a2")
  }

  test("optimizer rewrites levenshtein threshold predicates to the banded kernel") {
    // fixture-backed scan: a local Seq would be constant-folded into a
    // LocalRelation before the rewritten predicate is observable.
    val df = Tables.part(spark, TestSpark.sf).select(col("p_name"))
    val le = df.filter(expr("levenshtein(p_name, 'small ring') <= 2"))
    assert(le.queryExecution.optimizedPlan.toString.contains("Some(2)) >= 0"),
      "lev <= k was not rewritten to the bounded form")
    val gt = df.filter(expr("levenshtein(p_name, 'small ring') > 2"))
    assert(gt.queryExecution.optimizedPlan.toString.contains("Some(2)) = -1"),
      "lev > k was not rewritten to the bounded form")
    // semantics preserved: banded split is a partition of all rows
    assert(le.count() + gt.count() === df.count())
    assert(le.count() ===
      df.filter(expr("levenshtein(p_name, 'small ring', 2) >= 0")).count())
  }

  test("uuid5 returns null on malformed namespace (r4 ADVICE)") {
    import spark.implicits._
    // braces/urn form, short-but-hex, non-hex — all null, never wrong bytes
    val out = Seq(
      ("{6ba7b810-9dad-11d1-80b4-00c04fd430c8}", "a"),
      ("6ba7b810", "a"),
      ("urn:uuid:6ba7b810-9dad-11d1-80b4-00c04fd430c8", "a"),
      ("6ba7b810-9dad-11d1-80b4-00c04fd430cg", "a"))
      .toDF("ns", "n").select(expr("uuid5(ns, n)").as("u"))
      .collect().map(_.isNullAt(0))
    assert(out.forall(identity), "malformed namespaces must yield SQL NULL")
    // strict JVM helper raises with a clear message instead
    val e = intercept[IllegalArgumentException](Uuid5.uuid5("nope", "a"))
    assert(e.getMessage.contains("32 hex chars"))
  }

  test("levenshtein rewrite covers strict, reversed, and widened-literal forms (r4 ADVICE)") {
    val df = Tables.part(spark, TestSpark.sf).select(col("p_name"))
    def optimized(pred: String): String =
      df.filter(expr(pred)).queryExecution.optimizedPlan.toString
    // lev < k  ->  bounded(k-1) >= 0
    assert(optimized("levenshtein(p_name, 'small ring') < 3").contains("Some(2)) >= 0"))
    // k > lev  ->  bounded(k-1) >= 0
    assert(optimized("3 > levenshtein(p_name, 'small ring')").contains("Some(2)) >= 0"))
    // lev >= k  ->  bounded(k-1) = -1
    assert(optimized("levenshtein(p_name, 'small ring') >= 3").contains("Some(2)) = -1"))
    // bigint literal (analyzer widens lev to long) and foldable arithmetic
    assert(optimized("levenshtein(p_name, 'small ring') <= 2L").contains("Some(2)) >= 0"))
    assert(optimized("levenshtein(p_name, 'small ring') <= 1 + 1").contains("Some(2)) >= 0"))
    // k = 0 strict-below is left alone (no k-1 band exists)
    assert(!optimized("levenshtein(p_name, 'small ring') < 0").contains("Some("))
    // semantics: strict split still partitions all rows
    val lt = df.filter(expr("levenshtein(p_name, 'small ring') < 3")).count()
    val ge = df.filter(expr("levenshtein(p_name, 'small ring') >= 3")).count()
    assert(lt + ge === df.count())
  }

  test("merge_into raises on ambiguous source keys (r4 ADVICE)") {
    import spark.implicits._
    val target = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    val dupSource = Seq((1L, 1.0), (1L, 2.0), (3L, 3.0)).toDF("k", "v")
    val merged = graft.operators.MergeInto.merge(
      target, dupSource, "k", Seq("v"),
      whenMatched = c => col(s"s_$c"),
      whenNotMatched = c => col(s"s_$c"),
      deleteNotMatchedBySource = false)
    val e = intercept[Exception](merged.collect())
    assert(e.getMessage.contains("MERGE: multiple source rows") ||
      Option(e.getCause).exists(_.getMessage.contains("MERGE: multiple source rows")))
    // unique source keys still merge cleanly
    val okSource = Seq((1L, 1.0), (3L, 3.0)).toDF("k", "v")
    val ok = graft.operators.MergeInto.merge(
      target, okSource, "k", Seq("v"),
      whenMatched = c => col(s"s_$c"),
      whenNotMatched = c => col(s"s_$c"),
      deleteNotMatchedBySource = false)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ok === Map(1L -> 1.0, 2L -> 20.0, 3L -> 3.0))
  }

  test("uuid5 registers and evaluates as a column expression") {
    Uuid5.register(spark)
    import spark.implicits._
    val out = Seq(("www.example.com", "python.org")).toDF("a", "b")
      .select(
        expr(s"uuid5('${Uuid5.NamespaceDns}', a)"),
        expr(s"uuid5('${Uuid5.NamespaceDns}', b)"))
      .as[(String, String)].head()
    assert(out === ("2ed6657d-e927-568b-95e1-2665a8aea6a2",
      "886313e1-3b8a-5372-9b90-0c9aee199e5d"))
  }

  test("soundex / crc32 / sha1 match published vectors (DuckDB 1.0 can't oracle them)") {
    // string/crypto kernels Spark ships but the offline oracle lacks —
    // pinned against published test vectors, the uuid5/JaroWinkler precedent.
    val r = spark.sql(
      """SELECT soundex('Robert'), soundex('Rupert'), soundex('Tymczak'),
        |  soundex('Honeyman'),
        |  crc32(cast('abc' AS BINARY)), crc32(cast('' AS BINARY)),
        |  sha1(cast('abc' AS BINARY)), sha1(cast('' AS BINARY))""".stripMargin).head()
    assert(r.getString(0) === "R163")
    assert(r.getString(1) === "R163")
    assert(r.getString(2) === "T522")
    assert(r.getString(3) === "H555")
    assert(r.getLong(4) === 891568578L)  // 0x352441C2
    assert(r.getLong(5) === 0L)
    assert(r.getString(6) === "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(r.getString(7) === "da39a3ee5e6b4b0d3255bfef95601890afd80709")
  }

  test("product_agg: partial-merge distributed product, null semantics") {
    ProductAgg.register(spark)
    import spark.implicits._
    val df = Seq(
      ("g1", Some(2.0)), ("g1", Some(3.0)), ("g1", None),
      ("g2", None), ("g2", None)).toDF("g", "v").repartition(4)
    val rows = df.groupBy("g").agg(expr("product_agg(v)").as("p"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows("g1") === Some(6.0)) // nulls ignored
    assert(rows("g2") === None)      // all-null group -> null
  }

  test("BPE tokenize matches independently-computed greedy merges") {
    // Expectations walked with an INDEPENDENT python greedy longest-match
    // over src/main/resources/graft/bpe_vocab.txt (12000 pieces, len 2..6;
    // the first 1500 lines are the r11 corpus+morpheme vocab — ids stable —
    // and the rest deterministic syllable-product morphemes, so the trie
    // carries an HF-scale piece count):
    //   "the window" -> the | ' ' | window  (whole word "window" is a
    //   vocab piece at line 193; ids: merged piece = 256 + line index,
    //   single char = codepoint, ' ' = 32)
    assert(LlmFunctions.greedyPieces("the window") === Seq("the", " ", "window"))
    assert(LlmFunctions.greedyPieces("the window").map(LlmFunctions.bpeId) ===
      Seq(488L, 32L, 449L))
    // "scan" is itself a piece; chars absent from every piece fall back
    // to codepoints
    assert(LlmFunctions.greedyPieces("scan").map(LlmFunctions.bpeId) === Seq(300L))
    assert(LlmFunctions.greedyPieces("xq").map(LlmFunctions.bpeId) === Seq(120L, 113L))
    // greedy = LONGEST match at each cursor, never a shorter prefix
    assert(LlmFunctions.greedyPieces("window").head.length > 2)
    // lossless: pieces concatenate back to the input
    val s = "big batch query over the customer table   with-punct! 42"
    assert(LlmFunctions.greedyPieces(s).mkString === s)
    assert(LlmFunctions.greedyPieces("") === Seq.empty)
    // vocab contract the oracle's per-length probes rely on
    assert(LlmFunctions.bpeVocabPieces.forall(p =>
      p.length >= 2 && p.length <= LlmFunctions.MaxPieceLen))
    assert(LlmFunctions.bpeVocabPieces.length === 12000)
  }

  test("tokenize/embed are deterministic column expressions") {
    import spark.implicits._
    val df = Seq("hello world").toDF("text")
    val toks = df.select(LlmFunctions.tokenizeGreedy(col("text"))).as[Seq[Long]].head()
    // "hello world" -> he|l|l|o| |w|or|ld... greedy over the checked-in
    // vocab; just pin determinism + id-range here (exact walk above)
    assert(toks.nonEmpty && toks === df.select(LlmFunctions.tokenizeGreedy(col("text"))).as[Seq[Long]].head())
    val emb = df.select(LlmFunctions.embed(col("text"), 8)).as[Seq[Double]].head()
    // bag-of-words projection: 2 words, each contributing [-1, 1)
    assert(emb.length === 8 && emb.forall(v => v >= -2.0 && v < 2.0))
    // re-evaluation is identical (pure function of content)
    assert(df.select(LlmFunctions.embed(col("text"), 8)).as[Seq[Double]].head() === emb)
  }

  test("embedAgg is bit-identical to the column-form embed") {
    import spark.implicits._
    val df = Seq(
      (1L, "hello world"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "hello hello hello"), // multiplicities matter
      (4L, "one"))
      .toDF("doc_id", "text").repartition(3)
    val colForm = df
      .select(col("doc_id"), LlmFunctions.embed(col("text"), 8).as("emb"))
      .as[(Long, Seq[Double])].collect().toMap
    val aggForm = LlmFunctions.embedAgg(df, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getDouble)).toMap
    assert(aggForm.keySet === colForm.keySet)
    // integer contributions summed as long -> order-independent, so the two
    // forms must agree exactly, not just within tolerance
    for ((id, v) <- colForm) assert(aggForm(id) === v, s"doc $id")
  }

  test("llmGenerate batches through mapPartitions and appends the output column") {
    import spark.implicits._
    val in = (1 to 100).map(i => (i.toLong, s"prompt-$i")).toDF("id", "text").repartition(3)
    val out = LlmFunctions.llmGenerate(in, "text", "gen", EchoBackend, batchSize = 7)
    assert(out.columns.toSeq === Seq("id", "text", "gen"))
    val rows = out.as[(Long, String, String)].collect()
    assert(rows.length === 100)
    assert(rows.forall { case (_, t, g) => g === s"echo:${t.take(24)}:${t.length}" })
  }

  test("RetryBackend retries with exponential backoff and surfaces exhaustion") {
    class Flaky(failFirst: Int) extends graft.llm.GenBackend {
      var calls = 0
      def generate(ps: Seq[String]): Seq[String] = {
        calls += 1
        if (calls <= failFirst) throw new RuntimeException(s"transient $calls")
        ps.map("ok:" + _)
      }
    }
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    val flaky = new Flaky(2)
    val r = new graft.llm.RetryBackend(flaky, maxRetries = 3,
      baseDelayMs = 100, sleep = delays.append(_))
    assert(r.generate(Seq("a", "b")) === Seq("ok:a", "ok:b"))
    assert(flaky.calls === 3)
    assert(delays.toSeq === Seq(100L, 200L)) // doubling backoff
    val dead = new graft.llm.RetryBackend(new Flaky(10), maxRetries = 2,
      baseDelayMs = 1, sleep = _ => ())
    val ex = intercept[RuntimeException](dead.generate(Seq("x")))
    assert(ex.getMessage === "transient 3") // 1 try + 2 retries, then thrown
  }

  test("as-of composition: probe with no prior quote keeps null match") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // user 1: quote@10, probes@5 (no match) and @15 (matches 10)
    val quotes = Seq((1L, 10L, 1.5)).toDF("user_id", "t", "v")
    val probes = Seq((1L, 5L), (1L, 15L)).toDF("user_id", "t")
    val tagged = quotes.select(col("user_id"), col("t"), lit(0).as("is_probe"), col("v"))
      .unionByName(probes.select(col("user_id"), col("t"), lit(1).as("is_probe"),
        lit(null).cast("double").as("v")))
    val w = Window.partitionBy("user_id").orderBy(col("t"), col("is_probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = tagged.withColumn("m", last(col("v"), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1).orderBy("t")
      .select(col("t"), col("m")).collect()
    assert(got(0).isNullAt(1), "probe before any quote must not match")
    assert(got(1).getDouble(1) === 1.5)
  }

  test("snowflake aliases: strtok skips empty tokens, div0 and boolean edges") {
    import spark.implicits._
    val r = spark.sql(
      """SELECT strtok('a  b--c', ' -', 3) AS t3,
        |  strtok('a b', ' ', 9) AS t_oob,
        |  div0(10.0, 0) AS dz,
        |  booland(1, NULL) AS ba_null,
        |  booland(0, NULL) AS ba_false,
        |  boolnot(0) AS bn,
        |  insert('abcdef', 2, 3, 'XY') AS ins,
        |  charindex('c', 'abcabc', 4) AS ci""".stripMargin).head()
    assert(r.getString(0) === "c")          // empty tokens from '  ' and '--' skipped
    assert(r.isNullAt(1), "part beyond token count must be NULL")
    assert(r.getDouble(2) === 0.0)
    assert(r.isNullAt(3), "BOOLAND(1, NULL) is NULL")
    assert(r.getBoolean(4) === false, "BOOLAND(0, NULL) is false")
    assert(r.getBoolean(5) === true)
    assert(r.getString(6) === "aXYef")
    assert(r.getInt(7) === 6)
  }

  test("kmv_ndv: exact below K, estimate above K, partition-invariant merge") {
    import spark.implicits._
    import graft.text.TextKernels.md5Long
    // 40 distinct values < K=64 -> exact path returns 40.0 regardless of
    // how rows are partitioned (the distributed-merge property).
    val small = spark.range(0, 1000).select((col("id") % 40).cast("string").as("v"))
    def ndv(df: org.apache.spark.sql.DataFrame): Double =
      df.select(md5Long(col("v")).as("h")).agg(expr("kmv_ndv(h)")).as[Double].head()
    assert(ndv(small) === 40.0)
    assert(ndv(small.repartition(17)) === 40.0)
    // 5000 distinct values > K -> estimate path; deterministic, partition
    // invariant, and within 3x the theoretical rel. error (1/sqrt(K-2)).
    val big = spark.range(0, 5000).select(col("id").cast("string").as("v"))
    val est = ndv(big)
    assert(est === ndv(big.repartition(31)), "merge must be order/partition invariant")
    assert(math.abs(est - 5000.0) / 5000.0 < 3.0 / math.sqrt(62.0), s"est=$est")
  }

  test("windowed percentile_approx tracks the exact windowed percentile") {
    // The approximate window kernel (window_agg_array_kernels.py:
    // windowed_approx_percentile) has no DuckDB oracle — pin it here
    // against the exact `percentile` window aggregate instead: at
    // accuracy 10000 over ≤1000-row partitions, the t-digest answer
    // must land within 1% of the value range of the exact quantile.
    import spark.implicits._
    val df = spark.range(0, 3000)
      .select((col("id") % 3).as("g"),
        (pmod(col("id") * 2654435761L, lit(997)).cast("double")).as("v"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    val out = df.select(
      expr("percentile(v, 0.5)").over(w).as("exact"),
      expr("percentile_approx(v, 0.5, 10000)").over(w).as("approx"))
      .as[(Double, Double)].collect()
    assert(out.nonEmpty)
    for ((e, a) <- out) assert(math.abs(e - a) <= 9.97, s"exact=$e approx=$a")
  }

  test("regexpInstrSf rejects zero-width-matching patterns at build time (r8 VERDICT)") {
    import graft.functions.SnowflakeFns
    // 'a*' matches the empty string -> split-based position recovery would
    // silently miscount; must throw instead of returning wrong positions.
    val e = intercept[IllegalArgumentException] {
      SnowflakeFns.regexpInstrSf(lit("banana"), "a*")
    }
    assert(e.getMessage.contains("empty string"))
    // a non-zero-width pattern still builds and evaluates correctly
    import spark.implicits._
    val got = Seq("banana").toDF("s")
      .select(SnowflakeFns.regexpInstrSf(col("s"), "an", 1, 2).as("p"))
      .as[Int].head()
    assert(got === 4)
  }

  test("base64 alphabet override: 1-3 chars pad with defaults; bad chars throw (ADVICE)") {
    import graft.functions.SnowflakeFns
    import spark.implicits._
    // 'f' -> 'Zg==' : 1/2-char overrides touch only idx-62/63; 3-char remaps '='
    val df = Seq("f").toDF("s")
    val one = df.select(SnowflakeFns.base64EncodeSf(col("s").cast("binary"), 0, "-").as("b"))
      .as[String].head()
    assert(one === "Zg==") // idx-62 override only; padding keeps '='
    val two = df.select(SnowflakeFns.base64EncodeSf(col("s").cast("binary"), 0, "-_").as("b"))
      .as[String].head()
    assert(two === "Zg==")
    val three = df.select(SnowflakeFns.base64EncodeSf(col("s").cast("binary"), 0, "-_$").as("b"))
      .as[String].head()
    assert(three === "Zg$$")
    // the idx-62 override fires: 0xFBEFBE is four 62-sextets -> '++++'
    val hit = Seq(Array[Byte](0xfb.toByte, 0xef.toByte, 0xbe.toByte)).toDF("b")
      .select(SnowflakeFns.base64EncodeSf(col("b"), 0, "*").as("e")).as[String].head()
    assert(hit === "****")
    intercept[IllegalArgumentException] { // > 3 chars
      SnowflakeFns.base64EncodeSf(lit("x"), 0, "-_$!") }
    intercept[IllegalArgumentException] { // alphanumeric override char
      SnowflakeFns.base64EncodeSf(lit("x"), 0, "a") }
    intercept[IllegalArgumentException] { // duplicate override chars
      SnowflakeFns.base64EncodeSf(lit("x"), 0, "--") }
    // SQL registry spelling enforces the same contract
    intercept[Exception] { spark.sql("SELECT base64_encode(cast('x' AS binary), 0, 'ab')").head() }
    val sqlOne = spark.sql("SELECT base64_encode(cast('f' AS binary), 0, '-') AS b")
      .head().getString(0)
    assert(sqlOne === "Zg==")
  }

  test("numberToTs ns branch is exact beyond 2^53 (integral divide, ADVICE)") {
    import graft.functions.SnowflakeFns
    import spark.implicits._
    // 2^53 + 1 is not double-representable; +999 exercises the floor.
    val ns = 9007199254740993L * 7 + 999 // odd ns epoch far beyond 2^53
    val got = Seq(ns).toDF("n")
      .select(unix_micros(SnowflakeFns.numberToTs(col("n"))).as("us"))
      .as[Long].head()
    assert(got === ns / 1000, s"expected exact floor division, got $got vs ${ns / 1000}")
  }

  test("SQL registry parity: try_to_boolean trims; sf_regexp honors s/m flags (ADVICE)") {
    val r = spark.sql(
      """SELECT try_to_boolean(' true ') AS b,
        |  sf_regexp_substr('ab
        |cd', 'b.c', 1, 1, 's') AS dotall,
        |  sf_regexp_count('x1
        |x2', '^x', 1, 'm') AS multi""".stripMargin).head()
    assert(r.getBoolean(0) === true, "registry try_to_boolean must trim like the DSL")
    assert(r.getString(1) === "b\nc", "'s' flag must make . match newline")
    assert(r.getInt(2) === 2, "'m' flag must anchor ^ per line")
  }

  test("sf_regexp_instr/sf_regexp_replace/try_to_decimal registry completions (r9 VERDICT)") {
    // hand-computed on 'banana splits': [aeiou] matches at 2,4,6,10
    val r = spark.sql(
      """SELECT
        |  sf_regexp_instr('banana splits', '[aeiou]') AS i1,
        |  sf_regexp_instr('banana splits', '[aeiou]', 3, 2) AS i_pos_occ,
        |  sf_regexp_instr('banana splits', 'an', 1, 2, 1) AS i_end,
        |  sf_regexp_instr('banana splits', 'zz') AS i_absent,
        |  sf_regexp_instr('banana splits', 'SP[a-z]+', 1, 1, 0, 'i') AS i_flags,
        |  sf_regexp_replace('banana splits', '[aeiou]', '*', 8) AS r_pos,
        |  sf_regexp_replace('banana splits', '(a)(n)', '[\\2\\1]', 1, 2) AS r_occ,
        |  sf_regexp_replace('banana splits', 'zz', 'X', 1, 1) AS r_absent,
        |  try_to_decimal('12.346', 10, 2) AS d_ok,
        |  try_to_decimal('oops', 10, 2) AS d_bad,
        |  try_to_decimal('12345.6', 5, 2) AS d_ovf,
        |  try_to_decimal('77') AS d_def""".stripMargin).head()
    assert(r.getInt(0) === 2)
    assert(r.getInt(1) === 6, "2nd vowel at-or-after pos 3: 'a' at 4? no — matches from pos 3 are 4,6,10; 2nd is 6")
    assert(r.getInt(2) === 6, "2nd 'an' starts at 4, option=1 gives one past end = 6")
    assert(r.getInt(3) === 0)
    assert(r.getInt(4) === 8)
    assert(r.getString(5) === "banana spl*ts")
    assert(r.getString(6) === "ban[na]a splits", "2nd 'an' replaced with Snowflake \\N backrefs swapped")
    assert(r.getString(7) === "banana splits", "absent occurrence leaves subject unchanged")
    assert(r.getDecimal(8) === new java.math.BigDecimal("12.35"))
    assert(r.isNullAt(9))
    assert(r.isNullAt(10), "overflow beyond precision 5 must be null, not error")
    assert(r.getDecimal(11) === new java.math.BigDecimal("77"))
    // zero-width pattern rejected at build time for position-recovery forms
    intercept[Exception] {
      spark.sql("SELECT sf_regexp_instr('x', 'a*')").head() }
    intercept[Exception] {
      spark.sql("SELECT sf_regexp_replace('x', 'a*', 'y', 1, 2)").head() }
  }

  test("VectorIndex.ensure publishes via Hadoop FS: file: scheme, idempotent, race-safe") {
    import spark.implicits._
    import graft.llm.VectorIndex
    val rnd = new scala.util.Random(11)
    val base32 = (0L until 32L).map(i => (i, Array.fill(64)(rnd.nextFloat())))
    // each vector gets an exact twin under id+1000: same embedding -> same
    // LSH bucket, so every query provably has a same-bucket neighbor
    val vecs = (base32 ++ base32.map { case (i, e) => (i + 1000L, e) })
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("vecidx_fs_").toString
    // explicit file: scheme exercises the Hadoop FileSystem path end-to-end
    // (the old java.io version would have treated it as a relative dir)
    val base = s"file:$dir/idx"
    val p1 = VectorIndex.ensure(vecs, base)
    assert(p1.startsWith("file:"), s"returned path must keep the scheme: $p1")
    val out1 = VectorIndex.query(spark, p1, vecs.filter(col("vec_id") < 2), 3)
    assert(out1.count() > 0)
    // idempotent: same fingerprint -> no rebuild, same path
    assert(VectorIndex.ensure(vecs, base) === p1)
    // publish race: two concurrent builders over a fresh location; exactly
    // one wins the rename, the loser must clean its temp dir and return
    // the winner's finished index
    val base2 = s"file:$dir/idx_race"
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val paths = Await.result(
      Future.sequence(Seq.fill(2)(Future(VectorIndex.ensure(vecs, base2)))),
      5.minutes)
    assert(paths.distinct.size === 1)
    val published = new java.io.File(new java.net.URI(paths.head).getPath)
    assert(new java.io.File(published, "_SUCCESS").exists())
    // no leftover *_tmp_* siblings, no nested temp dir inside the index
    val leftovers = Option(published.getParentFile.listFiles()).get
      .map(_.getName).filter(_.contains("_tmp_"))
    assert(leftovers.isEmpty, s"temp dirs must not survive: ${leftovers.toSeq}")
    val nested = Option(published.listFiles()).get
      .map(_.getName).filter(_.contains("_tmp_"))
    assert(nested.isEmpty, s"nested temp dirs must not survive: ${nested.toSeq}")
    assert(VectorIndex.query(spark, paths.head, vecs.filter(col("vec_id") < 2), 3)
      .count() > 0)
  }

  test("native TIME kit (Spark 4.1 TimeType): toTime/timeFromParts are " +
       "real time(6) columns agreeing with the long-nanos compat form") {
    import graft.functions.SnowflakeFns
    val df = spark.range(0, 1000)
      .selectExpr("timestampadd(SECOND, cast(id * 977 AS int), " +
        "timestamp'2024-03-01 00:00:00') AS ts",
        "cast(id % 30 AS int) AS h", "cast(id % 700 - 200 AS int) AS mi",
        "cast(id % 90 AS int) AS s")
    val out = df.select(
      SnowflakeFns.toTime(col("ts")).as("t"),
      SnowflakeFns.timeFromParts(col("h"), col("mi"), col("s"), lit(0L))
        .as("tfp"),
      SnowflakeFns.timeFromPartsNs(col("h"), col("mi"), col("s"), lit(0L))
        .as("tfp_ns"),
      col("ts"))
    // the column IS the native type (the re-gate's schema_match proof)
    assert(out.schema("t").dataType ===
      org.apache.spark.sql.types.TimeType(6))
    assert(out.schema("tfp").dataType ===
      org.apache.spark.sql.types.TimeType(6))
    val rows = out.selectExpr(
      "cast(t AS STRING) AS t_s", "date_format(ts, 'HH:mm:ss') AS ts_s",
      "cast(tfp AS STRING) AS tfp_s", "tfp_ns").collect()
    rows.foreach { r =>
      // toTime: the wall clock's time-of-day, second-exact here
      assert(r.getString(0).startsWith(r.getString(1)),
        s"toTime ${r.getString(0)} != ${r.getString(1)}")
      // timeFromParts agrees with the wrapped ns-of-day compat form
      val ns = r.getLong(3)
      val sOfDay = ns / 1000000000L
      val want = f"${sOfDay / 3600}%02d:${(sOfDay % 3600) / 60}%02d:${sOfDay % 60}%02d"
      assert(r.getString(2) === want, s"timeFromParts vs ns form")
    }
    // negative/overflow parts wrap into [0, 24h) — the Snowflake contract
    val edge = spark.sql(
      "SELECT 1").select(
      SnowflakeFns.timeFromParts(lit(-1), lit(0), lit(0), lit(0L)).as("a"),
      SnowflakeFns.timeFromParts(lit(25), lit(150), lit(0), lit(0L)).as("b"))
      .selectExpr("cast(a AS STRING)", "cast(b AS STRING)").head()
    assert(edge.getString(0) === "23:00:00")
    assert(edge.getString(1) === "03:30:00") // 25h + 150min = 27:30 → 03:30
  }

  test("graft_bitmap_agg / graft_bitmap_or_agg are byte-identical to the " +
       "builtin bitmap aggregates and hash-aggregate (no SortAggregate)") {
    import spark.implicits._
    // deterministic positions across several groups, duplicates included
    val df = (0L until 20000L)
      .map(i => (i % 7, (i * 2654435761L % 32768L + 32768L) % 32768L))
      .toDF("g", "pos")
    df.createOrReplaceTempView("bm_src")
    // level 1: construct per group — bytes must match the builtin exactly
    val both = spark.sql(
      """SELECT g, bitmap_construct_agg(pos) AS b0, graft_bitmap_agg(pos) AS b1
        |FROM bm_src GROUP BY g""".stripMargin).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]]("b0"),
        r.getAs[Array[Byte]]("b1")), s"construct bytes differ for g=${r.get(0)}")
    }
    // level 2: or-merge of the builtin-built bitmaps — bytes must match too
    val or2 = spark.sql(
      """WITH lvl1 AS (
        |  SELECT g % 2 AS h, bitmap_construct_agg(pos) AS bm
        |  FROM bm_src GROUP BY g % 2, g)
        |SELECT h, bitmap_or_agg(bm) AS b0, graft_bitmap_or_agg(bm) AS b1,
        |       bitmap_count(bitmap_or_agg(bm)) AS c0,
        |       bitmap_count(graft_bitmap_or_agg(bm)) AS c1
        |FROM lvl1 GROUP BY h""".stripMargin).collect()
    or2.foreach { r =>
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]]("b0"),
        r.getAs[Array[Byte]]("b1")), s"or bytes differ for h=${r.get(0)}")
      assert(r.getAs[Long]("c0") === r.getAs[Long]("c1"))
    }
    // the custom pair must plan as hash aggregation, not SortAggregate
    val plan = spark.sql(
      """SELECT g, graft_bitmap_or_agg(bm) FROM (
        |  SELECT g, graft_bitmap_agg(pos) AS bm FROM bm_src GROUP BY g, pos % 3)
        |GROUP BY g""".stripMargin)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortAggregate"),
      s"custom bitmap aggregates fell back to SortAggregate:\n$plan")
    // out-of-range refusal, like the builtin
    val err = intercept[Exception] {
      Seq(40000L).toDF("pos").selectExpr("graft_bitmap_agg(pos)").collect()
    }
    assert(err.toString.toLowerCase.contains("position") ||
      err.getCause != null)
  }
}
