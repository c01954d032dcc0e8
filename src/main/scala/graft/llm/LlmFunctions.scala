package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.text.TextKernels.{md5Long, words}

/** LLM-pipeline column/operator surface (SURVEY.md §2.12).
  *
  * Mirrors the reference API shape — bodo/pandas/series.py:1903 `tokenize`,
  * `:1932` `llm_generate`, bodo/ai/series.py:42 `embed` — re-expressed
  * Spark-first:
  *   - `tokenize` / `embed` are pure Catalyst column expressions (codegen'd,
  *     shuffle-free, scale to any partition count);
  *   - `llmGenerate` is the external-service shape: `mapPartitions` with
  *     bounded batches and a per-partition pluggable backend, the same
  *     stateless partition-parallel design the reference uses for Bedrock /
  *     OpenAI-compatible endpoints. The container has no egress, so the
  *     shipped backend is a deterministic echo; a real HTTP backend plugs in
  *     via the same trait without touching the operator.
  */
trait GenBackend extends Serializable {
  /** One bounded batch of prompts -> one response per prompt. */
  def generate(prompts: Seq[String]): Seq[String]
}

/** Deterministic offline stand-in for an LLM endpoint. */
object EchoBackend extends GenBackend {
  def generate(prompts: Seq[String]): Seq[String] =
    prompts.map(s => s"echo:${s.take(24)}:${s.length}")
}

/** Retry decorator for flaky endpoints: exponential backoff with full
  * jitter-free doubling (deterministic), at most `maxRetries` re-attempts
  * per batch. Composes around any backend — the operator itself stays
  * oblivious to transport failures, mirroring how the reference isolates
  * endpoint retries from the batched-call plumbing. The sleep is
  * injectable so tests run without wall-clock delays.
  *
  * Only errors the `retryable` predicate accepts are retried (default:
  * everything except InterruptedException) — a permanent failure (auth,
  * malformed request) fails fast instead of burning the backoff budget.
  * An interrupt is NEVER swallowed: it re-raises immediately with the
  * thread's interrupt status restored, so task cancellation propagates. */
final class RetryBackend(inner: GenBackend, maxRetries: Int = 3,
                         baseDelayMs: Long = 200,
                         sleep: Long => Unit = Thread.sleep,
                         retryable: Exception => Boolean = _ => true)
    extends GenBackend {
  def generate(prompts: Seq[String]): Seq[String] = {
    var attempt = 0
    while (true) {
      try return inner.generate(prompts)
      catch {
        case e: InterruptedException =>
          Thread.currentThread().interrupt(); throw e
        case e: Exception =>
          if (attempt >= maxRetries || !retryable(e)) throw e
          sleep(baseDelayMs << attempt)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

object LlmFunctions {
  /** Hard cap on merged-piece length. The DuckDB oracle replays the greedy
    * walk with one hash-set membership probe per candidate length
    * (MaxPieceLen down to 2), so this bound is part of the tokenizer's
    * public contract, not an implementation detail. Defined BEFORE
    * bpeVocabPieces — object vals initialize in order. */
  val MaxPieceLen = 6

  /** Checked-in BPE merge vocabulary (12k multi-char pieces, one per line,
    * no spaces — so no piece can span a word boundary): the fixture
    * corpus's full intra-word n-gram space plus deterministic
    * syllable-product morphemes, at the piece count a real HF vocab
    * carries (32k-100k scale). Single characters are the implicit fallback
    * alphabet, exactly like byte-level BPE's base bytes. Mirrors the
    * reference's merges-file tokenizer surface (bodo/pandas/series.py:1903
    * wires HF tokenizers; this is a pure-JVM greedy longest-match
    * equivalent over a pinned vocab — no egress/JNI). The trie keeps
    * per-row cost independent of vocab size (bench-verified 1.5k vs 12k). */
  val bpeVocabPieces: Vector[String] = {
    val is = getClass.getResourceAsStream("/graft/bpe_vocab.txt")
    require(is != null, "missing resource graft/bpe_vocab.txt")
    try {
      val ps = scala.io.Source.fromInputStream(is, "UTF-8")
        .getLines().map(_.trim).filter(_.nonEmpty).toVector
      require(ps.distinct.length == ps.length, "bpe vocab has duplicate pieces")
      require(ps.forall(p => p.length > 1 && p.length <= MaxPieceLen &&
        !p.exists(_.isWhitespace) && !p.contains('\'') && !p.contains('\\')),
        s"bpe vocab pieces must be 2..$MaxPieceLen chars, whitespace/quote/backslash-free")
      require(ps.forall(_.forall(_ < 128)),
        "bpe vocab pieces must be ASCII (byte-level merge symbols)")
      ps
    } finally is.close()
  }
  /** Character trie over the vocab. Matching a position walks at most
    * maxPieceLen (=6) child links — independent of vocab SIZE, which is
    * what makes a realistic (1.5k-piece here, 30k+ in production) vocab
    * affordable per row. Built ONCE per JVM (object initializer): the UDF
    * closure captures only the LlmFunctions module reference, and each
    * executor JVM re-runs the initializer from the broadcast-shipped
    * resource on the classpath — no per-row or per-batch rebuild. */
  private final class TrieNode {
    var terminal: Boolean = false
    val kids = new java.util.HashMap[Char, TrieNode]()
  }
  private val bpeTrie: TrieNode = {
    val root = new TrieNode
    bpeVocabPieces.foreach { p =>
      var n = root
      p.foreach { c =>
        var k = n.kids.get(c)
        if (k == null) { k = new TrieNode; n.kids.put(c, k) }
        n = k
      }
      n.terminal = true
    }
    root
  }
  /** Length of the longest vocab piece starting at `pos`, or 1 (single-char
    * base-alphabet fallback). */
  private def longestMatchAt(text: String, pos: Int): Int = {
    var n = bpeTrie
    var i = pos
    var best = 1
    while (i < text.length) {
      n = n.kids.get(text.charAt(i))
      if (n == null) return best
      i += 1
      if (n.terminal) best = i - pos
    }
    best
  }
  // Ids: single char -> its codepoint (byte-level-style base alphabet);
  // merged piece -> 256 + merges-file line index. Deterministic forever.
  private val bpePieceId: Map[String, Long] =
    bpeVocabPieces.zipWithIndex.map { case (p, i) => p -> (256L + i) }.toMap

  /** GREEDY longest-match segmentation over the WHOLE text (spaces are
    * single-char tokens; vocab pieces contain none, so matches never
    * cross a word boundary). Lossless: concatenating the pieces restores
    * the input. Named honestly: greedy longest-match is NOT merge-rank
    * BPE — [[mergeRankPieces]]/[[tokenizeBytes]] carry that contract. */
  def greedyPieces(text: String): IndexedSeq[String] = {
    val out = Vector.newBuilder[String]
    var pos = 0
    while (pos < text.length) {
      val len = longestMatchAt(text, pos)
      out += text.substring(pos, pos + len)
      pos += len
    }
    out.result()
  }

  def bpeId(piece: String): Long =
    if (piece.length == 1) piece.charAt(0).toLong else bpePieceId(piece)

  /** Column form of the greedy piece stream (array<string>). A
    * deterministic scalar UDF is the right tool here: a tokenizer is a
    * per-row library call (like the codec in MultimodalQueries), not
    * relational algebra — there is nothing for Catalyst to push or
    * reorder inside it. */
  def greedyPiecesCol(text: Column): Column = {
    val f = udf((t: String) => if (t == null) null else greedyPieces(t))
    f(text)
  }

  /** Greedy longest-match ids over the checked-in vocab (array<long>). */
  def tokenizeGreedy(text: Column): Column = {
    val f = udf((t: String) => if (t == null) null else greedyPieces(t).map(bpeId))
    f(text)
  }

  // ---- MERGE-RANK BPE (r14): learned-merge-order application ----
  // HF/GPT-2 BPE does not take the longest match: it repeatedly merges
  // the ADJACENT SYMBOL PAIR whose concatenation has the LOWEST vocab
  // rank (the merge learned earliest), leftmost on equal rank, until no
  // adjacent pair concatenates to a vocab piece. On overlap-heavy input
  // the two segmentations diverge (MergeRankBpeSpec pins examples).

  /** piece -> vocab rank (line index = learned merge order). */
  private val bpeRankOf: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    bpeVocabPieces.zipWithIndex.foreach { case (p, i) => m.put(p, i) }
    m
  }

  /** RE2's \s — the whitespace class the oracle's word split uses. */
  private def isAsciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  private val mergeCache =
    new java.util.concurrent.ConcurrentHashMap[String, IndexedSeq[String]]()

  /** Merge-rank BPE over one whitespace-free run — GPT-2's exact loop:
    * each iteration selects the lowest-rank adjacent pair present (the
    * leftmost occurrence defines the tuple on a rank tie) and merges
    * ALL its non-overlapping occurrences left-to-right before
    * re-selecting, the way HF's `bpe()` rebuilds the whole word per
    * chosen merge. Symbols start as CODEPOINTS (a surrogate pair is one
    * symbol). O(L^2) per run with L bounded by word length; results
    * memoize per JVM (corpora repeat words heavily). */
  def mergeRankPieces(run: String): IndexedSeq[String] = {
    val hit = mergeCache.get(run)
    if (hit != null) return hit
    var syms = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < run.length) {
      val n = Character.charCount(run.codePointAt(i))
      syms += run.substring(i, i + n)
      i += n
    }
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var first: String = null
      var second: String = null
      var j = 0
      while (j < syms.length - 1) {
        if (syms(j).length + syms(j + 1).length <= MaxPieceLen) {
          val r = bpeRankOf.get(syms(j) + syms(j + 1))
          if (r != null && r < bestRank) { // strict <: leftmost wins ties
            bestRank = r; first = syms(j); second = syms(j + 1)
          }
        }
        j += 1
      }
      if (first == null) done = true
      else {
        // one GPT-2 merge step: replace every non-overlapping (first,
        // second) occurrence, scanning left to right
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var p = 0
        while (p < syms.length) {
          if (p < syms.length - 1 && syms(p) == first && syms(p + 1) == second) {
            out += first + second; p += 2
          } else { out += syms(p); p += 1 }
        }
        syms = out
        done = syms.length < 2
      }
    }
    val out = syms.toIndexedSeq
    if (mergeCache.size > (1 << 17)) mergeCache.clear()
    mergeCache.put(run, out)
    out
  }

  // ---- HF-fidelity surface (r13): byte-level ids, special tokens, NFC ----
  // The char-level `tokenize` above assigns single chars their CODEPOINT,
  // which collides with piece-id space for codepoints >= 256 and has no
  // special-token protocol. This byte-level form is the GPT-2-family
  // contract the reference wires through HF tokenizers
  // (bodo/pandas/series.py:1903): base ids are UTF-8 BYTES 0..255 (any
  // input is tokenizable — byte fallback), multi-char vocab pieces are
  // 256+idx, special tokens live in a reserved range above the vocab and
  // match ATOMICALLY (never split, never merged into neighbors).

  /** Special-token registry (reserved ids above the piece space). */
  val SpecialTokens: Seq[String] = Seq("<|doc|>", "<|end|>", "<|pad|>")
  /** First id of the reserved special-token range (= 256 + vocab size). */
  lazy val specialBase: Long = 256L + bpeVocabPieces.length
  lazy val specialIds: Map[String, Long] =
    SpecialTokens.zipWithIndex.map { case (t, i) => t -> (specialBase + i) }.toMap

  /** Unicode NFC normalization (the pre-tokenization normalizer most
    * sentencepiece/HF pipelines apply; é as e+combining-acute and é as
    * one codepoint must tokenize identically). */
  def nfc(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  def nfcCol(text: Column): Column = {
    val f = udf((t: String) => if (t == null) null else nfc(t))
    f(text)
  }

  /** Cursor-segment stream, MERGE-RANK semantics (r14): special tokens
    * whole, whitespace chars single, and every other maximal run
    * tokenized by learned-merge-order BPE ([[mergeRankPieces]] — a
    * surrogate pair stays one symbol). Concatenating the segments
    * restores the input exactly. */
  def byteSegments(text: String): IndexedSeq[String] = {
    val out = Vector.newBuilder[String]
    var pos = 0
    while (pos < text.length) {
      SpecialTokens.find(t => text.startsWith(t, pos)) match {
        case Some(t) => out += t; pos += t.length
        case None =>
          val c = text.charAt(pos)
          if (isAsciiWs(c)) { out += c.toString; pos += 1 }
          else {
            var end = pos
            while (end < text.length && !isAsciiWs(text.charAt(end)) &&
                   !SpecialTokens.exists(t => text.startsWith(t, end))) end += 1
            out ++= mergeRankPieces(text.substring(pos, end))
            pos = end
          }
      }
    }
    out.result()
  }

  /** Byte-level ids: special token -> reserved id; vocab piece -> 256+idx;
    * ASCII char -> its byte; any other char -> its UTF-8 bytes, one id
    * per byte (the GPT-2 byte fallback — NOTHING is untokenizable).
    * Lossless: ids decode back to the exact input. */
  def tokenizeBytes(text: String): IndexedSeq[Long] =
    byteSegments(text).flatMap { seg =>
      specialIds.get(seg) match {
        case Some(id) => Seq(id)
        case None if seg.length > 1 && bpePieceId.contains(seg) =>
          Seq(bpePieceId(seg))
        case None =>
          val c = seg.charAt(0)
          if (seg.length == 1 && c < 128) Seq(c.toLong)
          else seg.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            .toSeq.map(b => (b & 0xFF).toLong)
      }
    }

  /** Inverse of [[tokenizeBytes]] (round-trip spec-pinned). */
  def detokenizeBytes(ids: Seq[Long]): String = {
    val sb = new java.lang.StringBuilder
    val bytes = scala.collection.mutable.ArrayBuffer[Byte]()
    def flushBytes(): Unit = if (bytes.nonEmpty) {
      sb.append(new String(bytes.toArray, java.nio.charset.StandardCharsets.UTF_8))
      bytes.clear()
    }
    val byId = specialIds.map(_.swap)
    ids.foreach { id =>
      if (id < 256) bytes += id.toByte
      else {
        flushBytes()
        sb.append(byId.getOrElse(id, bpeVocabPieces((id - 256).toInt)))
      }
    }
    flushBytes()
    sb.toString
  }

  def tokenizeBytesCol(text: Column): Column = {
    val f = udf((t: String) => if (t == null) null else tokenizeBytes(t))
    f(text)
  }

  def byteSegmentsCol(text: Column): Column = {
    val f = udf((t: String) => if (t == null) null else byteSegments(t))
    f(text)
  }

  /** One-pass summary for the gate: (n_tokens, n_byte_tokens, n_special,
    * id_sum). The id SUM is a strong order-insensitive checksum over the
    * exact merge-rank token stream — the oracle recomputes it by
    * replaying learned-merge-order per distinct word. Byte-fallback ids
    * are exactly those in [128, 256) (UTF-8 lead/continuation bytes). */
  def tokenizeBytesSummaryCol(text: Column): Column = {
    val f = udf((t: String) =>
      if (t == null) null
      else {
        val ids = tokenizeBytes(t)
        (ids.length.toLong,
          ids.count(id => id >= 128 && id < 256).toLong,
          ids.count(_ >= specialBase).toLong,
          ids.sum)
      })
    f(text)
  }

  /** Deterministic embedding: a bag-of-words random projection — each of
    * the dim coordinates sums an independent signed word hash in
    * [-1, 1), so similar TEXTS get similar vectors (exact duplicates
    * cosine 1, heavy word overlap high cosine, unrelated docs low), the
    * smoothness property a real embedding endpoint provides and the one
    * cosine-dedup actually needs. Full-rank by construction: one
    * independent hash family per coordinate. (The earlier single-hash
    * form made every coordinate a piecewise-linear function of one
    * scalar — a 1-D manifold over which sign-LSH had a BOUNDED number of
    * distinct buckets; the r8 scale run exposed that as quadratic
    * candidate growth in dedup_docs_embedding.) */
  def embed(text: Column, dim: Int): Column = {
    // ONE md5 per word (not per word×dim — measured 8x hashing cost), then
    // dim coordinates by independent affine mixes of the reduced hash.
    // Per-word the dim coords are a 1-D curve in the hash, but the SUM
    // over a document's words is a dense random walk — full-rank, verified
    // empirically (bucket entropy + cosine discrimination match the
    // hash-per-coordinate form). h is reduced mod 200001 BEFORE the k-mix
    // so the arithmetic stays in int64 range in both engines (DuckDB
    // errors on multiplication overflow where the JVM would wrap).
    // Contributions are INTEGERS summed as long, divided once at the end:
    // bit-exact under any summation order, so this column form and the
    // shuffle-parallel embedAgg below agree exactly.
    val hs = transform(words(text), w => md5Long(w) % 200001)
    array((0 until dim).map { k =>
      aggregate(hs, lit(0L), (acc, h) =>
        acc + ((h * (2 * k + 13) + k * 7919) % 200001 - 100000)) / lit(100000.0)
    }: _*)
  }

  /** Aggregation-form embedding: explode words -> codegen'd integer
    * coordinate contributions -> one map-side-combined sum per document.
    * Output (idCol, e0..e{dim-1}). Bit-identical to embed() — the integer
    * sums are order-independent — but the per-word math runs inside
    * whole-stage codegen, where embed()'s higher-order lambdas
    * (transform/aggregate are CodegenFallback) evaluate interpreted. The
    * shuffle moves dim longs per document after partial aggregation, so
    * this is also the form that parallelizes a 100-TB corpus scan. */
  def embedAgg(docs: DataFrame, idCol: String, textCol: String,
               dim: Int): DataFrame = {
    import org.apache.spark.sql.functions.col
    val h = md5Long(col("w")) % 200001
    val sums = (0 until dim).map(k =>
      sum((h * (2 * k + 13) + k * 7919) % 200001 - 100000).as(s"s$k"))
    docs.select(col(idCol), explode(words(col(textCol))).as("w"))
      .groupBy(idCol).agg(sums.head, sums.tail: _*)
      .select(col(idCol) +:
        (0 until dim).map(k => (col(s"s$k") / 100000.0).as(s"e$k")): _*)
  }

  /** Batched generation over `textCol`, appending result column `outCol`.
    * Batches are bounded (`batchSize`) so a rate-limited endpoint sees
    * fixed-size requests; state is per-partition only (no driver loops). */
  def llmGenerate(df: DataFrame, textCol: String, outCol: String,
                  backend: GenBackend, batchSize: Int = 32): DataFrame = {
    val schema = df.schema.add(outCol, StringType)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val outs = backend.generate(batch.map(_.getString(idx)))
        batch.lazyZip(outs).map((r, o) => Row.fromSeq(r.toSeq :+ o))
      }
    }(Encoders.row(schema))
  }
}
