package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.LlmFunctions
import graft.llm.LlmFunctions._

/** Merge-rank BPE (r14): learned-merge-order application, the HF/GPT-2
  * contract, replacing greedy longest-match on the byte-level surface.
  * A naive O(L^3) independent replay is the in-test oracle; divergence
  * from greedy is PROVEN on real corpus words (not assumed); lossless
  * round-trip, specials, NFC, and byte fallback all survive.
  */
class MergeRankBpeSpec extends AnyFunSuite {

  /** Independent merge-order reference: no trie, no cache, no shared
    * code with the implementation under test. */
  private def referenceMerge(run: String): Vector[String] = {
    var syms = Vector.newBuilder[String].result()
    var i = 0
    while (i < run.length) {
      val n = Character.charCount(run.codePointAt(i))
      syms = syms :+ run.substring(i, i + n)
      i += n
    }
    val rank = bpeVocabPieces.zipWithIndex.toMap
    var go = true
    while (go && syms.length > 1) {
      val cands = syms.indices.dropRight(1)
        .flatMap(j => rank.get(syms(j) + syms(j + 1)).map(r => (r, j)))
      if (cands.isEmpty) go = false
      else {
        // GPT-2 step: the lowest-rank pair (leftmost occurrence names the
        // tuple), then ALL its non-overlapping occurrences merge at once
        val (_, j) = cands.min
        val (first, second) = (syms(j), syms(j + 1))
        val out = Vector.newBuilder[String]
        var p = 0
        while (p < syms.length) {
          if (p < syms.length - 1 && syms(p) == first && syms(p + 1) == second) {
            out += first + second; p += 2
          } else { out += syms(p); p += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  test("mergeRankPieces matches the independent merge-order replay on " +
       "corpus-like words and synthetic overlaps") {
    val words = Seq("customer", "window", "join", "hash", "string",
      "stream", "partition", "aggregate", "filter", "vector", "the",
      "scanned", "joining", "hashing", "xq", "a", "", "restring",
      "instring", "joint", "stint", "meant", "partaken") ++
      bpeVocabPieces.take(50) ++
      // piece-concatenations are exactly where greedy and merge order fight
      (for (a <- bpeVocabPieces.take(20); b <- bpeVocabPieces.take(20))
        yield a + b).take(200)
    words.foreach { w =>
      assert(mergeRankPieces(w) === referenceMerge(w),
        s"merge-order divergence for '$w'")
      assert(mergeRankPieces(w).mkString === w, s"lossless failed for '$w'")
    }
  }

  test("merge-rank PROVABLY diverges from greedy longest-match on this " +
       "vocab (the r13 fidelity gap, now closed)") {
    // search real vocab-derived strings for a divergence
    val candidates =
      (for (a <- bpeVocabPieces.take(300); b <- bpeVocabPieces.take(50))
        yield a + b) ++ bpeVocabPieces.take(2000)
    val diverging = candidates.filter { w =>
      greedyPieces(w) != mergeRankPieces(w).flatMap(s =>
        if (s.length == 1 || bpeVocabPieces.contains(s)) Seq(s)
        else s.map(_.toString))
    }
    assert(diverging.nonEmpty,
      "expected at least one divergent segmentation between greedy and merge-rank")
    info(s"${diverging.size} of ${candidates.size} candidates diverge; " +
      s"e.g. '${diverging.head}': greedy=${greedyPieces(diverging.head)} " +
      s"merge-rank=${mergeRankPieces(diverging.head)}")
  }

  test("a learned chain builds up in rank order: 'join' forms via its merges") {
    // the vocab carries jo -> joi -> join as an explicit chain
    assert(mergeRankPieces("join") === Vector("join"))
    assert(mergeRankPieces("hash") === Vector("hash"))
  }

  test("byte-level contract survives the merge-rank switch: round-trip, " +
       "specials, NFC, byte fallback") {
    val samples = Seq("plain ascii text", "café naïve", "中文文本",
      "mixed © 2024 中 ascii", "emoji 😀 astral", "",
      "<|doc|>wrapped<|end|>", "tab\tand\nnewline")
    samples.foreach { s =>
      assert(detokenizeBytes(tokenizeBytes(s)) === s, s"round-trip: $s")
    }
    assert(tokenizeBytes("<|doc|>x<|end|>") ===
      Seq(specialIds("<|doc|>"), 'x'.toLong, specialIds("<|end|>")))
    assert(tokenizeBytes(nfc("é")) === tokenizeBytes("é"))
    assert(tokenizeBytes("é") === Seq(0xC3L, 0xA9L))
  }

  test("summary ids agree with the raw stream (gate checksum semantics)") {
    val t = "<|doc|>" + nfc("the customer joined a stream é©中") + "<|end|>"
    val ids = tokenizeBytes(t)
    assert(ids.count(id => id >= 128 && id < 256) === 7) // é(2)+©(2)+中(3)
    assert(ids.count(_ >= specialBase) === 2)
    // merged pieces only from the vocab; every id in a defined range
    assert(ids.forall(id => id >= 0 && id < specialBase + SpecialTokens.size))
  }
}
