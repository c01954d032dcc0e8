package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.LlmFunctions

/** Byte-level tokenizer contract (HF-fidelity surface, r13): id-space
  * disjointness, byte fallback, special-token atomicity, NFC, lossless
  * round-trip — the properties the char-level `tokenize` lacks (its
  * single-char id IS the codepoint, which collides with piece ids for
  * codepoints >= 256).
  */
class TokenizerSpec extends AnyFunSuite {
  import LlmFunctions._

  test("id spaces are disjoint: bytes < 256 <= pieces < specials") {
    assert(specialBase === 256L + bpeVocabPieces.length)
    val pieceIds = bpeVocabPieces.indices.map(i => 256L + i)
    assert(pieceIds.forall(id => id >= 256 && id < specialBase))
    assert(specialIds.values.forall(_ >= specialBase))
    assert(specialIds.values.toSeq.distinct.size === SpecialTokens.size)
  }

  test("byte fallback: any unicode input tokenizes and round-trips") {
    val samples = Seq(
      "plain ascii text",
      "café naïve", // precomposed accents
      "中文文本", // CJK
      "mixed © 2024 中 ascii",
      "emoji 😀 astral", // surrogate pair (U+1F600)
      "", // empty
      "<|doc|>wrapped<|end|>")
    samples.foreach { s =>
      val ids = tokenizeBytes(s)
      assert(detokenizeBytes(ids) === s, s"round-trip failed for: $s")
      // every id is in a defined range
      assert(ids.forall(id => id >= 0 && id < specialBase + SpecialTokens.size))
    }
  }

  test("non-ASCII chars emit UTF-8 bytes (ids 128..255), never codepoints") {
    val ids = tokenizeBytes("é") // é = C3 A9
    assert(ids === Seq(0xC3L, 0xA9L))
    val cjk = tokenizeBytes("中") // 中 = E4 B8 AD
    assert(cjk === Seq(0xE4L, 0xB8L, 0xADL))
    val astral = tokenizeBytes("😀") // U+1F600 = F0 9F 98 80
    assert(astral === Seq(0xF0L, 0x9FL, 0x98L, 0x80L))
  }

  test("special tokens match atomically with reserved ids") {
    val ids = tokenizeBytes("<|doc|>x<|end|>")
    assert(ids.head === specialIds("<|doc|>"))
    assert(ids.last === specialIds("<|end|>"))
    assert(ids === Seq(specialIds("<|doc|>"), 'x'.toLong, specialIds("<|end|>")))
  }

  test("NFC: decomposed and precomposed accents tokenize identically") {
    assert(tokenizeBytes(nfc("é")) === tokenizeBytes("é"))
    assert(nfc("é") === "é")
  }

  test("greedy pieces still apply between specials and fallback bytes") {
    // a vocab piece inside the text must tokenize as ONE id >= 256
    val piece = bpeVocabPieces.head
    val ids = tokenizeBytes(s"<|doc|>$piece©")
    assert(ids === Seq(specialIds("<|doc|>"), 256L, 0xC2L, 0xA9L))
  }
}
