package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark
import graft.llm.HfBpeTokenizer

/** External HF tokenizer assets (r16): the loader parses the real file
  * formats (`merges.txt` + `vocab.json`, and fast-tokenizer
  * `tokenizer.json` in BOTH merge serializations), and the full GPT-2
  * byte-level pipeline — pre-tokenizer regex, bytes_to_unicode alphabet,
  * pair-ranked merge loop — reproduces PUBLISHED GPT-2 token ids for the
  * pinned strings. The fixture (src/test/resources/graft/gpt2_mini) is a
  * subset tokenizer in the exact file format: base-alphabet ids follow
  * the published order ('!'=0, '.'=13, 'Ġ'=220) and the pinned merged
  * pieces carry their real ids (Hello=15496, Ġworld=995, Ġthe=262), so a
  * correct pipeline and only a correct pipeline emits the published
  * sequences. */
class HfTokenizerSpec extends AnyFunSuite {
  import spark.implicits._

  private def res(name: String): String =
    getClass.getResource(s"/graft/gpt2_mini/$name").getPath

  private lazy val fromMerges =
    HfBpeTokenizer.fromMergesFile(res("merges.txt"), res("vocab.json"))
  private lazy val fromJson =
    HfBpeTokenizer.fromTokenizerJson(res("tokenizer.json"))

  test("pinned strings encode to the published GPT-2 ids") {
    // the canonical example: GPT-2 tokenizes "Hello world" -> [15496, 995]
    assert(fromMerges.encode("Hello world") === Seq(15496L, 995L))
    assert(fromMerges.encode("Hello the world") === Seq(15496L, 262L, 995L))
    // '!' is id 0 and '.' is id 13 in the published vocab (base bytes)
    assert(fromMerges.encode("Hello world!") === Seq(15496L, 995L, 0L))
    assert(fromMerges.encode(".") === Seq(13L))
  }

  test("tokenizer.json loads to the identical tokenizer (array-form merges)") {
    for (s <- Seq("Hello world", "Hello the world!", ". .", "don't stop"))
      assert(fromJson.encode(s) === fromMerges.encode(s), s"drift on '$s'")
  }

  test("GPT-2 pre-tokenization: contractions, leading spaces, trailing runs") {
    import HfBpeTokenizer.{preTokenize => pt}
    assert(pt("don't stop") === Seq("don", "'t", " stop"))
    assert(pt("I'll go") === Seq("I", "'ll", " go"))
    assert(pt("a  b") === Seq("a", " ", " b"))
    assert(pt("Hello world! ") === Seq("Hello", " world", "!", " "))
    assert(pt("x42 7y") === Seq("x", "42", " 7", "y"))
  }

  test("byte fallback: unmergeable non-ASCII falls to base-alphabet ids " +
       "and round-trips losslessly") {
    // 'é' = UTF-8 0xC3 0xA9; base ids follow the published order:
    // 0xC3=195 -> 106+(195-174)=127, 0xA9=169 -> 94+(169-161)=102
    val ids = fromMerges.encode("Hé")
    assert(ids === Seq('H'.toLong - 33, 127L, 102L))
    assert(fromMerges.decode(ids) === "Hé")
    // whole-string round-trip through pieces, spaces included
    val s = "Hello the world! Hé."
    assert(fromMerges.decode(fromMerges.encode(s)) === s)
  }

  test("column form ships only the asset PATHS; executors load once") {
    val df = Seq("Hello world", "Hello the world!", "don't")
      .toDF("text")
      .repartition(3)
    val got = df.select(
        HfBpeTokenizer.tokenizeCol(col("text"),
          res("merges.txt"), res("vocab.json")).as("ids"),
        HfBpeTokenizer.tokenizeJsonCol(col("text"),
          res("tokenizer.json")).as("ids2"))
      .collect()
      .map(r => (r.getSeq[Long](0), r.getSeq[Long](1)))
    got.foreach { case (a, b) => assert(a === b) }
    assert(got.map(_._1).toSet ===
      Set(Seq(15496L, 995L),
        fromMerges.encode("Hello the world!"),
        fromMerges.encode("don't")))
  }

  test("malformed assets fail loudly, not silently") {
    val dir = java.nio.file.Files.createTempDirectory("hf_bad")
    val bad = dir.resolve("merges.txt")
    java.nio.file.Files.write(bad, "a b c\n".getBytes("UTF-8"))
    intercept[IllegalArgumentException] {
      HfBpeTokenizer.fromMergesFile(bad.toString, res("vocab.json"))
        .encode("x")
    }
    val notBpe = dir.resolve("tokenizer.json")
    java.nio.file.Files.write(notBpe, """{"model":{"type":"WordPiece"}}""".getBytes)
    intercept[IllegalArgumentException] {
      HfBpeTokenizer.fromTokenizerJson(notBpe.toString)
    }
  }
}
