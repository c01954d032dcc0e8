package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic text-hashing kernels shared by the dedup / similarity /
  * tokenize operators (SURVEY.md §2.12, reference bodo/pandas/series.py:1903
  * `tokenize`, bodo/ai/series.py:42 `embed`).
  *
  * Everything here is a pure Catalyst column expression (whole-stage
  * codegen'd, no UDFs, no shuffle), and every hash bottoms out in md5 so the
  * DuckDB oracle can replicate results bit-for-bit:
  * Spark `conv(substring(md5(s),1,15),16,10)` == DuckDB
  * `('0x'||substring(md5(s),1,15))::BIGINT` — a 60-bit non-negative int.
  */
object TextKernels {
  /** Mersenne prime 2^31-1; (a*x+b) % P stays under 2^62 for a,x < 2^31. */
  val P: Long = 2147483647L

  /** 60-bit deterministic string hash, identical in Spark and DuckDB. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** md5Long reduced into the MinHash field [0, P). */
  def md5Mod(c: Column): Column = md5Long(c) % P

  /** Whitespace tokens (fixtures are single-space separated). */
  def words(text: Column): Column = split(text, " ")

  /** Word n-gram shingles as space-joined strings; empty array when the
    * document has fewer than n words. Array-level transform — no explode,
    * no shuffle; the DuckDB oracle mirrors it with list_transform/range. */
  def shingles(w: Column, n: Int): Column =
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** MinHash permutation constants: k universal hashes (a_i*x + b_i) % P.
    * Fixed literals (not Random) so the oracle embeds the same numbers. */
  def perms(k: Int): Seq[(Long, Long)] =
    (0 until k).map { i =>
      val a = (1103515245L * (2 * i + 1)) % P
      val b = (12345L * (i + 7) + i) % P
      (a, b)
    }

  /** SQL fragments for the DuckDB oracle side of the same kernels. */
  object duck {
    /** 60-bit md5 hash of SQL expression `e` (DuckDB syntax). */
    def md5Long(e: String): String =
      s"('0x' || substring(md5($e), 1, 15))::BIGINT"
    def md5Mod(e: String): String = s"(${md5Long(e)} % $P)"
    /** Word n-gram shingle list over a list-of-words column `w`. */
    def shingles(w: String, n: Int): String = {
      val parts = (0 until n).map(o => s"$w[i + $o]").mkString(" || ' ' || ")
      s"CASE WHEN len($w) >= $n THEN list_transform(range(1, len($w) - ${n - 2}), i -> $parts) ELSE [] END"
    }
  }
}
