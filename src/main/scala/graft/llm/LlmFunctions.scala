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
  /** BPE-ish tokenizer: whitespace pieces hashed into a 50257-id vocab
    * (GPT-2-sized). Deterministic md5-based ids so the oracle can replay. */
  def tokenize(text: Column): Column =
    transform(words(text), w => md5Long(w) % 50257)

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
    val ws = words(text)
    array((0 until dim).map { k =>
      aggregate(
        transform(ws, w =>
          (md5Long(concat(w, lit(s"#e$k"))) % 200001 - 100000) / lit(100000.0)),
        lit(0.0), (acc, x) => acc + x)
    }: _*)
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
