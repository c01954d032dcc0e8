package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Similarity search over the `embeddings` fixture (vec_id, 64-dim
  * array<float>, label) — SURVEY.md §2.12 / the training-data brief.
  *
  * Reference: bodo/pandas/series.py:2236 `query_s3_vectors` (top-k vector
  * query) and bodo/ai/series.py:42 `embed`. Two plans:
  *   - `ann_topk`: exact brute-force cosine top-k for a small broadcast
  *     query set — the correctness baseline. Scale shape: the 100 TB corpus
  *     streams once; only the k-vector query set is broadcast; ranking is a
  *     per-query window (WindowGroupLimit prunes to k per partition).
  *   - `ann_lsh`: the scale path — random-hyperplane (sign-LSH) signatures
  *     computed as pure codegen'd expressions, candidates generated only by
  *     an equi-join on the signature bucket (cost Σ bucket², never n²).
  * All arithmetic is double with a fixed fold order, and hyperplanes are
  * small-integer-valued, so the DuckDB oracle reproduces values exactly.
  */
object SimQueries extends QueryModule {

  private val DIM = 64
  // 16 hyperplanes -> 65536 sign buckets: bucket population shrinks ~2x per
  // plane, so Σ bucket² at corpus scale is n²/65536 (vs n²/256 with 8).
  // Recall lost to the finer partition is bought back with multi-probe: each
  // vector also probes its 16 Hamming-1 neighbor buckets (flip one sign).
  private val NPLANES = 16

  // r22 (guide §4 / §1.1): the per-PAIR dot (broadcast-join inner loops)
  // and the per-plane signature HOFs — aggregate(zip_with(...)),
  // CodegenFallback, a fresh zip array per interpreted call — moved to
  // tight-loop UDFs in functions/VecExprs: same left-to-right fold from
  // 0.0, bit-identical doubles (VecExprsSpec pins equivalence over the
  // real fixture), oracle unchanged. The per-ROW l2/cast HOFs stay:
  // unrolled codegen replacements for them measured SLOWER on the focused
  // A/B (fixture volume never amortizes the bigger plan), and their call
  // count is row-bounded, not pair-bounded.

  /** embedding as array<double> (floats widen exactly). */
  private def embD: Column = transform(col("embedding"), x => x.cast("double"))

  private def l2(e: Column): Column =
    sqrt(aggregate(e, lit(0.0), (acc, x) => acc + x * x))

  private lazy val dotLoop = graft.functions.VecExprs.dotLoop
  private def dot(a: Column, b: Column): Column = dotLoop(a, b)

  /** HOF dot kept where min-of-3 A/Bs measured it FASTER than the loop
    * UDF — ann_topk (0.43 vs 0.56 s) and embed_kmeans_assign (0.45 vs
    * 0.60) in the dev battery, ann_ivf (0.32 vs 0.45) and ann_lsh (0.93
    * vs 1.03) in the warm full-suite protocol: those shapes pay the
    * UDF's per-call array conversions without the recall queries'
    * offsetting signature win. Same fold order, same bits either way. */
  private def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** All NPLANES sign bits in one tight JVM loop per row — hyperplanes
    * w_j[i] = ((i*31+j*17)%7)-3, identical to the oracle mirrors. */
  private lazy val sigOf = graft.functions.VecExprs.lshSig(DIM, NPLANES)

  private def base(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).select(col("vec_id"), col("label"), embD.as("emb"))
      .withColumn("nrm", l2(col("emb")))

  // --- clustered variant (ann_lsh_recall_clustered) ---------------------
  // The fixture's embeddings are near-uniform on the sphere, where sign-LSH
  // provably carries no ranking signal (measured: recall@10 ≈ 5% in
  // ann_lsh_recall). Real production embeddings are CLUSTERED; to measure
  // the operator in its intended regime a mixture-of-Gaussians-style corpus
  // is derived deterministically from the fixture: centroid(label)[i] =
  // ((i*13 + label*29) % 11) - 5 (integer-valued, so DuckDB reproduces it
  // exactly) plus EPS × the fixture's unit vector as the noise draw.
  // ||centroid|| ≈ 25, noise = EPS, so intra-cluster cosines ≈ 1 and the
  // 10 clusters are well separated — the regime where sign buckets align.
  private val EPS = 0.3
  /** XOR masks for multi-probe at Hamming distance ≤ 2: identity + 16
    * one-bit flips + 120 two-bit flips = 137 probe keys per query. A
    * candidate at Hamming h ≤ 2 from the query matches via EXACTLY one mask
    * (the xor of the two signatures), so no dedup shuffle is needed. */
  private val HAM2_MASKS: Seq[Long] =
    0L +: (0 until NPLANES).map(j => 1L << j) ++:
      (for { j <- 0 until NPLANES; k <- j + 1 until NPLANES }
        yield (1L << j) | (1L << k))

  /** centroid(label) + EPS·v, element order identical to the DuckDB mirror. */
  private def clusteredEmb: Column =
    zip_with(sequence(lit(0), lit(DIM - 1)), col("embedding"),
      (i, x) => ((i * 13 + col("label") * 29) % 11 - 5).cast("double") +
        lit(EPS) * x.cast("double"))

  override def queries: Map[String, QueryFn] = Map(
    // Per-label corpus statistics over vector norms.
    "embed_stats" -> ((s, d) => {
      base(s, d)
        .select(col("label"), col("nrm"),
          element_at(col("emb"), 1).as("c0"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          avg("nrm").as("avg_norm"),
          min("nrm").as("min_norm"),
          max("nrm").as("max_norm"),
          avg("c0").as("avg_c0"))
    }),

    // Exact cosine top-10 for 8 broadcast query vectors.
    "ann_topk" -> ((s, d) => {
      val e = base(s, d)
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("emb").as("qe"), col("nrm").as("qn"))
      val c = e.filter(col("vec_id") >= 8)
        .select(col("vec_id").as("c_id"), col("emb").as("ce"), col("nrm").as("cn"))
      val scored = c.join(broadcast(q))
        .select(col("q_id"), col("c_id"),
          (dotHof(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("cos"))
      scored
        .withColumn("rnk",
          row_number().over(Window.partitionBy("q_id")
            .orderBy(col("cos").desc, col("c_id"))).cast("long"))
        .filter(col("rnk") <= 10)
    }),

    // IVF-style ANN: coarse partition (the label column stands in for a
    // nearest-centroid assignment), per-query top-3 within the partition
    // via WindowGroupLimit — the bucket-pruned probe shape of an IVF index.
    "ann_ivf" -> ((s, d) => {
      val e = base(s, d)
      // a bounded query batch (not all-vectors-probe — that is quadratic
      // per coarse cell and not how an IVF index is used)
      val q = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("q_id"), col("label").as("bkt"),
          col("emb").as("qe"), col("nrm").as("qn"))
      val c = e.select(col("vec_id").as("c_id"), col("label").as("bkt2"),
        col("emb").as("ce"), col("nrm").as("cn"))
      c.join(broadcast(q), col("bkt") === col("bkt2") && col("q_id") =!= col("c_id"))
        .select(col("q_id"), col("bkt"), col("c_id"),
          // dotHof: full-suite min-of-3 measured the loop UDF 1.4x slower
          // here (0.32 vs 0.45 s) — same warm-protocol story as ann_lsh
          (dotHof(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("cos"))
        .withColumn("rnk",
          row_number().over(Window.partitionBy("q_id")
            .orderBy(col("cos").desc, col("c_id"))).cast("long"))
        .filter(col("rnk") <= 3)
    }),

    // Persisted vector index (S3-Vectors shape, local parquet backend):
    // build = partitioned-by-bucket write; probe = bucket join with the
    // broadcast query set, top-5 per query. See graft.llm.VectorIndex.
    "vector_index_topk" -> ((s, d) => {
      val base = s"/tmp/graft_vecidx/${d.replaceAll("[^a-zA-Z0-9]", "_")}"
      val path = graft.llm.VectorIndex.ensure(embeddings(s, d), base)
      graft.llm.VectorIndex.query(s, path, embeddings(s, d).filter(col("vec_id") < 8), 5)
    }),

    // Recall evaluation of the LSH candidate generator: for each query
    // vector, what fraction of the EXACT cosine top-10 lands in the
    // multi-probe candidate set? The measurement every ANN deployment
    // needs before trusting the index — and itself a distributed query:
    // exact top-10 per query (broadcast-window, as ann_topk) left-joined
    // against the bucket-probe candidates (each true neighbor matches via
    // at most one probe key, so no dedup), one count per query.
    //
    // Measured finding on this fixture: recall@10 ≈ 5% — the true top-10
    // sit at Hamming 0–16 from their query's 16-bit signature (median ~6),
    // because near-uniform random embeddings have cosines clustered so
    // tightly that sign bits carry almost no ranking signal. That is the
    // honest conclusion the operator exists to surface: for unstructured
    // embeddings, route to the IVF/exact paths (ann_ivf / ann_topk);
    // sign-LSH earns its keep only on embeddings with real cluster
    // structure. No silent quality caps — the number is in the output.
    "ann_lsh_recall" -> ((s, d) => {
      val sig = sigOf(col("emb"))
      val e = base(s, d).withColumn("sig", sig)
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("emb").as("qe"),
          col("nrm").as("qn"), col("sig").as("qsig"))
      val c = e.filter(col("vec_id") >= 8)
        .select(col("vec_id").as("c_id"), col("emb").as("ce"),
          col("nrm").as("cn"), col("sig").as("csig"))
      val exact = c.join(broadcast(q))
        .select(col("q_id"), col("c_id"),
          (dot(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("cos"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))))
        .filter(col("rnk") <= 10)
        .select(col("q_id"), col("c_id"))
      val probeKeys = array(
        col("qsig") +: (0 until NPLANES).map(j => col("qsig").bitwiseXOR(lit(1L << j))): _*)
      val cand = q.select(col("q_id"), explode(probeKeys).as("pk"))
        .join(c.select(col("c_id"), col("csig")), col("pk") === col("csig"))
        .select(col("q_id"), col("c_id"), lit(1L).as("hit"))
      exact.join(cand, Seq("q_id", "c_id"), "left_outer")
        .groupBy(col("q_id"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"),
          (sum(coalesce(col("hit"), lit(0L))) / 10.0).as("recall10"))
    }),

    // Recall of the same LSH candidate generator measured in its INTENDED
    // regime — clustered embeddings (see clusteredEmb above) — with
    // multi-probe widened to Hamming ≤ 2. Measured: recall@10 = 0.9625 on
    // this fixture (vs ≈5% on the near-uniform raw vectors). Routing
    // guidance this pair of measurements establishes: sign-LSH is the scale
    // path for clustered production embeddings; for unstructured/uniform
    // embeddings route to ann_ivf (coarse-quantized) or ann_topk (exact
    // broadcast top-k). Plan shape is identical to ann_lsh_recall — the
    // probe fan-out is 137 keys per QUERY vector only (the corpus side
    // stays one row per vector), so candidate cost remains Σ bucket².
    "ann_lsh_recall_clustered" -> ((s, d) => {
      val e = embeddings(s, d)
        .select(col("vec_id"), clusteredEmb.as("emb"))
        .withColumn("nrm", l2(col("emb")))
      val sig = sigOf(col("emb"))
      val es = e.withColumn("sig", sig)
      val q = es.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("emb").as("qe"),
          col("nrm").as("qn"), col("sig").as("qsig"))
      val c = es.filter(col("vec_id") >= 8)
        .select(col("vec_id").as("c_id"), col("emb").as("ce"),
          col("nrm").as("cn"), col("sig").as("csig"))
      val exact = c.join(broadcast(q))
        .select(col("q_id"), col("c_id"),
          (dot(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("cos"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))))
        .filter(col("rnk") <= 10)
        .select(col("q_id"), col("c_id"))
      val probeKeys = array(HAM2_MASKS.map(m => col("qsig").bitwiseXOR(lit(m))): _*)
      val cand = q.select(col("q_id"), explode(probeKeys).as("pk"))
        .join(c.select(col("c_id"), col("csig")), col("pk") === col("csig"))
        .select(col("q_id"), col("c_id"), lit(1L).as("hit"))
      exact.join(cand, Seq("q_id", "c_id"), "left_outer")
        .groupBy(col("q_id"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"),
          (sum(coalesce(col("hit"), lit(0L))) / 10.0).as("recall10"))
    }),

    // SemDeDup-style cluster assignment (one Lloyd step): k=8 deterministic
    // centroids (lowest vec_ids) broadcast; every other vector assigned to
    // its max-cosine centroid via the per-vector window top-1
    // (WindowGroupLimit prunes to 1 before the shuffle). The cluster
    // accounting that semantic dedup / diversity sampling runs over; at
    // 100 TB the corpus streams once against k broadcast centroids —
    // embarrassingly parallel, one final rollup.
    "embed_kmeans_assign" -> ((s, d) => {
      val e = base(s, d)
      val cent = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("emb").as("ce"), col("nrm").as("cn"))
      val v = e.filter(col("vec_id") >= 8)
        .select(col("vec_id").as("vid"), col("emb").as("ve"), col("nrm").as("vn"))
      v.join(broadcast(cent))
        .select(col("vid"), col("cid"),
          (dotHof(col("ve"), col("ce")) / (col("vn") * col("cn"))).as("cos"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("vid").orderBy(col("cos").desc, col("cid"))))
        .filter(col("rnk") === 1)
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n_members"),
          avg(col("cos")).as("avg_cos"),
          min(col("vid")).as("min_vec"),
          max(col("vid")).as("max_vec"))
    }),

    // Sign-LSH bucketed near-neighbor pairs: 16 hyperplanes -> 65536
    // buckets, equi-join on the signature, cosine verified within buckets
    // only. Multi-probe (probe side explodes to its signature plus the 16
    // flip-one-bit neighbors) recovers pairs that a single sign flip would
    // otherwise split across buckets; each pair still matches via exactly
    // one probe key, so no dedup shuffle is needed.
    "ann_lsh" -> ((s, d) => {
      val sig = sigOf(col("emb"))
      // materialized once: the probe side and the bucket side otherwise
      // BOTH re-run the embedding load + NPLANES-plane signature
      val e = base(s, d).withColumn("sig", sig).localCheckpoint()
      val probeKeys = array(
        col("sig") +: (0 until NPLANES).map(j => col("sig").bitwiseXOR(lit(1L << j))): _*)
      val a = e.select(col("vec_id").as("vec_i"), col("emb").as("ea"),
        col("nrm").as("na"), explode(probeKeys).as("pk"))
      val b = e.select(col("vec_id").as("vec_j"), col("emb").as("eb"),
        col("nrm").as("nb"), col("sig").as("sigb"))
      // dotHof, not the loop UDF, settled by FULL-SUITE measurement (the
      // driver's protocol): the cos >= 0.2 filter collapses into the join
      // condition AND stays in the projection, so the pair dot evaluates
      // twice per candidate either way; an asNondeterministic UDF variant
      // that restored single evaluation won the cold dev-filter battery
      // (1.33→0.92 min-of-3) but LOST the warm interleaved full-suite
      // min-of-3 (0.93 HOF vs 1.03 UDF) — JIT-hot HOF interpretation
      // beats the UDF's 2×64-value array conversions per call here. The
      // signature stays a UDF (sigOf above): it wins in both protocols.
      a.join(b, col("pk") === col("sigb") && col("vec_i") < col("vec_j"))
        .select(col("vec_i"), col("vec_j"), col("sigb").as("bucket"),
          (dotHof(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos"))
        .filter(col("cos") >= 0.2)
    })
  )

  // DuckDB mirrors: double lists, list_transform/list_sum with the same
  // per-element order, identical integer hyperplanes.
  private val normSql =
    "sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))"

  override def oracle: Map[String, String] = Map(
    "embed_stats" ->
      s"""SELECT label, count(*) AS n,
         |  avg(nrm) AS avg_norm, min(nrm) AS min_norm, max(nrm) AS max_norm,
         |  avg(c0) AS avg_c0
         |FROM (SELECT label, $normSql AS nrm, CAST(embedding[1] AS DOUBLE) AS c0
         |      FROM embeddings)
         |GROUP BY label""".stripMargin,

    "ann_topk" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS emb, $normSql AS nrm FROM embeddings),
         |q AS (SELECT vec_id AS q_id, emb AS qe, nrm AS qn FROM e WHERE vec_id < 8),
         |c AS (SELECT vec_id AS c_id, emb AS ce, nrm AS cn FROM e WHERE vec_id >= 8),
         |s AS (
         |  SELECT q_id, c_id, list_dot_product(qe, ce) / (qn * cn) AS cos FROM q, c)
         |SELECT q_id, c_id, cos,
         |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS BIGINT) AS rnk
         |FROM s
         |QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) <= 10""".stripMargin,

    "ann_ivf" ->
      s"""WITH e AS (
         |  SELECT vec_id, label, embedding::DOUBLE[] AS emb, $normSql AS nrm FROM embeddings),
         |s AS (
         |  SELECT q.vec_id AS q_id, q.label AS bkt, c.vec_id AS c_id,
         |    list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm) AS cos
         |  FROM e q JOIN e c ON q.label = c.label AND q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 50)
         |SELECT q_id, bkt, c_id, cos,
         |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS BIGINT) AS rnk
         |FROM s
         |QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) <= 3""".stripMargin,

    "vector_index_topk" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS emb, $normSql AS nrm FROM embeddings),
         |pd AS (
         |  SELECT vec_id, j,
         |    list_sum(list_transform(range(0, $DIM),
         |      i -> emb[i + 1] * ((i * 31 + j * 17) % 7 - 3))) AS d
         |  FROM e, (SELECT unnest(range(0, ${graft.llm.VectorIndex.NPLANES})) AS j)),
         |sg AS (
         |  SELECT vec_id,
         |    CAST(sum(CASE WHEN d >= 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END) AS BIGINT) AS sig
         |  FROM pd GROUP BY vec_id),
         |je AS (
         |  SELECT e.vec_id, e.emb, e.nrm, sg.sig FROM e JOIN sg ON e.vec_id = sg.vec_id),
         |s AS (
         |  SELECT q.vec_id AS q_id, q.sig AS bucket, c.vec_id AS c_id,
         |    list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm) AS cos
         |  FROM je q JOIN je c ON q.sig = c.sig AND q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 8)
         |SELECT q_id, bucket, c_id, cos,
         |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS BIGINT) AS rnk
         |FROM s
         |QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) <= 5""".stripMargin,

    "ann_lsh_recall" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS emb, $normSql AS nrm FROM embeddings),
         |pd AS (
         |  SELECT vec_id, j,
         |    list_sum(list_transform(range(0, $DIM),
         |      i -> emb[i + 1] * ((i * 31 + j * 17) % 7 - 3))) AS d
         |  FROM e, (SELECT unnest(range(0, $NPLANES)) AS j)),
         |sg AS (
         |  SELECT vec_id,
         |    CAST(sum(CASE WHEN d >= 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END) AS BIGINT) AS sig
         |  FROM pd GROUP BY vec_id),
         |je AS (
         |  SELECT e.vec_id, e.emb, e.nrm, sg.sig FROM e JOIN sg ON e.vec_id = sg.vec_id),
         |q AS (SELECT vec_id AS q_id, emb AS qe, nrm AS qn, sig AS qsig FROM je WHERE vec_id < 8),
         |c AS (SELECT vec_id AS c_id, emb AS ce, nrm AS cn, sig AS csig FROM je WHERE vec_id >= 8),
         |exact AS (
         |  SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id,
         |      row_number() OVER (PARTITION BY q_id
         |        ORDER BY list_dot_product(qe, ce) / (qn * cn) DESC, c_id) AS rnk
         |    FROM q, c) WHERE rnk <= 10),
         |pk AS (
         |  SELECT q_id,
         |    unnest(list_concat([qsig],
         |      list_transform(range(0, $NPLANES), j -> xor(qsig, 1::BIGINT << j)))) AS pk
         |  FROM q),
         |cand AS (
         |  SELECT pk.q_id, c.c_id, 1::BIGINT AS hit
         |  FROM pk JOIN c ON pk.pk = c.csig)
         |SELECT exact.q_id,
         |  CAST(sum(coalesce(cand.hit, 0)) AS BIGINT) AS n_hits,
         |  sum(coalesce(cand.hit, 0)) / 10.0 AS recall10
         |FROM exact LEFT JOIN cand
         |  ON exact.q_id = cand.q_id AND exact.c_id = cand.c_id
         |GROUP BY exact.q_id""".stripMargin,

    "ann_lsh_recall_clustered" ->
      s"""WITH e AS (
         |  SELECT vec_id,
         |    list_transform(range(0, $DIM),
         |      i -> ((i*13 + label*29) % 11) - 5 + $EPS * (embedding::DOUBLE[])[i + 1]) AS emb
         |  FROM embeddings),
         |en AS (
         |  SELECT vec_id, emb, sqrt(list_sum(list_transform(emb, x -> x * x))) AS nrm FROM e),
         |pd AS (
         |  SELECT vec_id, j,
         |    list_sum(list_transform(range(0, $DIM),
         |      i -> emb[i + 1] * ((i * 31 + j * 17) % 7 - 3))) AS d
         |  FROM en, (SELECT unnest(range(0, $NPLANES)) AS j)),
         |sg AS (
         |  SELECT vec_id,
         |    CAST(sum(CASE WHEN d >= 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END) AS BIGINT) AS sig
         |  FROM pd GROUP BY vec_id),
         |je AS (
         |  SELECT en.vec_id, en.emb, en.nrm, sg.sig FROM en JOIN sg ON en.vec_id = sg.vec_id),
         |q AS (SELECT vec_id AS q_id, emb AS qe, nrm AS qn, sig AS qsig FROM je WHERE vec_id < 8),
         |c AS (SELECT vec_id AS c_id, emb AS ce, nrm AS cn, sig AS csig FROM je WHERE vec_id >= 8),
         |exact AS (
         |  SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id,
         |      row_number() OVER (PARTITION BY q_id
         |        ORDER BY list_dot_product(qe, ce) / (qn * cn) DESC, c_id) AS rnk
         |    FROM q, c) WHERE rnk <= 10),
         |pk AS (
         |  SELECT q_id, xor(qsig, m) AS pk
         |  FROM q, (SELECT unnest([${HAM2_MASKS.mkString(", ")}]) AS m)),
         |cand AS (
         |  SELECT pk.q_id, c.c_id, 1::BIGINT AS hit
         |  FROM pk JOIN c ON pk.pk = c.csig)
         |SELECT exact.q_id,
         |  CAST(sum(coalesce(cand.hit, 0)) AS BIGINT) AS n_hits,
         |  sum(coalesce(cand.hit, 0)) / 10.0 AS recall10
         |FROM exact LEFT JOIN cand
         |  ON exact.q_id = cand.q_id AND exact.c_id = cand.c_id
         |GROUP BY exact.q_id""".stripMargin,

    "embed_kmeans_assign" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS emb, $normSql AS nrm FROM embeddings),
         |cent AS (SELECT vec_id AS cid, emb AS ce, nrm AS cn FROM e WHERE vec_id < 8),
         |v AS (SELECT vec_id AS vid, emb AS ve, nrm AS vn FROM e WHERE vec_id >= 8),
         |s AS (
         |  SELECT vid, cid, list_dot_product(ve, ce) / (vn * cn) AS cos FROM v, cent),
         |a AS (
         |  SELECT vid, cid, cos FROM (
         |    SELECT vid, cid, cos,
         |      row_number() OVER (PARTITION BY vid ORDER BY cos DESC, cid) AS rnk
         |    FROM s) WHERE rnk = 1)
         |SELECT cid, count(*) AS n_members, avg(cos) AS avg_cos,
         |  min(vid) AS min_vec, max(vid) AS max_vec
         |FROM a GROUP BY cid""".stripMargin,

    "ann_lsh" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS emb, $normSql AS nrm FROM embeddings),
         |pd AS (
         |  SELECT vec_id, j,
         |    list_sum(list_transform(range(0, $DIM),
         |      i -> emb[i + 1] * ((i * 31 + j * 17) % 7 - 3))) AS d
         |  FROM e, (SELECT unnest(range(0, $NPLANES)) AS j)),
         |sg AS (
         |  SELECT vec_id,
         |    CAST(sum(CASE WHEN d >= 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END) AS BIGINT) AS sig
         |  FROM pd GROUP BY vec_id),
         |je AS (
         |  SELECT e.vec_id, e.emb, e.nrm, sg.sig FROM e JOIN sg ON e.vec_id = sg.vec_id),
         |pk AS (
         |  SELECT vec_id, emb, nrm,
         |    unnest(list_concat([sig],
         |      list_transform(range(0, $NPLANES), j -> xor(sig, 1::BIGINT << j)))) AS pk
         |  FROM je)
         |SELECT a.vec_id AS vec_i, b.vec_id AS vec_j, b.sig AS bucket,
         |  list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) AS cos
         |FROM pk a JOIN je b ON a.pk = b.sig AND a.vec_id < b.vec_id
         |WHERE list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) >= 0.2""".stripMargin
  )
}
