package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the decision
  * step of a dedup pipeline: pair generators (minhash / simhash / cosine)
  * emit EDGES, but the keep/drop policy needs CLUSTERS (A~B and B~C must
  * collapse to one kept document even when A~C was never emitted).
  * Reference analog: drop_duplicates keeps one row per key
  * (bodo/libs/streaming/union.py:38); over a similarity graph the "key"
  * is the component, computed here as min-label propagation:
  *
  *   label(v) ← min(label(v), min over neighbors u of label(u))
  *
  * iterated to fixpoint. Each round is one equi-join (edges ⋈ labels on
  * src) + one map-side-combined min-aggregation — no collect, no driver
  * graph state; the driver coordinates only the loop and reads one SUM
  * per round. Convergence detection is monotone: every label change
  * strictly decreases that label, so sum(label) is strictly decreasing
  * until the fixpoint — one cheap scalar agg replaces a changed-rows
  * anti-join.
  *
  * Scale posture: rounds = graph diameter. Near-dup clusters are
  * overwhelmingly small and star-shaped (diameter ≤ ~4 even at corpus
  * scale), so the bound is effectively constant; a pathological chain
  * would call for the alternating large-star/small-star variant
  * (Kiveris et al., "Connected Components in MapReduce and Beyond"),
  * which this loop structure accommodates without new machinery.
  * localCheckpoint truncates lineage each round so plan depth (and
  * re-analysis cost) stays O(1) across iterations instead of O(rounds).
  */
object ConnectedComponents {

  /** @param nodes single-column `id` frame (isolated nodes keep their own
    *              id as the component label)
    * @param edges two-column `src`/`dst` frame, undirected semantics
    *              (symmetrized internally, self-loops harmless)
    * @return (`id`, `component`) with component = min id reachable */
  def run(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = nodes.select(col("id"), col("id").as("component"))
      .localCheckpoint()
    def labelSum(df: DataFrame): BigDecimal = BigDecimal(
      df.agg(coalesce(sum(col("component").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head.getDecimal(0))
    var prevSum = BigDecimal(0)
    var curSum = labelSum(labels)
    var it = 0
    do {
      prevSum = curSum
      val prop = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("component"))
      labels = labels.union(prop)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint()
      curSum = labelSum(labels)
      it += 1
    } while (curSum < prevSum && it < maxIter)
    labels
  }
}
