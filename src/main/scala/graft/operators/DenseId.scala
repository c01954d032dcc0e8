package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Scale-safe dense numbering in key order — the pandas `ngroup()` /
  * categorical-code builder without the single-partition window.
  *
  * `dense_rank() OVER (ORDER BY …)` plans a SinglePartition WindowExec:
  * every row serializes through one task, which is fine for a handful of
  * post-aggregation keys but a scale cliff for a high-cardinality
  * dictionary. This operator numbers rows with a range-partitioned sort
  * (parallel) followed by RDD zipWithIndex — one extra count job to learn
  * per-partition offsets, then a narrow map. Two parallel passes, no
  * single-partition exchange at any size.
  *
  * Ties: zipWithIndex assigns DISTINCT consecutive ids, so callers must
  * pass rows already distinct on the sort key (group keys out of an
  * aggregate, a `.distinct()` dictionary) — exactly where dense ids are
  * well-defined anyway.
  *
  * Reference analog: categorical code assignment
  * (bodo/hiframes/pd_categorical_ext.py:51) and groupby.ngroup
  * (bodo/hiframes/pd_groupby_ext.py), both of which the reference computes
  * with a distributed sort + prefix offsets — the same shape as here.
  */
object DenseId {
  /** Append `outCol` (long, 0-based) numbering `df`'s rows in `order`. */
  def zipIndex(df: DataFrame, order: Seq[Column], outCol: String): DataFrame = {
    val sorted = df.sort(order: _*)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
