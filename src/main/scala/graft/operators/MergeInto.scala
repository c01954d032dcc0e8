package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE INTO row semantics over an immutable columnar store — the one
  * piece of Iceberg behavior reachable without a catalog jar: WHEN MATCHED
  * update / WHEN NOT MATCHED insert / WHEN NOT MATCHED BY SOURCE delete,
  * expressed as a single full-outer equi-join on the merge key plus one
  * conditional projection, then a copy-on-write rewrite of the target
  * (ref bodo/io/iceberg/merge_into.py, tests
  * BodoSQL/bodosql/tests/test_iceberg_merge_into/).
  *
  * Scale posture: one shuffle (the full-outer join on the key) and one
  * write. A table format with file-level stats (Iceberg/Delta) would prune
  * the rewrite to touched files; over raw parquet the rewrite is the whole
  * table — correct, and exactly what Iceberg's copy-on-write mode does per
  * touched file. No collect, no driver-side row logic.
  */
object MergeInto {

  /** Merge `source` into `target` on equality of `key`.
    *
    * The source must have at most one row per key — SQL MERGE / Iceberg
    * raise on ambiguous matches rather than fan the target row out, and so
    * does this operator: a per-key window count guards the source side and
    * any duplicate key fails the job with a clear message at execution
    * time. The guard shuffles the source on the same key as the join, so
    * it adds no new partitioning requirement.
    *
    * @param cols            non-key columns of both sides (same names)
    * @param whenMatched     value for column c on a matched row; source-side
    *                        columns are visible as s_<c>, target-side as t_<c>
    * @param whenNotMatched  value for column c on a source-only row (insert)
    * @param deleteNotMatchedBySource  drop target-only rows when true
    *                        (WHEN NOT MATCHED BY SOURCE THEN DELETE);
    *                        keep them unchanged when false
    */
  def merge(target: DataFrame, source: DataFrame, key: String,
            cols: Seq[String],
            whenMatched: String => Column,
            whenNotMatched: String => Column,
            deleteNotMatchedBySource: Boolean): DataFrame = {
    val t = target.select(col(key).as("__tk") +: cols.map(c => col(c).as(s"t_$c")): _*)
    val s = source.select(col(key).as("__sk") +: cols.map(c => col(c).as(s"s_$c")): _*)
      .withColumn("__sk",
        when(count(lit(1)).over(Window.partitionBy(col("__sk"))) > 1,
          raise_error(concat(
            lit("MERGE: multiple source rows match target key "),
            col("__sk").cast("string"))))
          .otherwise(col("__sk")))
    val j = t.join(s, col("__tk") === col("__sk"), "full_outer")
    val matched = col("__tk").isNotNull && col("__sk").isNotNull
    val sourceOnly = col("__tk").isNull
    val targetOnly = col("__sk").isNull
    val kept = if (deleteNotMatchedBySource) j.filter(!targetOnly) else j
    kept.select(
      coalesce(col("__tk"), col("__sk")).as(key) +:
        cols.map(c =>
          when(matched, whenMatched(c))
            .when(sourceOnly, whenNotMatched(c))
            .otherwise(col(s"t_$c")).as(c)): _*)
  }
}
