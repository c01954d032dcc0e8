package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Library-side accessor for `Dataset.ofRows`, which is `private[sql]` —
  * the standard way for an extension library to materialize a DataFrame
  * from a hand-built `LogicalPlan` (every Spark-native library that ships
  * custom plan nodes carries an equivalent one-liner). No Spark internals
  * are modified; this only re-exports an existing constructor.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
