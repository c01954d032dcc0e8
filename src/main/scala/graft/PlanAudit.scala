package graft

/** Dev tool: execute one SparkEntry query and print its AQE-final join/
  * exchange counts — the quick 100x-scale smell test (`sbt "runMain
  * graft.PlanAudit <query> [sfDir]"`). A broadcast-join count where a
  * sort-merge was expected, or an exchange count that grew a stage, is
  * the first thing to read before timing anything. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val df = SparkEntry.queries(args(0))(spark, args.lift(1).getOrElse("/root/testdata/sf0.01"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println("BROADCAST_JOINS=" + "BroadcastHashJoin".r.findAllIn(p).size)
    println("SMJ=" + "SortMergeJoin".r.findAllIn(p).size)
    println("EXCHANGES=" + ("Exchange".r.findAllIn(p).size - "BroadcastExchange".r.findAllIn(p).size))
    spark.stop()
  }
}
