package graft

/** Dev tool: write `.explain("formatted")` for a set of SparkEntry queries
  * to files — the before/after plan evidence for optimization rounds
  * (`sbt "runMain graft.PlanDump <outDir> <suffix> <query1> [query2 ...]"`).
  * Each query is EXECUTED first so the printed plan is the AQE-final one
  * (isFinalPlan=true) — the initial plan hides coalescing, SMJ→BHJ/SHJ
  * rewrites and skew splits; the suffix (`before`/`after`) names the file
  * `<outDir>/<query>_<suffix>.txt`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), formatted)
      println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
