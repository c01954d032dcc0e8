package graft.sources

import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.spark

/** The session Hadoop conf must reach executor-side file readers: on a
  * real cluster it carries s3a credentials and filesystem tuning — a
  * bare `new Configuration()` in the reader would silently drop them
  * (works on file://, fails on s3a://). The factory captures a
  * SerializableConfiguration at plan time; this spec pins the plumbing.
  */
class SnapshotConfSpec extends AnyFunSuite {
  import spark.implicits._

  test("session hadoop conf key survives into the partition reader factory") {
    val root = "/tmp/graft_snaplog_spec/confthread"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    SnapshotLog.commit(Seq(1, 2).toDF("x"), root, overwrite = true, 100L)

    spark.sparkContext.hadoopConfiguration.set("graft.test.conf.key", "tok-123")
    try {
      val df = spark.read.format("snapshotlog").load(root)
      val scan = df.queryExecution.optimizedPlan.collect {
        case r: DataSourceV2ScanRelation => r.scan.asInstanceOf[SnapshotLogScan]
      }.head
      val factory = scan.createReaderFactory()
        .asInstanceOf[SnapshotLogReaderFactory]
      assert(factory.conf.value.get("graft.test.conf.key") === "tok-123")
      // and the reader actually runs with it (fresh copy, projection-safe)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.IntegerType)))
      val total = scan.planInputPartitions().map { p =>
        val rdr = new SnapshotFileReader(
          p.asInstanceOf[SnapshotFilePartition].file, schema,
          Nil, Map.empty, Some(factory.conf.value))
        try Iterator.continually(rdr.next()).takeWhile(identity).size
        finally rdr.close()
      }.sum
      assert(total === 2)
    } finally spark.sparkContext.hadoopConfiguration.unset("graft.test.conf.key")
  }
}
