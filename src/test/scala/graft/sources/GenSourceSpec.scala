package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSv2 contract checks for the generator source: column pruning reaches
  * the scan, partition planning covers the row range exactly once, and
  * degenerate sizes behave. */
class GenSourceSpec extends SparkSpec {

  private def gen(rows: Long, parts: Int) =
    spark.read.format("graft.sources.GenSource")
      .option("rows", rows.toString)
      .option("numPartitions", parts.toString).load()

  test("required-column pruning reaches the scan") {
    val plan = gen(100, 4).select(col("val")).queryExecution.executedPlan
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("val"))
  }

  test("partition planning covers [0, rows) exactly once") {
    // rows not divisible by partitions: the tail split must not drop rows.
    val df = gen(1003, 7)
    assert(df.rdd.getNumPartitions == 7)
    assert(df.count() == 1003)
    assert(df.agg(sum(col("id"))).collect()(0).getLong(0) == 1003L * 1002 / 2)
  }

  test("single row and more partitions than rows") {
    assert(gen(1, 8).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 0L)))
    assert(gen(3, 8).count() == 3)
  }

  test("each micro-batch re-slices its admitted range to numPartitions") {
    val work = java.nio.file.Files.createTempDirectory("genslice")
    val q = spark.readStream.format("graft.sources.GenSource")
      .option("rows", "600").option("batchSize", "600")
      .option("numPartitions", "4").load()
      // spark_partition_id() observes the actual reader task layout.
      .selectExpr("id", "spark_partition_id() AS pid")
      .writeStream.format("parquet")
      .option("path", work.resolve("out").toString)
      .option("checkpointLocation", work.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(work.resolve("out").toString)
    assert(got.count() == 600)
    val pids = got.select("pid").distinct().count()
    assert(pids == 4, s"one admitted range must read as 4 partitions, saw $pids")
  }

  test("streaming drain runs MULTIPLE admission-bounded micro-batches") {
    val work = java.nio.file.Files.createTempDirectory("genstream")
    val q = spark.readStream.format("graft.sources.GenSource")
      .option("rows", "1000").option("batchSize", "300").load()
      .writeStream.format("parquet")
      .option("path", work.resolve("out").toString)
      .option("checkpointLocation", work.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(work.resolve("out").toString)
    assert(got.count() == 1000)
    assert(got.agg(org.apache.spark.sql.functions.sum("id"))
      .collect()(0).getLong(0) == 1000L * 999 / 2)
    // ceil(1000/300) = 4 triggers → ≥4 committed batches in the sink log.
    val batches = new java.io.File(work.resolve("out").resolve("_spark_metadata").toString)
      .list().count(_.forall(_.isDigit))
    assert(batches >= 4, s"expected >=4 micro-batches, saw $batches")
  }
}
