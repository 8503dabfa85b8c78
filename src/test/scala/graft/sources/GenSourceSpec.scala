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
}
