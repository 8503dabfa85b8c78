package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The semantic layer's two claims, checked directly: the catalog
  * compiles to ONE scan (plan-asserted), and each metric's semantics
  * survive the fusion (hand-computed fixture). */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("catalog fuses to a single scan and preserves each metric") {
    val dir = java.nio.file.Files.createTempDirectory("metrics").toString
    Seq(
      (1L, 10L, 100.0, "1-URGENT", java.sql.Timestamp.valueOf("1996-03-01 00:00:00")),
      (2L, 10L, 50.0, "2-HIGH", java.sql.Timestamp.valueOf("1997-01-01 00:00:00")),
      (3L, 20L, 25.5, "1-URGENT", java.sql.Timestamp.valueOf("1996-12-31 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority",
        "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val df = Metrics.compiled(spark.read.parquet(s"$dir/orders.parquet"))
    // sparkPlan, not executedPlan: AQE wraps the tree until execution and
    // hides the scan nodes from collect.
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.length == 1, s"expected ONE fused scan, got ${scans.length}")
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "n_buyers" -> 2L, "n_orders" -> 3L, "orders_1996" -> 2L,
      "revenue_cents" -> 17550L, "revenue_cents_urgent" -> 12550L))
  }
}
