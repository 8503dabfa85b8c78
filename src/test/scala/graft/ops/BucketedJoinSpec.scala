package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** Scale technique demo (SCALE.md "co-locate joins via bucketing"): writing
  * both join sides bucketed on the join key lets SortMergeJoin run with NO
  * shuffle exchange — at 100 TB this turns the dominant join cost into a
  * local merge per bucket. Verified by asserting the physical plan contains
  * no ShuffleExchange.
  */
class BucketedJoinSpec extends SparkSpec with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sql("DROP TABLE IF EXISTS graft_bucketed_orders")
    spark.sql("DROP TABLE IF EXISTS graft_bucketed_lineitem")
    // the catalog is in-memory per JVM but table locations persist on disk —
    // remove them or saveAsTable fails with LOCATION_ALREADY_EXISTS
    val wh = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    Seq("graft_bucketed_orders", "graft_bucketed_lineitem").foreach { t =>
      val p = wh.resolve(t)
      if (java.nio.file.Files.exists(p))
        scala.sys.process.Process(Seq("rm", "-rf", p.toString)).!
    }
    graft.Tables(spark, sf, "orders")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_bucketed_orders")
    graft.Tables(spark, sf, "lineitem")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_bucketed_lineitem")
  }

  test("bucketed-by-key join plans with zero shuffle exchanges") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val o = spark.table("graft_bucketed_orders")
      val l = spark.table("graft_bucketed_lineitem")
      val joined = l.join(o, col("l_orderkey") === col("o_orderkey"))
      assert(joined.count() == graft.Tables(spark, sf, "lineitem").count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join, got:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("unbucketed baseline DOES shuffle (sanity check of the assertion)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val o = graft.Tables(spark, sf, "orders")
      val l = graft.Tables(spark, sf, "lineitem")
      val joined = l.join(o, col("l_orderkey") === col("o_orderkey"))
      joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange hashpartitioning"), "baseline should shuffle")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
