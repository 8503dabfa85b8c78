package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale technique demo (SCALE.md "skewed keys → salting or AQE skew-join"):
  * AQE's OptimizeSkewedJoin splits a pathologically hot partition into
  * parallel sub-partitions at runtime — the no-code-change answer to key
  * skew in joins (q42 demonstrates the salting answer for aggregations).
  * Verified by asserting the executed plan marks the sort-merge join
  * `skew=true` and that results are unchanged.
  */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits the hot key's partition and the join result is unchanged") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      // keep post-shuffle coalescing from merging everything back together
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "16KB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      import spark.implicits._
      // 95% of the fact rows share one key — the classic hot-key join.
      val fact = spark.range(200000L)
        .select(
          when(col("id") % 20 =!= 0, lit("hot")).otherwise(concat(lit("k"), col("id")))
            .as("key"),
          col("id").as("v"),
          // padding makes the hot partition's bytes cross the skew threshold
          lpad(col("id").cast("string"), 48, "x").as("pad"))
      val dim = Seq.tabulate(50)(i => (if (i == 0) "hot" else s"k$i", i.toLong))
        .toDF("key", "dim_v")
      val joined = fact.join(dim, "key")
      // collect() (not count()) so THIS DataFrame's AQE plan is the one
      // that executes and finalizes — count() plans a separate aggregate.
      val n = joined.collect().length.toLong
      // expected: hot rows (190k) + k20, k40 (two of the k<1000 cold keys
      // divisible by 20 that exist in dim: k20, k40) — compute exactly:
      val expected = 190000L +
        (0 until 50).count(i => i != 0 && i % 20 == 0 && i < 50).toLong
      assert(n == expected, s"join row count $n != $expected")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE OptimizeSkewedJoin (skew=true) in:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
