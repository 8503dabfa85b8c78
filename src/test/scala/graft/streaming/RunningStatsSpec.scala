package graft.streaming

import java.nio.file.Paths

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** transformWithState running stats must agree with the batch groupBy
  * aggregate over the same fixture (latest update per user = batch total),
  * and state must persist across query restarts via the checkpoint (second
  * batch folds into the first's RocksDB state, not a fresh count). */
class RunningStatsSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val root = Paths.get("target", "tmp", "twsfix").toAbsolutePath.toString
  private val dir = s"$root/in"
  private val out = s"$root/out"
  private val ckpt = s"$root/ckpt"

  // Integer-valued doubles: sums are exact in any accumulation order.
  private val batch1 = Seq(
    RunningStats.Ev(1L, "click", 1.0),
    RunningStats.Ev(1L, "purchase", 10.0),
    RunningStats.Ev(2L, "view", 2.0))
  private val batch2 = Seq(
    RunningStats.Ev(1L, "purchase", 5.0),
    RunningStats.Ev(3L, "click", 3.0))

  override def beforeAll(): Unit = {
    super.beforeAll()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  private def runOnce(): Unit = {
    val ev = spark.readStream
      .schema("user_id LONG, event_type STRING, value DOUBLE")
      .parquet(dir)
      .as[RunningStats.Ev]
    val q = RunningStats.perUserStats(ev).writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def emitted(): Map[Long, Seq[RunningStats.Stat]] =
    spark.read.parquet(out).as[RunningStats.Stat].collect()
      .groupBy(_.user_id).view.mapValues(_.sortBy(_.n_events).toSeq).toMap

  test("running stats fold state across restarts and match the batch aggregate") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      batch1.toDS().write.mode("append").parquet(dir)
      runOnce()
      val afterB1 = emitted()
      assert(afterB1(1L).last === RunningStats.Stat(1L, 2L, 1L, 11.0))
      assert(afterB1(2L).last === RunningStats.Stat(2L, 1L, 0L, 2.0))

      // Second query over the same checkpoint: only the NEW file is read
      // and its rows fold into the RocksDB state recovered from ckpt.
      batch2.toDS().write.mode("append").parquet(dir)
      runOnce()
      val afterB2 = emitted()
      assert(afterB2(1L).last === RunningStats.Stat(1L, 3L, 2L, 16.0),
        "state must carry across restarts via the checkpoint")
      assert(afterB2(3L).last === RunningStats.Stat(3L, 1L, 0L, 3.0))
      assert(afterB2(2L).size === 1, "untouched key emits nothing in run 2")

      // Batch-aggregate parity: latest stat per user == groupBy over all data.
      val oracle = (batch1 ++ batch2).toDS()
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          count_if(col("event_type") === "purchase").as("np"),
          sum(col("value")).as("total"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      oracle.foreach { case (u, (n, np, total)) =>
        assert(afterB2(u).last === RunningStats.Stat(u, n, np, total), s"user $u")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
