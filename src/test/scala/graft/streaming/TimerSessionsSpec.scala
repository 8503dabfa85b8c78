package graft.streaming

import java.nio.file.Paths
import java.sql.Timestamp

import graft.SparkSpec
import org.scalatest.BeforeAndAfterAll

/** Event-time timer sessionization: a session closes exactly once, when the
  * watermark passes last_event + gap — across query restarts, driven only
  * by event time (no wall clock anywhere). */
class TimerSessionsSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val root = Paths.get("target", "tmp", "timerfix").toAbsolutePath.toString
  private val dir = s"$root/in"
  private val out = s"$root/out"
  private val ckpt = s"$root/ckpt"

  private def ts(h: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  override def beforeAll(): Unit = {
    super.beforeAll()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  private def runOnce(): Unit = {
    val ev = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP")
      .parquet(dir)
      .withWatermark("ts", "10 seconds")
      .as[TimerSessions.Ev]
    val q = TimerSessions.closedSessions(ev, gapMinutes = 30).writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def closed(): Seq[TimerSessions.Closed] =
    spark.read.parquet(out).as[TimerSessions.Closed].collect().toSeq
      .sortBy(c => (c.user_id, c.start_ms))

  test("sessions close once via event-time timers, surviving restarts") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // Batch 1: user 1 has 3 events 10:00-10:10; user 3 straddles a gap
      // INSIDE the trigger (10:00 then 11:00 — ≥30 min apart).
      Seq((1L, ts(10, 0)), (1L, ts(10, 5)), (1L, ts(10, 10)),
        (3L, ts(10, 0)), (3L, ts(11, 0)))
        .toDF("user_id", "ts").write.mode("append").parquet(dir)
      runOnce()
      val afterB1 = closed()
      // Two closures inside run 1: user 3's first session closes in-trigger
      // (the straddle needs no timer), and user 1's closes via its timer —
      // the final watermark (10:59:50, from user 3's 11:00 event) passes
      // user 1's 10:40 deadline, and availableNow runs the trailing batch
      // that fires it. User 3's second session (deadline 11:30) stays open.
      assert(afterB1 === Seq(
        TimerSessions.Closed(1L, ts(10, 0).getTime, ts(10, 10).getTime, 3L),
        TimerSessions.Closed(3L, ts(10, 0).getTime, ts(10, 0).getTime, 1L)))

      // Batch 2: a single late-morning event from user 2 pushes the
      // watermark past every pending deadline from batch 1.
      Seq((2L, ts(12, 0))).toDF("user_id", "ts")
        .write.mode("append").parquet(dir)
      runOnce()
      val afterB2 = closed()
      assert(afterB2.contains(
        TimerSessions.Closed(3L, ts(11, 0).getTime, ts(11, 0).getTime, 1L)),
        s"user 3's second session must close via the timer RESTORED from " +
          s"the run-1 checkpoint; got $afterB2")
      // User 2's session is still open (nothing advanced the watermark past
      // 12:30), and nothing closed twice.
      assert(!afterB2.exists(_.user_id == 2L))
      assert(afterB2.size === 3)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
