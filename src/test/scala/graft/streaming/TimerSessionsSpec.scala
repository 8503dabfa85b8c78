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

  private def runOnce(inDir: String = dir, outDir: String = out,
      ckptDir: String = ckpt, watermark: String = "10 seconds"): Unit = {
    val ev = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP")
      .parquet(inDir)
      .withWatermark("ts", watermark)
      .as[TimerSessions.Ev]
    val q = TimerSessions.closedSessions(ev, gapMinutes = 30).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckptDir)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def closed(outDir: String = out): Seq[TimerSessions.Closed] =
    spark.read.parquet(outDir).as[TimerSessions.Closed].collect().toSeq
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

  test("late-but-within-watermark event extends the session, never shrinks it") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val r = s"$root/ooo"
    val (in2, out2, ck2) = (s"$r/in", s"$r/out", s"$r/ckpt")
    try {
      // Run 1: user 1 opens a session [10:00, 10:20] — deadline 10:50.
      // Watermark delay is 2 h, so the final watermark is 08:20: nothing fires.
      Seq((1L, ts(10, 0)), (1L, ts(10, 20))).toDF("user_id", "ts")
        .write.mode("append").parquet(in2)
      runOnce(in2, out2, ck2, watermark = "2 hours")
      assert(closed(out2).isEmpty)

      // Run 2 (watermark still 08:20 from run 1): two late user-1 events —
      // 08:30, a FULL gap before the open session's start, which can never
      // join it and closes immediately as its own singleton session (the
      // batch semantics); and 09:55, within a gap of the start, which is
      // absorbed (start extends down, `last` must NOT shrink). The user-9
      // event at 12:40 advances the watermark to 10:40 — past the WRONG
      // deadline a shrunken session would have (10:25), before the TRUE
      // one (10:50): the open session must survive.
      Seq((1L, ts(8, 30)), (1L, ts(9, 55)), (9L, ts(12, 40)))
        .toDF("user_id", "ts")
        .write.mode("append").parquet(in2)
      runOnce(in2, out2, ck2, watermark = "2 hours")
      assert(closed(out2).filter(_.user_id == 1L) === Seq(
        TimerSessions.Closed(1L, ts(8, 30).getTime, ts(8, 30).getTime, 1L)),
        s"expected only the very-late singleton closed: ${closed(out2)}")

      // Run 3: the user-9 event at 13:00 advances the watermark to 11:00 >
      // 10:50, firing the open session's timer: [09:55, 10:20], 3 events.
      Seq((9L, ts(13, 0))).toDF("user_id", "ts")
        .write.mode("append").parquet(in2)
      runOnce(in2, out2, ck2, watermark = "2 hours")
      val u1 = closed(out2).filter(_.user_id == 1L)
      assert(u1 === Seq(
        TimerSessions.Closed(1L, ts(8, 30).getTime, ts(8, 30).getTime, 1L),
        TimerSessions.Closed(1L, ts(9, 55).getTime, ts(10, 20).getTime, 3L)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
