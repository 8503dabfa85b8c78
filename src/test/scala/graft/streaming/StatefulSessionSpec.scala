package graft.streaming

import java.nio.file.Paths

import graft.SparkSpec
import graft.ops.Events
import org.scalatest.BeforeAndAfterAll

/** flatMapGroupsWithState sessionization must agree with the oracle-gated
  * session_window query on the same fixture. */
class StatefulSessionSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val dir = Paths.get("target", "tmp", "statefix").toAbsolutePath.toString
  private def ns(minutes: Long): Long = minutes * 60L * 1000000000L

  override def beforeAll(): Unit = {
    super.beforeAll()
    Seq(
      (1L, ns(0), 1L, "click", 1.0, """{"k": 1}"""),
      (2L, ns(29), 1L, "view", 2.0, """{"k": 2}"""),
      (3L, ns(60), 1L, "purchase", 3.0, """{"k": 3}"""),
      (4L, ns(95), 1L, "view", 4.0, """{"k": 4}"""),
      (5L, ns(5), 2L, "click", 5.0, """{"k": 5}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("custom-state sessions match session_window semantics") {
    val ev = graft.Tables(spark, dir, "events")
      .selectExpr("user_id", "unix_micros(ts) AS ts_us")
      .as[StatefulSession.Ev]
    val sessions = StatefulSession.sessionize(ev, gapMinutes = 30).collect()

    // per-user (n_sessions, n_events) from the custom-state path
    val mine = sessions.groupBy(_.user_id).map { case (u, ss) =>
      u -> ((ss.length.toLong, ss.map(_.n_events).sum))
    }
    val oracle = Events.q22Sessionize.fn(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events")))).toMap
    assert(mine == oracle)
    // user 1: sessions [0,29], [60], [95] → 3 sessions
    assert(mine(1L) == ((3L, 4L)))
  }

  test("session boundaries are exact event times") {
    val ev = Seq(StatefulSession.Ev(7L, 0L), StatefulSession.Ev(7L, 100L),
      StatefulSession.Ev(7L, 30L * 60L * 1000000L + 100L)).toDS()
    val ss = StatefulSession.sessionize(ev, 30).collect().sortBy(_.start_us)
    assert(ss.length == 2)
    assert(ss(0).start_us == 0L && ss(0).end_us == 100L && ss(0).n_events == 2L)
    assert(ss(1).n_events == 1L)
  }
}
