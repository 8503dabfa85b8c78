package graft.ops

import java.nio.file.Paths

import graft.SparkSpec
import org.scalatest.BeforeAndAfterAll

/** Semantics tests for sessionization / windows / as-of join on a crafted
  * events fixture (ts written as raw nanos-epoch Long, matching the driver
  * testdata's TIMESTAMP(NANOS) → nanosAsLong read path in Tables). */
class EventsSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val dir = Paths.get("target", "tmp", "eventsfix").toAbsolutePath.toString
  private def ns(minutes: Long): Long = minutes * 60L * 1000000000L

  override def beforeAll(): Unit = {
    super.beforeAll()
    // user 1: events at t=0, +29min (same session), +29+31min (new session)
    // user 2: single event; click at t=5min before purchase at t=8min
    Seq(
      (1L, ns(0), 1L, "click", 1.0, """{"k": 1}"""),
      (2L, ns(29), 1L, "view", 2.0, """{"k": 2}"""),
      (3L, ns(60), 1L, "purchase", 3.0, """{"k": 3}"""),
      (4L, ns(5), 2L, "click", 4.0, """{"k": 4}"""),
      (5L, ns(8), 2L, "purchase", 5.0, """{"k": 5}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("q22 sessionize: 29min gap merges, 31min gap splits") {
    val rows = Events.q22Sessionize.fn(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"))).toMap
    assert(rows(1L) == (2L, 3L))
    assert(rows(2L) == (1L, 2L)) // 3-minute gap → one session of 2 events
  }

  test("q21 tumbling windows: epoch-aligned 10-minute buckets") {
    val rows = Events.q21Tumbling.fn(spark, dir).collect()
    val starts = rows.map(_.getAs[Long]("win_start")).distinct.sorted.toSeq
    assert(starts == Seq(0L, 1200L, 3600L)) // 0/5/8min→0, 29min→1200, 60min→3600
  }

  test("q24 as-of join: purchase picks most recent prior click per user") {
    val rows = Events.q24AsofJoin.fn(spark, dir).collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        (if (r.isNullAt(1)) None else Some(r.getAs[Long]("click_epoch")))).toMap
    assert(rows(3L) == Some(0L)) // user 1: click at t=0
    assert(rows(5L) == Some(300L)) // user 2: click at t=5min
  }

  test("q20 JSON extraction sums k per event type") {
    val rows = Events.q20Json.fn(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("sum_k")).toMap
    assert(rows("click") == 5L) // k=1 + k=4
    assert(rows("purchase") == 8L)
  }

  test("q111 forward fill: gap days carry the last observation and are marked") {
    // Dedicated fixture: user 1 observed day 0 (two events — later one
    // wins) and day 3; days 1-2 are gaps. User 2 observed day 0 only.
    val fdir = Paths.get("target", "tmp", s"fillfix-${System.nanoTime}")
      .toAbsolutePath.toString
    def dayNs(d: Long, m: Long): Long = d * 1440L * 60L * 1000000000L + ns(m)
    Seq(
      (1L, dayNs(0, 10), 1L, "m", 5.0, "{}"),
      (2L, dayNs(0, 20), 1L, "m", 7.0, "{}"), // later same day → wins
      (3L, dayNs(3, 0), 1L, "m", 9.0, "{}"),
      (4L, dayNs(0, 0), 2L, "m", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$fdir/events.parquet")
    val rows = Events.q111ForwardFill.fn(spark, fdir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("epoch_day")) ->
        (r.getAs[Double]("value"), r.getAs[Boolean]("filled"))).toMap
    assert(rows.size == 5) // user 1: days 0-3; user 2: day 0
    assert(rows((1L, 0L)) == (7.0, false)) // last observation of the day wins
    assert(rows((1L, 1L)) == (7.0, true)) // gap day carries forward
    assert(rows((1L, 2L)) == (7.0, true))
    assert(rows((1L, 3L)) == (9.0, false))
    assert(rows((2L, 0L)) == (1.5, false))
  }

  test("q113 scd2Merge: boundary stitch equals a full rebuild at any cut") {
    // Crafted to hit every boundary case: user 1's run SPANS the cut with
    // the SAME attr (open run extends); user 2 changes attr AT the cut
    // (open run closes at the batch's first event); user 3 appears only
    // in the archive (current row passes through); user 4 only in the
    // batch (versions keep their own numbering).
    val fdir = Paths.get("target", "tmp", s"scd2fix-${System.nanoTime}")
      .toAbsolutePath.toString
    Seq(
      (1L, ns(0), 1L, "a", 0.0, "{}"), (2L, ns(10), 1L, "b", 0.0, "{}"),
      (3L, ns(70), 1L, "b", 0.0, "{}"), (4L, ns(80), 1L, "c", 0.0, "{}"),
      (5L, ns(5), 2L, "a", 0.0, "{}"), (6L, ns(65), 2L, "b", 0.0, "{}"),
      (7L, ns(15), 3L, "a", 0.0, "{}"),
      (8L, ns(75), 4L, "a", 0.0, "{}"), (9L, ns(85), 4L, "b", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$fdir/events.parquet")
    val ev = graft.Tables(spark, fdir, "events")
    val cut = org.apache.spark.sql.functions.col("ts") <
      org.apache.spark.sql.functions.lit("1970-01-01 01:00:00").cast("timestamp")
    val full = Events.scd2Of(ev)
    val inc = Events.scd2Merge(
      Events.scd2Of(ev.filter(cut)), Events.scd2Of(ev.filter(!cut)))
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("user_id"), r.getAs[Long]("version"))
    val fm = full.collect().map(r => key(r) -> r.toSeq).toMap
    val im = inc.collect().map(r => key(r) -> r.toSeq).toMap
    assert(im == fm)
    // Sanity on shape: user 1 has runs a,b,c (b spans the cut, n_events=2).
    val u1 = inc.filter("user_id = 1").collect()
      .map(r => r.getAs[Long]("version") ->
        (r.getAs[String]("attr"), r.getAs[Long]("n_events"))).toMap
    assert(u1 == Map(1L -> ("a", 1L), 2L -> ("b", 2L), 3L -> ("c", 1L)))
  }

  test("q192: bucket-decomposed lag equals the global lag; no row-scale unpartitioned window") {
    // Ids span four non-empty buckets (width 512) with gaps WITHIN buckets,
    // ACROSS adjacent buckets (510→513), and across a run of EMPTY buckets
    // (2000 in b3 → 5000 in b9). 194 = 2·97 is planted for the %97 filter;
    // id 5 appears twice for the distinct.
    val d2 = Paths.get("target", "tmp", "eventsgap").toAbsolutePath.toString
    Seq(1L, 2L, 5L, 5L, 194L, 510L, 513L, 1030L, 2000L, 5000L)
      .map(id => (id, ns(0), 1L, "click", 1.0, """{"k": 1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d2/events.parquet")
    val df = Events.q192IdGapDetection.fn(spark, d2)
    val wins = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, "expected window nodes in the q192 plan")
    val unpart = wins.filter(_.partitionSpec.isEmpty)
    assert(unpart.length == 1,
      s"expected exactly ONE unpartitioned window (the bucket-summary stitch), got ${unpart.length}")
    // …and that one must consume the ≤ #buckets summary, never the id set.
    val stitchCols = unpart.head.child.output.map(_.name).toSet
    assert(stitchCols.contains("bmax") && !stitchCols.contains("event_id"),
      s"unpartitioned window should read the bucket summary, saw columns $stitchCols")
    // Semantics: the global-lag gaps over distinct [1,2,5,510,513,1030,2000,5000].
    val got = df.collect()
      .map(r => (r.getAs[Long]("gap_start"), r.getAs[Long]("gap_end"),
        r.getAs[Long]("n_missing"))).toSeq
    assert(got == Seq(
      (3L, 4L, 2L), (6L, 509L, 504L), (511L, 512L, 2L),
      (514L, 1029L, 516L), (1031L, 1999L, 969L), (2001L, 4999L, 2999L)),
      s"got $got")
  }
}
