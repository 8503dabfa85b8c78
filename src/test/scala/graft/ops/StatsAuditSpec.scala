package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand fixtures for the round-6 statistics / audit kernels: interval
  * coalescing boundaries (q139), equi-depth bucket assignment at an
  * exactly-divisible boundary (q142), Benford flagging on planted digits
  * (q143), and the IVM zero-count-drop rule (q144).
  */
class StatsAuditSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def writeEvents(dir: String, rows: Seq[(Long, Long)]): Unit =
    rows.toDF("user_id", "sec")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("q139: touching intervals merge, true gaps split") {
    val dir = tmp("coalesce")
    // user 1: [0,600) and [600,1200) TOUCH (lo == running max end) →
    // one island; 2000 opens a second. user 2: single event.
    writeEvents(dir, Seq((1L, 0L), (1L, 600L), (1L, 2000L), (2L, 50L)))
    val got = Intervals.q139IntervalCoalesce.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 0L, 1200L, 2L), (1L, 2000L, 2600L, 1L), (2L, 50L, 650L, 1L)))
  }

  test("q139: duplicate timestamps land in one island") {
    val dir = tmp("coalesce2")
    writeEvents(dir, Seq((1L, 100L), (1L, 100L), (1L, 100L)))
    val got = Intervals.q139IntervalCoalesce.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 100L, 700L, 3L)))
  }

  test("q142: exactly-divisible boundaries give one value per bucket") {
    val dir = tmp("hist")
    // 8 distinct prices, one row each: cum ends 1..8 over n=8, so bucket
    // (cum−1)·8 div 8 = cum−1 — any float-division rounding would smear
    // a boundary value into a neighbor bucket.
    (1 to 8).map(i => (i.toLong, i.toDouble)).toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Layout.q142EquidepthHist.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == (0 to 7).map(b =>
      (b.toLong, (b + 1) * 100L, (b + 1) * 100L, 1L, 1L)))
  }

  test("q143: all-digit-1 amounts flag every digit") {
    val dir = tmp("benford")
    // 10 prices all starting with '1' → obs(1)=10⁶ ppm vs 301030
    // expected; every other digit reads 0 vs >20000 ppm expected.
    (1 to 10).map(i => (i.toLong, 100.0 + i)).toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Snapshot.q143BenfordAudit.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4)))
    assert(got.length == 9)
    assert(got.head == ((1L, 10L, 1000000L, true)))
    assert(got.tail.forall { case (_, n, ppm, flagged) =>
      n == 0L && ppm == 0L && flagged
    })
  }

  test("q144: a fully-deleted group drops out; deltas apply exactly") {
    val dir = tmp("ivm")
    // prio X: keys 7 and 70 (both %7=0, %10≠9) → both deleted → X gone.
    // prio Y: key 1 survives untouched, key 5 updated (+100), key 9 is
    // an insert (not in base, %7/% 5 rules don't touch inserts).
    Seq((7L, "X", 10.0), (70L, "X", 20.0),
      (1L, "Y", 1.0), (5L, "Y", 2.0), (9L, "Y", 4.0))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Snapshot.q144IvmDeltaAgg.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("Y", 3L, 1.0 + 102.0 + 4.0)))
  }
}
