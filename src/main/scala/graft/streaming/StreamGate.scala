package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Oracle-gated streaming execution (SURVEY §2.8): q92 runs the tumbling
  * event-window aggregation through an ACTUAL `writeStream` (file source →
  * watermark → windowed agg → parquet file sink, `Trigger.AvailableNow`)
  * and gates the files the sink wrote against the same DuckDB SQL as the
  * batch q21 — turning the batch-parity theorem the streaming specs prove
  * into a driver-checked CORRECTNESS row.
  *
  * Append mode only emits a window once the watermark passes its end, so
  * the input is staged into a scratch dir with one SENTINEL event appended
  * 80 minutes after the real maximum: the final watermark (max+80m−1h =
  * max+20m) closes every real window (each ends ≤ max+10m) while the
  * sentinel's own window stays open and is never emitted. The sentinel is
  * additionally filtered on read-back, so the checked result is exactly
  * the batch q21 surface.
  *
  * At 100 TB the same topology runs unbounded: the file sink's per-window
  * append IS the incremental publish, and state stays bounded by the
  * 1-hour watermark (windows close and evict as event time advances).
  */
object StreamGate {

  private val Sentinel = "__sentinel__"

  val q92StreamTumbling: Q = Q(
    "q92_stream_tumbling",
    s"""SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS win_start,
       |       event_type,
       |       count(*) AS n,
       |       ${Q.oSum6("value")} AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin) { (s, dir) =>
    val work = Files.createTempDirectory("graft-q92-")
    // EventStream.events reads `<dir>/events.parquet`, so stage into the
    // same layout under the scratch dir.
    val in = work.resolve("in").resolve("events.parquet")
    Files.createDirectories(in)
    // Stage the real events file(s) next to the sentinel.
    val src = Paths.get(dir, "events.parquet")
    if (Files.isDirectory(src)) {
      Files.list(src).forEach { f =>
        if (f.getFileName.toString.endsWith(".parquet"))
          Files.copy(f, in.resolve(f.getFileName.toString),
            StandardCopyOption.REPLACE_EXISTING)
      }
    } else Files.copy(src, in.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    // Sentinel 80 min past the real max ts (written in the stored
    // raw layout: ts as Long nanoseconds).
    val maxTsMicros = Tables(s, dir, "events")
      .agg(max(unix_micros(col("ts")))).collect()(0).getLong(0)
    val sentinelNanos = (maxTsMicros + 80L * 60 * 1000000) * 1000
    s.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(-1L, sentinelNanos, -1L, Sentinel, 0.0, "")),
      EventStream.rawSchema)
      .write.mode("append").parquet(in.toString)

    val out = work.resolve("out").toString
    val agg = EventStream.events(s, work.resolve("in").toString)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), Q.dsum6(col("value")).as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
    val query = agg.writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", work.resolve("ckpt").toString)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()

    s.read.parquet(out)
      .filter(col("event_type") =!= Sentinel)
      .orderBy(col("win_start"), col("event_type"))
  }

  val all: Seq[Q] = Seq(q92StreamTumbling)
}
