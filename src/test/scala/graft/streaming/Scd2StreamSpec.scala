package graft.streaming

import java.nio.file.Paths

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** q114's per-trigger publish ([[StreamGate.scd2Publish]]): generations
  * stitched batch-over-batch must equal the full rebuild, and redelivery
  * of an already-published batch (at-least-once) must rewrite its
  * generation with identical rows — the effective-exactly-once property
  * the overwrite + strictly-before base resolution is designed for. */
class Scd2StreamSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val root = Paths.get("target", "tmp", "scd2stream").toAbsolutePath.toString

  override def beforeAll(): Unit = {
    super.beforeAll()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  private def ev(rows: (String, String, String, Long)*) =
    rows.toDF("user_id", "event_type", "tss", "event_id")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")

  // Three nightly batches, strictly increasing in time (the scd2Merge
  // contract): u1 flips attr across batches, u2's open run extends, u3
  // appears only in the last batch.
  private val day1 = ev(
    ("u1", "view", "2024-01-01 10:00:00", 1L),
    ("u1", "click", "2024-01-01 11:00:00", 2L),
    ("u2", "view", "2024-01-01 12:00:00", 3L))
  private val day2 = ev(
    ("u1", "click", "2024-01-02 09:00:00", 4L),
    ("u2", "view", "2024-01-02 10:00:00", 5L))
  private val day3 = ev(
    ("u1", "view", "2024-01-03 08:00:00", 6L),
    ("u3", "buy", "2024-01-03 09:00:00", 7L))

  private def gen(store: String, id: Long) =
    spark.read.parquet(s"$store/gen=$id")

  test("stitched generations equal the full rebuild; replay is idempotent") {
    val store = s"$root/store"
    StreamGate.scd2Publish(store, day1, 0L)
    StreamGate.scd2Publish(store, day2, 1L)
    StreamGate.scd2Publish(store, day3, 2L)

    val full = graft.ops.Events.scd2Of(day1.union(day2).union(day3))
    assert(rowStrings(gen(store, 2L)) === rowStrings(full),
      "final generation must equal the full-rebuild SCD2 history")

    // Mid-stream generation equals the rebuild over its prefix.
    assert(rowStrings(gen(store, 1L)) ===
      rowStrings(graft.ops.Events.scd2Of(day1.union(day2))))

    // At-least-once redelivery of the LAST batch: the publish re-resolves
    // its base as gen=1 (strictly before id=2, never its own output) and
    // overwrites gen=2 with identical rows.
    val before = rowStrings(gen(store, 2L))
    StreamGate.scd2Publish(store, day3, 2L)
    assert(rowStrings(gen(store, 2L)) === before,
      "replayed batch must rewrite its generation unchanged")
    // Earlier generations are untouched by the replay.
    assert(rowStrings(gen(store, 1L)) ===
      rowStrings(graft.ops.Events.scd2Of(day1.union(day2))))
  }

  test("q126 vocabPublish: merged counters equal the one-shot aggregate") {
    val store = s"$root/vocab"
    def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")
    val b0 = docs((1L, "a b a"), (2L, "a c"))
    val b1 = docs((3L, "a b"), (4L, "d"))
    StreamGate.vocabPublish(store, b0, 0L)
    StreamGate.vocabPublish(store, b1, 1L)
    val want = b0.union(b1)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf"))
    assert(rowStrings(gen(store, 1L).orderBy("tok"))
      === rowStrings(want.orderBy("tok")),
      "streamed counter merge must equal the batch aggregate")
    // Replay of the last batch resolves its base as gen=0 → unchanged.
    val before = rowStrings(gen(store, 1L).orderBy("tok"))
    StreamGate.vocabPublish(store, b1, 1L)
    assert(rowStrings(gen(store, 1L).orderBy("tok")) === before)
  }

  test("base resolution skips the batch's own stale output") {
    val store = s"$root/crash"
    StreamGate.scd2Publish(store, day1, 0L)
    // Simulate a crash AFTER gen=1 was written but BEFORE the checkpoint
    // committed, with a DIFFERENT (stale) batch content left behind: the
    // redelivered batch must rebuild from gen=0, not trust gen=1.
    graft.ops.Events.scd2Of(day1.limit(1))
      .write.mode("overwrite").parquet(s"$store/gen=1")
    StreamGate.scd2Publish(store, day2, 1L)
    assert(rowStrings(gen(store, 1L)) ===
      rowStrings(graft.ops.Events.scd2Of(day1.union(day2))),
      "redelivery must overwrite the stale generation from the prior base")
  }
}
