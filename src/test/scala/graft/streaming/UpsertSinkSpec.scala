package graft.streaming

import java.nio.file.Paths

import graft.SparkSpec
import org.scalatest.BeforeAndAfterAll

/** foreachBatch upsert publish: last-writer-wins by (key, seq) within a
  * batch, across batches, and under replay of an already-published batch
  * (idempotence — the effective-exactly-once property). */
class UpsertSinkSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val root = Paths.get("target", "tmp", "upsink").toAbsolutePath.toString
  private val in = s"$root/in"
  private val snap = s"$root/snap"
  private val ckpt = s"$root/ckpt"

  override def beforeAll(): Unit = {
    super.beforeAll()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  private def runOnce(): Unit = {
    val st = spark.readStream.schema("key STRING, seq LONG, v STRING").parquet(in)
    UpsertSink.publish(st, snap, ckpt).awaitTermination()
  }

  private def snapshot(): Map[String, (Long, String)] =
    spark.read.parquet(s"$snap/current").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap

  test("streamed batches merge into a keyed snapshot, last writer wins") {
    // Batch 1 carries two versions of key a — within-batch LWW.
    Seq(("a", 1L, "a1"), ("a", 2L, "a2"), ("b", 1L, "b1"))
      .toDF("key", "seq", "v").write.mode("append").parquet(in)
    runOnce()
    assert(snapshot() === Map("a" -> ((2L, "a2")), "b" -> ((1L, "b1"))))

    // Batch 2: newer a, new c, and a STALE b (seq 0 — a replayed old
    // version must not regress the published row).
    Seq(("a", 3L, "a3"), ("c", 1L, "c1"), ("b", 0L, "b0"))
      .toDF("key", "seq", "v").write.mode("append").parquet(in)
    runOnce()
    assert(snapshot() === Map(
      "a" -> ((3L, "a3")), "b" -> ((1L, "b1")), "c" -> ((1L, "c1"))))

    // Replay batch 2 against the snapshot directly (simulating foreachBatch
    // redelivery after a crash between merge and checkpoint commit): the
    // merge is idempotent, the snapshot is unchanged.
    UpsertSink.mergeBatch(
      Seq(("a", 3L, "a3"), ("c", 1L, "c1"), ("b", 0L, "b0"))
        .toDF("key", "seq", "v"), snap)
    assert(snapshot() === Map(
      "a" -> ((3L, "a3")), "b" -> ((1L, "b1")), "c" -> ((1L, "c1"))))
  }

  test("crash between retire and promote is rolled back, not rebuilt from one batch") {
    val dir = s"$root/crash1"
    UpsertSink.mergeBatch(
      Seq(("a", 1L, "a1"), ("b", 1L, "b1")).toDF("key", "seq", "v"), dir)

    // Simulate the crash window: `current` was renamed aside to retired-*,
    // the staged dir was never promoted. No `current` exists.
    val f = new java.io.File(dir)
    assert(new java.io.File(f, "current").renameTo(new java.io.File(f, "retired-test")))
    val stagedDir = new java.io.File(f, "staged-test")
    stagedDir.mkdirs() // half-written staged output, content irrelevant

    // The next merge must FIRST roll the retired snapshot back, then merge —
    // keys a and b survive even though this batch only carries c.
    UpsertSink.mergeBatch(Seq(("c", 1L, "c1")).toDF("key", "seq", "v"), dir)
    assert(spark.read.parquet(s"$dir/current").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap ===
      Map("a" -> ((1L, "a1")), "b" -> ((1L, "b1")), "c" -> ((1L, "c1"))))
    // Crash leftovers are garbage-collected.
    assert(!f.listFiles().exists(d =>
      d.getName.startsWith("retired-") || d.getName.startsWith("staged-")))
  }

  test("ambiguous crash state (no current, multiple retired) fails loudly") {
    val dir = s"$root/crash2"
    val f = new java.io.File(dir)
    new java.io.File(f, "retired-x").mkdirs()
    new java.io.File(f, "retired-y").mkdirs()
    val ex = intercept[IllegalArgumentException] {
      UpsertSink.mergeBatch(Seq(("a", 1L, "a1")).toDF("key", "seq", "v"), dir)
    }
    assert(ex.getMessage.contains("refusing to rebuild"))
  }
}
