package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Replay-totality contract of [[StreamGate.committedBatchesBefore]] (the
  * q296/q301 accumulator read): enumerate committed `batch=K` subdirs with
  * K < id, never the replaying trigger's own (possibly half-born) dir, and
  * never whole-directory schema inference — a crash mid-FIRST-write leaves
  * only `batch=0/_temporary`, and inference over that throws, which would
  * wedge the replay permanently (the round-9 session-3 review finding). */
class CommittedBatchesSpec extends SparkSpec {

  private def empty =
    spark.range(0).select(col("id").as("k"), (col("id") * 2).as("v"))

  test("missing store and no-committed-batches store both read as empty") {
    val work = Files.createTempDirectory("graft-cbb-")
    val store = work.resolve("acc").toString
    assert(StreamGate.committedBatchesBefore(spark, store, 5L, empty).count() == 0)
    // Half-born first write: only _temporary exists — the exact crash
    // shape; a schema-inferring read of the store root throws here.
    Files.createDirectories(work.resolve("acc").resolve("batch=0").resolve("_temporary"))
    assert(StreamGate.committedBatchesBefore(spark, store, 1L, empty).count() == 0)
  }

  test("latestGenBefore skips half-born generations instead of throwing or shadowing") {
    val work = Files.createTempDirectory("graft-lgb-")
    val store = work.resolve("gens").toString
    assert(StreamGate.latestGenBefore(spark, store, 5L).isEmpty)
    spark.range(0, 3).select(col("id").as("k")).write.parquet(s"$store/gen=1")
    // Interrupted cleanup: gen=2 exists but holds no committed data file.
    // It must neither throw nor shadow the complete gen=1.
    Files.createDirectories(work.resolve("gens").resolve("gen=2").resolve("_temporary"))
    val got = StreamGate.latestGenBefore(spark, store, 5L)
    assert(got.isDefined && got.get.count() == 3)
  }

  test("reads the union of committed batches strictly below id") {
    val work = Files.createTempDirectory("graft-cbb2-")
    val store = work.resolve("acc").toString
    spark.range(0, 3).select(col("id").as("k"), (col("id") * 2).as("v"))
      .write.parquet(s"$store/batch=0")
    spark.range(3, 5).select(col("id").as("k"), (col("id") * 2).as("v"))
      .write.parquet(s"$store/batch=1")
    // The replaying trigger's own dir is excluded even when present and
    // committed (a prior attempt may have finished the write then died
    // before the checkpoint commit).
    spark.range(5, 9).select(col("id").as("k"), (col("id") * 2).as("v"))
      .write.parquet(s"$store/batch=2")
    val got = StreamGate.committedBatchesBefore(spark, store, 2L, empty)
    assert(got.count() == 5)
    assert(rowStrings(got) ==
      rowStrings(spark.range(0, 5).select(col("id").as("k"), (col("id") * 2).as("v"))))
  }
}
