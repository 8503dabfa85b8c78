package graft.ops

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Two-writer interleaves at the PER-TABLE GenStore layer — the lease
  * protocol StoreManifestSpec proves at the store ROOT, exercised here
  * through the actual per-table maintenance entry points
  * ([[Dedup.compactBandIndex]] / [[Dedup.forgetDocs]], the same
  * `GenStore.withLease` path [[Similarity.ivfAppend]] and the streaming
  * maintenance gates share): a live holder rejects the second writer AT
  * ACQUIRE, and a stalled writer whose lease was TTL-taken-over is
  * refused at the promote-time ownership re-check — before the
  * destructive pointer rename, not after. */
class StorePerTableRaceSpec extends SparkSpec {
  import spark.implicits._

  private def freshBandIndex(): String = {
    val work = Files.createTempDirectory("graft-ptrace-")
    org.apache.commons.io.FileUtils.forceDeleteOnExit(work.toFile)
    val idx = work.resolve("bandidx").toString
    (0L to 9L).map(i => (i, s"b${i % 3}")).toDF("doc_id", "bh")
      .write.mode("overwrite").parquet(s"$idx/batch=0")
    (10L to 19L).map(i => (i, s"b${i % 3}")).toDF("doc_id", "bh")
      .write.mode("overwrite").parquet(s"$idx/batch=1")
    (20L to 29L).map(i => (i, s"b${i % 3}")).toDF("doc_id", "bh")
      .write.mode("overwrite").parquet(s"$idx/batch=2")
    idx
  }

  test("per-table two-writer race: a live lease holder rejects BOTH " +
    "maintenance writers at acquire; after release they proceed") {
    val idx = freshBandIndex()
    val base = new Path(idx)
    val fs = GenStore.fsOf(spark, idx)
    // Writer A is mid-run (lease held, heartbeat implied by a fresh
    // epoch). Writers B and C — a compaction and a purge overlapping a
    // live run, the realistic cron-overlap pair — must fail loudly at
    // acquire, BEFORE touching any state.
    GenStore.acquireLease(fs, base, "writer-A")
    val eb = intercept[IllegalStateException] {
      Dedup.compactBandIndex(spark, idx, keepRecent = 1)
    }
    assert(eb.getMessage.contains("held by"))
    val ec = intercept[IllegalStateException] {
      Dedup.forgetDocs(spark, idx, Seq(0L).toDF("doc_id"))
    }
    assert(ec.getMessage.contains("held by"))
    // The refused writers changed nothing: no generation pointer exists.
    assert(!fs.exists(new Path(base, "_bandgen-1")))
    // A releases cleanly; the same maintenance now runs to completion.
    GenStore.releaseLease(fs, base, "writer-A")
    Dedup.compactBandIndex(spark, idx, keepRecent = 1)
    assert(fs.exists(new Path(base, "_bandgen-1")))
    assert(spark.read.parquet(Dedup.bandIndexRoot(spark, idx)).count() == 30)
  }

  test("per-table mid-run takeover: after a TTL takeover runs a full " +
    "maintenance pass, the stalled writer's promote is refused at the " +
    "ownership re-check") {
    val idx = freshBandIndex()
    val base = new Path(idx)
    val fs = GenStore.fsOf(spark, idx)
    // Writer A acquired and then STALLED (heartbeat dead — simulated by
    // aging the lease's content epoch AND mtime past B's 30-min TTL; the
    // direct acquire has no renewal daemon, so nothing re-freshens it).
    GenStore.acquireLease(fs, base, "stalled-A")
    val aLease = new GenStore.Lease(fs, base, "stalled-A")
    val leasePath = new Path(base, GenStore.LeaseName)
    val agedEpoch = System.currentTimeMillis() - 31L * 60 * 1000
    val out = fs.create(leasePath, true)
    try out.write(s"stalled-A\n$agedEpoch".getBytes("UTF-8"))
    finally out.close()
    fs.setTimes(leasePath, agedEpoch, -1)
    // Writer B's purge takes over the stale lease, publishes gen=1, and
    // releases — a complete interleaving maintenance pass.
    Dedup.forgetDocs(spark, idx, Seq(1L).toDF("doc_id"))
    assert(fs.exists(new Path(base, "_bandgen-1")))
    assert(spark.read.parquet(Dedup.bandIndexRoot(spark, idx))
      .filter(col("doc_id") === 1L).count() == 0)
    // A wakes up believing it still owns the store and tries to promote
    // its own staged generation: the pre-rename ownership re-check must
    // refuse (B's generation survives untouched).
    val genDir = s"$idx/gen=2"
    Seq((999L, "bX")).toDF("doc_id", "bh")
      .write.mode("overwrite").parquet(s"$genDir/batch=0")
    val e = intercept[IllegalStateException] {
      GenStore.promote(fs, base, "_bandgen-", 2L, 1L, Seq.empty,
        Some(aLease))
    }
    assert(e.getMessage.contains("taken") || e.getMessage.contains("held"))
    // The takeover's published generation is still the live one and the
    // stalled writer's pointer never committed.
    assert(fs.exists(new Path(base, "_bandgen-1")))
    assert(!fs.exists(new Path(base, "_bandgen-2")))
    assert(spark.read.parquet(Dedup.bandIndexRoot(spark, idx))
      .filter(col("doc_id") === 999L).count() == 0)
  }
}
