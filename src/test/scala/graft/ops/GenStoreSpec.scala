package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Crash-window reclamation for the shared generation-pointer protocol:
  * every state a dead maintenance run can leave (stale tmp pointer,
  * unreferenced gen dir, superseded root artifacts after a
  * commit-then-crash) is reclaimed by the NEXT maintenance run, and the
  * live generation keeps answering correctly throughout. */
class GenStoreSpec extends SparkSpec {
  import spark.implicits._

  test("ivfRetrain pre-clean reclaims stale tmp pointers, orphan gens, and superseded root data") {
    // One tmp root per run for BOTH the table and the index (no shared
    // fixed path to race on across concurrent checkouts), reaped on exit.
    val work = Files.createTempDirectory("graft-genstore-")
    org.apache.commons.io.FileUtils.forceDeleteOnExit(work.toFile)
    val big = work.resolve("data").toString
    def unit(axis: Int): Array[Float] =
      Array.tabulate(64)(i => if (i == axis) 1.0f else 0.0f)
    (0 until 256).map(i => (i.toLong, unit(i % 16), (i % 16).toLong))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$big/embeddings.parquet")
    val e = Similarity.embWithNorm(spark, big)
    val idx = work.resolve("idx")
    Similarity.ivfAppend(spark, idx.toString, e, 0L)

    // Simulate a maintenance run that died before its pointer rename:
    // a stale dot-tmp pointer and a half-written, unreferenced gen dir.
    Files.writeString(idx.resolve(".ivfgen-tmp-deadbeef"), "gen=1")
    Files.createDirectories(idx.resolve("gen=1").resolve("centroids"))
    Files.writeString(idx.resolve("gen=1").resolve("junk.txt"), "orphan")

    // The orphan gen dir has no pointer — readers still resolve gen 0.
    assert(Similarity.ivfCurrentRoot(spark, idx.toString) == idx.toString)

    Similarity.ivfRetrain(spark, idx.toString, e, lloydIters = 0)

    assert(!Files.exists(idx.resolve(".ivfgen-tmp-deadbeef")),
      "stale tmp pointer must be reclaimed by the next maintenance run")
    assert(Files.exists(idx.resolve("_ivfgen-1")))
    assert(!Files.exists(idx.resolve("centroids")),
      "superseded root-layout data must be GC'd after the commit")
    assert(Files.exists(idx.resolve("gen=1").resolve("centroids")),
      "the promoted generation replaces the crashed attempt's dir")
    // Simulate commit-then-crash: gen=1 promoted but imagine the root
    // artifacts had survived — a SECOND retrain's pre-clean sweeps any
    // root leftovers and the prior generation after its own promote.
    Files.createDirectories(idx.resolve("assign"))
    Files.writeString(idx.resolve("assign").resolve("leftover.parquet"), "x")
    Similarity.ivfRetrain(spark, idx.toString, e, lloydIters = 0)
    assert(!Files.exists(idx.resolve("assign")),
      "root leftovers from a crashed GC must be reclaimed")
    assert(!Files.exists(idx.resolve("gen=1")), "replaced generation GC'd")
    assert(Files.exists(idx.resolve("_ivfgen-2")))
    // The index still answers: vec 0's top neighbors are its same-axis
    // copies at cosine 1.0 through every generation change.
    val rows = Similarity.ivfQuery(spark, idx.toString, e,
        e.filter(col("vec_id") === 0))
      .orderBy(col("rank")).collect()
    assert(rows.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(16L, 32L, 48L))
    assert(rows.forall(_.getAs[Double]("cos_sim") == 1.0))
  }

  test("writer lease: overlapping maintenance runs -> one winner, one clean rejection, no lost generation") {
    val work = Files.createTempDirectory("graft-genlease-")
    org.apache.commons.io.FileUtils.forceDeleteOnExit(work.toFile)
    val big = work.resolve("data").toString
    def unit(axis: Int): Array[Float] =
      Array.tabulate(64)(i => if (i == axis) 1.0f else 0.0f)
    (0 until 64).map(i => (i.toLong, unit(i % 8), (i % 8).toLong))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$big/embeddings.parquet")
    val e = Similarity.embWithNorm(spark, big)
    val idx = work.resolve("idx")
    Similarity.ivfAppend(spark, idx.toString, e, 0L)

    val base = new org.apache.hadoop.fs.Path(idx.toString)
    val fs = GenStore.fsOf(spark, idx.toString)
    // Run 1 holds the lease (as if mid-maintenance, between preClean and
    // promote — the destructive interleave window). Run 2 must be
    // rejected AT ACQUIRE, before touching any state.
    GenStore.acquireLease(fs, base, "run1")
    val ex = intercept[IllegalStateException] {
      Similarity.ivfRetrain(spark, idx.toString, e, lloydIters = 0)
    }
    assert(ex.getMessage.contains("held by 'run1'"))
    // No lost generation: the rejected run changed nothing.
    assert(Similarity.ivfCurrentRoot(spark, idx.toString) == idx.toString)
    assert(!Files.exists(idx.resolve("gen=1")))

    // Releasing with the wrong owner is itself a loud failure.
    intercept[IllegalArgumentException] {
      GenStore.releaseLease(fs, base, "run2")
    }
    // Run 1 finishes and releases; run 2 (retried) now wins cleanly.
    GenStore.releaseLease(fs, base, "run1")
    Similarity.ivfRetrain(spark, idx.toString, e, lloydIters = 0)
    assert(Files.exists(idx.resolve("_ivfgen-1")))
    assert(Files.exists(idx.resolve("gen=1").resolve("centroids")))
    // The lease is released after a successful run (withLease finally).
    assert(!Files.exists(idx.resolve(GenStore.LeaseName)))

    // Crashed-holder takeover: a lease whose epoch is past the TTL is
    // abandoned property, not a block — the next run takes it over.
    Files.writeString(idx.resolve(GenStore.LeaseName), "deadrun\n12345")
    Similarity.ivfRetrain(spark, idx.toString, e, lloydIters = 0)
    assert(Files.exists(idx.resolve("_ivfgen-2")),
      "a stale (crashed-holder) lease must not block maintenance forever")
    assert(!Files.exists(idx.resolve(GenStore.LeaseName)))

    // Stale-takeover interleave, step-serialized. Protocol: claim the
    // stale lease by atomic RENAME, then CREATE the fresh lease —
    // whoever CREATES wins; the rename only serializes stale deletion.
    // Simulated: run A claims the stale lease (rename) but run B slips
    // into A's claim→create window and creates the fresh lease first.
    // Exactly one winner (B); A's completion must LOSE loudly, not
    // delete B's fresh lease (the delete-then-create bug this replaced).
    Files.writeString(idx.resolve(GenStore.LeaseName), "deadrun\n12345")
    val lease = new org.apache.hadoop.fs.Path(idx.toString, GenStore.LeaseName)
    val claimedA = new org.apache.hadoop.fs.Path(
      idx.toString, ".lease-takeover-simulated-A")
    assert(fs.rename(lease, claimedA), "A's claim rename must succeed")
    GenStore.acquireLease(fs, base, "runB") // B creates in A's window — wins
    fs.delete(claimedA, false) // A resumes: drops its claim artifact...
    val lost = intercept[IllegalStateException] {
      GenStore.acquireLease(fs, base, "runA") // ...and must lose at create
    }
    assert(lost.getMessage.contains("held by 'runB'"))
    assert(Files.readString(idx.resolve(GenStore.LeaseName))
      .startsWith("runB"), "exactly one recorded holder")
    GenStore.releaseLease(fs, base, "runB")

    // compactBandIndex honors the same lease (shared protocol).
    val bidx = work.resolve("bandidx")
    (0L to 9L).map(i => (i, i % 3)).toDF("doc_id", "bh")
      .write.mode("overwrite").parquet(s"$bidx/batch=0")
    (10L to 19L).map(i => (i, i % 3)).toDF("doc_id", "bh")
      .write.mode("overwrite").parquet(s"$bidx/batch=1")
    (20L to 29L).map(i => (i, i % 3)).toDF("doc_id", "bh")
      .write.mode("overwrite").parquet(s"$bidx/batch=2")
    val bbase = new org.apache.hadoop.fs.Path(bidx.toString)
    GenStore.acquireLease(fs, bbase, "run1")
    intercept[IllegalStateException] {
      Dedup.compactBandIndex(spark, bidx.toString, keepRecent = 1)
    }
    GenStore.releaseLease(fs, bbase, "run1")
    Dedup.compactBandIndex(spark, bidx.toString, keepRecent = 1)
    assert(Files.exists(bidx.resolve("_bandgen-1")))
  }
}
