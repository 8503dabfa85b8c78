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

    // Releasing with the wrong owner is itself a loud failure — and an
    // ATOMIC one: the release claims the lease by rename, sees it is
    // run1's, and renames it BACK before throwing (the old exists→read→
    // delete shape could delete a fresh lease it didn't own).
    val exRel = intercept[IllegalStateException] {
      GenStore.releaseLease(fs, base, "run2")
    }
    assert(exRel.getMessage.contains("held by 'run1'"))
    assert(Files.readString(idx.resolve(GenStore.LeaseName)).startsWith("run1"),
      "a wrongful release must RESTORE the rightful holder's lease")
    // Run 1 finishes and releases; run 2 (retried) now wins cleanly.
    GenStore.releaseLease(fs, base, "run1")
    Similarity.ivfRetrain(spark, idx.toString, e, lloydIters = 0)
    assert(Files.exists(idx.resolve("_ivfgen-1")))
    assert(Files.exists(idx.resolve("gen=1").resolve("centroids")))
    // The lease is released after a successful run (withLease finally).
    assert(!Files.exists(idx.resolve(GenStore.LeaseName)))

    // Crashed-holder takeover: a lease whose EFFECTIVE epoch (content
    // epoch ∨ heartbeat mtime) is past the TTL is abandoned property,
    // not a block — the next run takes it over. The planted file's
    // mtime must be backdated too: a fresh mtime reads as a live
    // heartbeat (that is the point of the mtime channel).
    Files.writeString(idx.resolve(GenStore.LeaseName), "deadrun\n12345")
    assert(idx.resolve(GenStore.LeaseName).toFile.setLastModified(12345L))
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
    assert(idx.resolve(GenStore.LeaseName).toFile.setLastModified(12345L))
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

  test("lease heartbeat: a run longer than the TTL keeps the lease (renewal); a silent holder is taken over after the TTL") {
    val work = Files.createTempDirectory("graft-genlease-hb-")
    org.apache.commons.io.FileUtils.forceDeleteOnExit(work.toFile)
    val base = new org.apache.hadoop.fs.Path(work.toString)
    val fs = GenStore.fsOf(spark, work.toString)

    // Step-serialized long run: acquire with a TTL the body will OUTLIVE,
    // renewing manually at the heartbeat cadence (withLease's daemon
    // thread does exactly this on real runs). A second writer probing at
    // every step must be rejected for the whole run — before the
    // heartbeat existed, it would have "taken over" the still-live run
    // the moment the ORIGINAL epoch went TTL-stale.
    // Margins are sized for a loaded CI box: the TTL is 4 s and the probe
    // cadence 500 ms, so only a multi-second stall between a renew and
    // its probe could flake this — not ordinary GC/IO jitter.
    val ttl = 4000L
    GenStore.acquireLease(fs, base, "longrun", ttl)
    val lease = new GenStore.Lease(fs, base, "longrun")
    val t0 = System.currentTimeMillis()
    while (System.currentTimeMillis() - t0 < ttl + ttl / 2) {
      Thread.sleep(ttl / 8) // well inside the ttl/3 heartbeat cadence
      lease.renew()
      val ex = intercept[IllegalStateException] {
        GenStore.acquireLease(fs, base, "intruder", ttl)
      }
      assert(ex.getMessage.contains("held by 'longrun'"))
    }
    assert(!lease.lostOwnership, "renewal must never observe another holder")
    GenStore.releaseLease(fs, base, "longrun")

    // Inverse: the holder is KILLED (heartbeat stops — no more renew
    // calls). Once the last-stamped epoch is TTL-stale the next writer's
    // takeover must succeed; before that it must still be rejected (the
    // too-early probe has the full 3 s TTL as its margin).
    val ttl2 = 3000L
    GenStore.acquireLease(fs, base, "deadrun", ttl2)
    intercept[IllegalStateException] {
      GenStore.acquireLease(fs, base, "taker", ttl2) // too early — rejected
    }
    Thread.sleep(ttl2 + 400)
    GenStore.acquireLease(fs, base, "taker", ttl2) // stale now — takeover
    assert(Files.readString(work.resolve(GenStore.LeaseName)).startsWith("taker"))
    GenStore.releaseLease(fs, base, "taker")
  }

  test("withLease background heartbeat + promote-time ownership re-check") {
    val work = Files.createTempDirectory("graft-genlease-wl-")
    org.apache.commons.io.FileUtils.forceDeleteOnExit(work.toFile)
    val base = new org.apache.hadoop.fs.Path(work.toString)
    val fs = GenStore.fsOf(spark, work.toString)

    // The real withLease daemon renews on its own: a body that sleeps
    // past the TTL stays the holder and an intruder is rejected mid-body.
    // (ttl 2 s, heartbeat every ~666 ms: a stall would need to exceed a
    // full TTL between beats to flake this.)
    GenStore.withLease(fs, base, ttlMs = 2000) { lease =>
      Thread.sleep(4500) // 2.25× the TTL — only the heartbeat keeps it live
      val ex = intercept[IllegalStateException] {
        GenStore.acquireLease(fs, base, "intruder", 2000)
      }
      assert(ex.getMessage.contains("held by"))
      assert(!lease.lostOwnership)
    }
    assert(!Files.exists(work.resolve(GenStore.LeaseName)))

    // promote re-checks ownership immediately before the pointer rename:
    // simulate a takeover landing mid-body (long default TTL here so the
    // background heartbeat never races the simulated thief), and the
    // promote must refuse BEFORE committing the pointer.
    // (Lease writes go through the Hadoop fs API — a direct
    // Files.writeString would leave the LocalFileSystem's .crc sidecar
    // stale and read back as corrupt.)
    def writeLease(owner: String): Unit = {
      val out = fs.create(
        new org.apache.hadoop.fs.Path(base, GenStore.LeaseName), true)
      try out.write(s"$owner\n${System.currentTimeMillis()}".getBytes("UTF-8"))
      finally out.close()
    }
    Files.createDirectories(work.resolve("gen=1"))
    GenStore.withLease(fs, base) { lease =>
      writeLease("thief")
      val ex = intercept[IllegalStateException] {
        GenStore.promote(fs, base, "_tgen-", 1L, 0L, Nil, Some(lease))
      }
      assert(ex.getMessage.contains("held by 'thief'") ||
        ex.getMessage.contains("'thief'"))
      assert(!Files.exists(work.resolve("_tgen-1")),
        "the pointer must NOT commit after a detected takeover")
      assert(lease.lostOwnership)
      // Hand the lease back to this owner so the withLease release is
      // clean (the takeover-detected release path is covered above).
      writeLease(lease.owner)
    }
    assert(!Files.exists(work.resolve(GenStore.LeaseName)))
  }
}
