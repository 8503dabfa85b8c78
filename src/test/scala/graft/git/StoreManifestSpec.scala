package graft.git

import java.nio.file.{Files, Paths}
import scala.sys.process._

import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec

/** U6 cross-table atomicity: the root store manifest is the ONE commit
  * point for an [[Pipeline.etlAppend]] run across all five tables
  * (transactions.ts:43-56 — one transaction per repo covers all five
  * loads). Driven through the `etlAppendStaged` step seam: a hook that
  * throws is a process kill at that instant; a hook that reads is a
  * concurrent snapshot reader — the same step-serialized interleave
  * discipline GenStoreSpec applies to the generation store.
  */
class StoreManifestSpec extends SparkSpec with BeforeAndAfterAll {

  private val root = Paths.get("target", "tmp",
    s"storemanifest-${java.util.UUID.randomUUID().toString.take(8)}").toAbsolutePath
  private val repoA = root.resolve("repoA")

  private def git(cwd: java.nio.file.Path, epoch: Long, args: String*): Unit = {
    val env = Seq(
      "GIT_AUTHOR_DATE" -> s"$epoch +0000", "GIT_COMMITTER_DATE" -> s"$epoch +0000",
      "GIT_AUTHOR_NAME" -> "Alice", "GIT_AUTHOR_EMAIL" -> "alice@example.com",
      "GIT_COMMITTER_NAME" -> "Alice", "GIT_COMMITTER_EMAIL" -> "alice@example.com")
    assert(Process(Seq("git") ++ args, cwd.toFile, env: _*).! == 0)
  }

  private def addCommit(file: String, epoch: Long): Unit = {
    Files.writeString(repoA.resolve(file), s"content of $file\n")
    git(repoA, epoch, "add", ".")
    git(repoA, epoch, "commit", "-q", "-m", s"add $file")
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    if (Files.exists(root)) Process(Seq("rm", "-rf", root.toString)).!
    Files.createDirectories(repoA)
    git(repoA, 1700000000L, "init", "-q", "-b", "main")
    addCommit("a.py", 1700000000L)
    git(repoA, 1700000000L, "tag", "-a", "v1", "-m", "first")
  }

  private val tables = Seq("commits", "authors", "file_changes", "tags", "repos")

  /** One comparable fingerprint per table via the store-level reader. */
  private def observe(out: String): Map[String, Seq[String]] =
    tables.map(t => t ->
      Pipeline.readStoreSnapshot(spark, out, t).collect().map(_.toString).sorted.toSeq).toMap

  test("kill between commits and file_changes publish leaves the previous " +
    "generation visible cross-table; rerun converges") {
    val out = root.resolve("out_kill").toString
    Pipeline.etlAppend(spark, Seq(repoA.toString), out)
    val old = observe(out)
    assert(Pipeline.readStoreSnapshot(spark, out, "commits").count() == 1)

    addCommit("b.py", 1700000100L)
    // Run 2 dies right after the commits publish — before file_changes.
    val boom = intercept[RuntimeException] {
      Pipeline.etlAppendStaged(spark, Seq(repoA.toString), out, None, {
        case "after:commits" => throw new RuntimeException("kill")
        case _ => ()
      })
    }
    assert(boom.getMessage == "kill")

    // The commits table's PER-TABLE manifest did advance (the crash landed
    // mid-sequence, not before it)…
    assert(Pipeline.readSnapshot(spark, out, "commits").count() == 2)
    // …but the STORE snapshot still resolves every table at the previous
    // generation: no commits-without-their-file_changes state is visible.
    assert(observe(out) == old)

    // Recovery is a rerun: keyed upserts converge and the store flips.
    Pipeline.etlAppend(spark, Seq(repoA.toString), out)
    val now = observe(out)
    assert(Pipeline.readStoreSnapshot(spark, out, "commits").count() == 2)
    assert(Pipeline.readStoreSnapshot(spark, out, "file_changes").count() == 2)
    // Authors re-add per run (database.ts:109-117): 1 + 2 (crashed run's
    // authors publish never happened — its generation was never committed
    // to the store, and the rerun's merge baseline is the last COMMITTED
    // authors table) … the crashed run died before authors published, so
    // exactly two runs' counts are in: 1 (run 1) + 2 (rerun) = 3.
    val alice = Pipeline.readStoreSnapshot(spark, out, "authors")
      .filter(col("email") === "alice@example.com").collect()(0)
    assert(alice.getAs[Long]("total_commits") == 3)
    assert(now("commits") != old("commits"))
  }

  test("interleaved reader sees exactly the old or the new store " +
    "generation, never a cross-table mix") {
    val out = root.resolve("out_interleave").toString
    Pipeline.etlAppend(spark, Seq(repoA.toString), out)
    val old = observe(out)

    addCommit("c.py", 1700000200L)
    git(repoA, 1700000200L, "tag", "-a", "v2", "-m", "second")

    val seen = scala.collection.mutable.ListBuffer[(String, Map[String, Seq[String]])]()
    Pipeline.etlAppendStaged(spark, Seq(repoA.toString), out, None,
      step => seen += step -> observe(out))
    val now = observe(out)
    assert(now != old)

    assert(seen.map(_._1).toSeq == Seq("after:rollback", "after:commits",
      "after:authors", "after:file_changes", "after:tags", "after:repos",
      "before:flip", "after:flip"))
    seen.foreach { case (step, obs) =>
      val expected = if (step == "after:flip") now else old
      assert(obs == expected,
        s"reader at '$step' saw a state that is neither all-old nor all-new " +
          s"(or the wrong side of the flip)")
    }
  }

  test("kill AFTER the authors publish (non-idempotent additive merge): " +
    "the rerun's entry rollback discards the aborted counts — no double-count") {
    val out = root.resolve("out_kill_authors").toString
    Pipeline.etlAppend(spark, Seq(repoA.toString), out)
    val old = observe(out)
    val run1Commits = Pipeline.readStoreSnapshot(spark, out, "commits").count()

    addCommit("d.py", 1700000300L)
    val nCommits = run1Commits + 1
    // Run 2 dies right after the AUTHORS publish: its per-table manifest
    // now carries run1 + aborted-run2 counts (mergeAuthors ADDS), but the
    // store manifest never flipped. This is exactly the window where a
    // rerun that baselines on the latest per-table manifest would
    // double-count the aborted run — the reference's single SQLite
    // transaction (transactions.ts:43-56) rolls that increment back.
    val boom = intercept[RuntimeException] {
      Pipeline.etlAppendStaged(spark, Seq(repoA.toString), out, None, {
        case "after:authors" => throw new RuntimeException("kill")
        case _ => ()
      })
    }
    assert(boom.getMessage == "kill")
    // The authors per-table manifest DID advance (the crash landed after
    // its commit) — the hazard is real, not vacuous…
    val aborted = Pipeline.readSnapshot(spark, out, "authors")
      .filter(col("email") === "alice@example.com").collect()(0)
      .getAs[Long]("total_commits")
    assert(aborted == run1Commits + nCommits,
      "crash was expected to land AFTER the authors per-table commit")
    // …but the store snapshot is still all-old.
    assert(observe(out) == old)

    // Rerun: the entry rollback deletes the aborted authors generation
    // before merging, so exactly two committed runs' counts are in —
    // run1 (run1Commits) + rerun (nCommits), NOT + the aborted run too.
    Pipeline.etlAppend(spark, Seq(repoA.toString), out)
    val alice = Pipeline.readStoreSnapshot(spark, out, "authors")
      .filter(col("email") === "alice@example.com").collect()(0)
      .getAs[Long]("total_commits")
    assert(alice == run1Commits + nCommits,
      s"expected ${run1Commits + nCommits} (committed runs only), got " +
        s"$alice — the aborted run's additive merge leaked into the rerun")
    assert(Pipeline.readStoreSnapshot(spark, out, "commits").count() == nCommits)
  }

  test("two concurrent writers: the second is rejected at lease acquire " +
    "before touching state; one winner, no mixed generation; retry converges") {
    val out = root.resolve("out_race").toString
    Pipeline.etlAppend(spark, Seq(repoA.toString), out)
    val old = observe(out)
    val run1Commits = Pipeline.readStoreSnapshot(spark, out, "commits").count()

    addCommit("e.py", 1700000400L)
    val nCommits = run1Commits + 1
    // Writer A runs on its own thread and parks mid-publish (after the
    // commits table, before authors) — the maximally dangerous instant
    // for a second writer: A's per-table manifests are committed but
    // store-uncommitted, so a concurrent entry ROLLBACK would delete them
    // out from under A's coming flip.
    val parked = new java.util.concurrent.SynchronousQueue[String]()
    val release = new java.util.concurrent.SynchronousQueue[String]()
    @volatile var aFailed: Throwable = null
    val a = new Thread(() => {
      try Pipeline.etlAppendStaged(spark, Seq(repoA.toString), out, None, {
        case "after:commits" => parked.put("parked"); release.take(); ()
        case _ => ()
      }) catch { case t: Throwable => aFailed = t }
    }, "writer-A")
    a.start()
    assert(parked.take() == "parked")

    // Writer B: rejected AT ACQUIRE — a loud IllegalStateException naming
    // the holder, before B has staged, rolled back, or merged anything.
    val ex = intercept[IllegalStateException] {
      Pipeline.etlAppend(spark, Seq(repoA.toString), out)
    }
    assert(ex.getMessage.contains("held by"))
    // B's rejection changed nothing: the store still resolves all-old
    // (A hasn't flipped) and A's in-flight manifests are untouched.
    assert(observe(out) == old)

    release.put("go")
    a.join(180000)
    assert(!a.isAlive, "writer A did not finish")
    assert(aFailed == null, s"writer A failed: $aFailed")
    // Exactly one winner: A's generation is live and cross-table
    // consistent (commits and file_changes agree on the new commit).
    assert(Pipeline.readStoreSnapshot(spark, out, "commits").count() == nCommits)
    assert(Pipeline.readStoreSnapshot(spark, out, "file_changes").count() == nCommits)

    // The loser's RETRY (the documented recovery: rerun after the winner)
    // converges on top of A's generation — authors gain exactly one more
    // run's worth, nothing double-counts, commits stay keyed-deduped.
    val aliceAfterA = Pipeline.readStoreSnapshot(spark, out, "authors")
      .filter(col("email") === "alice@example.com").collect()(0)
      .getAs[Long]("total_commits")
    Pipeline.etlAppend(spark, Seq(repoA.toString), out)
    val aliceAfterB = Pipeline.readStoreSnapshot(spark, out, "authors")
      .filter(col("email") === "alice@example.com").collect()(0)
      .getAs[Long]("total_commits")
    assert(aliceAfterB == aliceAfterA + nCommits)
    assert(Pipeline.readStoreSnapshot(spark, out, "commits").count() == nCommits)
  }

  test("lease takeover mid-run: the stalled writer is refused AT THE FLIP " +
    "(ownership re-check) — no mixed generation commits; rerun converges") {
    val out = root.resolve("out_takeover").toString
    Pipeline.etlAppend(spark, Seq(repoA.toString), out)
    val old = observe(out)
    val run1Commits = Pipeline.readStoreSnapshot(spark, out, "commits").count()

    addCommit("f.py", 1700000500L)
    val nCommits = run1Commits + 1
    val fs = graft.ops.GenStore.fsOf(spark, out)
    val leasePath = new org.apache.hadoop.fs.Path(out,
      graft.ops.GenStore.LeaseName)
    // Simulate a TTL takeover landing while this run is mid-publish: a
    // thief replaces the lease just before the flip. The flip's ownership
    // re-check must refuse BEFORE the store-manifest rename — all five
    // per-table publishes are committed but the cross-table generation
    // must NOT flip over the takeover.
    val boom = intercept[IllegalStateException] {
      Pipeline.etlAppendStaged(spark, Seq(repoA.toString), out, None, {
        case "before:flip" =>
          val outs = fs.create(leasePath, true)
          try outs.write(
            s"thief\n${System.currentTimeMillis()}".getBytes("UTF-8"))
          finally outs.close()
        case _ => ()
      })
    }
    assert(boom.getMessage.contains("thief"))
    // Nothing flipped: the store still resolves all-old, every table.
    assert(observe(out) == old)

    // The thief "releases" (crash/TTL-expiry equivalent for the test);
    // the stalled writer's RERUN rolls back its own aborted per-table
    // publishes and converges — authors count exactly the committed runs.
    fs.delete(leasePath, false)
    Pipeline.etlAppend(spark, Seq(repoA.toString), out)
    assert(Pipeline.readStoreSnapshot(spark, out, "commits").count() == nCommits)
    val alice = Pipeline.readStoreSnapshot(spark, out, "authors")
      .filter(col("email") === "alice@example.com").collect()(0)
      .getAs[Long]("total_commits")
    assert(alice == run1Commits + nCommits,
      s"expected ${run1Commits + nCommits}, got $alice — the refused run's " +
        "publishes leaked into the rerun's merge")
  }
}
