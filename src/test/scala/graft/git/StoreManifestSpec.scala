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

    assert(seen.map(_._1).toSeq == Seq("after:commits", "after:authors",
      "after:file_changes", "after:tags", "after:repos", "before:flip",
      "after:flip"))
    seen.foreach { case (step, obs) =>
      val expected = if (step == "after:flip") now else old
      assert(obs == expected,
        s"reader at '$step' saw a state that is neither all-old nor all-new " +
          s"(or the wrong side of the flip)")
    }
  }
}
