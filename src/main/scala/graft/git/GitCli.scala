package graft.git

import java.nio.file.{Files, Path, Paths}
import scala.collection.mutable
import scala.jdk.CollectionConverters._
import scala.sys.process._
import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source operators S1–S7 (SURVEY §2.1): the git-subprocess boundary.
  *
  * Design (SURVEY §4): extraction lives *outside* the query engine as a
  * `Seq[RepoInfo] → DataFrame(raw text)` boundary, exactly as the reference
  * treats it. Each repo's log is fetched by one `git` subprocess running on
  * whichever executor owns that repo's partition — one partition per repo is
  * the natural split (mapPartitions over a repo list; at cluster scale the
  * repo paths would be a shared filesystem or a pre-extracted text dataset).
  * Everything after the subprocess is the declarative GitParse/GitAgg plan.
  */
object GitCli {

  private val logFormat =
    "COMMIT_START%n%H%n%ae%n%an%n%ct%n%P%n%s%nCOMMIT_MSG_END"
  private val tagFormat =
    "%(refname:short)|%(objecttype)|%(objectname)|%(taggername)|%(taggeremail)|%(taggerdate:unix)|%(subject)|%(contents:body)"

  private def run(cwd: String, cmd: String*): Option[String] =
    Try(Process(cmd, new java.io.File(cwd)).!!(ProcessLogger(_ => ()))).toOption

  // ---- S3: branch probe (src/git-parser.ts:57-70) -------------------------
  def currentBranch(repoPath: String): Option[String] =
    run(repoPath, "git", "rev-parse", "--abbrev-ref", "HEAD").map(_.trim)
      .filter(_.nonEmpty)

  // ---- S5: author-existence probe (main.ts:30-77) — LIMIT-1 gate ----------
  def hasCommitsByAuthor(repoPath: String, authorPattern: String): Boolean =
    currentBranch(repoPath).exists { branch =>
      run(repoPath, "git", "log", branch, "--author", authorPattern,
        "--format=%H", "-n", "1").exists(_.trim.nonEmpty)
    }

  /** RepoInfo for a path: name from the last path segment (P12) + S3. */
  def repoInfo(repoPath: String): Option[RepoInfo] =
    currentBranch(repoPath).map { b =>
      RepoInfo(Paths.get(repoPath).getFileName.toString, repoPath, b)
    }

  /** Extraction task list as a Dataset, one partition per repo.
    *
    * The nonce column defeats Catalyst plan-cache matching: these scans read
    * EXTERNAL state (the repos on disk), which the logical plan cannot see,
    * so two extractions over the same repo list canonicalize to the same
    * plan — without the nonce, a cached first run would be silently served
    * for a re-run even after the repos changed (observed: a second
    * `Pipeline.build` returning stale commits). Same reason Spark marks
    * `rand()` non-deterministic: identical plan text ≠ identical data. */
  private def tasks(spark: SparkSession, repos: Seq[RepoInfo]) = {
    import spark.implicits._
    val nonce = java.util.UUID.randomUUID().toString
    spark.createDataset(repos.map(r => (r.name, r.path, r.branch, nonce)))
      .repartition(math.max(repos.size, 1))
  }

  // ---- S1: git-log scan → raw text DataFrame ------------------------------
  /** One row per repo: (repo_name, branch, raw log text). Runs the
    * subprocess on the executor that owns the repo's partition. */
  def rawLogs(spark: SparkSession, repos: Seq[RepoInfo]): DataFrame = {
    import spark.implicits._
    tasks(spark, repos).mapPartitions { it =>
      it.flatMap { case (name, path, branch, _) =>
        run(path, "git", "log", branch, s"--pretty=format:$logFormat",
          "--numstat").map(raw => (name, branch, raw))
      }
    }.toDF("repo_name", "branch", "raw")
  }

  // ---- S2: git-tags scan (src/git-parser.ts:277-300) ----------------------
  def rawTags(spark: SparkSession, repos: Seq[RepoInfo]): DataFrame = {
    import spark.implicits._
    tasks(spark, repos).mapPartitions { it =>
      it.flatMap { case (name, path, _, _) =>
        run(path, "git", "for-each-ref", "refs/tags",
          s"--format=$tagFormat").map(raw => (name, raw))
      }
    }.toDF("repo_name", "raw")
  }

  // ---- S4: file-list scan (src/git-parser.ts:214-222) ---------------------
  def lsFiles(spark: SparkSession, repos: Seq[RepoInfo]): DataFrame = {
    import spark.implicits._
    tasks(spark, repos).mapPartitions { it =>
      it.flatMap { case (name, path, _, _) =>
        run(path, "git", "ls-files").toSeq
          .flatMap(_.split("\n")).filter(_.nonEmpty)
          .map(f => (name, f))
      }
    }.toDF("repo_name", "file_path")
  }

  // ---- S7: repo-discovery scan (main.ts:154-215) --------------------------
  private val skipDirs =
    Set("node_modules", "venv", ".venv", "dist", "build", "target")

  /** Recursive walk, depth ≤ 3, stop descending at the first `.git`, skip
    * hidden dirs and the reference's skip-list; permission errors ignored. */
  def discoverRepos(root: String, maxDepth: Int = 3): Seq[String] = {
    val out = mutable.ArrayBuffer[String]()
    def walk(dir: Path, depth: Int): Unit = {
      if (depth > maxDepth) return
      if (Files.isDirectory(dir.resolve(".git"))) { out += dir.toString; return }
      val children = Try(Files.list(dir).iterator.asScala.toList).getOrElse(Nil)
      children.filter(Files.isDirectory(_)).foreach { c =>
        val name = c.getFileName.toString
        if (!name.startsWith(".") && !skipDirs.contains(name)) walk(c, depth + 1)
      }
    }
    walk(Paths.get(root), 0)
    out.toSeq
  }

  // ---- J1 + J4: ignore-filter and dedup of the repo list (main.ts:277-296)
  def applyIgnore(paths: Seq[String], ignore: Seq[String]): Seq[String] = {
    val norm = (s: String) => s.replaceAll("/+$", "")
    val ignored = ignore.map(norm).toSet
    paths.map(norm).distinct.filterNot(ignored.contains)
  }
}
