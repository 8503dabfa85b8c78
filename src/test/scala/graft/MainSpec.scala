package graft

import java.nio.file.{Files, Paths}
import scala.sys.process._

import org.scalatest.BeforeAndAfterAll

/** E2 end-to-end through the CLI surface: config JSON → discovery → ignore
  * filter → full ETL → parquet tables on disk. */
class MainSpec extends SparkSpec with BeforeAndAfterAll {

  private val root = Paths.get("target", "tmp", "mainfix").toAbsolutePath
  private val repoA = root.resolve("scan/repoA")
  private val repoB = root.resolve("scan/repoB")

  private def git(cwd: java.nio.file.Path, args: String*): Unit = {
    val env = Seq(
      "GIT_AUTHOR_DATE" -> "1700000000 +0000", "GIT_COMMITTER_DATE" -> "1700000000 +0000",
      "GIT_AUTHOR_NAME" -> "Alice", "GIT_AUTHOR_EMAIL" -> "alice@example.com",
      "GIT_COMMITTER_NAME" -> "Alice", "GIT_COMMITTER_EMAIL" -> "alice@example.com")
    assert(Process(Seq("git") ++ args, cwd.toFile, env: _*).! == 0)
  }

  private def mkRepo(p: java.nio.file.Path, file: String): Unit = {
    Files.createDirectories(p)
    git(p, "init", "-q", "-b", "main")
    Files.writeString(p.resolve(file), "content\n")
    git(p, "add", ".")
    git(p, "commit", "-q", "-m", s"add $file")
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    if (Files.exists(root)) Process(Seq("rm", "-rf", root.toString)).!
    mkRepo(repoA, "a.py")
    mkRepo(repoB, "b.scala")
  }

  test("config load + discovery + ignore + ETL writes all five tables") {
    val cfg = root.resolve("repos.json")
    Files.writeString(cfg,
      s"""{"paths": ["${root.resolve("scan")}"], "ignore": ["$repoB/"]}""")
    val repos = Main.resolveRepos(Main.loadConfig(cfg.toString))
    assert(repos == Seq(repoA.toString)) // repoB ignored (trailing slash normalized)

    val out = root.resolve("out").toString
    Main.run(spark, repos, out, authorGate = None)
    Seq("commits", "authors", "file_changes", "tags", "repos").foreach { t =>
      val df = spark.read.parquet(s"$out/$t")
      assert(df.columns.nonEmpty, t)
    }
    assert(spark.read.parquet(s"$out/commits").count() == 1)
    assert(spark.read.parquet(s"$out/repos").collect()(0).getAs[String]("name") == "repoA")
  }

  test("author gate skips repos without matching commits (S5)") {
    val out2 = root.resolve("out2").toString
    intercept[IllegalArgumentException] {
      Main.run(spark, Nil, out2, None)
    }
    // gate that matches nothing → Pipeline sees zero repos post-filter
    val r = _root_.graft.git.Pipeline.build(spark, Seq(repoA.toString), Some("NobodySuchAuthor"))
    assert(r.commits.count() == 0)
  }
}
