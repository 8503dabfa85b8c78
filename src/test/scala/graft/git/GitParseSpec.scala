package graft.git

import graft.SparkSpec
import graft.ops.GitQueries
import org.apache.spark.sql.functions._

class GitParseSpec extends SparkSpec {
  import spark.implicits._

  private def sampleCommits =
    GitAgg.dedupCommits(GitParse.parseLog(
      Seq(("sample", "main", GitQueries.rawLog)).toDF("repo_name", "branch", "raw")))

  test("P4 rename-path rewrite: mid-path, empty-old, multiple") {
    val df = Seq(
      "path/{old.js => new.js}",
      "{ => single}/file.ts",
      "a/{b => c}/d/{e => f}.g",
      "no/rename/here.txt"
    ).toDF("p").select(GitParse.resolveRenamePath(col("p")).as("r"))
    assert(df.as[String].collect().toSeq == Seq(
      "path/new.js", "single/file.ts", "a/c/d/f.g", "no/rename/here.txt"))
  }

  test("P5 is_merge: empty, single, multiple parents") {
    val df = Seq("", "p1", "p1 p2", "  p1 p2 p3  ").toDF("p")
      .select(GitParse.isMerge(col("p")).as("m"))
    assert(df.as[Boolean].collect().toSeq == Seq(false, false, true, true))
  }

  test("P3 numstat: binary '-' → 0; path with spaces survives rejoin") {
    val fc = GitAgg.dedupFileChanges(GitParse.explodeFileChanges(sampleCommits))
    val binary = fc.filter($"file_path" === "assets/logo.png").collect()(0)
    assert(binary.getAs[Long]("additions") == 0L && binary.getAs[Long]("deletions") == 0L)
    assert(fc.filter($"file_path" === "dir name/file with spaces.py").count() == 1)
  }

  test("P1/P2/A4: four commits with correct rollups; root commit empty") {
    val c = sampleCommits.orderBy("sha").collect()
    assert(c.length == 4)
    assert(c(0).getAs[Long]("additions") == 13L) // sha_a: 10 + 0(binary) + 3
    assert(c(0).getAs[Boolean]("is_merge"))
    assert(c(3).getAs[Long]("files_changed") == 0L) // sha_d root commit
    assert(!c(3).getAs[Boolean]("is_merge"))
  }

  test("U3 first-wins: post-rename duplicate path keeps first occurrence") {
    val fc = GitAgg.dedupFileChanges(GitParse.explodeFileChanges(sampleCommits))
    val row = fc.filter($"sha" === "sha_c" && $"file_path" === "src/new.ts").collect()
    assert(row.length == 1)
    assert(row(0).getAs[Long]("additions") == 1L) // direct edit listed first
  }

  test("A1 min_by quirk: oldest commit's name survives") {
    val a = GitAgg.authors(sampleCommits)
      .filter($"email" === "alice@example.com").collect()(0)
    assert(a.getAs[String]("name") == "Alice Smith")
    assert(a.getAs[Long]("total_commits") == 2L)
  }

  test("P7-P11 tags: annotated vs lightweight") {
    val tags = GitAgg.dedupTags(GitParse.parseTags(
      Seq(("sample", GitQueries.rawTags)).toDF("repo_name", "raw")))
      .orderBy("tag_name").collect()
    val light = tags(0); val ann = tags(1)
    assert(!light.getAs[Boolean]("is_annotated"))
    assert(light.isNullAt(light.fieldIndex("tagger_email")))
    assert(light.isNullAt(light.fieldIndex("message")))
    assert(ann.getAs[String]("tagger_email") == "carol@example.com")
    assert(ann.getAs[String]("message") == "Release v1.0\n\nFirst stable release")
  }

  test("P13 extension: reference semantics (whole-path split)") {
    val df = Seq("a/b.PY", "noext", ".gitignore", "x.tar.gz").toDF("f")
      .select(GitParse.fileExtension(col("f")).as("e"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("py"), None, Some("gitignore"), Some("gz")))
  }

  test("A3 tie-break: equal counts resolve by extension asc") {
    val files = Seq("r" -> "a.py", "r" -> "b.py", "r" -> "a.ts", "r" -> "b.ts",
      "r" -> "x.unknown").toDF("repo_name", "file_path")
    val lang = GitAgg.repoLanguage(files).collect()
    assert(lang.length == 1 && lang(0).getAs[String]("language") == "Python")
  }

  test("A2 summary stats") {
    val s = GitAgg.summaryStats(sampleCommits).collect()(0)
    assert(s.getAs[Long]("total_commits") == 4L)
    assert(s.getAs[Long]("merge_commits") == 1L)
    assert(s.getAs[Long]("unique_authors") == 3L)
    assert(s.getAs[String]("date_from") == "2023-11-14")
  }
}
