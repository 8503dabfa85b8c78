package graft.ops

import graft.Q
import graft.git.{GitAgg, GitParse}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-parity parse/aggregate operators (P1–P14, A1, U3, S2) under the
  * driver's DuckDB-oracle gate: a fixed raw `git log --numstat` /
  * `for-each-ref` sample (every corner case from FIXTURES.md §B) is parsed by
  * the real operator pipeline, and the oracle is the hand-derived expected
  * output as a VALUES table. sfDir is ignored — the input is the embedded
  * sample, identical for Spark and DuckDB.
  *
  * Corner cases covered: merge commit (2 parents), binary numstat (`-` → 0),
  * rename `{old => new}` mid-path, empty-old rename `{ => dir}`, path with
  * spaces (whitespace split + rejoin), root commit (empty parents, no
  * changes), same author under two names (A1 min_by quirk), duplicate
  * post-rename path (U3 first-wins), annotated + lightweight tags
  * (P7–P11).
  */
object GitQueries {

  val sampleRepo = "sample"

  val rawLog: String = Seq(
    "COMMIT_START", "sha_a", "alice@example.com", "Alice", "1700000000",
    "p00001 p00002", "Merge branch feature", "COMMIT_MSG_END", "",
    "10\t2\tsrc/main.ts",
    "-\t-\tassets/logo.png",
    "3\t1\tsrc/{old.ts => new.ts}",
    "COMMIT_START", "sha_b", "bob@example.com", "Bob", "1700003600",
    "p00003", "Add docs dir", "COMMIT_MSG_END", "",
    "5\t0\t{ => docs}/readme.md",
    "2\t4\tdir name/file with spaces.py",
    "COMMIT_START", "sha_c", "alice@example.com", "Alice Smith", "1699996400",
    "p00004", "Earlier commit under another name", "COMMIT_MSG_END", "",
    "1\t1\tsrc/new.ts",
    "3\t1\tsrc/{old.ts => new.ts}",
    "COMMIT_START", "sha_d", "dave@example.com", "Dave", "1699990000",
    "", "Initial empty commit", "COMMIT_MSG_END"
  ).mkString("\n")

  val rawTags: String = Seq(
    "v1.0|tag|deadbeef|Carol|<carol@example.com>|1700010000|Release v1.0|First stable release",
    "v0.9|commit|cafebabe|||||"
  ).mkString("\n")

  private def logDf(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((sampleRepo, "main", rawLog)).toDF("repo_name", "branch", "raw")
  }

  private def commits(s: SparkSession): DataFrame =
    GitAgg.dedupCommits(GitParse.parseLog(logDf(s)))

  /** P1/P2/P3/P5/P6 + A4 rollup + U1 dedup → commit-level table. */
  val q50Commits: Q = Q(
    "q50_git_parse_commits",
    """SELECT * FROM (VALUES
      |  ('sample', 'sha_a', 'alice@example.com', 'Alice',
      |   TIMESTAMP '2023-11-14 22:13:20', 'Merge branch feature', true,
      |   CAST(13 AS BIGINT), CAST(3 AS BIGINT), CAST(3 AS BIGINT)),
      |  ('sample', 'sha_b', 'bob@example.com', 'Bob',
      |   TIMESTAMP '2023-11-14 23:13:20', 'Add docs dir', false,
      |   CAST(7 AS BIGINT), CAST(4 AS BIGINT), CAST(2 AS BIGINT)),
      |  ('sample', 'sha_c', 'alice@example.com', 'Alice Smith',
      |   TIMESTAMP '2023-11-14 21:13:20', 'Earlier commit under another name', false,
      |   CAST(4 AS BIGINT), CAST(2 AS BIGINT), CAST(2 AS BIGINT)),
      |  ('sample', 'sha_d', 'dave@example.com', 'Dave',
      |   TIMESTAMP '2023-11-14 19:26:40', 'Initial empty commit', false,
      |   CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT))
      |) t(repo_name, sha, author_email, author_name, committed_at, message,
      |    is_merge, additions, deletions, files_changed)
      |ORDER BY sha""".stripMargin) { (s, _) =>
    commits(s)
      .select(
        col("repo_name"), col("sha"), col("author_email"), col("author_name"),
        col("committed_at"), col("message"), col("is_merge"),
        col("additions"), col("deletions"), col("files_changed"))
      .orderBy(col("sha"))
  }

  /** P3 `-`→0 + P4 rename rewrite + U3 first-wins dedup → file_changes. */
  val q51FileChanges: Q = Q(
    "q51_git_file_changes",
    """SELECT * FROM (VALUES
      |  ('sample', 'sha_a', 'assets/logo.png', CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
      |  ('sample', 'sha_a', 'src/main.ts', CAST(10 AS BIGINT), CAST(2 AS BIGINT)),
      |  ('sample', 'sha_a', 'src/new.ts', CAST(3 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('sample', 'sha_b', 'dir name/file with spaces.py', CAST(2 AS BIGINT), CAST(4 AS BIGINT)),
      |  ('sample', 'sha_b', 'docs/readme.md', CAST(5 AS BIGINT), CAST(0 AS BIGINT)),
      |  ('sample', 'sha_c', 'src/new.ts', CAST(1 AS BIGINT), CAST(1 AS BIGINT))
      |) t(repo_name, sha, file_path, additions, deletions)
      |ORDER BY sha, file_path""".stripMargin) { (s, _) =>
    GitAgg.dedupFileChanges(GitParse.explodeFileChanges(commits(s)))
      .orderBy(col("sha"), col("file_path"))
  }

  /** A1/U2 author aggregation — the min_by(name) ordering quirk. */
  val q52Authors: Q = Q(
    "q52_git_authors",
    """SELECT * FROM (VALUES
      |  ('alice@example.com', 'Alice Smith', CAST(2 AS BIGINT),
      |   TIMESTAMP '2023-11-14 21:13:20', TIMESTAMP '2023-11-14 22:13:20'),
      |  ('bob@example.com', 'Bob', CAST(1 AS BIGINT),
      |   TIMESTAMP '2023-11-14 23:13:20', TIMESTAMP '2023-11-14 23:13:20'),
      |  ('dave@example.com', 'Dave', CAST(1 AS BIGINT),
      |   TIMESTAMP '2023-11-14 19:26:40', TIMESTAMP '2023-11-14 19:26:40')
      |) t(email, name, total_commits, first_commit_at, last_commit_at)
      |ORDER BY email""".stripMargin) { (s, _) =>
    GitAgg.authors(commits(s)).orderBy(col("email"))
  }

  /** S2/P7–P11 tag parsing: annotated (bracket-stripped email, unix date,
    * subject+body message) vs lightweight (all-null tagger fields). */
  val q53Tags: Q = Q(
    "q53_git_tags",
    """SELECT * FROM (VALUES
      |  ('sample', 'v0.9', 'cafebabe', false, CAST(NULL AS VARCHAR),
      |   CAST(NULL AS VARCHAR), CAST(NULL AS TIMESTAMP), CAST(NULL AS VARCHAR)),
      |  ('sample', 'v1.0', 'deadbeef', true, 'Carol', 'carol@example.com',
      |   TIMESTAMP '2023-11-15 01:00:00',
      |   'Release v1.0' || chr(10) || chr(10) || 'First stable release')
      |) t(repo_name, tag_name, sha, is_annotated, tagger_name, tagger_email,
      |    tag_date, message)
      |ORDER BY tag_name""".stripMargin) { (s, _) =>
    import s.implicits._
    val raw = Seq((sampleRepo, rawTags)).toDF("repo_name", "raw")
    GitAgg.dedupTags(GitParse.parseTags(raw)).orderBy(col("tag_name"))
  }

  /** A3/J3 language detection with the deterministic tie-break (py vs ts both
    * ×2 → 'py' wins on ext asc ⇒ Python). */
  val q54Language: Q = Q(
    "q54_git_language",
    """SELECT * FROM (VALUES ('sample', 'Python')) t(repo_name, language)""") { (s, _) =>
    import s.implicits._
    val files = Seq(
      (sampleRepo, "src/main.ts"), (sampleRepo, "src/new.ts"),
      (sampleRepo, "a.py"), (sampleRepo, "dir name/file with spaces.py"),
      (sampleRepo, "readme.md"), (sampleRepo, "logo.png"),
      (sampleRepo, "Makefile")).toDF("repo_name", "file_path")
    GitAgg.repoLanguage(files)
  }

  /** Validator/quality-flag stage (reference src/validation.ts:15-194) over a
    * fixture hitting every rule: sha length/hex + first-error-only, email
    * empty/format/length ordering, name empty/length, null date, negative
    * counts, multi-error ordering, author count/date-order, tag name/sha and
    * annotated-only tagger checks (truthy-gated). Output = one row per
    * (entity, key, error position). */
  val q55Validation: Q = Q(
    "q55_validation_flags",
    """SELECT * FROM (VALUES
      |  ('author', 'd@e.f', 0, 'Author must have at least 1 commit'),
      |  ('author', 'g@h.i', 0, 'First commit date cannot be after last commit date'),
      |  ('commit', 'bad', 0, 'Invalid SHA length: bad'),
      |  ('commit', 'bad', 1, 'Invalid email format: bad-email'),
      |  ('commit', 'bad', 2, 'Author name cannot be empty'),
      |  ('commit', 'bad', 3, 'Addition/deletion/file counts cannot be negative'),
      |  ('commit', 'cafebabe', 0, 'Author name cannot be empty'),
      |  ('commit', 'cafebabe1', 0, 'Committed date is invalid'),
      |  ('commit', 'cafebabe2', 0, 'Addition/deletion/file counts cannot be negative'),
      |  ('commit', 'deadbee', 0, 'Invalid email format: no-at-sign'),
      |  ('commit', 'deadbeef01', 0, 'Email cannot be empty'),
      |  ('commit', 'feed0001', 0, 'Author name exceeds 255 characters'),
      |  ('commit', 'feed0002', 0, 'Email exceeds 255 characters'),
      |  ('commit', 'gggggggg', 0, 'Invalid SHA format (must be hex): gggggggg'),
      |  ('commit', 'xyz', 0, 'Invalid SHA length: xyz'),
      |  ('tag', '', 0, 'Tag name cannot be empty'),
      |  ('tag', 'v1', 0, 'Invalid SHA length: zzz'),
      |  ('tag', 'v2', 0, 'Invalid email format: not-an-email')
      |) t(entity, entity_key, ord, error)
      |ORDER BY entity, entity_key, ord""".stripMargin) { (s, _) =>
    import s.implicits._
    val ok = "ok@example.com"
    val t = Some(1700000000L)
    val commits = Seq(
      ("a1b2c3d4", ok, "Okay", t, "fine", 1L, 1L, 1L), // fully valid → no rows
      ("xyz", ok, "Okay", t, "m", 0L, 0L, 0L), // short sha wins over non-hex
      ("gggggggg", ok, "Okay", t, "m", 0L, 0L, 0L),
      ("deadbee", "no-at-sign", "Okay", t, "m", 0L, 0L, 0L),
      ("deadbeef01", " ", "Okay", t, "m", 0L, 0L, 0L), // whitespace = empty
      ("cafebabe", ok, "", t, "m", 0L, 0L, 0L),
      ("cafebabe1", ok, "Okay", None, "m", 0L, 0L, 0L),
      ("cafebabe2", ok, "Okay", t, "m", -1L, 0L, 0L),
      ("feed0001", ok, "n" * 256, t, "m", 0L, 0L, 0L),
      ("feed0002", "e" * 290 + "@x.com", "Okay", t, "m", 0L, 0L, 0L),
      ("bad", "bad-email", "", t, "m", 0L, -2L, 0L)) // 4 errors, fixed order
      .toDF("sha", "author_email", "author_name", "epoch", "message",
        "additions", "deletions", "files_changed")
      .withColumn("committed_at", GitParse.epochToTimestamp(col("epoch")))
    val authors = Seq(
      ("a@b.c", "A", 1L, 1000L, 2000L), // valid
      ("d@e.f", "D", 0L, 1000L, 1000L),
      ("g@h.i", "G", 2L, 2000L, 1000L))
      .toDF("email", "name", "total_commits", "f", "l")
      .withColumn("first_commit_at", timestamp_seconds(col("f")))
      .withColumn("last_commit_at", timestamp_seconds(col("l")))
    val none: Option[String] = None
    val tags = Seq(
      ("", "deadbeef", false, none, none, none),
      ("v1", "zzz", false, none, none, none),
      ("v2", "deadbeef", true, Some("T"), Some("not-an-email"), Some("msg")),
      ("v3", "deadbeef", true, none, none, none)) // null tagger fields skipped
      .toDF("tag_name", "sha", "is_annotated", "tagger_name", "tagger_email",
        "message")
    def explodeErrs(df: DataFrame, entity: String, key: String, errs: org.apache.spark.sql.Column) =
      df.withColumn("__errs", errs)
        .select(lit(entity).as("entity"), col(key).as("entity_key"),
          posexplode(col("__errs")).as(Seq("ord", "error")))
    explodeErrs(graft.git.Validate.flagCommits(commits), "commit", "sha",
        col("validation_errors"))
      .unionAll(explodeErrs(authors, "author", "email", graft.git.Validate.authorErrors))
      .unionAll(explodeErrs(tags, "tag", "tag_name", graft.git.Validate.tagErrors))
      .orderBy(col("entity"), col("entity_key"), col("ord"))
  }

  val all: Seq[Q] = Seq(
    q50Commits, q51FileChanges, q52Authors, q53Tags, q54Language, q55Validation)
}
