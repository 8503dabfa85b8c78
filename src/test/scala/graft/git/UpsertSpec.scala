package graft.git

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-run upsert merge semantics (reference src/database.ts): DO-UPDATE
  * (new row replaces), INSERT-OR-IGNORE (stored row wins), and the authors
  * accumulate merge. The end-to-end two-run flow is in MainSpec; these pin
  * the per-table conflict rules on synthetic frames. */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private val existing = Seq(
    ("r1", "aaa", "old message", 10L),
    ("r1", "bbb", "kept", 20L))
    .toDF("repo_name", "sha", "message", "additions")
  private val incoming = Seq(
    ("r1", "aaa", "new message", 11L), // conflicts with stored aaa
    ("r2", "ccc", "inserted", 30L))
    .toDF("repo_name", "sha", "message", "additions")

  private def byKey(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap

  test("upsertLatest: ON CONFLICT DO UPDATE — incoming row replaces wholesale") {
    val m = byKey(GitAgg.upsertLatest(existing, incoming, Seq("repo_name", "sha")))
    assert(m == Map(
      ("r1", "aaa") -> "new message",
      ("r1", "bbb") -> "kept",
      ("r2", "ccc") -> "inserted"))
  }

  test("upsertKeepFirst: INSERT OR IGNORE — stored row wins on conflict") {
    val m = byKey(GitAgg.upsertKeepFirst(existing, incoming, Seq("repo_name", "sha")))
    assert(m == Map(
      ("r1", "aaa") -> "old message",
      ("r1", "bbb") -> "kept",
      ("r2", "ccc") -> "inserted"))
  }

  test("mergeAuthors: counts add, dates min/max-merge, incoming name wins") {
    val ex = Seq(("a@x", "Old Name", 3L, 1000L, 2000L))
      .toDF("email", "name", "total_commits", "f", "l")
      .withColumn("first_commit_at", timestamp_seconds(col("f")))
      .withColumn("last_commit_at", timestamp_seconds(col("l")))
      .drop("f", "l")
    val in = Seq(("a@x", "New Name", 2L, 500L, 1500L), ("b@x", "B", 1L, 100L, 100L))
      .toDF("email", "name", "total_commits", "f", "l")
      .withColumn("first_commit_at", timestamp_seconds(col("f")))
      .withColumn("last_commit_at", timestamp_seconds(col("l")))
      .drop("f", "l")
    val out = GitAgg.mergeAuthors(ex, in).collect().map { r =>
      r.getAs[String]("email") -> ((r.getAs[String]("name"),
        r.getAs[Long]("total_commits"),
        r.getAs[java.sql.Timestamp]("first_commit_at").getTime / 1000,
        r.getAs[java.sql.Timestamp]("last_commit_at").getTime / 1000))
    }.toMap
    assert(out == Map(
      "a@x" -> (("New Name", 5L, 500L, 2000L)),
      "b@x" -> (("B", 1L, 100L, 100L))))
  }
}
