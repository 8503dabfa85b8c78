package graft.git

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Validator stage (reference src/validation.ts:15-194): first-error-only
  * per field, fixed error order per record, and the pipeline-level
  * valid/reject split. The exhaustive per-rule matrix is oracle-gated in
  * q55_validation_flags; this spec covers the stage wiring. */
class ValidateSpec extends SparkSpec {
  import spark.implicits._

  test("emailError: first matching rule wins, valid emails yield null") {
    val df = Seq("ok@example.com", "no-at", " ", "e" * 290 + "@x.com")
      .toDF("email")
      .select(Validate.emailError(col("email")).as("err"))
    assert(df.as[Option[String]].collect().toSeq == Seq(
      None, Some("Invalid email format: no-at"), Some("Email cannot be empty"),
      Some("Email exceeds 255 characters")))
  }

  test("shaError: empty → length → hex, case-insensitive hex accepted") {
    val df = Seq("DEADBEEF", "abc", "gggggggg", "")
      .toDF("sha")
      .select(Validate.shaError(col("sha")).as("err"))
    assert(df.as[Option[String]].collect().toSeq == Seq(
      None, Some("Invalid SHA length: abc"),
      Some("Invalid SHA format (must be hex): gggggggg"),
      Some("SHA cannot be empty")))
  }

  test("flagCommits splits valid from multi-error rows, order preserved") {
    val commits = Seq(
      ("a1b2c3d4", "ok@example.com", "Okay", Some(1700000000L), "m", 1L, 1L, 1L),
      ("bad", "bad-email", "", Some(1700000000L), "m", 0L, -2L, 0L))
      .toDF("sha", "author_email", "author_name", "epoch", "message",
        "additions", "deletions", "files_changed")
      .withColumn("committed_at", GitParse.epochToTimestamp(col("epoch")))
    val flagged = Validate.flagCommits(commits)
    assert(flagged.filter(col("is_valid")).select("sha").as[String]
      .collect().toSeq == Seq("a1b2c3d4"))
    val errs = flagged.filter(!col("is_valid"))
      .select(explode(col("validation_errors"))).as[String].collect().toSeq
    assert(errs == Seq(
      "Invalid SHA length: bad", "Invalid email format: bad-email",
      "Author name cannot be empty",
      "Addition/deletion/file counts cannot be negative"))
  }

  test("tagErrors: tagger checks gated on is_annotated and truthy fields") {
    val none: Option[String] = None
    val df = Seq(
      // lightweight tag with a bad tagger email → email check skipped
      ("v1", "deadbeef", false, none, Some("not-an-email"), none),
      // annotated with empty-string tagger email → JS-falsy, skipped
      ("v2", "deadbeef", true, none, Some(""), none),
      ("v3", "deadbeef", true, none, Some("not-an-email"), none))
      .toDF("tag_name", "sha", "is_annotated", "tagger_name", "tagger_email",
        "message")
      .select(col("tag_name"), Validate.tagErrors.as("errs"))
    assert(rowStrings(df) == Seq(
      "[v1,ArraySeq()]", "[v2,ArraySeq()]",
      "[v3,ArraySeq(Invalid email format: not-an-email)]").sorted)
  }
}
