package graft.git

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record validators (reference src/validation.ts:15-194) as a quality-flag /
  * filter stage. The reference exports these but never calls them; they are
  * its only data-quality spec, so we ship them as first-class operators
  * (SURVEY §2.2).
  *
  * Semantics preserved exactly:
  *   - `validateEmail`/`validateSha` return a single ValidationResult, so at
  *     most ONE error per field, checked in reference order (empty → format →
  *     length for email, validation.ts:15-31; empty → length → hex for sha,
  *     validation.ts:36-52) — rendered as a `when` chain.
  *   - `validateCommit`/`validateAuthor`/`validateTag` accumulate errors in a
  *     fixed order (validation.ts:84-120, 126-150, 156-194) — rendered as an
  *     `array(...)` of conditional messages with nulls filtered out, which
  *     preserves that order.
  *
  * Everything is built from codegen'd builtins (rlike/length/trim/when), so
  * flagging 100 TB of commits stays inside whole-stage codegen with no
  * shuffle — it is a pure projection.
  */
object Validate {

  private def emptyish(c: Column): Column = c.isNull || trim(c) === ""

  /** JS truthiness for strings: non-null and non-empty (`if (tag.taggerEmail)`). */
  private def truthy(c: Column): Column = c.isNotNull && c =!= ""

  /** validateEmail (validation.ts:15-31). */
  def emailError(email: Column): Column =
    when(emptyish(email), lit("Email cannot be empty"))
      .when(!email.rlike("^[^\\s@]+@[^\\s@]+\\.[^\\s@]+$"),
        concat(lit("Invalid email format: "), email))
      .when(length(email) > 255, lit("Email exceeds 255 characters"))

  /** validateSha (validation.ts:36-52): 7–40 chars, hex (case-insensitive). */
  def shaError(sha: Column): Column =
    when(emptyish(sha), lit("SHA cannot be empty"))
      .when(length(sha) < 7 || length(sha) > 40,
        concat(lit("Invalid SHA length: "), sha))
      .when(!sha.rlike("(?i)^[a-f0-9]+$"),
        concat(lit("Invalid SHA format (must be hex): "), sha))

  private def collect(errs: Column*): Column =
    filter(array(errs: _*), e => e.isNotNull)

  /** validateCommit (validation.ts:84-120), error order preserved.
    * Expects the [[GitParse.parseLog]] column names. */
  def commitErrors: Column =
    collect(
      shaError(col("sha")),
      emailError(col("author_email")),
      when(emptyish(col("author_name")), lit("Author name cannot be empty")),
      when(length(col("author_name")) > 255,
        lit("Author name exceeds 255 characters")),
      when(col("committed_at").isNull, lit("Committed date is invalid")),
      when(length(col("message")) > 65535,
        lit("Commit message exceeds maximum length")),
      when(col("additions") < 0 || col("deletions") < 0 || col("files_changed") < 0,
        lit("Addition/deletion/file counts cannot be negative")))

  /** validateAuthor (validation.ts:126-150), over [[GitAgg.authors]] output. */
  def authorErrors: Column =
    collect(
      emailError(col("email")),
      when(emptyish(col("name")), lit("Author name cannot be empty")),
      when(length(col("name")) > 255, lit("Author name exceeds 255 characters")),
      when(col("total_commits") < 1, lit("Author must have at least 1 commit")),
      when(col("first_commit_at") > col("last_commit_at"),
        lit("First commit date cannot be after last commit date")))

  /** validateTag (validation.ts:156-194), over [[GitParse.parseTags]] output.
    * Tagger checks only apply to annotated tags, and only when the field is
    * truthy (the reference's `if (tag.taggerEmail)` guards). */
  def tagErrors: Column =
    collect(
      when(emptyish(col("tag_name")), lit("Tag name cannot be empty")),
      when(length(col("tag_name")) > 255, lit("Tag name exceeds 255 characters")),
      shaError(col("sha")),
      when(col("is_annotated") && truthy(col("tagger_email")),
        emailError(col("tagger_email"))),
      when(col("is_annotated") && truthy(col("tagger_name")) &&
        length(col("tagger_name")) > 255,
        lit("Tagger name exceeds 255 characters")),
      when(col("is_annotated") && truthy(col("message")) &&
        length(col("message")) > 65535,
        lit("Tag message exceeds maximum length")))

  /** Quality-flag stage: annotate without dropping. */
  def flagCommits(commits: DataFrame): DataFrame =
    commits
      .withColumn("validation_errors", commitErrors)
      .withColumn("is_valid", size(col("validation_errors")) === 0)
}
