package graft.git

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E1/E2: the end-to-end ETL pipeline (SURVEY §3) — extract all repos in
  * parallel, union, transform once, write the five output tables as parquet.
  *
  * The reference's sequential per-repo loop with cross-run SQLite upserts
  * becomes: repoList → parallel extract → union → one keyed
  * dedup/re-aggregation per output table → write. Equivalent because every
  * reference load is a keyed upsert with associative merge functions
  * (SURVEY §2.6), and this shape is embarrassingly parallel at 100 TB (each
  * output table is a single shuffle on its natural key).
  */
object Pipeline {

  final case class Result(
      commits: DataFrame,
      authors: DataFrame,
      fileChanges: DataFrame,
      tags: DataFrame,
      repos: DataFrame)

  /** Extract + transform (no write): the five reference tables. */
  def build(spark: SparkSession, repoPaths: Seq[String],
      authorGate: Option[String] = None): Result = {
    // S5 gate: cheap LIMIT-1 probe before full extraction (main.ts:338-343).
    val infos = repoPaths.flatMap(GitCli.repoInfo)
      .filter(r => authorGate.forall(p => GitCli.hasCommitsByAuthor(r.path, p)))

    val commits = GitAgg.dedupCommits(
      GitParse.parseLog(GitCli.rawLogs(spark, infos))).cache()
    val fileChanges = GitAgg.dedupFileChanges(GitParse.explodeFileChanges(commits))
    val tags = GitAgg.dedupTags(GitParse.parseTags(GitCli.rawTags(spark, infos)))
    val language = GitAgg.repoLanguage(GitCli.lsFiles(spark, infos))
    val repos = GitAgg.repoMeta(commits)
      .join(language.withColumnRenamed("repo_name", "name"), Seq("name"), "left")
    Result(
      commits = commits.drop("file_changes"),
      authors = GitAgg.authors(commits),
      fileChanges = fileChanges,
      tags = tags,
      repos = repos)
  }

  /** E1/E2 with the S8 sink: write each table as parquet under outDir.
    * (The reference's one-transaction-per-repo atomicity is subsumed by
    * Spark's output-commit protocol per table — SURVEY §2.6 U6.) */
  def etl(spark: SparkSession, repoPaths: Seq[String], outDir: String,
      authorGate: Option[String] = None): Result = {
    val r = build(spark, repoPaths, authorGate)
    r.commits.write.mode("overwrite").parquet(s"$outDir/commits")
    r.authors.write.mode("overwrite").parquet(s"$outDir/authors")
    r.fileChanges.write.mode("overwrite").parquet(s"$outDir/file_changes")
    r.tags.write.mode("overwrite").parquet(s"$outDir/tags")
    r.repos.write.mode("overwrite").parquet(s"$outDir/repos")
    r
  }

  /** S10: formatted console summary report (src/transforms.ts:64-86). */
  def summaryReport(commits: DataFrame): String = {
    val row = GitAgg.summaryStats(commits).collect()(0)
    val fmt = java.text.NumberFormat.getIntegerInstance(java.util.Locale.US)
    def n(i: Int) = fmt.format(row.getLong(i))
    s"""Summary
       |  Commits:        ${n(0)}
       |  Additions:      ${n(1)}
       |  Deletions:      ${n(2)}
       |  Files changed:  ${n(3)}
       |  Merge commits:  ${n(4)}
       |  Unique authors: ${n(5)}
       |  Date range:     ${row.getString(6)} .. ${row.getString(7)}""".stripMargin
  }
}
