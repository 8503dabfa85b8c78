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
      repos: DataFrame,
      rejects: DataFrame,
      /** Frees the pipeline's internal cache once outputs are materialized
        * (each run caches a nonce-distinct plan, so without this, repeated
        * runs in one session accumulate dead cache entries). */
      release: () => Unit = () => ())

  /** Extract + transform (no write): the five reference tables plus the
    * validation rejects (SURVEY §2.2: the reference's dead validators shipped
    * as a filter/quality-flag stage — invalid commits are diverted, with
    * their error list, instead of silently loaded). */
  def build(spark: SparkSession, repoPaths: Seq[String],
      authorGate: Option[String] = None): Result = {
    // S5 gate: cheap LIMIT-1 probe before full extraction (main.ts:338-343).
    val infos = repoPaths.flatMap(GitCli.repoInfo)
      .filter(r => authorGate.forall(p => GitCli.hasCommitsByAuthor(r.path, p)))

    val flagged = Validate.flagCommits(GitAgg.dedupCommits(
      GitParse.parseLog(GitCli.rawLogs(spark, infos)))).cache()
    val rejects = flagged.filter(!col("is_valid"))
      .select(col("repo_name"), col("sha"), col("validation_errors"))
    val commits = flagged.filter(col("is_valid"))
      .drop("validation_errors", "is_valid")
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
      repos = repos,
      rejects = rejects,
      release = () => { flagged.unpersist(); () })
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
    r.rejects.write.mode("overwrite").parquet(s"$outDir/rejects")
    r.release()
    r
  }

  /** Cross-run incremental mode (U1–U5 across successive runs): the
    * reference appends every run into the same SQLite file, so each load is
    * a keyed upsert against the cumulative table (src/database.ts:21-36,
    * 85-95, 109-117, 148-151, 228-236). Here: read the previously-written
    * table (if any), merge with that table's reference conflict semantics,
    * and swap the directory in atomically (stage → delete → rename via the
    * FileSystem API — same pattern as the output-commit protocol, so a
    * crashed run leaves the old table intact; this is the U6 atomicity
    * story per table). One shuffle per table on its natural key — the merge
    * cost is proportional to the run's output, not the archive, once the
    * store is partitioned by key (e.g. repo_name) so only touched
    * partitions rewrite.
    */
  def etlAppend(spark: SparkSession, repoPaths: Seq[String], outDir: String,
      authorGate: Option[String] = None): Unit = {
    val r = build(spark, repoPaths, authorGate)
    def mergeWrite(table: String, incoming: DataFrame)(
        merge: (DataFrame, DataFrame) => DataFrame): Unit = {
      val path = new org.apache.hadoop.fs.Path(s"$outDir/$table")
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val merged =
        if (fs.exists(path)) merge(spark.read.parquet(path.toString), incoming)
        else incoming
      val staged = new org.apache.hadoop.fs.Path(s"$outDir/$table.__staged")
      merged.write.mode("overwrite").parquet(staged.toString)
      fs.delete(path, true)
      require(fs.rename(staged, path), s"atomic swap failed for $table")
    }
    // ON CONFLICT(repo_name, sha) DO UPDATE (database.ts:21-36)
    mergeWrite("commits", r.commits)(
      GitAgg.upsertLatest(_, _, Seq("repo_name", "sha")))
    // ON CONFLICT(email): counts add, dates min/max, new name wins (:109-117)
    mergeWrite("authors", r.authors)(GitAgg.mergeAuthors)
    // INSERT OR IGNORE (:148-151): stored row wins
    mergeWrite("file_changes", r.fileChanges)(
      GitAgg.upsertKeepFirst(_, _, Seq("repo_name", "sha", "file_path")))
    // ON CONFLICT(repo_name, tag_name) DO UPDATE (:228-236)
    mergeWrite("tags", r.tags)(
      GitAgg.upsertLatest(_, _, Seq("repo_name", "tag_name")))
    // ON CONFLICT(name) DO UPDATE (:85-95)
    mergeWrite("repos", r.repos)(GitAgg.upsertLatest(_, _, Seq("name")))
    // rejects are per-run diagnostics (no reference counterpart): overwrite
    r.rejects.write.mode("overwrite").parquet(s"$outDir/rejects")
    r.release()
  }

  /** S8 JDBC sink option, mirroring the reference's embedded-file database
    * contract (db/index.ts:4: a single SQLite file consumed by external BI
    * tools). Derby is the embedded JDBC engine available on the Spark
    * classpath; `jdbc:derby:/path;create=true` is the moral equivalent of
    * the reference's `/var/tmp/git-analytics.db`. Parquet stays the primary
    * sink (SURVEY §2.1 S8) — this is the compatibility path, and it
    * single-streams through one connection per table, so it is for serving
    * summaries, not 100 TB fact tables. */
  def etlJdbc(spark: SparkSession, repoPaths: Seq[String], jdbcUrl: String,
      authorGate: Option[String] = None): Result = {
    val r = build(spark, repoPaths, authorGate)
    val props = new java.util.Properties()
    def w(table: String, df: DataFrame): Unit =
      df.write.mode("overwrite").jdbc(jdbcUrl, table, props)
    w("commits", r.commits)
    w("authors", r.authors)
    w("file_changes", r.fileChanges)
    w("tags", r.tags)
    w("repos", r.repos)
    // validation_errors is array-typed — JDBC needs a scalar rendering
    w("rejects", r.rejects.withColumn("validation_errors",
      concat_ws("; ", col("validation_errors"))))
    r.release()
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
