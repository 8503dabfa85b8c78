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
    * 85-95, 109-117, 148-151, 228-236).
    *
    * The four repo-scoped tables (commits, file_changes, tags, repos) are
    * stored PARTITIONED by repo: a run merges only the partitions of the
    * repos it touched — the previous store is read partition-pruned to the
    * touched set, merged with that table's reference conflict semantics,
    * staged, and swapped in per partition with a retire→promote→clean
    * rename sequence. Untouched repos' files are never read, rewritten, or
    * even listed: merge cost is proportional to the run's output, not the
    * archive — at 100 TB this is the difference between an incremental
    * publish and a full rewrite. Per-partition atomicity matches the
    * reference's own granularity (one SQLite transaction per repo,
    * main.ts), and a crash between retire and promote is rolled back by
    * the next run (dot-prefixed retired dirs are invisible to readers).
    *
    * `authors` is the one table that CANNOT be repo-partitioned: its key
    * is email and its counts accumulate ACROSS repos (database.ts:109-117),
    * so it keeps the whole-table merge — it is a dimension table, orders
    * of magnitude smaller than the fact tables.
    */
  def etlAppend(spark: SparkSession, repoPaths: Seq[String], outDir: String,
      authorGate: Option[String] = None): Unit = {
    val r = build(spark, repoPaths, authorGate)
    val conf = spark.sparkContext.hadoopConfiguration

    // Whole-table retire→promote→clean swap with crash recovery: a crash
    // between retire and promote leaves `.{table}.__retired-*` and no
    // table dir — rolled back before the next merge reads the store.
    def swapTable(fs: org.apache.hadoop.fs.FileSystem,
        path: org.apache.hadoop.fs.Path, staged: org.apache.hadoop.fs.Path,
        table: String): Unit = {
      if (fs.exists(path)) {
        val retired = new org.apache.hadoop.fs.Path(
          s"$outDir/.$table.__retired-${java.util.UUID.randomUUID()}")
        require(fs.rename(path, retired), s"retire failed for $table")
        require(fs.rename(staged, path), s"atomic swap failed for $table")
        fs.delete(retired, true)
      } else require(fs.rename(staged, path), s"atomic swap failed for $table")
    }
    def recoverTable(fs: org.apache.hadoop.fs.FileSystem, table: String): Unit = {
      val base = new org.apache.hadoop.fs.Path(outDir)
      if (!fs.exists(base)) return
      val path = new org.apache.hadoop.fs.Path(s"$outDir/$table")
      val retired = fs.listStatus(base).map(_.getPath)
        .filter(_.getName.startsWith(s".$table.__retired-"))
      if (!fs.exists(path)) {
        require(retired.length <= 1,
          s"unrecoverable state for $table: ${retired.length} retired dirs")
        retired.foreach(r => require(fs.rename(r, path),
          s"crash rollback failed for $table"))
      } else retired.foreach(r => fs.delete(r, true))
    }

    // Whole-table merge (authors only): stage → retire → promote → clean.
    def mergeWrite(table: String, incoming: DataFrame)(
        merge: (DataFrame, DataFrame) => DataFrame): Unit = {
      val path = new org.apache.hadoop.fs.Path(s"$outDir/$table")
      val fs = path.getFileSystem(conf)
      recoverTable(fs, table)
      val merged =
        if (fs.exists(path)) merge(spark.read.parquet(path.toString), incoming)
        else incoming
      val staged = new org.apache.hadoop.fs.Path(s"$outDir/.$table.__staged")
      merged.write.mode("overwrite").parquet(staged.toString)
      swapTable(fs, path, staged, table)
    }

    // Partitioned merge: prune the store read to the run's partitions,
    // merge, stage partitioned, swap each staged partition dir in.
    def mergeWritePartitioned(table: String, partCol: String, incoming: DataFrame)(
        merge: (DataFrame, DataFrame) => DataFrame): Unit = {
      val store = new org.apache.hadoop.fs.Path(s"$outDir/$table")
      val fs = store.getFileSystem(conf)
      recoverTable(fs, table)
      recoverPartitions(fs, store)
      // A store written by the old FLAT layout (or the empty-table marker)
      // has data files at the root: those rows span ALL repos, so a pruned
      // merge would lose the untouched ones when the root files are
      // cleared. Migrate with one unpruned full merge; every later run is
      // partition-pruned.
      val flatData = fs.exists(store) && fs.listStatus(store).exists(st =>
        st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
      // The touched-partition set is the run's repo list — a handful of
      // names, driver-side by construction (not a data-volume collect).
      // Lazy: the flat-migration branch merges unpruned and must not pay
      // (or depend on) this job. Null partition values would silently miss
      // the isin prune and corrupt the merge — refuse them loudly.
      lazy val touched = {
        val t = incoming.select(col(partCol)).distinct()
          .collect().map(_.getString(0)).toSeq
        require(!t.contains(null),
          s"$table: null $partCol cannot be partition-merged")
        t
      }
      val merged =
        if (fs.exists(store)) {
          // Explicit schema pins the partition column's type (no dir-name
          // type inference) and lets the isin prune skip untouched dirs.
          val all = spark.read.schema(incoming.schema).parquet(store.toString)
          val existing =
            if (flatData) all else all.filter(col(partCol).isin(touched: _*))
          merge(existing, incoming).select(incoming.columns.map(col): _*)
        } else incoming
      val staged = new org.apache.hadoop.fs.Path(s"$outDir/.$table.__staged")
      fs.delete(staged, true)
      merged.write.mode("overwrite").partitionBy(partCol).parquet(staged.toString)
      fs.mkdirs(store)
      val partDirs = fs.listStatus(staged).filter(_.isDirectory)
      if (partDirs.isEmpty) {
        // Empty merged result (e.g. a run with no tags): a partitioned
        // write emits no files, which would leave an unreadable empty dir.
        // Keep the table readable with a flat empty-schema'd parquet —
        // replaced by real partition dirs the first time any appear.
        if (fs.listStatus(store).isEmpty)
          merged.write.mode("overwrite").parquet(store.toString)
        fs.delete(staged, true)
      } else if (flatData) {
        // Migration (old flat layout, or the empty-table marker): the
        // staged dir holds the FULL merged table, so swap the whole table
        // dir in one retire→promote→clean — at no instant do flat rows
        // exist only in a dir a later run would discard.
        swapTable(fs, store, staged, table)
      } else {
        partDirs.foreach(p => swapPartition(fs, store, p.getPath, p.getPath.getName))
        fs.delete(staged, true)
      }
    }

    // ON CONFLICT(repo_name, sha) DO UPDATE (database.ts:21-36)
    mergeWritePartitioned("commits", "repo_name", r.commits)(
      GitAgg.upsertLatest(_, _, Seq("repo_name", "sha")))
    // ON CONFLICT(email): counts add, dates min/max, new name wins (:109-117)
    mergeWrite("authors", r.authors)(GitAgg.mergeAuthors)
    // INSERT OR IGNORE (:148-151): stored row wins
    mergeWritePartitioned("file_changes", "repo_name", r.fileChanges)(
      GitAgg.upsertKeepFirst(_, _, Seq("repo_name", "sha", "file_path")))
    // ON CONFLICT(repo_name, tag_name) DO UPDATE (:228-236)
    mergeWritePartitioned("tags", "repo_name", r.tags)(
      GitAgg.upsertLatest(_, _, Seq("repo_name", "tag_name")))
    // ON CONFLICT(name) DO UPDATE (:85-95)
    mergeWritePartitioned("repos", "name", r.repos)(
      GitAgg.upsertLatest(_, _, Seq("name")))
    // rejects are per-run diagnostics (no reference counterpart): overwrite
    r.rejects.write.mode("overwrite").parquet(s"$outDir/rejects")
    r.release()
  }

  /** Swap a staged partition dir over the live one: retire → promote →
    * clean, each step one atomic rename/delete. The naming convention is
    * what [[recoverPartitions]] parses for crash rollback — shared by the
    * publish and compaction paths so the two can never drift. */
  private def swapPartition(fs: org.apache.hadoop.fs.FileSystem,
      store: org.apache.hadoop.fs.Path, staged: org.apache.hadoop.fs.Path,
      name: String): Unit = {
    val dest = new org.apache.hadoop.fs.Path(store, name)
    if (fs.exists(dest)) {
      val retired = new org.apache.hadoop.fs.Path(store,
        s".retired-${java.util.UUID.randomUUID()}--$name")
      require(fs.rename(dest, retired), s"retire failed for $dest")
      require(fs.rename(staged, dest), s"promote failed for $dest")
      fs.delete(retired, true)
    } else require(fs.rename(staged, dest), s"promote failed for $dest")
  }

  /** Compact a repo-partitioned table written by [[etlAppend]]: every
    * incremental run adds a fresh file set to each touched partition's
    * rewrite, and long-running stores accumulate small files (the classic
    * 100 TB operational problem — file-count pressure on listing, footer
    * reads, and task scheduling). Partitions already at or below
    * `filesPerPartition` data files are skipped (idempotent: a second
    * compact run touches nothing), the rest are coalesced and swapped in
    * with the same crash-safe retire→promote→clean renames as the publish
    * path. Content is untouched — only the physical file layout changes.
    * Like the publish path, compaction assumes a single writer; a reader
    * listing partitions in the instant between retire and promote can
    * observe the table without that one partition. */
  def compact(spark: SparkSession, outDir: String, table: String,
      filesPerPartition: Int = 1): Unit = {
    val store = new org.apache.hadoop.fs.Path(s"$outDir/$table")
    val fs = store.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(store)) return
    recoverPartitions(fs, store)
    fs.listStatus(store).filter(p => p.isDirectory && p.getPath.getName.contains("="))
      .foreach { p =>
        val part = p.getPath
        val nData = fs.listStatus(part).count(f =>
          f.isFile && f.getPath.getName.endsWith(".parquet"))
        if (nData > filesPerPartition) {
          val staged = new org.apache.hadoop.fs.Path(store, s".compact-staged-${part.getName}")
          fs.delete(staged, true)
          spark.read.parquet(part.toString)
            .coalesce(filesPerPartition)
            .write.mode("overwrite").parquet(staged.toString)
          swapPartition(fs, store, staged, part.getName)
        }
      }
  }

  /** Roll back partitions stranded by a crash between retire and promote:
    * a `.retired-<uuid>--<partdir>` whose `<partdir>` is missing means the
    * promote never happened — restore the retired copy; one whose partdir
    * exists is post-promote junk — delete it. Dot-prefixed names are
    * invisible to Spark's partition discovery either way. */
  private def recoverPartitions(fs: org.apache.hadoop.fs.FileSystem,
      store: org.apache.hadoop.fs.Path): Unit = {
    if (!fs.exists(store)) return
    fs.listStatus(store).map(_.getPath)
      .filter(_.getName.startsWith(".retired-")).foreach { p =>
        // name = .retired-<36-char-uuid>--<partdir>
        val part = p.getName.drop(".retired-".length + 36 + 2)
        val dest = new org.apache.hadoop.fs.Path(store, part)
        if (part.nonEmpty && !fs.exists(dest)) {
          require(fs.rename(p, dest), s"crash rollback failed for $dest")
        } else fs.delete(p, true)
      }
    // Stale compaction staging (crash before its retire) is always junk:
    // the live partition dir was never touched.
    fs.listStatus(store).map(_.getPath)
      .filter(_.getName.startsWith(".compact-staged-"))
      .foreach(fs.delete(_, true))
  }

  /** S8 bucketed-layout sink (opt-in): the two fact tables are saved as
    * catalog tables bucketed AND sorted on (repo_name, sha), so every
    * downstream keyed operation on that key — the U1/U3 cross-run dedup,
    * the commits⋈file_changes star join, an as-of join against commit
    * history — plans as a shuffle-free sort-merge over co-located buckets.
    * At 100 TB this moves the dominant join cost from a cluster-wide
    * exchange to a local merge per bucket, paid once at write time.
    * Dimension tables (authors, tags, repos) stay plain: they broadcast.
    * Proven by a plan assertion in MainSpec (zero Exchange in the fact
    * join) — the same machinery BucketedJoinSpec demonstrates on TPC-H. */
  def etlBucketed(spark: SparkSession, repoPaths: Seq[String],
      tablePrefix: String, buckets: Int = 8,
      authorGate: Option[String] = None): Result = {
    val r = build(spark, repoPaths, authorGate)
    Seq("commits" -> r.commits, "file_changes" -> r.fileChanges).foreach {
      case (name, df) =>
        df.write.mode("overwrite")
          .bucketBy(buckets, "repo_name", "sha").sortBy("repo_name", "sha")
          .saveAsTable(s"${tablePrefix}_$name")
    }
    r.authors.write.mode("overwrite").saveAsTable(s"${tablePrefix}_authors")
    r.tags.write.mode("overwrite").saveAsTable(s"${tablePrefix}_tags")
    r.repos.write.mode("overwrite").saveAsTable(s"${tablePrefix}_repos")
    r.release()
    r
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
