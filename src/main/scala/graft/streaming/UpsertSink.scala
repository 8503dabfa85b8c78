package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Streaming UPSERT publish via `foreachBatch` — the production pattern for
  * maintaining a keyed snapshot table from a stream when the sink has no
  * native merge (plain parquet here; the same code shape drives JDBC or any
  * table format): per micro-batch, merge the batch's rows into the snapshot
  * by key (last-writer-wins within and across batches), stage the new
  * snapshot, and swap it in with a retire→promote→clean rename sequence:
  * the previous snapshot is renamed aside (not deleted) before the staged
  * one is promoted, so EVERY crash point leaves a recoverable state — the
  * next merge's `recover` rolls a retired snapshot back rather than
  * rebuilding from one batch (foreachBatch is at-least-once; the merge is
  * idempotent by key+seq, so replays converge — effective exactly-once).
  *
  * At 100 TB the only change is scope: with a key-partitioned snapshot the
  * merge touches only the partitions present in the batch (dynamic
  * partition overwrite), not the whole table. The merge itself is the q79
  * digest-diff shape: join on key, prefer the higher ingest seq.
  */
object UpsertSink {

  /** Crash recovery for the three-step swap (retire → promote → clean).
    * A crash between retire and promote leaves NO `current` but exactly one
    * `retired-*` dir holding the intact previous snapshot: roll it back.
    * A crash after promote leaves `current` plus leftover `retired-*` /
    * `staged-*` dirs: garbage-collect them. Ambiguous states (no current,
    * zero-or-many retired dirs, but staged dirs present) fail loudly rather
    * than silently rebuilding the snapshot from one batch. */
  private def recover(fs: org.apache.hadoop.fs.FileSystem, dir: Path, cur: Path): Unit = {
    if (!fs.exists(dir)) return
    val kids = fs.listStatus(dir).map(_.getPath)
    val retired = kids.filter(_.getName.startsWith("retired-"))
    val staged = kids.filter(_.getName.startsWith("staged-"))
    if (!fs.exists(cur)) {
      if (retired.length == 1) {
        require(fs.rename(retired.head, cur), s"crash rollback failed at $cur")
      } else require(retired.isEmpty,
        s"unrecoverable snapshot state at $dir: no `current` and " +
          s"${retired.length} retired dirs — refusing to rebuild the " +
          "snapshot from a single batch")
      // retired.isEmpty && staged only: a crash during the FIRST batch's
      // staged write — no snapshot existed yet, so rebuilding from the
      // replayed batch is exactly right; the stale staged dirs are junk.
    }
    // With `current` present (possibly just rolled back), leftovers are junk.
    (kids.filter(p => p.getName.startsWith("retired-") || p.getName.startsWith("staged-")))
      .filter(fs.exists(_)).foreach(fs.delete(_, true))
  }

  /** Merge `batch` (key, seq, payload...) into the parquet snapshot at
    * `snapshotDir` — keep, per key, the row with the highest `seq`
    * (ties: the incoming row wins; within a batch, the max-seq row). */
  def mergeBatch(batch: DataFrame, snapshotDir: String): Unit = {
    val spark = batch.sparkSession
    val fs = new Path(snapshotDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = new Path(snapshotDir, "current")
    val staged = new Path(snapshotDir, s"staged-${java.util.UUID.randomUUID()}")
    recover(fs, new Path(snapshotDir), cur)

    // Within-batch last-writer-wins first (a batch can carry several
    // versions of one key), rendered as max_by over the whole row.
    val cols = batch.columns
    val batchLatest = batch
      .groupBy(col("key"))
      .agg(max_by(struct(cols.map(col): _*), col("seq")).as("r"))
      .select(col("r.*"))

    val merged =
      if (fs.exists(cur)) {
        val snap = spark.read.parquet(cur.toString)
        // Anti-join keeps snapshot rows whose key is absent from the batch
        // (or present only with a LOWER seq — those are replays of already
        // -published data and must not regress the snapshot).
        val keep = snap.as("s").join(batchLatest.as("b"),
            col("s.key") === col("b.key") && col("s.seq") <= col("b.seq"),
            "left_anti")
        val fresh = batchLatest.as("b").join(snap.as("s"),
            col("b.key") === col("s.key") && col("b.seq") < col("s.seq"),
            "left_anti")
        keep.unionByName(fresh)
      } else batchLatest

    merged.write.mode(SaveMode.Overwrite).parquet(staged.toString)
    // Retire → promote → clean: each step is a single atomic rename/delete,
    // and at no instant is the previous snapshot lost — a crash before the
    // promote is rolled back by `recover` on the next merge.
    if (fs.exists(cur)) {
      val retired = new Path(snapshotDir, s"retired-${java.util.UUID.randomUUID()}")
      require(fs.rename(cur, retired), s"snapshot retire failed at $cur")
      require(fs.rename(staged, cur), s"atomic snapshot swap failed at $cur")
      fs.delete(retired, true)
    } else {
      require(fs.rename(staged, cur), s"atomic snapshot swap failed at $cur")
    }
  }

  /** Attach the upsert sink to a keyed stream: every micro-batch merges
    * into `snapshotDir/current`. */
  def publish(stream: DataFrame, snapshotDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        mergeBatch(batch, snapshotDir)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
