package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Streaming UPSERT publish via `foreachBatch` — the production pattern for
  * maintaining a keyed snapshot table from a stream when the sink has no
  * native merge (plain parquet here; the same code shape drives JDBC or any
  * table format): per micro-batch, merge the batch's rows into the snapshot
  * by key (last-writer-wins within and across batches), stage the new
  * snapshot, and swap it in atomically — the same stage→rename protocol as
  * `git.Pipeline.etlAppend`, so a crash mid-publish leaves the old snapshot
  * intact and the batch replays (foreachBatch is at-least-once; the merge
  * is idempotent by key+seq, so replays converge — effective exactly-once).
  *
  * At 100 TB the only change is scope: with a key-partitioned snapshot the
  * merge touches only the partitions present in the batch (dynamic
  * partition overwrite), not the whole table. The merge itself is the q79
  * digest-diff shape: join on key, prefer the higher ingest seq.
  */
object UpsertSink {

  /** Merge `batch` (key, seq, payload...) into the parquet snapshot at
    * `snapshotDir` — keep, per key, the row with the highest `seq`
    * (ties: the incoming row wins; within a batch, the max-seq row). */
  def mergeBatch(batch: DataFrame, snapshotDir: String): Unit = {
    val spark = batch.sparkSession
    val fs = new Path(snapshotDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = new Path(snapshotDir, "current")
    val staged = new Path(snapshotDir, s"staged-${java.util.UUID.randomUUID()}")

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
    if (fs.exists(cur)) fs.delete(cur, true)
    require(fs.rename(staged, cur), s"atomic snapshot swap failed at $cur")
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
