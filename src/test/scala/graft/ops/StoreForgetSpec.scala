package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deletion-path edge cases the q269/q270 gates don't reach: forgetting
  * from a COMPACTED band store (the purge must rewrite the consolidated
  * `batch=-1` partition too), purging a batch down to zero rows (empty
  * partition round-trips), ivfForget's centroid-id refusal, and
  * ivfForget on a RETRAINED (gen>0) index. */
class StoreForgetSpec extends SparkSpec {
  import spark.implicits._

  test("forgetDocs on a compacted store purges the consolidated partition; empty partitions round-trip") {
    val work = Files.createTempDirectory("graft-forget-band-")
    org.apache.commons.io.FileUtils.forceDeleteOnExit(work.toFile)
    val idx = work.resolve("bandidx").toString
    // Three synthetic band batches; batch 0 will fold into batch=-1.
    (0L to 9L).map(i => (i, s"b${i % 3}")).toDF("doc_id", "bh")
      .write.mode("overwrite").parquet(s"$idx/batch=0")
    (10L to 19L).map(i => (i, s"b${i % 3}")).toDF("doc_id", "bh")
      .write.mode("overwrite").parquet(s"$idx/batch=1")
    (20L to 29L).map(i => (i, s"b${i % 3}")).toDF("doc_id", "bh")
      .write.mode("overwrite").parquet(s"$idx/batch=2")
    Dedup.compactBandIndex(spark, idx, keepRecent = 1)
    assert(Files.exists(work.resolve("bandidx").resolve("_bandgen-1")))

    // Forget ids spanning the consolidated archive AND a recent batch,
    // including ALL of batch 2 (its purged partition must round-trip
    // empty, not vanish — the replay contract keeps the subdir).
    val deleted = ((0L to 4L) ++ (20L to 29L)).toDF("doc_id")
    Dedup.forgetDocs(spark, idx, deleted)
    val live = spark.read.parquet(Dedup.bandIndexRoot(spark, idx))
    assert(live.filter(col("doc_id") < 5 || col("doc_id") >= 20).count() == 0,
      "forgotten ids must not survive in any partition, folded or recent")
    assert(live.select(col("doc_id")).distinct().count() == 15,
      "every remaining id survives the purge")
    // The purged generation still lists BOTH partitions (batch=-1 and
    // batch=2), so a replayed tail batch finds its own subdir.
    val root = new java.io.File(Dedup.bandIndexRoot(spark, idx))
    val parts = root.listFiles().map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(parts == Set("batch=-1", "batch=2"), s"partitions: $parts")
  }

  test("ivfForget refuses centroid-id deletions and purges a retrained (gen>0) index") {
    val work = Files.createTempDirectory("graft-forget-ivf-")
    org.apache.commons.io.FileUtils.forceDeleteOnExit(work.toFile)
    val big = work.resolve("data").toString
    def unit(axis: Int): Array[Float] =
      Array.tabulate(64)(i => if (i == axis) 1.0f else 0.0f)
    (0 until 128).map(i => (i.toLong, unit(i % 16), (i % 16).toLong))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$big/embeddings.parquet")
    val e = Similarity.embWithNorm(spark, big)
    val idx = work.resolve("idx").toString
    Similarity.ivfAppend(spark, idx, e, 0L)
    Similarity.ivfRetrain(spark, idx, e, lloydIters = 0) // → gen=1

    // Centroid ids after the retrain are the k smallest vec_ids (seed
    // rule): deleting one must be refused, loudly.
    val refusal = intercept[IllegalArgumentException] {
      Similarity.ivfForget(spark, idx, Seq(0L).toDF("vec_id"))
    }
    assert(refusal.getMessage.contains("centroid"))

    // A non-centroid purge on the gen=1 index publishes gen=2 and
    // removes exactly the deleted assignments.
    val deleted = (100L until 110L).toDF("vec_id")
    Similarity.ivfForget(spark, idx, deleted)
    val root = Similarity.ivfCurrentRoot(spark, idx)
    assert(root.endsWith("gen=2"), s"purge must publish a new generation: $root")
    val assign = spark.read.parquet(s"$root/assign")
    assert(assign.filter(col("vec_id") >= 100 && col("vec_id") < 110).count() == 0)
    assert(assign.select(col("vec_id")).distinct().count() == 118)
    // The purged index still answers: vec 0's same-axis copies rank top.
    val rows = Similarity.ivfQuery(spark, idx, e,
        e.filter(col("vec_id") === 0)).orderBy(col("rank")).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Double]("cos_sim") == 1.0))
  }
}
