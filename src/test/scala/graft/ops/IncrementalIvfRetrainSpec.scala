package graft.ops

import java.nio.file.Paths

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The day-N story for the persisted IVF index: growth degrades the
  * frozen-k cost law, ivfRetrain restores it — and publishes the new
  * generation atomically so readers never see a half-retrained index. */
class IncrementalIvfRetrainSpec extends SparkSpec {
  import spark.implicits._

  test("ivfRetrain after 4x growth: k back to semK(N), lists back to TargetClusterSize, atomic promote") {
    // 80 deterministic pseudo-random directions in 64-dim, each duplicated
    // 64 times (vec_id i -> direction i%80): N = 5120. The 80 smallest
    // vec_ids cover every direction exactly once, so the retrain seeds are
    // one per direction and Lloyd is exactly stable (mean of identical
    // copies = the direction itself).
    val big = Paths.get("target", "tmp", "ivfretrain").toAbsolutePath.toString
    val rnd = new scala.util.Random(7)
    val dirs = Array.fill(80)(Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    val n = 5120
    (0 until n).map(i => (i.toLong, dirs(i % 80), (i % 80).toLong))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$big/embeddings.parquet")
    val e = Similarity.embWithNorm(spark, big)
    val idx = Paths.get("target", "tmp",
      s"ivfrt-${java.util.UUID.randomUUID()}").toAbsolutePath.toString

    // Four daily appends of 1280: day 1 trains k = semK(1280) = 20, the
    // rest assign to the frozen centroids — by day 4 every inverted list
    // holds 256 members, 4x the target: the cost-law defect ivfRetrain fixes.
    (0 until 4).foreach { d =>
      Similarity.ivfAppend(spark, idx,
        e.filter(col("vec_id") >= d * 1280 && col("vec_id") < (d + 1) * 1280),
        d.toLong)
    }
    assert(spark.read.parquet(s"$idx/centroids").count() == 20)
    assert(spark.read.parquet(s"$idx/assign").count() == n)
    val degraded = spark.read.parquet(s"$idx/assign")
      .groupBy("centroid_id").count()
      .agg(avg("count")).first().getDouble(0)
    assert(degraded == n.toDouble / 20, s"expected 4x-degraded lists, got $degraded")

    Similarity.ivfRetrain(spark, idx, e)

    // Atomic promote: pointer committed, replaced generation-0 store dropped.
    assert(new java.io.File(s"$idx/_ivfgen-1").exists(), "generation pointer missing")
    assert(!new java.io.File(s"$idx/centroids").exists(),
      "superseded generation-0 centroids must be GC'd after the commit")
    assert(spark.read.parquet(s"$idx/gen=1/centroids").count() == 80,
      "k must be recomputed as semK(5120) = 80")
    val sizes = spark.read.parquet(s"$idx/gen=1/assign")
      .groupBy("centroid_id").count()
      .collect().map(_.getAs[Long]("count"))
    assert(sizes.length == 80 && sizes.sum == n, s"membership lost: ${sizes.toSeq}")
    assert(sizes.forall(_ == Similarity.TargetClusterSize),
      s"lists not back at TargetClusterSize: ${sizes.toSeq}")

    // Exact oracle on the duplicated-direction fixture: vec 0's true top-3
    // are its same-direction copies at cosine exactly 1.0, ranked by id.
    val rows = Similarity.ivfQuery(spark, idx, e, e.filter(col("vec_id") === 0))
      .orderBy(col("rank")).collect()
    assert(rows.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(80L, 160L, 240L),
      s"got ${rows.map(_.getAs[Long]("neighbor_id")).toSeq}")
    assert(rows.forall(_.getAs[Double]("cos_sim") == 1.0))

    // Day 5 appends land in the NEW generation; batch ids continue.
    val big2 = Paths.get("target", "tmp", "ivfretrain-d5").toAbsolutePath.toString
    (n until n + 640).map(i => (i.toLong, dirs(i % 80), (i % 80).toLong))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$big2/embeddings.parquet")
    Similarity.ivfAppend(spark, idx, Similarity.embWithNorm(spark, big2), 4L)
    assert(new java.io.File(s"$idx/gen=1/assign/batch=4").exists(),
      "post-retrain appends must write into the live generation")
    assert(spark.read.parquet(s"$idx/gen=1/assign").count() == n + 640)
  }
}
