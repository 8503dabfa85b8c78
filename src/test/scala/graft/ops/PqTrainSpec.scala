package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ANN quality regression gate on a CLUSTER-STRUCTURED fixture.
  *
  * q237/q242 honestly record that on the driver's i.i.d. random
  * embeddings PQ recall is ~0.34 and one Lloyd step gives zero lift —
  * correct (there is nothing to learn from isotropic noise), but it
  * means a regression in codebook training would be INVISIBLE to those
  * gates. This spec builds the structure PQ actually exploits — PRODUCT
  * cluster structure: each 16-dim subspace has its own 16 Gaussian
  * components and every vector picks one INDEPENDENTLY per subspace, so
  * composite codes address 16⁴ cells, vectors land in distinct cells,
  * and ADC ordering is driven by quantization error rather than
  * within-cell ties (a single global mixture degenerates: same-cluster
  * members share all four codes, ADC ties across the whole cluster, and
  * recall measures the id tiebreak, not the books — measured, r8). On
  * this fixture one Lloyd step provably has headroom: seed books are
  * noisy cell MEMBERS (error ~ σ·√16 from their subcenter), refined
  * books are cell MEANS (error ~ σ·√16/√|cell|), so ADC error drops
  * ~3× and recall must lift. Asserted: a seed floor, a strict mean
  * lift, and a trained floor. */
class PqTrainSpec extends SparkSpec {
  import spark.implicits._

  test("one Lloyd step lifts PQ recall on product-clustered embeddings") {
    val work = Files.createTempDirectory("graft-pqtrain-")
    org.apache.commons.io.FileUtils.forceDeleteOnExit(work.toFile)
    val dir = work.toString
    val rnd = new java.util.Random(42)
    val k = 16
    val dims = 64
    val subDims = 16
    val nSubs = dims / subDims // 4 PQ subspaces, matching pqSubs
    // 16 subcenters per subspace, chosen independently per vector.
    val centers = Array.fill(nSubs, k, subDims)(rnd.nextGaussian().toFloat)
    val n = 200
    val rows = (0 until n).map { i =>
      val emb = new Array[Float](dims)
      for (s <- 0 until nSubs) {
        val c = centers(s)(rnd.nextInt(k))
        for (d <- 0 until subDims)
          emb(s * subDims + d) = c(d) + rnd.nextGaussian().toFloat * 0.5f
      }
      (i.toLong, emb, 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    graft.functions.GraftFunctions.register(spark)
    val res = Similarity.q242PqTrain.fn(spark, dir)
      .agg(avg(col("recall_seed")).as("seed"),
        avg(col("recall_trained")).as("trained"),
        count(lit(1)).as("nq"))
      .collect()(0)
    val seed = res.getAs[Double]("seed")
    val trained = res.getAs[Double]("trained")
    info(s"PQ recall@5 on product-clustered fixture: seed=$seed trained=$trained")
    assert(res.getAs[Long]("nq") === 10L)
    // The whole pipeline is deterministic (seeded fixture, decimal-exact
    // distances, id tiebreaks), so these are exact-reproducible numbers
    // (measured: seed=0.50, trained=0.58; lift is stable at +0.06..+0.10
    // across σ∈[0.3,0.8]; the margins absorb only benign fixture
    // re-tuning, not a regression). The trained ceiling ~0.6 is the seed
    // COVERAGE bound: q242 seeds books from the first 16 vectors, whose
    // random cell choices cover ~10 of 16 components per subspace, and
    // one Lloyd step refines codes but cannot invent missing ones.
    assert(seed >= 0.45,
      s"seed PQ recall collapsed on clustered data: $seed — the encode or " +
        "ADC path regressed (i.i.d. gates can't see this)")
    assert(trained >= seed + 0.05,
      s"one Lloyd step must lift recall on product-clustered embeddings, " +
        s"got seed=$seed trained=$trained — codebook training regressed")
    assert(trained >= 0.55,
      s"trained PQ recall below floor on clustered data: $trained")
  }
}
