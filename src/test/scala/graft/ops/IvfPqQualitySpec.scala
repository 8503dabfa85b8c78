package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Composed-index quality gate: q239's IVF-PQ topology on the
  * product-clustered fixture (PqTrainSpec's structure — the data PQ can
  * actually exploit; on the driver's i.i.d. embeddings recall floors are
  * provably uninformative). The flat-PQ arm (q236's exhaustive ADC) is
  * the upper reference: IVF adds list pruning ON TOP of the same codes,
  * so the sweep pins the recall/probe-cost trade-off — how much the
  * coarse quantizer's candidate restriction costs at each nprobe —
  * as a tested invariant rather than a hope.
  *
  * Note recall is NOT theoretically monotone in nprobe (ADC is
  * approximate: a widened candidate set can displace a true neighbor
  * from the approximate top-5), and IVF can even beat flat for the same
  * reason. The asserts are therefore floors and a bounded gap-to-flat,
  * not strict orderings — the measured fixture numbers with margins
  * that absorb benign re-tuning, not a regression. */
class IvfPqQualitySpec extends SparkSpec {
  import spark.implicits._

  test("IVF-PQ recall@5 on product-clustered embeddings: floors per nprobe, bounded gap to flat PQ") {
    val work = Files.createTempDirectory("graft-ivfpq-")
    org.apache.commons.io.FileUtils.forceDeleteOnExit(work.toFile)
    val dir = work.toString
    val rnd = new java.util.Random(42)
    val k = 16
    val dims = 64
    val subDims = 16
    val nSubs = dims / subDims
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

    // Exact L2² ground truth per probe query (driver-side over the
    // 200-vector fixture; ties broken (d2, id) like every gated ranking).
    val embs = rows.map { case (id, e, _) => id -> e }.toMap
    def exactTop5(q: Long): Set[Long] =
      embs.keysIterator.filter(_ != q).map { v =>
        val a = embs(q); val b = embs(v)
        var d = 0.0
        var i = 0
        while (i < a.length) {
          val t = a(i).toDouble - b(i).toDouble; d += t * t; i += 1
        }
        (v, d)
      }.toSeq.sortBy { case (v, d) => (d, v) }.take(5).map(_._1).toSet
    val truth = (0L until 10L).map(q => q -> exactTop5(q)).toMap

    def recallOf(df: DataFrame): Double = {
      val got = df.collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      (0L until 10L)
        .map(q => (got.getOrElse(q, Set.empty[Long]) & truth(q)).size / 5.0)
        .sum / 10.0
    }

    val flat = recallOf(Similarity.pqAdcTop5(spark, dir))
    val r1 = recallOf(Similarity.ivfPqTop5(spark, dir, 1))
    val r2 = recallOf(Similarity.ivfPqTop5(spark, dir, 2))
    val r4 = recallOf(Similarity.ivfPqTop5(spark, dir, 4))
    info(s"recall@5: flat=$flat nprobe1=$r1 nprobe2=$r2 nprobe4=$r4")

    // Deterministic pipeline (seeded fixture, decimal-exact distances,
    // id tiebreaks) → exact-reproducible numbers (measured: flat=0.50,
    // nprobe1=0.42, nprobe2=0.52, nprobe4=0.50 — nprobe2 edging out flat
    // is the documented displacement artifact, not an error). Floors sit
    // 2–3 recall steps (0.02 = one hit over 10 queries × 5) under
    // measured — margin for benign fixture re-tuning, not a regression.
    assert(flat >= 0.44, s"flat-PQ recall collapsed: $flat")
    assert(r1 >= 0.36, s"nprobe=1 recall collapsed: $r1")
    assert(r2 >= 0.46, s"nprobe=2 (q239's gate setting) recall collapsed: $r2")
    assert(r4 >= 0.44, s"nprobe=4 recall collapsed: $r4")
    // Graceful degradation vs flat: the coarse quantizer's pruning may
    // cost recall but must stay within a bounded gap of scanning
    // everything with the same codes (measured gaps: −0.02 and 0.00).
    assert(r2 >= flat - 0.06,
      s"IVF pruning at nprobe=2 costs more than the bounded gap: flat=$flat r2=$r2")
    assert(r4 >= flat - 0.06,
      s"IVF pruning at nprobe=4 costs more than the bounded gap: flat=$flat r4=$r4")
  }
}
