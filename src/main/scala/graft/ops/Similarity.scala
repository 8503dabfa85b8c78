package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`embedding: array<float>`,
  * dim=64): exact brute-force cosine top-k as the baseline, a
  * sign-LSH-bucketed variant as the scale path, and cosine near-duplicate
  * detection.
  *
  * Numerics: float×float widened to double is exact (24+24 ≤ 53 mantissa
  * bits); each product is then cast to DECIMAL(38,12) and summed — decimal
  * addition is associative, so Spark's fold order and DuckDB's grouped-sum
  * order give bit-identical results, making the cosine reproducible across
  * engines. Spark computes the fold with `zip_with`+`aggregate` (one pass
  * per pair, no explode); the per-element explode happens only in the
  * DuckDB oracle.
  *
  * Scale design: queries are broadcast (small side), candidates stream;
  * brute force is O(Q×N) with no shuffle of the big side; the LSH variant
  * joins on a 256-way sign-bucket key so each query only scores ~N/256
  * candidates — the standard recall/throughput trade.
  */
object Similarity {

  /** Exact decimal dot product of two float-array columns (Spark SQL expr). */
  private def dDot(a: String, b: String): String =
    s"""CAST(aggregate(
       |  zip_with($a, $b, (x, y) -> CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(38,12))),
       |  CAST(0 AS DECIMAL(38,12)),
       |  (acc, v) -> CAST(acc + v AS DECIMAL(38,12))) AS DOUBLE)""".stripMargin

  /** Cheap all-double dot for prefiltering (not oracle-compared). */
  private def fDot(a: String, b: String): String =
    s"""aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
       |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin

  /** DuckDB: one row per (vec_id, element index) — the oracle's explode. */
  private val duckEl =
    """el AS (SELECT vec_id, label, i, CAST(embedding[i] AS DOUBLE) AS v
      |       FROM embeddings, range(1, 65) t(i))""".stripMargin
  private val duckN2 =
    """n2 AS (SELECT vec_id, CAST(SUM(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE) AS n2
      |       FROM el GROUP BY vec_id)""".stripMargin

  private def embWithNorm(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .withColumn("n2", expr(dDot("embedding", "embedding")))

  /** Cosine near-duplicate pairs within the same label partition.
    * Spark prunes with a double-precision cosine ≥ 0.9 before the exact
    * decimal rescore (double error ~1e-13 ≪ the 0.05 margin, so pruning is
    * lossless w.r.t. the ≥ 0.95 verdict). */
  val q38EmbedNearDup: Q = Q(
    "q38_embed_neardup",
    s"""WITH $duckEl,
       |$duckN2,
       |d AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |             CAST(SUM(CAST(a.v * b.v AS DECIMAL(38,12))) AS DOUBLE) AS dot
       |      FROM el a JOIN el b
       |        ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id
       |      GROUP BY 1, 2)
       |SELECT vec_a, vec_b, round(dot / sqrt(na.n2 * nb.n2), 6) AS cos_sim
       |FROM d JOIN n2 na ON na.vec_id = vec_a JOIN n2 nb ON nb.vec_id = vec_b
       |WHERE round(dot / sqrt(na.n2 * nb.n2), 6) >= 0.95
       |ORDER BY vec_a, vec_b""".stripMargin) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    val e = embWithNorm(s, dir)
    val a = e.select(col("vec_id").as("vec_a"), col("label"),
      col("embedding").as("emb_a"), col("n2").as("n2_a"))
    val b = e.select(col("vec_id").as("vec_b"), col("label"),
      col("embedding").as("emb_b"), col("n2").as("n2_b"))
    a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      // candidate prefilter on the codegen'd native expression (fast path);
      // the decimal-exact rescore below is what the oracle compares
      .filter(expr("cosine_f32(emb_a, emb_b)") >= 0.9)
      .withColumn("cos_sim",
        round(expr(dDot("emb_a", "emb_b")) / sqrt(col("n2_a") * col("n2_b")), 6))
      .filter(col("cos_sim") >= 0.95)
      .select(col("vec_a"), col("vec_b"), col("cos_sim"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Brute-force cosine top-5 for query vectors (vec_id < 10) over the whole
    * table. Spark: broadcast the queries, double-precision shortlist of 200
    * per query (margin ≫ double error vs the rounded-decimal rank key),
    * exact decimal rescore + deterministic rank. */
  val q39AnnTopK: Q = Q(
    "q39_ann_topk",
    s"""WITH $duckEl,
       |$duckN2,
       |d AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |             CAST(SUM(CAST(q.v * c.v AS DECIMAL(38,12))) AS DOUBLE) AS dot
       |      FROM el q JOIN el c ON q.i = c.i AND q.vec_id < 10 AND c.vec_id <> q.vec_id
       |      GROUP BY 1, 2),
       |r AS (SELECT query_id, neighbor_id,
       |             round(dot / sqrt(nq.n2 * nc.n2), 6) AS cos_sim,
       |             row_number() OVER (PARTITION BY query_id
       |               ORDER BY round(dot / sqrt(nq.n2 * nc.n2), 6) DESC, neighbor_id) AS rank
       |      FROM d JOIN n2 nq ON nq.vec_id = query_id JOIN n2 nc ON nc.vec_id = neighbor_id)
       |SELECT query_id, neighbor_id, cos_sim, rank
       |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = embWithNorm(s, dir)
    val q = e.filter(col("vec_id") < 10).select(
      col("vec_id").as("query_id"), col("embedding").as("emb_q"), col("n2").as("n2_q"))
    val c = e.select(
      col("vec_id").as("neighbor_id"), col("embedding").as("emb_c"), col("n2").as("n2_c"))
    val shortlist = Window.partitionBy(col("query_id"))
      .orderBy(col("dcos").desc, col("neighbor_id"))
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("dcos", expr(fDot("emb_q", "emb_c")) / sqrt(col("n2_q") * col("n2_c")))
      .withColumn("srn", row_number().over(shortlist))
      .filter(col("srn") <= 200) // double-precision shortlist; exact rescore below
      .withColumn("cos_sim",
        round(expr(dDot("emb_q", "emb_c")) / sqrt(col("n2_q") * col("n2_c")), 6))
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Sign-LSH bucketed ANN (the scale path): bucket = sign bits of the first
    * 8 dims (256 buckets); each query (vec_id < 50) scores only its own
    * bucket — candidate set ~N/256 instead of N. */
  val q40AnnLsh: Q = {
    def duckBucket(col: String) =
      (1 to 8).map(i => s"CASE WHEN $col[$i] > 0 THEN '1' ELSE '0' END").mkString(" || ")
    def sparkBucket(col: String) =
      (1 to 8).map(i => s"IF(element_at($col, $i) > 0, '1', '0')").mkString("concat(", ", ", ")")
    Q(
      "q40_ann_lsh",
      s"""WITH $duckEl,
         |$duckN2,
         |bkt AS (SELECT vec_id, ${duckBucket("embedding")} AS bkt FROM embeddings),
         |cand AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |         FROM bkt q JOIN bkt c
         |           ON q.bkt = c.bkt AND q.vec_id < 50 AND c.vec_id <> q.vec_id),
         |d AS (SELECT query_id, neighbor_id,
         |             CAST(SUM(CAST(a.v * b.v AS DECIMAL(38,12))) AS DOUBLE) AS dot
         |      FROM cand JOIN el a ON a.vec_id = query_id
         |                JOIN el b ON b.vec_id = neighbor_id AND b.i = a.i
         |      GROUP BY 1, 2),
         |r AS (SELECT query_id, neighbor_id,
         |             round(dot / sqrt(nq.n2 * nc.n2), 6) AS cos_sim,
         |             row_number() OVER (PARTITION BY query_id
         |               ORDER BY round(dot / sqrt(nq.n2 * nc.n2), 6) DESC, neighbor_id) AS rank
         |      FROM d JOIN n2 nq ON nq.vec_id = query_id JOIN n2 nc ON nc.vec_id = neighbor_id)
         |SELECT query_id, neighbor_id, cos_sim, rank
         |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = embWithNorm(s, dir).withColumn("bkt", expr(sparkBucket("embedding")))
      val q = e.filter(col("vec_id") < 50).select(
        col("vec_id").as("query_id"), col("bkt"),
        col("embedding").as("emb_q"), col("n2").as("n2_q"))
      val c = e.select(
        col("vec_id").as("neighbor_id"), col("bkt"),
        col("embedding").as("emb_c"), col("n2").as("n2_c"))
      val rankW = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("neighbor_id"))
      c.join(broadcast(q), Seq("bkt"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cos_sim",
          round(expr(dDot("emb_q", "emb_c")) / sqrt(col("n2_q") * col("n2_c")), 6))
        .withColumn("rank", row_number().over(rankW).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }
  }

  val all: Seq[Q] = Seq(q38EmbedNearDup, q39AnnTopK, q40AnnLsh)
}
