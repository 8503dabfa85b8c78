package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed-ML building blocks — the feature-engineering / model-step
  * kernels a training pipeline runs INSIDE the data engine, where the data
  * already lives: leakage-free target encoding, one ALS alternation,
  * histogram split finding, isotonic calibration. Each is expressed as
  * keyed aggregates over the fact tables (the row stream is touched once
  * or twice, everything downstream is cell-grain), so the shapes survive
  * 100 TB: the "model" sides are bounded by key cardinality (nations,
  * event types, histogram bins), never by row count, and broadcast back.
  *
  * Determinism discipline: all statistics are integer/decimal rationals
  * surfaced as ppm/µ-unit integers (the q305/q320 contract) — no
  * engine-specific float accumulation anywhere.
  */
object Learn {

  private val dec = "decimal(38,0)"

  /** q336: out-of-fold (OOF) target encoding with empirical-Bayes
    * smoothing — the leakage-FREE construction of the highest-value
    * categorical feature in tabular ML. Naive target encoding (category →
    * mean target) leaks each row's own label into its feature; the OOF
    * fix encodes fold f's rows from the OTHER folds' counts only, with a
    * K-strength prior toward the global rate for thin cells (K=20, q320's
    * shrinkage with q187's fold hygiene). Encoded value for (nation,
    * fold): ((x_tot−x_f)·n_g + K·x_g) / ((n_tot−n_f+K)·n_g) as one
    * integer rational, surfaced in ppm. The in-fold raw rate rides along
    * so the leakage gap is READable from the output.
    *
    * Determinism: fold = portable md5 bucket of the order key (q187's
    * device); the encoding is one integer division of DECIMAL(38,0)/
    * HUGEINT products (x·n_g·10⁶ passes BIGINT at warehouse scale).
    *
    * Scale shape: one fact-dim join, then the row stream collapses
    * map-side to (nation, fold) cells — 125 rows at ANY scale; nation
    * totals and the global prior are cell-grain rollups broadcast back.
    * Nothing after the first aggregate sees row count. */
  val q336OofTargetEncode: Q = Q(
    "q336_oof_target_encode",
    s"""WITH j AS (
       |  SELECT c.c_nationkey AS nation,
       |         md5(concat(CAST(o.o_orderkey AS VARCHAR), '-graft-te')) AS m,
       |         CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
       |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
       |f AS (SELECT nation, (${PortableHash.hexHeadToLong("m", "strpos")}) % 5 AS fold, y
       |      FROM j),
       |cells AS (SELECT nation, fold, CAST(count(*) AS HUGEINT) AS n,
       |                 CAST(sum(y) AS HUGEINT) AS x
       |          FROM f GROUP BY 1, 2),
       |tot AS (SELECT nation, sum(n) AS nt, sum(x) AS xt FROM cells GROUP BY 1),
       |g AS (SELECT sum(n) AS ng, sum(x) AS xg FROM cells)
       |SELECT CAST(c.nation AS BIGINT) AS nation, CAST(c.fold AS BIGINT) AS fold,
       |       CAST(c.n AS BIGINT) AS n_fold,
       |       CAST(t.nt - c.n AS BIGINT) AS n_oof,
       |       CAST(c.x * 1000000 // c.n AS BIGINT) AS infold_ppm,
       |       CAST(((t.xt - c.x) * g.ng + 20 * g.xg) * 1000000
       |            // ((t.nt - c.n + 20) * g.ng) AS BIGINT) AS oof_ppm
       |FROM cells c JOIN tot t USING (nation), g
       |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val oc = Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
      .withColumn("m",
        md5(concat(col("o_orderkey").cast("string"), lit("-graft-te"))))
      .select(col("c_nationkey").as("nation"),
        (expr(PortableHash.hexHeadToLong("m", "instr")) % 5).as("fold"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
    val cells = oc.groupBy(col("nation"), col("fold"))
      .agg(count(lit(1)).cast(dec).as("n"), sum(col("y").cast(dec)).as("x"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tot = cells.groupBy(col("nation"))
      .agg(sum(col("n")).as("nt"), sum(col("x")).as("xt"))
    val g = cells.agg(sum(col("n")).as("ng"), sum(col("x")).as("xg"))
    cells.join(broadcast(tot), "nation").crossJoin(broadcast(g))
      .select(col("nation").cast("long").as("nation"),
        col("fold").cast("long").as("fold"),
        col("n").cast("long").as("n_fold"),
        (col("nt") - col("n")).cast("long").as("n_oof"),
        expr("CAST(x * 1000000 div n AS LONG)").as("infold_ppm"),
        expr("""CAST(((xt - x) * ng + 20 * xg) * 1000000
               |     div ((nt - n + 20) * ng) AS LONG)""".stripMargin)
          .as("oof_ppm"))
      .orderBy(col("nation"), col("fold"))
  }

  /** q337: one rank-1 ALS alternation over the (user × event_type)
    * engagement matrix — the distributed matrix-factorization step
    * (Koren et al.'s alternating least squares, the canonical Spark-era
    * recommender kernel). Ratings r(i,j) = Σ cents of `value`; item
    * factors initialize to v=1, the u-solve is then exactly the per-user
    * row mean (u_i = Σ_j r_ij / n_i), and the v-solve is the per-item
    * least squares v_j = Σ_i r_ij·u_i / Σ_i u_i². Output is the item
    * factor in ppm PLUS the per-item SSE before (v=1) and after the
    * alternation — the defining ALS property (each solve is exact least
    * squares, so SSE cannot rise) shipped as data. `improved` may
    * honestly read false for an item only through the documented µ-unit
    * flooring of u and v (exact solves cannot raise SSE; floors can by
    * O(10⁻⁶·r)).
    *
    * Determinism: u is an integer floor of a cents rational; v_ppm is one
    * DECIMAL(38,0)/HUGEINT rational; SSE terms are exact integer squares.
    *
    * Scale shape: exactly the ALS shuffle pattern — ratings aggregate
    * once (map-side combine), the u-solve is a user-keyed rollup riding
    * the same partitioning, the v-solve re-keys by item, and the tiny
    * item-factor table (|event_type| rows) broadcasts into the SSE audit.
    * At rank k the two solves become k×k normal equations per key; the
    * shuffles are identical. BIGINT output ceiling: SSE is cents², ~10¹⁶
    * per item-cell here; re-scale to µ-units per row before the final
    * cast if a deployment's cells exceed 2⁶³ cents². */
  val q337AlsStep: Q = Q(
    "q337_als_step",
    """WITH r AS (SELECT user_id, event_type,
      |                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS r
      |           FROM events GROUP BY 1, 2),
      |u AS (SELECT user_id, sum(r) // count(*) AS u FROM r GROUP BY 1),
      |v AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
      |             sum(r.r * u.u) * 1000000 // sum(u.u * u.u) AS v_ppm
      |      FROM r JOIN u USING (user_id) GROUP BY 1),
      |e AS (SELECT r.event_type,
      |             sum((r.r - u.u) * (r.r - u.u)) AS sse0,
      |             sum((r.r - (u.u * v.v_ppm) // 1000000)
      |                 * (r.r - (u.u * v.v_ppm) // 1000000)) AS sse1
      |      FROM r JOIN u USING (user_id) JOIN v USING (event_type)
      |      GROUP BY 1)
      |SELECT v.event_type, v.n_users, CAST(v.v_ppm AS BIGINT) AS v_ppm,
      |       CAST(e.sse0 AS BIGINT) AS sse0, CAST(e.sse1 AS BIGINT) AS sse1,
      |       e.sse1 <= e.sse0 AS improved
      |FROM v JOIN e USING (event_type) ORDER BY 1""".stripMargin) { (s, dir) =>
    val r = Tables(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("rc"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("rc").cast(dec)).as("r"))
    val u = r.groupBy(col("user_id"))
      .agg(expr("CAST(sum(r) div count(1) AS decimal(38,0))").as("u"))
    // The u-join rides the ratings' user partitioning; persist it — the
    // v-solve and the SSE audit both read it.
    val ru = r.join(u, "user_id").persist(StorageLevel.MEMORY_AND_DISK)
    val v = ru.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        expr("CAST(sum(r * u) * 1000000 div sum(u * u) AS decimal(38,0))")
          .as("v_ppm"))
    ru.join(broadcast(v), "event_type")
      .withColumn("pred", expr("CAST(u * v_ppm div 1000000 AS decimal(38,0))"))
      .groupBy(col("event_type"))
      .agg(first(col("n_users")).as("n_users"),
        first(col("v_ppm")).cast("long").as("v_ppm"),
        sum((col("r") - col("u")) * (col("r") - col("u"))).cast("long")
          .as("sse0"),
        sum((col("r") - col("pred")) * (col("r") - col("pred"))).cast("long")
          .as("sse1"))
      .withColumn("improved", col("sse1") <= col("sse0"))
      .orderBy(col("event_type"))
  }

  val all: Seq[Q] = Seq(q336OofTargetEncode, q337AlsStep)
}
