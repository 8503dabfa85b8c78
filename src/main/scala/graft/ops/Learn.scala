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

  /** Shared DuckDB CTE chain: order totals as cents with a binary target,
    * 1-row global stats, and the 32-bin equi-width histogram — the base
    * both split finding (q345) and isotonic calibration (q346) read.
    * Binning is the exact integer map (c−mn)·32 // (mx−mn+1) ∈ [0,31]. */
  private val duckPriceHist: String =
    """c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
      |             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      |      FROM orders),
      |st AS (SELECT min(c) AS mn, max(c) AS mx, CAST(count(*) AS HUGEINT) AS nn,
      |              CAST(sum(y) AS HUGEINT) AS xx FROM c),
      |h AS (SELECT (c.c - st.mn) * 32 // (st.mx - st.mn + 1) AS bin,
      |             CAST(count(*) AS HUGEINT) AS n, CAST(sum(c.y) AS HUGEINT) AS x
      |      FROM c, st GROUP BY 1)""".stripMargin

  /** Spark mirror of [[duckPriceHist]]: returns (hist(bin,n,x) with n,x
    * DECIMAL(38,0), stats 1-row frame (mn,mx,nn,xx)). The row stream
    * collapses map-side into ≤32 cells; stats broadcast. */
  private def priceHist(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val c = Tables(s, dir, "orders")
      .select(round(col("o_totalprice") * 100).cast("long").as("c"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
    val st = c.agg(min(col("c")).as("mn"), max(col("c")).as("mx"),
      count(lit(1)).cast(dec).as("nn"), sum(col("y").cast(dec)).as("xx"))
    val h = c.crossJoin(broadcast(st))
      .groupBy(expr("(c - mn) * 32 div (mx - mn + 1)").as("bin"))
      .agg(count(lit(1)).cast(dec).as("n"), sum(col("y").cast(dec)).as("x"))
    (h, st)
  }

  /** Spark mirror of the q345 spine+cumulative chain: the 0..31 bin spine
    * left-joined with the histogram, with running (nl, xl) — the frame
    * both split rounds search over. Returns (cum(bin,nl,xl), st). */
  private def histCum(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import org.apache.spark.sql.expressions.Window
    val (h, st) = priceHist(s, dir)
    val sp = s.range(0, 32).toDF("bin")
      .join(broadcast(h), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n"), lit(0).cast(dec)).as("n"),
        coalesce(col("x"), lit(0).cast(dec)).as("x"))
    val cumW = Window.orderBy(col("bin")).rowsBetween(Window.unboundedPreceding, 0)
    val cum = sp.select(col("bin"), col("n"), col("x"),
      sum(col("n")).over(cumW).as("nl"), sum(col("x")).over(cumW).as("xl"))
    (cum, st)
  }

  /** q345: histogram-based best-split search — the inner loop of every
    * gradient-boosted-tree trainer (XGBoost/LightGBM's "hist" mode): the
    * row stream collapses ONCE into a 32-bin equi-width histogram of the
    * feature (order total, cents) carrying per-bin positive counts of the
    * target (orderstatus F), and the split search is then a window over
    * the 32 cells — the map-side histogram + tiny reduce that makes tree
    * training feasible at 100 TB (the alternative, sorting rows per
    * feature, is a full shuffle per split). Split score is the binary
    * variance-reduction surrogate x_L²/n_L + x_R²/n_R (parent term
    * constant, shipped alongside); threshold_cents is the exact smallest
    * cents value routed right.
    *
    * Determinism: binning, thresholds and gains are integer rationals
    * (µ-floored per term, DECIMAL(38,0)/HUGEINT products); best split
    * tie-breaks on bin asc.
    *
    * Scale shape: one map-side-combined 32-group aggregate over the fact
    * scan; the spine, cumulative window, and argmax all run over ≤32
    * rows (PlanAuditSpec-admitted bounded windows). */
  val q345SplitGain: Q = Q(
    "q345_split_gain",
    s"""WITH $duckPriceHist,
       |sp AS (SELECT t.i AS bin, coalesce(h.n, 0) AS n, coalesce(h.x, 0) AS x
       |       FROM generate_series(0, 31) t(i) LEFT JOIN h ON h.bin = t.i),
       |cum AS (SELECT bin, sum(n) OVER w AS nl, sum(x) OVER w AS xl
       |        FROM sp WINDOW w AS (ORDER BY bin ROWS UNBOUNDED PRECEDING)),
       |cand AS (SELECT cum.bin,
       |                st.mn + ((cum.bin + 1) * (st.mx - st.mn + 1) + 31) // 32
       |                  AS threshold_cents,
       |                cum.nl, cum.xl, st.nn - cum.nl AS nr, st.xx - cum.xl AS xr,
       |                cum.xl * cum.xl * 1000000 // cum.nl
       |                  + (st.xx - cum.xl) * (st.xx - cum.xl) * 1000000
       |                    // (st.nn - cum.nl) AS gain_micro,
       |                st.xx * st.xx * 1000000 // st.nn AS parent_micro
       |         FROM cum, st
       |         WHERE cum.bin < 31 AND cum.nl > 0 AND st.nn - cum.nl > 0)
       |SELECT CAST(bin AS BIGINT) AS bin,
       |       CAST(threshold_cents AS BIGINT) AS threshold_cents,
       |       CAST(nl AS BIGINT) AS n_left, CAST(xl AS BIGINT) AS x_left,
       |       CAST(nr AS BIGINT) AS n_right, CAST(xr AS BIGINT) AS x_right,
       |       CAST(gain_micro AS BIGINT) AS gain_micro,
       |       CAST(parent_micro AS BIGINT) AS parent_micro,
       |       row_number() OVER (ORDER BY gain_micro DESC, bin) = 1 AS is_best
       |FROM cand ORDER BY bin""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val (cum, st) = histCum(s, dir)
    val cand = cum.select(col("bin"), col("nl"), col("xl"))
      .crossJoin(broadcast(st))
      .filter(col("bin") < 31 && col("nl") > 0 && (col("nn") - col("nl")) > 0)
      .select(col("bin"),
        expr("CAST(mn + ((bin + 1) * (mx - mn + 1) + 31) div 32 AS LONG)")
          .as("threshold_cents"),
        col("nl").cast("long").as("n_left"), col("xl").cast("long").as("x_left"),
        (col("nn") - col("nl")).cast("long").as("n_right"),
        (col("xx") - col("xl")).cast("long").as("x_right"),
        expr("""CAST(xl * xl * 1000000 div nl
               |     + (xx - xl) * (xx - xl) * 1000000 div (nn - nl)
               |  AS LONG)""".stripMargin).as("gain_micro"),
        expr("CAST(xx * xx * 1000000 div nn AS LONG)").as("parent_micro"))
    cand
      .withColumn("is_best",
        row_number().over(Window.orderBy(col("gain_micro").desc, col("bin"))) === 1)
      .orderBy(col("bin"))
  }

  /** q346: isotonic (PAV) calibration of the histogram's target-rate
    * curve — the monotone fit that turns q345's raw per-bin rates into a
    * calibrated score→probability map (Zadrozny–Elkan isotonic
    * calibration; also the standard monotone-constraint repair for any
    * binned rate curve). Pool-adjacent-violators is inherently
    * sequential, but over a BOUNDED bin table it has the closed minimax
    * form ŷ_i = max_{j≤i} min_{k≥i} rate(j..k) — expressible as two
    * grouped reductions over bin-index triples, all O(bins³) ≤ 32³ rows
    * regardless of data scale.
    *
    * Determinism: pooled rates are ppm floors of integer cumulative-sum
    * rationals BEFORE the minimax (documented µ-unit contract: a floor
    * shifts a pooled rate by <1 ppm; the minimax over the floored
    * integers is then exact and identical in both engines).
    *
    * Scale shape: everything below the 32-cell histogram is bin-grain;
    * the candidate-range join is a broadcast over ≤528 pairs. The output
    * ships the raw rate, the isotonic rate, and the count of adjacent
    * inversions the fit repaired. */
  val q346IsotonicCalibration: Q = Q(
    "q346_isotonic_calibration",
    s"""WITH $duckPriceHist,
       |ord AS (SELECT bin, n, x,
       |               row_number() OVER (ORDER BY bin) AS idx,
       |               sum(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cn,
       |               sum(x) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cx
       |        FROM h),
       |p AS (SELECT j.idx AS j, k.idx AS k,
       |             (k.cx - j.cx + j.x) * 1000000 // (k.cn - j.cn + j.n)
       |               AS rate_ppm
       |      FROM ord j JOIN ord k ON k.idx >= j.idx),
       |m AS (SELECT i.idx AS i, p.j, min(p.rate_ppm) AS mn_rate
       |      FROM ord i JOIN p ON p.j <= i.idx AND p.k >= i.idx
       |      GROUP BY 1, 2),
       |fit AS (SELECT i, max(mn_rate) AS iso_ppm FROM m GROUP BY 1)
       |SELECT CAST(o.bin AS BIGINT) AS bin, CAST(o.n AS BIGINT) AS n,
       |       CAST(o.x AS BIGINT) AS x,
       |       CAST(o.x * 1000000 // o.n AS BIGINT) AS raw_ppm,
       |       CAST(f.iso_ppm AS BIGINT) AS iso_ppm,
       |       CAST(o.x * 1000000 // o.n AS BIGINT) <> CAST(f.iso_ppm AS BIGINT)
       |         AS pooled,
       |       (SELECT count(*) FROM ord a JOIN ord b ON b.idx = a.idx + 1
       |        WHERE b.x * a.n * 1000000 < a.x * b.n * 1000000)
       |         AS inversions_repaired
       |FROM ord o JOIN fit f ON f.i = o.idx
       |ORDER BY bin""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    // Persist the HISTOGRAM, not the windowed frame: caches live BELOW
    // windows (q327's recorded gotcha — an InMemoryRelation above the
    // window hides it from PlanAuditSpec's bounded-window audit). The
    // windows themselves are ≤32-row recomputes.
    val h = priceHist(s, dir)._1.persist(StorageLevel.MEMORY_AND_DISK)
    val cumW = Window.orderBy(col("bin")).rowsBetween(Window.unboundedPreceding, 0)
    val ord = h
      .select(col("bin"), col("n"), col("x"),
        row_number().over(Window.orderBy(col("bin"))).as("idx"),
        sum(col("n")).over(cumW).as("cn"), sum(col("x")).over(cumW).as("cx"))
    val pj = ord.select(col("idx").as("j"), col("n").as("nj"), col("x").as("xj"),
      col("cn").as("cnj"), col("cx").as("cxj"))
    val pk = ord.select(col("idx").as("k"), col("cn").as("cnk"), col("cx").as("cxk"))
    val p = pj.join(broadcast(pk), col("k") >= col("j"))
      .select(col("j"), col("k"),
        expr("CAST((cxk - cxj + xj) * 1000000 div (cnk - cnj + nj) AS LONG)")
          .as("rate_ppm"))
    val m = ord.select(col("idx").as("i"))
      .join(broadcast(p), col("j") <= col("i") && col("k") >= col("i"))
      .groupBy(col("i"), col("j")).agg(min(col("rate_ppm")).as("mn_rate"))
    val fit = m.groupBy(col("i")).agg(max(col("mn_rate")).as("iso_ppm"))
    val inv = ord.as("a")
      .join(ord.as("b"), col("b.idx") === col("a.idx") + 1)
      .agg(count(when(
        col("b.x") * col("a.n") * 1000000 < col("a.x") * col("b.n") * 1000000,
        1)).as("inversions_repaired"))
    ord.join(broadcast(fit), col("i") === col("idx"))
      .crossJoin(broadcast(inv))
      .select(col("bin").cast("long").as("bin"), col("n").cast("long").as("n"),
        col("x").cast("long").as("x"),
        expr("CAST(x * 1000000 div n AS LONG)").as("raw_ppm"),
        col("iso_ppm"),
        (expr("CAST(x * 1000000 div n AS LONG)") =!= col("iso_ppm")).as("pooled"),
        col("inversions_repaired"))
      .orderBy(col("bin"))
  }

  /** q353: the SECOND boosting round — gradient boosting actually
    * iterating: round 1 is q345's best split with mean-leaf values; this
    * round searches the SAME 32-bin histogram for the best split of the
    * round-1 RESIDUALS (squared loss ⇒ residual = y − leaf mean). The
    * punchline ships as data: residuals sum to zero within each round-1
    * leaf, so the round-1 split's own round-2 gain is EXACTLY 0 (and the
    * total residual sum is 0, collapsing the right-side term to the same
    * sl²) — the reason boosting must pick a different split each round,
    * visible in the output.
    *
    * Exactness: residuals are carried in D = n_L·n_R units (leaf means
    * x_L/n_L, x_R/n_R become the integers x_L·n_R, x_R·n_L), so the
    * entire round — per-bin residual sums, cumulative sums, gains — is
    * integer arithmetic derived from the ROUND-1 HISTOGRAM ALONE (no
    * second data scan: S̃_b = x_b·D − n_b·m̃_leaf(b)). Gains are µ-floored
    * per term. DECIMAL(38,0) bound: S̃²·10⁶ ≈ (N·D)²·10⁶ ≈ 10³⁶ at
    * sf0.1 — inside width here; a warehouse-scale deployment rescales
    * residual units per leaf before squaring (documented ceiling).
    *
    * Scale shape: identical to q345 — ONE fact scan builds the
    * histogram; both rounds are windows over the 32-cell spine. */
  val q353BoostRound: Q = Q(
    "q353_boost_round",
    s"""WITH $duckPriceHist,
       |sp AS (SELECT t.i AS bin, coalesce(h.n, 0) AS n, coalesce(h.x, 0) AS x
       |       FROM generate_series(0, 31) t(i) LEFT JOIN h ON h.bin = t.i),
       |cum AS (SELECT bin, n, x, sum(n) OVER w AS nl, sum(x) OVER w AS xl
       |        FROM sp WINDOW w AS (ORDER BY bin ROWS UNBOUNDED PRECEDING)),
       |c1 AS (SELECT cum.bin, cum.nl, cum.xl,
       |              st.nn - cum.nl AS nr, st.xx - cum.xl AS xr,
       |              cum.xl * cum.xl * 1000000 // cum.nl
       |                + (st.xx - cum.xl) * (st.xx - cum.xl) * 1000000
       |                  // (st.nn - cum.nl) AS gain
       |       FROM cum, st
       |       WHERE cum.bin < 31 AND cum.nl > 0 AND st.nn - cum.nl > 0),
       |b1 AS (SELECT bin AS bin1, nl AS nl1, xl AS xl1, nr AS nr1, xr AS xr1,
       |              nl * nr AS d
       |       FROM c1 ORDER BY gain DESC, bin LIMIT 1),
       |res AS (SELECT cum.bin,
       |               cum.x * b1.d - cum.n *
       |                 (CASE WHEN cum.bin <= b1.bin1
       |                       THEN b1.xl1 * b1.nr1 ELSE b1.xr1 * b1.nl1 END)
       |                 AS sres
       |        FROM cum, b1),
       |cum2 AS (SELECT res.bin, sum(res.sres) OVER w AS sl
       |         FROM res WINDOW w AS (ORDER BY bin ROWS UNBOUNDED PRECEDING)),
       |c2 AS (SELECT cum2.bin,
       |              st.mn + ((cum2.bin + 1) * (st.mx - st.mn + 1) + 31) // 32
       |                AS threshold_cents,
       |              cum.nl, cum2.sl, b1.bin1, b1.d,
       |              cum2.sl * cum2.sl * 1000000 // (cum.nl * b1.d * b1.d)
       |                + cum2.sl * cum2.sl * 1000000
       |                  // ((st.nn - cum.nl) * b1.d * b1.d) AS gain2_micro
       |       FROM cum2 JOIN cum USING (bin), st, b1
       |       WHERE cum2.bin < 31 AND cum.nl > 0 AND st.nn - cum.nl > 0)
       |SELECT CAST(bin AS BIGINT) AS bin,
       |       CAST(threshold_cents AS BIGINT) AS threshold_cents,
       |       CAST(nl AS BIGINT) AS n_left,
       |       CAST(sl * 1000 // d AS BIGINT) AS sum_resid_milli,
       |       CAST(gain2_micro AS BIGINT) AS gain2_micro,
       |       CAST(bin1 AS BIGINT) AS round1_bin,
       |       row_number() OVER (ORDER BY gain2_micro DESC, bin) = 1 AS is_best
       |FROM c2 ORDER BY bin""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val (cum, st) = histCum(s, dir)
    val c1 = cum.crossJoin(broadcast(st))
      .filter(col("bin") < 31 && col("nl") > 0 && (col("nn") - col("nl")) > 0)
      .select(col("bin"), col("nl"), col("xl"),
        (col("nn") - col("nl")).as("nr"), (col("xx") - col("xl")).as("xr"),
        expr("""xl * xl * 1000000 div nl
               |  + (xx - xl) * (xx - xl) * 1000000 div (nn - nl)"""
          .stripMargin).as("gain"))
    val b1 = c1.orderBy(col("gain").desc, col("bin")).limit(1)
      .select(col("bin").as("bin1"), col("nl").as("nl1"), col("xl").as("xl1"),
        col("nr").as("nr1"), col("xr").as("xr1"),
        (col("nl") * col("nr")).as("d"))
    val res = cum.crossJoin(broadcast(b1))
      .select(col("bin"), col("nl"),
        (col("x") * col("d") - col("n") *
          when(col("bin") <= col("bin1"), col("xl1") * col("nr1"))
            .otherwise(col("xr1") * col("nl1"))).as("sres"),
        col("bin1"), col("d"))
    val cumW = Window.orderBy(col("bin")).rowsBetween(Window.unboundedPreceding, 0)
    res.withColumn("sl", sum(col("sres")).over(cumW))
      .crossJoin(broadcast(st))
      .filter(col("bin") < 31 && col("nl") > 0 && (col("nn") - col("nl")) > 0)
      .select(col("bin"),
        expr("CAST(mn + ((bin + 1) * (mx - mn + 1) + 31) div 32 AS LONG)")
          .as("threshold_cents"),
        col("nl").cast("long").as("n_left"),
        expr("CAST(sl * 1000 div d AS LONG)").as("sum_resid_milli"),
        expr("""CAST(sl * sl * 1000000 div (nl * d * d)
               |  + sl * sl * 1000000 div ((nn - nl) * d * d) AS LONG)"""
          .stripMargin).as("gain2_micro"),
        col("bin1").cast("long").as("round1_bin"))
      .withColumn("is_best",
        row_number().over(Window.orderBy(col("gain2_micro").desc, col("bin"))) === 1)
      .orderBy(col("bin"))
  }

  /** q359: cumulative gains / lift chart of the q336 encoder — the
    * standard "is this score worth anything" evaluation: rank the
    * population by the OOF-encoded score (descending), and at every
    * score level report the cumulative share of population taken vs the
    * cumulative share of positives captured, plus their ratio (lift).
    * A useless score tracks the diagonal (lift 10⁶); a useful one
    * captures positives early. Together with q346 (calibration) and
    * q348 (information), this completes the scoring-model audit tier.
    *
    * Determinism: the score is q336's exact oof_ppm integer; the chart
    * is integer cumulative sums over SCORE LEVELS with lift one cross-
    * multiplied rational (cum_x·N·10⁶ / (X·cum_n)) — no row-grain math
    * anywhere.
    *
    * Scale shape: the population never materializes at row grain — the
    * (nation, fold) cells CARRY their member counts, so the level table
    * is ≤125 rows and the cumulative window is bounded by cell count
    * (PlanAuditSpec-admitted). */
  val q359GainsChart: Q = Q(
    "q359_gains_chart",
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
       |g AS (SELECT sum(n) AS ng, sum(x) AS xg FROM cells),
       |enc AS (SELECT c.nation, c.fold, c.n, c.x,
       |               ((t.xt - c.x) * g.ng + 20 * g.xg) * 1000000
       |                 // ((t.nt - c.n + 20) * g.ng) AS score_ppm
       |        FROM cells c JOIN tot t USING (nation), g),
       |lvl AS (SELECT score_ppm, sum(n) AS n, sum(x) AS x
       |        FROM enc GROUP BY 1),
       |cum AS (SELECT score_ppm, n, x,
       |               sum(n) OVER w AS cn, sum(x) OVER w AS cx
       |        FROM lvl WINDOW w AS (ORDER BY score_ppm DESC
       |                              ROWS UNBOUNDED PRECEDING))
       |SELECT CAST(cum.score_ppm AS BIGINT) AS score_ppm,
       |       CAST(cum.n AS BIGINT) AS n, CAST(cum.x AS BIGINT) AS x,
       |       CAST(cum.cn * 1000000 // g.ng AS BIGINT) AS cum_share_ppm,
       |       CAST(cum.cx * 1000000 // g.xg AS BIGINT) AS capture_ppm,
       |       CAST(cum.cx * g.ng * 1000000 // (g.xg * cum.cn) AS BIGINT)
       |         AS lift_ppm
       |FROM cum, g ORDER BY score_ppm DESC""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
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
    val lvl = cells.join(broadcast(tot), "nation").crossJoin(broadcast(g))
      .select(
        expr("""CAST(((xt - x) * ng + 20 * xg) * 1000000
               |     div ((nt - n + 20) * ng) AS LONG)""".stripMargin)
          .as("score_ppm"),
        col("n"), col("x"))
      .groupBy(col("score_ppm"))
      .agg(sum(col("n")).as("n"), sum(col("x")).as("x"))
    val cumW = Window.orderBy(col("score_ppm").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    lvl.withColumn("cn", sum(col("n")).over(cumW))
      .withColumn("cx", sum(col("x")).over(cumW))
      .crossJoin(broadcast(g))
      .select(col("score_ppm"),
        col("n").cast("long").as("n"), col("x").cast("long").as("x"),
        expr("CAST(cn * 1000000 div ng AS LONG)").as("cum_share_ppm"),
        expr("CAST(cx * 1000000 div xg AS LONG)").as("capture_ppm"),
        expr("CAST(cx * ng * 1000000 div (xg * cn) AS LONG)").as("lift_ppm"))
      .orderBy(col("score_ppm").desc)
  }

  /** q373: categorical feature-importance screen — q345 finds the best
    * split WITHIN one numeric feature; this ranks features AGAINST each
    * other by the gain a one-level categorical split would realize,
    * the screen a tabular pipeline runs before building anything. For a
    * binary target, the variance-reduction gain of splitting by feature
    * F is Σ_levels x_l²/n_l − X²/N (the same x²/n sufficient statistic
    * as q345's bins, summed over F's level cells). Four features over the
    * order stream — customer nation (fact-dim join), order day-of-week
    * (pure integer epoch//86400 % 7 — no calendar function drift),
    * order month, and priority class — share one target (order status
    * 'F', the fulfilled flag). Importance = each feature's share of the
    * summed gains, in ppm.
    *
    * Determinism: per-level terms are µ-floored integer rationals
    * (x²·10⁶//n, the q345 contract) so the cross-feature sums are exact
    * integers in both engines.
    *
    * Scale shape: one fact-dim join; each feature's cells are a map-side
    * collapse of the same persisted base (levels ≤ 25/7/12/5); the
    * importance table is ≤ 4 rows at any scale. */
  val q373FeatureImportance: Q = Q(
    "q373_feature_importance",
    """WITH base AS (
      |  SELECT CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
      |         CAST(c.c_nationkey AS VARCHAR) AS f_nation,
      |         CAST(CAST(floor(epoch(o.o_orderdate)) AS BIGINT) // 86400 % 7
      |           AS VARCHAR) AS f_dow,
      |         CAST(month(o.o_orderdate) AS VARCHAR) AS f_month,
      |         o.o_orderpriority AS f_priority
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
      |long AS (SELECT 'nation' AS feature, f_nation AS level, y FROM base
      |         UNION ALL SELECT 'dow', f_dow, y FROM base
      |         UNION ALL SELECT 'month', f_month, y FROM base
      |         UNION ALL SELECT 'priority', f_priority, y FROM base),
      |cell AS (SELECT feature, level, CAST(count(*) AS BIGINT) AS n,
      |                CAST(sum(y) AS BIGINT) AS x
      |         FROM long GROUP BY 1, 2),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn,
      |               CAST(sum(y) AS BIGINT) AS xx FROM base),
      |g AS (SELECT cell.feature,
      |             CAST(count(*) AS BIGINT) AS n_levels,
      |             CAST(sum(cell.x * cell.x * 1000000 // cell.n)
      |                  - (SELECT xx * xx * 1000000 // nn FROM tot)
      |               AS BIGINT) AS gain_micro
      |      FROM cell GROUP BY 1),
      |sg AS (SELECT CAST(sum(gain_micro) AS BIGINT) AS total FROM g)
      |SELECT g.feature, g.n_levels, g.gain_micro,
      |       CAST(g.gain_micro * 1000000 // nullif(sg.total, 0) AS BIGINT)
      |         AS importance_ppm
      |FROM g, sg ORDER BY g.gain_micro DESC, g.feature""".stripMargin) { (s, dir) =>
    val base = Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
      .select(when(col("o_orderstatus") === "F", 1).otherwise(0).as("y"),
        col("c_nationkey").cast("string").as("f_nation"),
        expr("CAST(unix_timestamp(o_orderdate) div 86400 % 7 AS STRING)")
          .as("f_dow"),
        month(col("o_orderdate")).cast("string").as("f_month"),
        col("o_orderpriority").as("f_priority"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def leg(name: String, c: String) =
      base.select(lit(name).as("feature"), col(c).as("level"), col("y"))
    val long = leg("nation", "f_nation")
      .unionAll(leg("dow", "f_dow"))
      .unionAll(leg("month", "f_month"))
      .unionAll(leg("priority", "f_priority"))
    val cell = long.groupBy(col("feature"), col("level"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("x"))
    val tot = base.agg(count(lit(1)).as("nn"), sum(col("y")).as("xx"))
      .select(expr("xx * xx * 1000000 div nn").as("parent_micro"))
    val g = cell.groupBy(col("feature"))
      .agg(count(lit(1)).as("n_levels"),
        sum(expr("x * x * 1000000 div n")).as("lg"))
      .crossJoin(broadcast(tot))
      .select(col("feature"), col("n_levels"),
        (col("lg") - col("parent_micro")).as("gain_micro"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sg = g.agg(sum(col("gain_micro")).as("total"))
    g.crossJoin(broadcast(sg))
      .select(col("feature"), col("n_levels"), col("gain_micro"),
        expr("CAST(gain_micro * 1000000 div nullif(total, 0) AS LONG)")
          .as("importance_ppm"))
      .orderBy(col("gain_micro").desc, col("feature"))
  }

  /** q377: learning curve for the target encoder — "would more data
    * help?" answered from inside the engine: train q336's smoothed
    * nation-rate encoder on NESTED 25/50/100% fractions of a fixed 80%
    * train pool (one portable hash bucket drives everything: bucket ≥ 80
    * is the frozen holdout; buckets < 20/40/80 are the nested fractions,
    * so each larger fraction strictly CONTAINS the smaller — the
    * textbook learning-curve design) and score each on the SAME holdout
    * by mean squared error against the 0/10⁶ outcome. A flattening SSE
    * says the encoder is data-saturated; a falling one says collect
    * more.
    *
    * Determinism: the split is the q187/q336 md5-bucket device; rates
    * are the q336 EB-smoothed integer rationals (K=20); SSE terms are
    * exact integer squares (≤10¹² each) summed as BIGINT.
    *
    * Scale shape: one fact-dim join builds the base once; each fraction
    * is a filter + (nation)-cell collapse of it; holdout scoring is a
    * broadcast of ≤|nations| rates against the holdout rows. */
  val q377LearningCurve: Q = {
    val legs = Seq((20, 25L), (40, 50L), (80, 100L))
    def duckLeg(t: Int, pct: Long): String =
      s"""SELECT CAST($pct AS BIGINT) AS frac_pct,
         |       (SELECT CAST(sum(n) AS BIGINT) FROM cells$t) AS n_train,
         |       CAST(count(*) AS BIGINT) AS n_holdout,
         |       CAST(max(g.xg * 1000000 // g.ng) AS BIGINT)
         |         AS global_rate_ppm,
         |       CAST(sum((h.y * 1000000
         |                 - coalesce(r.rate_ppm,
         |                            CAST(g.xg * 1000000 // g.ng AS BIGINT)))
         |                * (h.y * 1000000
         |                   - coalesce(r.rate_ppm,
         |                              CAST(g.xg * 1000000 // g.ng AS BIGINT))))
         |            // count(*)
         |         AS BIGINT) AS sse_mean_ppm2
         |FROM hold h LEFT JOIN rate$t r ON r.nation = h.nation
         |     CROSS JOIN g$t g""".stripMargin
    def duckRate(t: Int): String =
      s"""cells$t AS (SELECT nation, CAST(count(*) AS HUGEINT) AS n,
         |                   CAST(sum(y) AS HUGEINT) AS x
         |            FROM base WHERE b < $t GROUP BY 1),
         |g$t AS (SELECT sum(n) AS ng, sum(x) AS xg FROM cells$t),
         |rate$t AS (SELECT c.nation,
         |                  CAST((c.x * g.ng + 20 * g.xg) * 1000000
         |                       // ((c.n + 20) * g.ng) AS BIGINT) AS rate_ppm
         |           FROM cells$t c, g$t g)""".stripMargin
    Q(
      "q377_learning_curve",
      s"""WITH j AS (
         |  SELECT c.c_nationkey AS nation,
         |         md5(concat(CAST(o.o_orderkey AS VARCHAR), '-graft-lc')) AS m,
         |         CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
         |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
         |base AS (SELECT nation, y,
         |                (${PortableHash.hexHeadToLong("m", "strpos")}) % 100
         |                  AS b
         |         FROM j),
         |hold AS (SELECT nation, y FROM base WHERE b >= 80),
         |${legs.map { case (t, _) => duckRate(t) }.mkString(",\n")}
         |${legs.map { case (t, p) => duckLeg(t, p) }.mkString("\nUNION ALL ")}
         |ORDER BY frac_pct""".stripMargin) { (s, dir) =>
      val base = Tables(s, dir, "orders")
        .join(Tables(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .withColumn("m",
          md5(concat(col("o_orderkey").cast("string"), lit("-graft-lc"))))
        .select(col("c_nationkey").as("nation"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"),
          (expr(PortableHash.hexHeadToLong("m", "instr")) % 100).as("b"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val hold = base.filter(col("b") >= 80).select(col("nation"), col("y"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      legs.map { case (t, pct) =>
        val cells = base.filter(col("b") < t)
          .groupBy(col("nation"))
          .agg(count(lit(1)).cast(dec).as("n"), sum(col("y")).cast(dec).as("x"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val g = cells.agg(sum(col("n")).as("ng"), sum(col("x")).as("xg"))
        val rate = cells.crossJoin(broadcast(g))
          .select(col("nation"),
            expr("""CAST((x * ng + 20 * xg) * 1000000
                   |     div ((n + 20) * ng) AS LONG)""".stripMargin)
              .as("rate_ppm"))
        val nTrain = cells.agg(sum(col("n")).cast("long").as("n_train"))
        // LEFT join + global-rate fallback: a nation the fraction never
        // sampled must still score every holdout row (mirrored oracle).
        hold.join(broadcast(rate), Seq("nation"), "left")
          .crossJoin(broadcast(g))
          .withColumn("rr", coalesce(col("rate_ppm"),
            expr("CAST(xg * 1000000 div ng AS LONG)")))
          .agg(count(lit(1)).as("n_holdout"),
            expr("""CAST(sum((y * 1000000 - rr) * (y * 1000000 - rr))
                   |     div count(*) AS LONG)""".stripMargin)
              .as("sse_mean_ppm2"),
            expr("CAST(max(xg * 1000000 div ng) AS LONG)")
              .as("global_rate_ppm"))
          .crossJoin(broadcast(nTrain))
          .select(lit(pct).as("frac_pct"), col("n_train"), col("n_holdout"),
            col("global_rate_ppm"), col("sse_mean_ppm2"))
      }.reduce(_ unionAll _).orderBy(col("frac_pct"))
    }
  }

  val all: Seq[Q] = Seq(q336OofTargetEncode, q337AlsStep, q345SplitGain,
    q346IsotonicCalibration, q353BoostRound, q359GainsChart,
    q373FeatureImportance, q377LearningCurve)
}
