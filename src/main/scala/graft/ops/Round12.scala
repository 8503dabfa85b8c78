package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

import graft.{Q, Tables}

/** Round-12 additions: a cross-engine-IDENTICAL distinct sketch (the
  * register contents gate, not just an accuracy audit), three graph
  * kernels the co-purchase tier lacked (hop-capped harmonic centrality,
  * double-sweep diameter, per-edge triangle support), and weighted
  * reservoir sampling (A-ES) for weight-proportional training-data
  * selection.
  */
object Round12 {

  /** The support-2 co-purchase edge CTEs every graph oracle shares
    * (q106/q382/q383's rendering verbatim). */
  private val duckEdges: String =
    """lp AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e0 AS (
      |  SELECT l1.l_partkey AS u, l2.l_partkey AS v
      |  FROM lp l1 JOIN lp l2
      |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin

  /** Pure-integer MSB position: bit length of a 16-bit value (0 for 0),
    * as a 16-branch CASE cascade whose text runs identically in both
    * engines. Replaces `floor(log2(n16))` in the HLL rank — empirically
    * the float was green at all three SFs, but libm vs JVM log
    * implementations may differ by 1 ulp at power-of-two arguments, and
    * a bit-identical register gate should carry no float dependency at
    * all (HLL rank = 17 − bitlen). */
  private def bitlen16(e: String): String =
    (16 to 1 by -1).map(i => s"WHEN ($e) >= ${1L << (i - 1)} THEN $i")
      .mkString("(CASE ", " ", " ELSE 0 END)")

  /** q385: HyperLogLog REGISTERS, bit-identical across engines — where
    * q252 audits Spark's native `hll_sketch_agg` against the exact
    * distinct count, this builds the sketch from engine-NEUTRAL
    * primitives (md5 → hex-nibble arithmetic) so the 64 register values
    * themselves hash-match DuckDB: bucket = first byte mod 64, rank =
    * leading-zeros+1 of the next 16 hash bits = 17 − bitlen (a pure-
    * integer 16-branch MSB cascade — [[bitlen16]]; no float anywhere),
    * estimate = the raw HLL formula α·m²/Σ2^(−M_j) carried in
    * pure integers (Σ scaled by 2^17, α = 709/1000, floor division).
    *
    * Scale shape: ONE map-side-combinable max per bucket after the
    * distinct — 64 registers regardless of key count; the sketch is the
    * canonical mergeable distinct-count state for 100 TB (registers from
    * disjoint shards combine by per-bucket max — associative, so
    * partial-aggregated exactly like a sum). */
  val q385HllRegisters: Q = Q(
    "q385_hll_registers",
    s"""WITH v AS (SELECT DISTINCT o_custkey AS k FROM orders),
      |h AS (SELECT md5(CAST(k AS VARCHAR)) AS d FROM v),
      |x AS (SELECT
      |        (16 * (strpos('0123456789abcdef', substr(d, 1, 1)) - 1)
      |           + (strpos('0123456789abcdef', substr(d, 2, 1)) - 1)) % 64
      |          AS bucket,
      |        4096 * (strpos('0123456789abcdef', substr(d, 3, 1)) - 1)
      |          + 256 * (strpos('0123456789abcdef', substr(d, 4, 1)) - 1)
      |          + 16 * (strpos('0123456789abcdef', substr(d, 5, 1)) - 1)
      |          + (strpos('0123456789abcdef', substr(d, 6, 1)) - 1) AS n16
      |      FROM h),
      |r AS (SELECT bucket,
      |             CAST(17 - ${bitlen16("n16")} AS BIGINT) AS rnk
      |      FROM x),
      |reg AS (SELECT bucket, max(rnk) AS mr FROM r GROUP BY 1),
      |regs AS (SELECT CAST(gs.b AS BIGINT) AS bucket,
      |                CAST(coalesce(reg.mr, 0) AS BIGINT) AS max_rank
      |         FROM (SELECT unnest(range(0, 64)) AS b) gs
      |         LEFT JOIN reg ON reg.bucket = gs.b),
      |s AS (SELECT CAST(sum(CAST(1 AS BIGINT)
      |                       << CAST(17 - max_rank AS INTEGER)) AS BIGINT)
      |               AS ssum FROM regs),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM v),
      |e AS (SELECT CAST(CAST(709 AS BIGINT) * 4096 * 131072
      |                  // (1000 * ssum) AS BIGINT) AS estimate FROM s)
      |SELECT regs.bucket, regs.max_rank, t.n_exact, e.estimate,
      |       CAST(abs(e.estimate - t.n_exact) * 1000000 // t.n_exact
      |         AS BIGINT) AS err_ppm
      |FROM regs, t, e ORDER BY regs.bucket""".stripMargin) { (s, dir) =>
    def hv(i: Int) = s"(instr('0123456789abcdef', substring(d, $i, 1)) - 1)"
    val v = Tables(s, dir, "orders").select(col("o_custkey").as("k"))
      .distinct().persist(MEMORY_AND_DISK) // registers + the exact count
    val x = v.select(md5(col("k").cast("string")).as("d"))
      .select(
        expr(s"CAST((16 * ${hv(1)} + ${hv(2)}) % 64 AS BIGINT)").as("bucket"),
        expr(s"4096 * ${hv(3)} + 256 * ${hv(4)} + 16 * ${hv(5)} + ${hv(6)}")
          .as("n16"))
    val reg = x.select(col("bucket"),
      expr(s"CAST(17 - ${bitlen16("n16")} AS BIGINT)").as("rnk"))
      .groupBy(col("bucket")).agg(max(col("rnk")).as("mr"))
    val regs = s.range(64).select(col("id").as("bucket"))
      .join(reg, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("mr"), lit(0L)).as("max_rank"))
      .persist(MEMORY_AND_DISK) // output rows + the Σ2^(17−M) fold
    val ssum = regs.agg(
      sum(expr("CAST(shiftleft(1, CAST(17 - max_rank AS INT)) AS BIGINT)"))
        .as("ssum"))
    val est = ssum.select(expr(
      "CAST(CAST(709 AS BIGINT) * 4096 * 131072 div (1000 * ssum) AS BIGINT)")
      .as("estimate"))
    val t = v.agg(count(lit(1)).as("n_exact"))
    regs.crossJoin(broadcast(t)).crossJoin(broadcast(est))
      .select(col("bucket"), col("max_rank"), col("n_exact"), col("estimate"),
        expr("CAST(abs(estimate - n_exact) * 1000000 div n_exact AS BIGINT)")
          .as("err_ppm"))
      .orderBy(col("bucket"))
  }

  /** Multi-source hop-capped BFS over the symmetrized co-purchase graph:
    * min distance from each seed to every node within `cap` hops. One
    * frontier-expand join + one known-set anti-join per level; lineage
    * cut every level (the frontier is the small derived table). */
  private def bfsFrom(seeds: org.apache.spark.sql.DataFrame,
      sym: org.apache.spark.sql.DataFrame, cap: Int)
      : org.apache.spark.sql.DataFrame = {
    var dist = seeds.select(col("seed"), col("seed").as("node"),
      lit(0L).as("dist")).localCheckpoint()
    var frontier = dist
    var h = 0L
    var more = true
    while (more && h < cap) {
      h += 1
      val nxt = frontier.join(sym, frontier("node") === sym("u"))
        .select(col("seed"), col("v").as("node")).distinct()
        .join(dist.select(col("seed"), col("node")), Seq("seed", "node"),
          "left_anti")
        .select(col("seed"), col("node"), lit(h).as("dist"))
        .localCheckpoint()
      more = nxt.limit(1).count() > 0
      if (more) dist = dist.unionByName(nxt).localCheckpoint()
      frontier = nxt
    }
    dist
  }

  /** q386: harmonic centrality (12-hop-capped) of the five highest-degree
    * hubs — the "how reachable is the catalog from its hubs" audit
    * PageRank's stationary view doesn't give: H(s) = Σ_{v≠s} 1/d(s,v),
    * in exact nano fixed point (10⁹ // d — floor division, no float).
    * The hop cap is part of the metric's DEFINITION (both engines stop
    * at 12), which also bounds the oracle's recursive closure.
    *
    * Scale shape: one multi-source BFS — per level ONE frontier⋈edges
    * join and one anti-join against the known set, frontier bounded by
    * |seeds|·V; no per-pair work, no windows. */
  val q386HarmonicCentrality: Q = Q(
    "q386_harmonic_centrality",
    s"""WITH RECURSIVE $duckEdges,
      |sym AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
      |deg AS (SELECT u, count(*) AS dg FROM sym GROUP BY 1),
      |seeds AS (SELECT u FROM deg ORDER BY dg DESC, u LIMIT 5),
      |walk AS (
      |  SELECT u AS seed, u AS node, 0 AS dist FROM seeds
      |  UNION
      |  SELECT w.seed, sym.v AS node, w.dist + 1
      |  FROM walk w JOIN sym ON sym.u = w.node
      |  WHERE w.dist < 12),
      |md AS (SELECT seed, node, min(dist) AS d FROM walk GROUP BY 1, 2)
      |SELECT seed, CAST(count(*) FILTER (WHERE d > 0) AS BIGINT) AS n_reached,
      |       CAST(sum(CASE WHEN d > 0 THEN 1000000000 // d ELSE 0 END)
      |         AS BIGINT) AS harmonic_nano
      |FROM md GROUP BY seed ORDER BY seed""".stripMargin) { (s, dir) =>
    val e0 = Graph.supportedEdges(s, dir)
    val sym = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v")))
      .persist(MEMORY_AND_DISK)
    val seeds = sym.groupBy(col("u")).agg(count(lit(1)).as("dg"))
      .orderBy(col("dg").desc, col("u")).limit(5)
      .select(col("u").as("seed"))
    bfsFrom(seeds, sym, 12)
      .groupBy(col("seed"))
      .agg(count_if(col("dist") > 0).as("n_reached"),
        sum(when(col("dist") > 0, expr("CAST(1000000000 div dist AS BIGINT)"))
          .otherwise(0L)).as("harmonic_nano"))
      .orderBy(col("seed"))
  }

  /** q387: double-sweep diameter bound (30-hop-capped) — the standard
    * two-BFS estimator: sweep 1 from the smallest node id finds its
    * eccentricity and farthest node; sweep 2 from that node's
    * eccentricity is the classic diameter lower bound (exact on trees,
    * ≥ half the true diameter in general). Caps and min-id/min-node tie
    * breaks are part of the definition, shared by both engines; the
    * bound covers the seed's component (the graph's main body — the
    * co-purchase graph's smaller components only shrink the sweep).
    *
    * Scale shape: exactly two single-source BFS passes (the q386 loop
    * with one seed), each level one join — the textbook distributed
    * diameter estimator at any graph size. */
  val q387GraphDiameter: Q = Q(
    "q387_graph_diameter",
    s"""WITH RECURSIVE $duckEdges,
      |sym AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
      |s1 AS (SELECT min(u) AS seed FROM sym HAVING count(*) > 0),
      |w1 AS (
      |  SELECT seed AS node, 0 AS dist FROM s1
      |  UNION
      |  SELECT sym.v AS node, w.dist + 1
      |  FROM w1 w JOIN sym ON sym.u = w.node
      |  WHERE w.dist < 30),
      |m1 AS (SELECT node, min(dist) AS d FROM w1 GROUP BY 1),
      |f1 AS (SELECT node, d FROM m1 ORDER BY d DESC, node LIMIT 1),
      |w2 AS (
      |  SELECT node, 0 AS dist FROM f1
      |  UNION
      |  SELECT sym.v AS node, w.dist + 1
      |  FROM w2 w JOIN sym ON sym.u = w.node
      |  WHERE w.dist < 30),
      |m2 AS (SELECT node, min(dist) AS d FROM w2 GROUP BY 1),
      |f2 AS (SELECT node, d FROM m2 ORDER BY d DESC, node LIMIT 1)
      |SELECT s1.seed, CAST(f1.d AS BIGINT) AS ecc_seed,
      |       f1.node AS far_node, CAST(f2.d AS BIGINT) AS diameter_bound,
      |       f2.node AS antipode,
      |       (SELECT CAST(count(*) AS BIGINT) FROM m2) AS component_size
      |FROM s1, f1, f2""".stripMargin) { (s, dir) =>
    val e0 = Graph.supportedEdges(s, dir)
    val sym = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v")))
      .persist(MEMORY_AND_DISK)
    // Empty graph: the oracle's s1 HAVING-gates to zero rows — mirror
    // that (the previous getLong(0) NPE'd on the NULL min).
    val seedRow = sym.agg(min(col("u"))).head
    if (seedRow.isNullAt(0))
      s.range(0).select(col("id").as("seed"), col("id").as("ecc_seed"),
        col("id").as("far_node"), col("id").as("diameter_bound"),
        col("id").as("antipode"), col("id").as("component_size"))
    else {
      val seed = seedRow.getLong(0)
      def sweep(from: Long) = bfsFrom(
        s.range(1).select(lit(from).as("seed")), sym, 30)
        .select(col("node"), col("dist")).persist(MEMORY_AND_DISK)
      val m1 = sweep(seed)
      val Array(far1, ecc1) = m1.orderBy(col("dist").desc, col("node")).limit(1)
        .collect().map(r => Array(r.getLong(0), r.getLong(1))).head
      val m2 = sweep(far1)
      val Array(far2, ecc2) = m2.orderBy(col("dist").desc, col("node")).limit(1)
        .collect().map(r => Array(r.getLong(0), r.getLong(1))).head
      val compSize = m2.count()
      m1.unpersist(); m2.unpersist(); sym.unpersist()
      s.range(1).select(lit(seed).as("seed"), lit(ecc1).as("ecc_seed"),
        lit(far1).as("far_node"), lit(ecc2).as("diameter_bound"),
        lit(far2).as("antipode"), lit(compSize).as("component_size"))
    }
  }

  /** q388: per-EDGE triangle support — the k-truss building block (an
    * edge in a k-truss sits in ≥ k−2 triangles): q106 counts the graph's
    * triangles and q342 each NODE's closure; this names each EDGE's
    * embedded triangle count, the cohesion signal community trimming
    * thresholds on. Triangles are enumerated ONCE via q106's
    * (deg,id)-oriented wedge join (out-degrees O(√E) after orientation —
    * skew-immune, measured by the round-12 wedge boundary probe), then
    * each triangle credits its three edges.
    *
    * Scale shape: the wedge join is the only super-linear step and is
    * orientation-bounded; the explode is 3 rows per triangle; support
    * aggregates map-side at edge grain. */
  /** The from-scratch per-edge triangle support of an (u < v) edge set —
    * q388's kernel, exposed for the k-truss peel (q396, which recomputes
    * it on the shrinking graph) and as the incremental fold's batch
    * reference (q395). Triangles are enumerated ONCE via the
    * (deg,id)-oriented wedge join (out-degrees O(√E) after orientation —
    * skew-immune, measured by the round-12 wedge boundary probe), then
    * each triangle credits its three edges. Returns (u, v, tri) covering
    * every input edge, zeros included, unordered.
    *
    * `checkpointOri`: the oriented edge list is referenced three times;
    * one-shot callers persist it (cache registry, dropped by Verify's
    * per-query clearCache), but the k-truss peel calls this 40+ times
    * in a loop — there localCheckpoint materializes it without pinning
    * 40 entries in the cache registry (the ContextCleaner reclaims the
    * blocks when the round's frame goes unreachable). */
  private[graft] def triSupportOf(e0: org.apache.spark.sql.DataFrame,
      checkpointOri: Boolean = false): org.apache.spark.sql.DataFrame = {
    val deg = e0.select(col("u").as("n")).unionAll(e0.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val fwd = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriPlan = e0
      .join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
      .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
      .select(when(fwd, col("u")).otherwise(col("v")).as("a"),
        when(fwd, col("v")).otherwise(col("u")).as("b"),
        when(fwd, col("dv")).otherwise(col("du")).as("db"))
    val ori = // wedge sides + the close probe: materialize once
      if (checkpointOri) oriPlan.localCheckpoint()
      else oriPlan.persist(MEMORY_AND_DISK)
    val wedge = ori.as("o1").join(ori.as("o2"),
        col("o1.a") === col("o2.a") &&
          (col("o1.db") < col("o2.db") ||
            (col("o1.db") === col("o2.db") && col("o1.b") < col("o2.b"))))
      .select(col("o1.a").as("ta"), col("o1.b").as("x"), col("o2.b").as("y"))
    // Each closed wedge IS a triangle on nodes (ta, x, y); credit its
    // three edges in canonical (min, max) form and fold at edge grain.
    val tri = wedge.join(ori, col("x") === col("a") && col("y") === col("b"))
      .select(explode(array(
        struct(least(col("ta"), col("x")).as("u"),
          greatest(col("ta"), col("x")).as("v")),
        struct(least(col("ta"), col("y")).as("u"),
          greatest(col("ta"), col("y")).as("v")),
        struct(least(col("x"), col("y")).as("u"),
          greatest(col("x"), col("y")).as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("tri"))
    e0.join(tri, Seq("u", "v"), "left")
      .select(col("u"), col("v"), coalesce(col("tri"), lit(0L)).as("tri"))
  }

  val q388TriSupport: Q = Q(
    "q388_tri_support",
    s"""WITH $duckEdges,
      |adj AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
      |supp AS (SELECT e.u, e.v, CAST(count(*) AS BIGINT) AS tri
      |         FROM e0 e
      |         JOIN adj a1 ON a1.u = e.u
      |         JOIN adj a2 ON a2.u = e.v AND a2.v = a1.v
      |         GROUP BY 1, 2)
      |SELECT e0.u, e0.v, CAST(coalesce(supp.tri, 0) AS BIGINT) AS tri_support
      |FROM e0 LEFT JOIN supp ON supp.u = e0.u AND supp.v = e0.v
      |ORDER BY e0.u, e0.v""".stripMargin) { (s, dir) =>
    val e0 = Graph.supportedEdges(s, dir).persist(MEMORY_AND_DISK)
    triSupportOf(e0)
      .select(col("u"), col("v"), col("tri").as("tri_support"))
      .orderBy(col("u"), col("v"))
  }

  /** q389: weighted reservoir sampling (A-ES, Efraimidis–Spirakis) — the
    * weight-PROPORTIONAL selection q57's uniform reservoir can't do:
    * each document draws priority u^(1/w) (u from its id's md5, w =
    * n_chars), and the top-k priorities are the sample — inclusion
    * probability ∝ weight, deterministic given ids. Ranked in LOG space
    * (ln u = ln(v+1) − 28·ln 2 over the 28-bit hash integer v —
    * monotone, so the top-k is identical), with every ln taken on an
    * exact-integer-valued double, rounded to 9 decimals, ×10⁹ routed
    * through DECIMAL(28,9) (the established nano discipline), then ONE
    * floor division by the weight — both engines produce bit-equal
    * priorities.
    *
    * Scale shape: priorities are map-side scalar math; top-32 is one
    * TakeOrderedAndProject (k-bounded, no global window) + posexplode —
    * q109's rank device. A-ES is THE distributed weighted sampler: no
    * global pass, mergeable by keeping each partition's top-k. */
  /** A-ES priorities (prio_nano per doc) — q389's kernel, shared with the
    * streaming twin (q393): map-side md5-nibble hash → rounded-ln nano
    * fixed point → one floor division by the weight. */
  private[graft] def aesPriorities(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    def hv(i: Int) = s"(instr('0123456789abcdef', substring(d, $i, 1)) - 1)"
    docs.filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars"),
        md5(col("doc_id").cast("string")).as("d"))
      .select(col("doc_id"), col("n_chars"),
        expr(s"""16777216 * ${hv(1)} + 1048576 * ${hv(2)} + 65536 * ${hv(3)}
                |+ 4096 * ${hv(4)} + 256 * ${hv(5)} + 16 * ${hv(6)}
                |+ ${hv(7)}""".stripMargin).as("hv"))
      .select(col("doc_id"), col("n_chars"),
        expr("""(CAST(CAST(round(ln(hv + 1), 9) AS DECIMAL(28,9))
               |      * 1000000000 AS BIGINT)
               | - 28 * CAST(CAST(round(ln(2), 9) AS DECIMAL(28,9))
               |             * 1000000000 AS BIGINT)) div n_chars"""
          .stripMargin).as("prio_nano"))
  }

  /** Top-32 by (prio_nano desc, doc_id) via the k-bounded posexplode
    * device — q389's epilogue, shared with the streaming twin. */
  private[graft] def aesTop32(p: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    p.orderBy(col("prio_nano").desc, col("doc_id"))
      .limit(32)
      .agg(collect_list(struct(col("prio_nano").as("s"),
        col("doc_id").as("k"), col("n_chars").as("w"))).as("rows"))
      .select(posexplode(expr(
        """array_sort(rows, (l, r) ->
          |  CASE WHEN l.s > r.s THEN -1 WHEN l.s < r.s THEN 1
          |       WHEN l.k < r.k THEN -1 WHEN l.k > r.k THEN 1
          |       ELSE 0 END)""".stripMargin)).as(Seq("i", "r")))
      .select((col("i") + 1).cast("long").as("pos"),
        col("r.k").as("doc_id"), col("r.w").as("n_chars"),
        col("r.s").as("prio_nano"))
      .orderBy(col("pos"))

  val q389WeightedSample: Q = Q(
    "q389_weighted_sample",
    """WITH h AS (SELECT doc_id, n_chars,
      |                  md5(CAST(doc_id AS VARCHAR)) AS d
      |           FROM documents WHERE n_chars > 0),
      |v AS (SELECT doc_id, n_chars,
      |        16777216 * (strpos('0123456789abcdef', substr(d, 1, 1)) - 1)
      |        + 1048576 * (strpos('0123456789abcdef', substr(d, 2, 1)) - 1)
      |        + 65536 * (strpos('0123456789abcdef', substr(d, 3, 1)) - 1)
      |        + 4096 * (strpos('0123456789abcdef', substr(d, 4, 1)) - 1)
      |        + 256 * (strpos('0123456789abcdef', substr(d, 5, 1)) - 1)
      |        + 16 * (strpos('0123456789abcdef', substr(d, 6, 1)) - 1)
      |        + (strpos('0123456789abcdef', substr(d, 7, 1)) - 1) AS hv
      |      FROM h),
      |p AS (SELECT doc_id, n_chars,
      |        (CAST(CAST(round(ln(hv + 1), 9) AS DECIMAL(28,9))
      |              * 1000000000 AS BIGINT)
      |         - 28 * CAST(CAST(round(ln(2), 9) AS DECIMAL(28,9))
      |                     * 1000000000 AS BIGINT)) // n_chars
      |          AS prio_nano
      |      FROM v),
      |r AS (SELECT doc_id, n_chars, prio_nano,
      |             CAST(row_number() OVER (ORDER BY prio_nano DESC, doc_id)
      |               AS BIGINT) AS pos
      |      FROM p)
      |SELECT pos, doc_id, n_chars, prio_nano
      |FROM r WHERE pos <= 32 ORDER BY pos""".stripMargin) { (s, dir) =>
    // q109's k-bounded rank device: TakeOrderedAndProject + posexplode
    // re-sorted with the same tie discipline — no global WindowExec.
    aesTop32(aesPriorities(Tables(s, dir, "documents")))
  }

  /** q390: TextRank keyword extraction — q109's exact integer PageRank
    * fixpoint run on the WORD CO-OCCURRENCE graph (adjacent-token pairs,
    * support ≥ 3, symmetrized): the unsupervised keyword ranker. Tokens
    * that sit in many well-connected contexts rank above merely-frequent
    * ones — the signal TF (q30) and TF-IDF (q63) don't carry. Same
    * determinism devices as q109: BIGINT micro-mass 10¹²//n, floor
    * divisions, damping 85/100, 3 unrolled iterations, k-bounded
    * leaderboard (no window).
    *
    * Scale shape: the pair build is one map-side explode + one count at
    * pair grain (support-3 floor bounds the graph exactly like q106's
    * support-2); each PR iteration is one equi-join + map-side-combined
    * sum — word-graph size is vocabulary-bounded, not corpus-bounded. */
  val q390Textrank: Q = Q(
    "q390_textrank",
    """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents
      |           WHERE text IS NOT NULL),
      |adjp AS (SELECT least(ws[i], ws[i+1]) AS a,
      |                greatest(ws[i], ws[i+1]) AS b
      |         FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM w
      |               WHERE len(ws) >= 2)
      |         WHERE ws[i] <> ws[i+1]),
      |e0 AS (SELECT a, b FROM adjp GROUP BY 1, 2 HAVING count(*) >= 3),
      |sym AS (SELECT a AS u, b AS v FROM e0
      |        UNION ALL SELECT b, a FROM e0),
      |outd AS (SELECT u, count(*) AS od FROM sym GROUP BY 1),
      |n AS (SELECT count(*) AS nn FROM outd),
      |r0 AS (SELECT u AS w, 1000000000000 // (SELECT nn FROM n) AS r
      |       FROM outd),
      |r1 AS (SELECT sym.v AS w,
      |              (15 * (1000000000000 // (SELECT nn FROM n))) // 100
      |                + (85 * sum(r0.r // outd.od)) // 100 AS r
      |       FROM sym JOIN r0 ON r0.w = sym.u JOIN outd ON outd.u = sym.u
      |       GROUP BY sym.v),
      |r2 AS (SELECT sym.v AS w,
      |              (15 * (1000000000000 // (SELECT nn FROM n))) // 100
      |                + (85 * sum(r1.r // outd.od)) // 100 AS r
      |       FROM sym JOIN r1 ON r1.w = sym.u JOIN outd ON outd.u = sym.u
      |       GROUP BY sym.v),
      |r3 AS (SELECT sym.v AS w,
      |              (15 * (1000000000000 // (SELECT nn FROM n))) // 100
      |                + (85 * sum(r2.r // outd.od)) // 100 AS r
      |       FROM sym JOIN r2 ON r2.w = sym.u JOIN outd ON outd.u = sym.u
      |       GROUP BY sym.v)
      |SELECT CAST(row_number() OVER (ORDER BY r DESC, w) AS BIGINT) AS pos,
      |       w AS word, CAST(r AS BIGINT) AS rank_micro
      |FROM r3 QUALIFY pos <= 20 ORDER BY pos""".stripMargin) { (s, dir) =>
    val adjp = Tables(s, dir, "documents")
      .filter(col("text").isNotNull)
      .select(split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        """filter(transform(sequence(1, size(ws) - 1),
          |  i -> struct(ws[i-1] AS x, ws[i] AS y)), p -> p.x != p.y)"""
          .stripMargin)).as("p"))
      .select(least(col("p.x"), col("p.y")).as("a"),
        greatest(col("p.x"), col("p.y")).as("b"))
    val e0 = adjp.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 3).select(col("a"), col("b"))
    val sym = e0.unionAll(e0.select(col("b").as("a"), col("a").as("b")))
      .select(col("a").as("u"), col("b").as("v"))
    val outd = sym.groupBy(col("u")).agg(count(lit(1)).as("od"))
      .persist(MEMORY_AND_DISK)
    val nn = outd.count()
    // Degenerate corpus (no support-3 co-occurrence edge at all): the
    // oracle's r3 is empty, so surface the empty leaderboard instead of
    // dividing by zero on the driver. (An if/else EXPRESSION — a `return`
    // inside this lambda would be a non-local return.)
    if (nn == 0)
      s.range(0).select(col("id").as("pos"),
        col("id").cast("string").as("word"), col("id").as("rank_micro"))
    else {
      val base = 1000000000000L / nn
      val jump = (15L * base) / 100L
      val edges = sym.join(outd, "u").persist(MEMORY_AND_DISK)
      var r = outd.select(col("u").as("w"), lit(base).as("r"))
      for (_ <- 1 to 3) {
        r = edges.join(r, col("w") === col("u"))
          .groupBy(col("v"))
          .agg(sum(expr("r div od")).as("c"))
          .select(col("v").as("w"),
            (lit(jump) + expr("(85 * c) div 100")).as("r"))
      }
      Graph.rankTopK(r, "r", "w", 20, "word", "rank_micro")
    }
  }

  /** q391: HELD-OUT bigram-LM perplexity ranking — q265 trains the
    * add-one LM on the whole corpus and thresholds per-language flagged
    * mass (self-scoring: every doc contributes to the model that judges
    * it); this is the eval-proper construction a filter TUNES on: train
    * on the even-id half only, score the UNSEEN odd-id half (unseen
    * bigrams and head words hit the smoothing floor — impossible in
    * q265's self-trained setup), and surface the 15 WORST documents a
    * perplexity threshold would drop. Also exactness-stronger: each NLL
    * term is ln(c₁+V) − ln(c₂+1) with both ln args exact-integer-valued
    * doubles, rounded to 9 decimals and ×10⁹ through DECIMAL(28,9) (the
    * nano discipline — no float division anywhere, where q265 rounds a
    * float ratio), summed as BIGINT, one floor division per doc.
    *
    * Scale shape: counts are map-side-combined pair/word-grain
    * aggregates; scoring is two pair-grain equi-joins (bigram, then
    * head-word) against the count tables; the leaderboard is k-bounded.
    * At 100 TB the count tables ARE the LM — shuffles at n-gram grain,
    * never at corpus-text grain. */
  val q391BigramLm: Q = Q(
    "q391_bigram_lm",
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ws
      |            FROM documents WHERE text IS NOT NULL),
      |bg AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
      |       FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
      |             FROM tok WHERE len(ws) >= 2)),
      |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
      |       FROM bg WHERE doc_id % 2 = 0 GROUP BY 1, 2),
      |c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
      |voc AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
      |        FROM (SELECT unnest(ws) AS w FROM tok WHERE doc_id % 2 = 0)),
      |sc AS (SELECT bg.doc_id,
      |              CAST(CAST(round(ln(coalesce(c1.c1, 0) + voc.v), 9)
      |                        AS DECIMAL(28,9)) * 1000000000 AS BIGINT)
      |              - CAST(CAST(round(ln(coalesce(c2.c2, 0) + 1), 9)
      |                          AS DECIMAL(28,9)) * 1000000000 AS BIGINT)
      |                AS nll_nano
      |       FROM bg
      |       LEFT JOIN c2 ON c2.w1 = bg.w1 AND c2.w2 = bg.w2
      |       LEFT JOIN c1 ON c1.w1 = bg.w1
      |       CROSS JOIN voc
      |       WHERE bg.doc_id % 2 = 1),
      |d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |             CAST(sum(nll_nano) // count(*) AS BIGINT) AS avg_nll_nano
      |      FROM sc GROUP BY 1),
      |r AS (SELECT d.*, CAST(row_number() OVER
      |               (ORDER BY avg_nll_nano DESC, doc_id) AS BIGINT) AS pos
      |      FROM d)
      |SELECT pos, doc_id, n_bigrams, avg_nll_nano
      |FROM r WHERE pos <= 15 ORDER BY pos""".stripMargin) { (s, dir) =>
    val d = addOneBigramNllPerDoc(s, dir)
    // k-bounded worst-docs leaderboard (desc by NLL, tie doc_id asc).
    d.orderBy(col("avg_nll_nano").desc, col("doc_id")).limit(15)
      .agg(collect_list(struct(col("avg_nll_nano").as("s"),
        col("doc_id").as("k"), col("n_bigrams").as("nb"))).as("rows"))
      .select(posexplode(expr(
        """array_sort(rows, (l, r) ->
          |  CASE WHEN l.s > r.s THEN -1 WHEN l.s < r.s THEN 1
          |       WHEN l.k < r.k THEN -1 WHEN l.k > r.k THEN 1
          |       ELSE 0 END)""".stripMargin)).as(Seq("i", "r")))
      .select((col("i") + 1).cast("long").as("pos"),
        col("r.k").as("doc_id"), col("r.nb").as("n_bigrams"),
        col("r.s").as("avg_nll_nano"))
      .orderBy(col("pos"))
  }

  /** Per-document held-out ADD-ONE bigram NLL (doc_id, n_bigrams,
    * avg_nll_nano) — q391's scoring surface without the leaderboard
    * epilogue, exposed for the round-14 smoother-disagreement audit
    * (q409 ranks this against the Kneser-Ney surface). */
  private[graft] def addOneBigramNllPerDoc(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    val tok = Tables(s, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .persist(MEMORY_AND_DISK) // bigrams (train + heldout) and the vocab
    val bg = tok.filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ws) - 1),
          |  i -> named_struct('w1', ws[i-1], 'w2', ws[i]))""".stripMargin)).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val c2 = bg.filter(col("doc_id") % 2 === 0)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      .persist(MEMORY_AND_DISK) // probed by sc, folded by c1
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val voc = tok.filter(col("doc_id") % 2 === 0)
      .select(explode(col("ws")).as("w")).distinct()
      .agg(count(lit(1)).as("v"))
    val nano = (e: String) =>
      s"CAST(CAST(round(ln($e), 9) AS DECIMAL(28,9)) * 1000000000 AS BIGINT)"
    val sc = bg.filter(col("doc_id") % 2 === 1)
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(voc))
      .select(col("doc_id"),
        (expr(nano("coalesce(c1, 0) + v")) -
          expr(nano("coalesce(c2, 0) + 1"))).as("nll_nano"))
    sc.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        expr("CAST(sum(nll_nano) div count(*) AS BIGINT)").as("avg_nll_nano"))
  }

  /** q392: Katz centrality — attenuated PATH counting, the centrality
    * between degree (local) and PageRank (degree-normalized): x =
    * Σ_k α^k·A^k·1 rewards being reachable by many short paths without
    * dividing out the neighbor's own connectivity. Exact integers:
    * scale S = 10⁹ per unit, α = 1/8 as a floor division per hop, 3
    * unrolled iterations x' = S·1 + (A·x) // 8 — α·λ_max < 1 holds on
    * the support-2 graph (checked by the series' values staying well
    * under 64-bit range; divergence would overflow the gate loudly).
    *
    * Scale shape: q109's iteration economics — one equi-join + map-side
    * sum per hop on the shared edge list. */
  val q392KatzCentrality: Q = Q(
    "q392_katz_centrality",
    s"""WITH $duckEdges,
      |sym AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
      |nodes AS (SELECT DISTINCT u FROM sym),
      |x0 AS (SELECT u AS n, CAST(1000000000 AS HUGEINT) AS x FROM nodes),
      |x1 AS (SELECT nodes.u AS n,
      |              1000000000 + coalesce(s.a, 0) AS x
      |       FROM nodes LEFT JOIN (
      |         SELECT sym.v AS n, sum(x0.x) // 8 AS a
      |         FROM sym JOIN x0 ON x0.n = sym.u GROUP BY 1) s
      |         ON s.n = nodes.u),
      |x2 AS (SELECT nodes.u AS n,
      |              1000000000 + coalesce(s.a, 0) AS x
      |       FROM nodes LEFT JOIN (
      |         SELECT sym.v AS n, sum(x1.x) // 8 AS a
      |         FROM sym JOIN x1 ON x1.n = sym.u GROUP BY 1) s
      |         ON s.n = nodes.u),
      |x3 AS (SELECT nodes.u AS n,
      |              1000000000 + coalesce(s.a, 0) AS x
      |       FROM nodes LEFT JOIN (
      |         SELECT sym.v AS n, sum(x2.x) // 8 AS a
      |         FROM sym JOIN x2 ON x2.n = sym.u GROUP BY 1) s
      |         ON s.n = nodes.u)
      |SELECT CAST(row_number() OVER (ORDER BY x DESC, n) AS BIGINT) AS pos,
      |       n, CAST(x AS BIGINT) AS katz_nano
      |FROM x3 QUALIFY pos <= 20 ORDER BY pos""".stripMargin) { (s, dir) =>
    val e0 = Graph.supportedEdges(s, dir)
    val sym = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v")))
      .persist(MEMORY_AND_DISK)
    val nodes = sym.select(col("u").as("n")).distinct()
      .persist(MEMORY_AND_DISK)
    val dec = "decimal(38,0)"
    var x = nodes.select(col("n"), lit(1000000000L).cast(dec).as("x"))
    for (_ <- 1 to 3) {
      val a = sym.join(x, col("n") === col("u"))
        .groupBy(col("v"))
        .agg(expr(s"CAST(sum(x) AS $dec) div 8").as("a"))
      x = nodes.join(a.select(col("v").as("n"), col("a")), Seq("n"), "left")
        .select(col("n"),
          (lit(1000000000L).cast(dec) + coalesce(col("a"), lit(0L).cast(dec)))
            .as("x"))
    }
    Graph.rankTopK(x.select(col("n"), col("x").cast("long").as("x")),
      "x", "n", 20, "n", "katz_nano")
  }

  /** q394: HLL register MERGE identity — the property the 100-TB story
    * actually leans on, gated explicitly: registers built PER SHARD
    * (o_orderpriority as the shard key — shards overlap in customers, the
    * harder case) and merged by per-bucket max equal the registers built
    * over the global distinct key set in one pass. The oracle computes
    * the GLOBAL sketch only; Spark computes the MERGED one — any merge
    * defect (double-count sensitivity, lost shard, wrong combine op)
    * hash-mismatches. Output also carries the shard count per bucket's
    * contributing max for audit.
    *
    * Scale shape: per-shard distinct + 64-cell max per shard, then one
    * 64·|shards|→64 max — the exact map-side-combine shape a
    * 1000-executor distinct-count rollup uses. */
  val q394HllMerge: Q = Q(
    "q394_hll_merge",
    s"""WITH v AS (SELECT DISTINCT o_custkey AS k FROM orders),
      |h AS (SELECT md5(CAST(k AS VARCHAR)) AS d FROM v),
      |x AS (SELECT
      |        (16 * (strpos('0123456789abcdef', substr(d, 1, 1)) - 1)
      |           + (strpos('0123456789abcdef', substr(d, 2, 1)) - 1)) % 64
      |          AS bucket,
      |        4096 * (strpos('0123456789abcdef', substr(d, 3, 1)) - 1)
      |          + 256 * (strpos('0123456789abcdef', substr(d, 4, 1)) - 1)
      |          + 16 * (strpos('0123456789abcdef', substr(d, 5, 1)) - 1)
      |          + (strpos('0123456789abcdef', substr(d, 6, 1)) - 1) AS n16
      |      FROM h),
      |r AS (SELECT bucket,
      |             CAST(17 - ${bitlen16("n16")} AS BIGINT) AS rnk
      |      FROM x),
      |reg AS (SELECT bucket, max(rnk) AS mr FROM r GROUP BY 1),
      |sh AS (SELECT CAST(count(DISTINCT o_orderpriority) AS BIGINT)
      |         AS n_shards FROM orders)
      |SELECT CAST(gs.b AS BIGINT) AS bucket,
      |       CAST(coalesce(reg.mr, 0) AS BIGINT) AS max_rank,
      |       sh.n_shards
      |FROM (SELECT unnest(range(0, 64)) AS b) gs
      |LEFT JOIN reg ON reg.bucket = gs.b
      |CROSS JOIN sh
      |ORDER BY bucket""".stripMargin) { (s, dir) =>
    def hv(i: Int) = s"(instr('0123456789abcdef', substring(d, $i, 1)) - 1)"
    val o = Tables(s, dir, "orders")
      .select(col("o_orderpriority").as("shard"), col("o_custkey").as("k"))
    // Per-shard sketches: distinct within shard (shards OVERLAP in
    // customers — the dedup is per shard, as real per-partition partials
    // would be), 64-cell max per shard…
    val perShard = o.distinct()
      .select(col("shard"), md5(col("k").cast("string")).as("d"))
      .select(col("shard"),
        expr(s"CAST((16 * ${hv(1)} + ${hv(2)}) % 64 AS BIGINT)").as("bucket"),
        expr(s"4096 * ${hv(3)} + 256 * ${hv(4)} + 16 * ${hv(5)} + ${hv(6)}")
          .as("n16"))
      .select(col("shard"), col("bucket"),
        expr(s"CAST(17 - ${bitlen16("n16")} AS BIGINT)").as("rnk"))
      .groupBy(col("shard"), col("bucket")).agg(max(col("rnk")).as("mr"))
    // …then the MERGE: per-bucket max across shards — if this combine
    // were anything weaker than the sketch's true union, the gate's
    // global-sketch oracle would mismatch.
    val merged = perShard.groupBy(col("bucket")).agg(max(col("mr")).as("mr"))
    val nShards = o.select(col("shard")).distinct()
      .agg(count(lit(1)).as("n_shards"))
    s.range(64).select(col("id").as("bucket"))
      .join(merged, Seq("bucket"), "left")
      .crossJoin(broadcast(nShards))
      .select(col("bucket"), coalesce(col("mr"), lit(0L)).as("max_rank"),
        col("n_shards"))
      .orderBy(col("bucket"))
  }

  val all: Seq[Q] = Seq(q385HllRegisters, q386HarmonicCentrality,
    q387GraphDiameter, q388TriSupport, q389WeightedSample, q390Textrank,
    q391BigramLm, q392KatzCentrality, q394HllMerge)
}
