package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q._

/** Additional relational surface rounding out SURVEY §2.5/§2.7 extension
  * coverage: exact percentiles, ordered string aggregation, INTERSECT/EXCEPT,
  * pivot, and the lead/first_value/nth_value window family.
  */
object Extended {

  /** Exact percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`, both
    * linear-interpolation on the sorted set — identical doubles). */
  val q25Percentiles: Q = Q(
    "q25_percentiles",
    """SELECT l_returnflag,
      |       round(quantile_cont(l_quantity, 0.25), 4) AS p25,
      |       round(quantile_cont(l_quantity, 0.5), 4) AS p50,
      |       round(quantile_cont(l_quantity, 0.75), 4) AS p75
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_quantity, 0.75)"), 4).as("p75"))
      .orderBy(col("l_returnflag"))
  }

  /** Ordered string aggregation over distinct values. */
  val q26StringAgg: Q = Q(
    "q26_string_agg",
    """SELECT o_orderpriority,
      |       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
      |       count(*) AS n
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        array_join(array_sort(collect_set(col("o_orderstatus"))), ",").as("statuses"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  /** INTERSECT / EXCEPT set operations on key sets. */
  val q27SetOps: Q = Q(
    "q27_set_ops",
    """SELECT 'both' AS side, count(*) AS n FROM
      |  (SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders) t1
      |UNION ALL
      |SELECT 'only_customers' AS side, count(*) AS n FROM
      |  (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders) t2
      |ORDER BY side""".stripMargin) { (s, dir) =>
    val c = Tables(s, dir, "customer").select(col("c_custkey"))
    val o = Tables(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
    val both = c.intersect(o).agg(count(lit(1)).as("n")).select(lit("both").as("side"), col("n"))
    val only = c.except(o).agg(count(lit(1)).as("n"))
      .select(lit("only_customers").as("side"), col("n"))
    both.unionByName(only).orderBy(col("side"))
  }

  /** Pivot: order counts by priority × status (explicit value list, so the
    * output schema is static — required for a deterministic oracle). */
  val q28Pivot: Q = Q(
    "q28_pivot",
    """SELECT o_orderpriority,
      |       count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
      |       count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
      |       count(*) FILTER (WHERE o_orderstatus = 'P') AS P
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .select(
        col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("F"),
        coalesce(col("O"), lit(0L)).as("O"),
        coalesce(col("P"), lit(0L)).as("P"))
      .orderBy(col("o_orderpriority"))
  }

  /** lead / first_value / nth_value window family with explicit frames. */
  val q29WindowFuncs: Q = Q(
    "q29_window_funcs",
    """SELECT o_custkey, o_orderkey,
      |       lead(o_totalprice) OVER w AS next_price,
      |       first_value(o_totalprice) OVER
      |         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price,
      |       nth_value(o_totalprice, 2) OVER
      |         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    val ord = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(s, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        lead(col("o_totalprice"), 1).over(ord).as("next_price"),
        first(col("o_totalprice")).over(cum).as("first_price"),
        nth_value(col("o_totalprice"), 2).over(full).as("second_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Two-phase salted aggregation — the skew-mitigation pattern: aggregate
    * on (salt, key) first so a hot key spreads over S reducers, then merge
    * partials by key. Result ≡ plain groupBy (the oracle). */
  val q42SaltedAgg: Q = Q(
    "q42_salted_agg",
    s"""SELECT l_returnflag, count(*) AS n, ${oSum2("l_extendedprice")} AS total
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .withColumn("__salt", pmod(hash(col("l_orderkey")), lit(16)))
      .groupBy(col("l_returnflag"), col("__salt"))
      .agg(
        count(lit(1)).as("pn"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("pt"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("pn")).as("n"),
        sum(col("pt")).cast("double").as("total"))
      .orderBy(col("l_returnflag"))
  }

  /** Approximate sketches (HLL distinct, approx quantiles) — the 100 TB
    * substitutes for their exact counterparts. Different engines' sketches
    * can't hash-match on raw values, so the oracle gate is on *error
    * bounds*: Spark surfaces scalar booleans asserting each sketch landed
    * inside its documented error envelope (HLL rsd 0.05 → ±15% = 3σ;
    * approx_percentile accuracy 1000 → rank error ≤ 1e-3, checked against
    * a generous ±5%-rank window). DuckDB's side of the compare is the
    * constant-true rendering — the hash matches iff every bound holds.
    *
    * The quantile check is by RANK COUNTING, not by exact percentiles: an
    * exact `percentile()` materializes every group value in an
    * ObjectHashAggregate buffer (measured 30+ s at sf0.1 — the single
    * most expensive aggregate in the suite, and exactly what the sketch
    * exists to replace). Instead, pass 1 computes the sketches, and pass 2
    * re-scans counting how many values fall below each sketched quantile
    * (`count_if` — plain codegen'd hash aggregation, no value buffers).
    * The sketch is valid iff its empirical rank sits in the window. Both
    * passes stream; peak memory is O(groups), not O(rows). */
  val q43ApproxSketches: Q = Q(
    "q43_approx_sketches",
    """SELECT l_returnflag, true AS orders_ok, true AS p50_ok, true AS p99_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val li = Tables(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_extendedprice"))
    val sk = li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey")).as("ac"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.99), 1000)").as("ap"))
      .select(col("l_returnflag"), col("ac"),
        element_at(col("ap"), 1).as("ap50"), element_at(col("ap"), 2).as("ap99"))
    li.join(broadcast(sk), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("ec"),
        count(lit(1)).as("n"),
        first(col("ac")).as("ac"),
        count_if(col("l_extendedprice") <= col("ap50")).as("le50"),
        count_if(col("l_extendedprice") < col("ap50")).as("lt50"),
        count_if(col("l_extendedprice") <= col("ap99")).as("le99"),
        count_if(col("l_extendedprice") < col("ap99")).as("lt99"))
      .select(
        col("l_returnflag"),
        (col("ac") >= col("ec") * 0.85 && col("ac") <= col("ec") * 1.15)
          .as("orders_ok"),
        (col("le50") >= col("n") * 0.45 && col("lt50") <= col("n") * 0.55)
          .as("p50_ok"),
        (col("le99") >= col("n") * 0.98 && col("lt99") <= col("n") * 0.9995)
          .as("p99_ok"))
      .orderBy(col("l_returnflag"))
  }

  /** GROUPING SETS through the SQL entry path (temp view + spark.sql —
    * exercises the parser/analyzer front door, not just the DSL). */
  val q44GroupingSets: Q = Q(
    "q44_grouping_sets",
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |       coalesce(l_linestatus, 'ALL') AS linestatus,
      |       count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY returnflag, linestatus""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem").createOrReplaceTempView("graft_lineitem")
    s.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       count(*) AS n
        |FROM graft_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin)
  }

  /** Correlated scalar subquery — Catalyst decorrelates it into a join;
    * DuckDB runs the same ANSI text. */
  val q45CorrelatedSubquery: Q = Q(
    "q45_correlated_subquery",
    """SELECT o_orderkey,
      |       (SELECT count(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS n_items,
      |       (SELECT max(l_shipdate) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS last_ship
      |FROM orders o ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem").createOrReplaceTempView("graft_lineitem")
    Tables(s, dir, "orders").createOrReplaceTempView("graft_orders")
    s.sql(
      """SELECT o_orderkey,
        |       (SELECT count(*) FROM graft_lineitem l WHERE l.l_orderkey = o.o_orderkey) AS n_items,
        |       (SELECT max(l_shipdate) FROM graft_lineitem l WHERE l.l_orderkey = o.o_orderkey) AS last_ship
        |FROM graft_orders o ORDER BY o_orderkey""".stripMargin)
  }

  /** q88: distribution moments (mean / variance / skewness) from EXACT
    * power sums — the portable-determinism recipe for higher statistics.
    * Built-in `var_samp`/`skewness` accumulate floats in engine-specific
    * order, so they can never hash-match across engines; instead Σx, Σx²,
    * Σx³ are exact DECIMAL sums (l_quantity is integer-valued ≤ 50, so
    * x³ ≤ 125000 is exactly representable — no rounding enters the sums),
    * and the moment formulas are scalar IEEE expressions over those exact
    * inputs, written in the SAME shape in both engines → identical bits.
    *
    * Scale shape: one partial/final aggregate pair, map-side combining
    * three decimal sums — the same plan as any sum, no second pass and no
    * sort, where a naive two-pass (mean then Σ(x−mean)²) would rescan. */
  val q88MomentStats: Q = Q(
    "q88_moment_stats",
    """WITH s AS (SELECT l_returnflag AS grp, count(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
      |  CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS s2,
      |  CAST(SUM(CAST(l_quantity * l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s3
      |  FROM lineitem GROUP BY 1)
      |SELECT grp, n,
      |  round(s1 / n, 6) AS mean,
      |  round((s2 - s1 * s1 / n) / n, 6) AS variance,
      |  round(((s3 - 3 * s1 * s2 / n + 2 * s1 * s1 * s1 / (CAST(n AS DOUBLE) * n)) / n)
      |        / pow((s2 - s1 * s1 / n) / n, 1.5), 6) AS skewness
      |FROM s ORDER BY grp""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.types.DecimalType
    val q = col("l_quantity")
    val agg = Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag").as("grp"))
      .agg(
        count(lit(1)).as("n"),
        sum(q.cast(DecimalType(18, 2))).cast("double").as("s1"),
        sum((q * q).cast(DecimalType(28, 4))).cast("double").as("s2"),
        sum((q * q * q).cast(DecimalType(38, 6))).cast("double").as("s3"))
    val n = col("n")
    val (s1, s2, s3) = (col("s1"), col("s2"), col("s3"))
    val variance = (s2 - s1 * s1 / n) / n
    val m3 = (s3 - lit(3) * s1 * s2 / n + lit(2) * s1 * s1 * s1 / (n.cast("double") * n)) / n
    agg.select(
        col("grp"), n,
        round(s1 / n, 6).as("mean"),
        round(variance, 6).as("variance"),
        round(m3 / pow(variance, 1.5), 6).as("skewness"))
      .orderBy(col("grp"))
  }

  /** q89: winsorized (outlier-clipped) statistics — robust aggregation:
    * clip every value into [p05, p95] before averaging, with the exact
    * percentiles found by RANK COUNTING over the per-group VALUE HISTOGRAM,
    * not a row-level sort: groupBy (grp, value) first (map-side combining,
    * high-cardinality key), then a cumulative window over the value-level
    * rows — orders of magnitude fewer than raw rows, so the per-group sort
    * never sees the raw table. p05 = smallest value whose cumulative count
    * reaches ceil(0.05·n). The winsorized mean is an exact decimal sum of
    * clamped values, one division at the end.
    *
    * The row-level alternative (row_number over each group) funnels whole
    * groups through single reducers — the low-cardinality window trap this
    * plan exists to avoid. */
  val q89Winsorized: Q = Q(
    "q89_winsorized_stats",
    """WITH vc AS (SELECT l_returnflag AS grp, l_extendedprice AS x, count(*) AS c
      |            FROM lineitem GROUP BY 1, 2),
      |cum AS (SELECT grp, x, c,
      |               sum(c) OVER (PARTITION BY grp ORDER BY x) AS cumc,
      |               sum(c) OVER (PARTITION BY grp) AS n
      |        FROM vc),
      |p AS (SELECT grp,
      |             min(CASE WHEN cumc >= CAST(ceil(0.05 * n) AS BIGINT) THEN x END) AS p05,
      |             min(CASE WHEN cumc >= CAST(ceil(0.95 * n) AS BIGINT) THEN x END) AS p95
      |      FROM cum GROUP BY grp)
      |SELECT grp, CAST(sum(c) AS BIGINT) AS n, p05, p95,
      |       CAST(coalesce(sum(c) FILTER (WHERE x < p05), 0) AS BIGINT) AS n_low,
      |       CAST(coalesce(sum(c) FILTER (WHERE x > p95), 0) AS BIGINT) AS n_high,
      |       round(CAST(SUM(CAST(greatest(p05, least(p95, x)) * c AS DECIMAL(28,4)) ) AS DOUBLE)
      |             / sum(c), 4) AS wins_mean
      |FROM vc JOIN p USING (grp)
      |GROUP BY grp, p05, p95 ORDER BY grp""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val vc = Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag").as("grp"), col("l_extendedprice").as("x"))
      .agg(count(lit(1)).as("c"))
    val wOrd = Window.partitionBy(col("grp")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("grp"))
    val cum = vc
      .withColumn("cumc", sum(col("c")).over(wOrd))
      .withColumn("n", sum(col("c")).over(wAll))
    val p = cum.groupBy(col("grp")).agg(
      min(when(col("cumc") >= ceil(lit(0.05) * col("n")).cast("long"), col("x"))).as("p05"),
      min(when(col("cumc") >= ceil(lit(0.95) * col("n")).cast("long"), col("x"))).as("p95"))
    val clamped = greatest(col("p05"), least(col("p95"), col("x")))
    vc.join(p, "grp")
      .groupBy(col("grp"), col("p05"), col("p95"))
      .agg(
        sum(col("c")).as("n"),
        sum(when(col("x") < col("p05"), col("c")).otherwise(lit(0L))).as("n_low"),
        sum(when(col("x") > col("p95"), col("c")).otherwise(lit(0L))).as("n_high"),
        round(sum((clamped * col("c")).cast(DecimalType(28, 4))).cast("double")
          / sum(col("c")), 4).as("wins_mean"))
      .select(col("grp"), col("n"), col("p05"), col("p95"),
        col("n_low"), col("n_high"), col("wins_mean"))
      .orderBy(col("grp"))
  }

  /** q91: the custom bounded-heap aggregate (`functions.TopKByScore`)
    * oracle-gated DIRECTLY — top-3 line items per return flag by price,
    * where the Spark side is `topk_by_score` (map-side k-bounded heap, ≤ k
    * rows per group per partition reach the shuffle) and the oracle is the
    * semantically-equal row_number window. q39 uses the aggregate as an
    * internal shortlist; here its own output order and tie-breaking
    * (score desc, id asc) are what the hash compare certifies. */
  val q91TopKAggregate: Q = Q(
    "q91_topk_aggregate",
    """WITH ranked AS (
      |  SELECT l_returnflag AS grp,
      |         l_orderkey * 10 + l_linenumber AS id,
      |         l_extendedprice AS score,
      |         row_number() OVER (PARTITION BY l_returnflag
      |           ORDER BY l_extendedprice DESC, l_orderkey * 10 + l_linenumber) AS rank
      |  FROM lineitem)
      |SELECT grp, rank, id, score FROM ranked WHERE rank <= 3
      |ORDER BY grp, rank""".stripMargin) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    Tables(s, dir, "lineitem")
      .select(col("l_returnflag").as("grp"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
        col("l_extendedprice").as("score"))
      .groupBy(col("grp"))
      .agg(expr("topk_by_score(score, id, 3)").as("top"))
      .select(col("grp"), posexplode(col("top")))
      .select(col("grp"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("id"), col("col.score").as("score"))
      .orderBy(col("grp"), col("rank"))
  }

  /** q125: group-wise OLS regression — slope / intercept / R² of
    * extendedprice on quantity per returnflag, from the five sufficient
    * statistics (n, Σx, Σy, Σxy, Σx², Σy²) in ONE pass. Same determinism
    * discipline as q88: each sufficient statistic accumulates as an exact
    * DECIMAL (the per-row product is one IEEE double multiply, identical
    * across engines, then a deterministic decimal cast; the sum is then
    * associative ⇒ order-insensitive), surfaces as DOUBLE, and the
    * closed-form estimators are a fixed dag of IEEE ops over
    * bit-identical inputs.
    *
    * Scale shape: a single map-side-combining hash aggregate — the
    * regression never sees rows twice, never sorts, never shuffles more
    * than 6 numbers per (partition × group). This is the cheapest
    * possible distributed OLS and exactly how you'd fit millions of
    * per-key trend lines (one groupBy key swap away). */
  val q125GroupRegression: Q = Q(
    "q125_group_regression",
    """WITH s AS (SELECT l_returnflag AS grp, count(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |  CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
      |  CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
      |  CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS syy
      |  FROM lineitem GROUP BY 1)
      |SELECT grp, n,
      |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
      |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) AS intercept,
      |  round((n * sxy - sx * sy) * (n * sxy - sx * sy)
      |        / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
      |FROM s ORDER BY grp""".stripMargin) { (s, dir) =>
    regressionOf(Tables(s, dir, "lineitem")
      .select(col("l_returnflag").as("grp"), col("l_quantity").as("x"),
        col("l_extendedprice").as("y")))
      .orderBy(col("grp"))
  }

  /** The q125 core over any (grp, x, y) frame. */
  private[ops] def regressionOf(in: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val (x, y) = (col("x"), col("y"))
    val agg = in.groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n"),
        sum(x.cast(DecimalType(18, 2))).cast("double").as("sx"),
        sum(y.cast(DecimalType(18, 2))).cast("double").as("sy"),
        sum((x * y).cast(DecimalType(38, 6))).cast("double").as("sxy"),
        sum((x * x).cast(DecimalType(28, 4))).cast("double").as("sxx"),
        sum((y * y).cast(DecimalType(38, 6))).cast("double").as("syy"))
    val (n, sx, sy) = (col("n"), col("sx"), col("sy"))
    val (sxy, sxx, syy) = (col("sxy"), col("sxx"), col("syy"))
    val cov = n * sxy - sx * sy
    val varx = n * sxx - sx * sx
    agg.select(
      col("grp"), n,
      round(cov / varx, 6).as("slope"),
      round((sy - cov / varx * sx) / n, 6).as("intercept"),
      round(cov * cov / (varx * (n * syy - sy * sy)), 6).as("r2"))
  }

  /** q127: 2-D skyline (Pareto frontier) — the orders no other order
    * dominates on (price HIGHER, date EARLIER): multi-objective "best"
    * without collapsing the objectives into one score. Classic algorithmic
    * shape: reduce to per-price LEVELS (min date per distinct price —
    * every other row at that price is dominated by its level
    * representative), then one price-descending sweep keeps a level iff
    * its date beats the running-min date of all strictly-higher prices.
    *
    * Scale shape: the level reduction is a map-side-combining aggregate;
    * the sweep is then SALTED — a partitioned window drops everything
    * locally dominated (any local dominator is also a global one, so
    * survivors ⊇ the true frontier), and only the survivors — O(frontier)
    * per salt, ~H(n) ≈ ln n expected for independent dims — reach the one
    * global window. The unpartitioned sweep only ever sees ~64·ln n rows;
    * the oracle renders the unsalted sweep, and gate equality IS the
    * salt-losslessness proof. */
  val q127Skyline: Q = Q(
    "q127_skyline",
    """WITH lv AS (
      |  SELECT o_totalprice AS price, min(o_orderdate) AS first_date
      |  FROM orders GROUP BY 1),
      |w AS (
      |  SELECT price, first_date,
      |         min(first_date) OVER (ORDER BY price DESC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rm
      |  FROM lv)
      |SELECT price, first_date FROM w
      |WHERE rm IS NULL OR first_date < rm
      |ORDER BY price DESC""".stripMargin) { (s, dir) =>
    skylineOf(Tables(s, dir, "orders")
      .select(col("o_totalprice").as("price"), col("o_orderdate").as("d")))
      .orderBy(col("price").desc)
  }

  /** The q127 core over any (price, d) frame: maximize price, minimize d. */
  private[ops] def skylineOf(points: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lv = points.groupBy(col("price")).agg(min(col("d")).as("first_date"))
    val localW = Window.partitionBy(col("salt")).orderBy(col("price").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val survivors = lv
      .withColumn("salt", pmod(hash(col("price")), lit(64)))
      .withColumn("rm", min(col("first_date")).over(localW))
      .filter(col("rm").isNull || col("first_date") < col("rm"))
      .drop("salt", "rm")
    val globalW = Window.orderBy(col("price").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    survivors
      .withColumn("rm", min(col("first_date")).over(globalW))
      .filter(col("rm").isNull || col("first_date") < col("rm"))
      .select(col("price"), col("first_date"))
  }

  /** q136: exact z-score outlier audit — per-group sigma-tail counts with
    * NO square root and NO float: |x−μ| > z·σ is cross-multiplied into
    * pure integer form. With per-group n, S=Σv, SS=Σv² (v = exact cents),
    * σ² = (n·SS − S²)/n², so |x−μ| > 1.5σ ⇔ 4·(n·v−S)² > 9·(n·SS−S²) and
    * |x−μ| > 3σ ⇔ (n·v−S)² > 9·(n·SS−S²) — both sides exact 128-bit
    * integers (HUGEINT / DECIMAL(38,0)), so the flag can never disagree
    * across engines the way a float sqrt comparison can. (q88 computes
    * the moments; this turns them into a per-ROW decision — the anomaly
    * feed, not the summary.)
    *
    * Scale shape: pass 1 reduces to one (n, S, SS) triple per group
    * (map-side combining, tiny result); the triple table broadcasts back
    * onto a second scan whose flags evaluate map-side, then collapse to
    * per-group counts. Two linear scans, no wide shuffle, no window. At
    * 100 TB the stats side stays a broadcast whatever the row count. */
  val q136SigmaOutliers: Q = Q(
    "q136_sigma_outliers",
    """WITH e AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events),
      |st AS (
      |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
      |         CAST(sum(v) AS HUGEINT) AS s, CAST(sum(v * v) AS HUGEINT) AS ss
      |  FROM e GROUP BY 1)
      |SELECT e.event_type, CAST(max(st.n) AS BIGINT) AS n_events,
      |       CAST(count(*) FILTER (WHERE 4 * (st.n * e.v - st.s) * (st.n * e.v - st.s)
      |                                   > 9 * (st.n * st.ss - st.s * st.s)) AS BIGINT)
      |         AS n_gt_1p5_sigma,
      |       CAST(count(*) FILTER (WHERE (st.n * e.v - st.s) * (st.n * e.v - st.s)
      |                                   > 9 * (st.n * st.ss - st.s * st.s)) AS BIGINT)
      |         AS n_gt_3_sigma
      |FROM e JOIN st USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val e = Tables(s, dir, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("v"))
    val st = e.groupBy(col("event_type"))
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("v").cast(dec)).as("s"),
        sum((col("v") * col("v")).cast(dec)).as("ss"))
    val dev = col("n") * col("v").cast(dec) - col("s")
    val varTerm = col("n") * col("ss") - col("s") * col("s")
    e.join(broadcast(st), "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("n")).cast("long").as("n_events"),
        count_if(lit(4).cast(dec) * dev * dev > lit(9).cast(dec) * varTerm)
          .as("n_gt_1p5_sigma"),
        count_if(dev * dev > lit(9).cast(dec) * varTerm).as("n_gt_3_sigma"))
      .orderBy(col("event_type"))
  }

  /** q140: unpivot / melt — the inverse of q28's pivot: the four lineitem
    * measures become (metric, value) rows, then a long-format rollup per
    * (returnflag, metric). Uses Spark's NATIVE `Dataset.unpivot` (planned
    * as an Expand — a map-side row multiplier with zero shuffle), not a
    * union of four scans like the SQL rendering: one pass over lineitem,
    * 4× rows out of Expand, collapsed by partial aggregation BEFORE the
    * single shuffle. At 100 TB melt-by-union is four full scans; this is
    * one — same reason ANALYZE-style multi-column stats use Expand. Sums
    * accumulate in exact DECIMAL (the Q.dsum6 parity rule). */
  val q140Unpivot: Q = Q(
    "q140_unpivot",
    s"""WITH m AS (
       |  SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
       |  UNION ALL
       |  SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
       |  UNION ALL
       |  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
       |  UNION ALL
       |  SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
       |SELECT l_returnflag, metric, count(*) AS n,
       |       ${Q.oSum6("value")} AS sum_value
       |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax")),
        "metric", "value")
      .groupBy(col("l_returnflag"), col("metric"))
      .agg(count(lit(1)).as("n"), Q.dsum6(col("value")).as("sum_value"))
      .orderBy(col("l_returnflag"), col("metric"))
  }

  /** q147: group-wise EXACT discrete quantiles at scale — the SLO
    * percentile kernel (p50/p90/p99 per event_type) computed without a
    * per-group sorted array: rows reduce to (group, value, count) LEVELS
    * map-side, one cumulative window runs PARTITIONED by group over the
    * levels, and quantile q = min value whose cumulative count reaches
    * ⌈q·n⌉ (the rank test is 100·cum ≥ q100·n in integers — no float
    * rank). q25's `percentile` holds each group's values in one
    * aggregation buffer; this form's state is the level table, partial-
    * aggregated and spillable, and groups parallelize independently —
    * the difference between "fits in one buffer" and 100 TB. Values are
    * exact cents; discrete (lower-value) semantics, so results are actual
    * data values and engine-identical. */
  val q147GroupQuantiles: Q = Q(
    "q147_group_quantiles",
    """WITH lv AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, v,
      |         sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,
      |         sum(c) OVER (PARTITION BY event_type) AS n
      |  FROM lv)
      |SELECT event_type,
      |       min(CASE WHEN 100 * cum >= 50 * n THEN v END) AS p50_cents,
      |       min(CASE WHEN 100 * cum >= 90 * n THEN v END) AS p90_cents,
      |       min(CASE WHEN 100 * cum >= 99 * n THEN v END) AS p99_cents
      |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val lv = Tables(s, dir, "events")
      .groupBy(col("event_type"), round(col("value") * 100).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val byType = Window.partitionBy(col("event_type"))
    val cum = lv.select(col("event_type"), col("v"),
      sum(col("c")).over(byType.orderBy(col("v"))).as("cum"),
      sum(col("c")).over(byType).as("n"))
    cum.groupBy(col("event_type"))
      .agg(
        min(when(lit(100) * col("cum") >= lit(50) * col("n"), col("v"))).as("p50_cents"),
        min(when(lit(100) * col("cum") >= lit(90) * col("n"), col("v"))).as("p90_cents"),
        min(when(lit(100) * col("cum") >= lit(99) * col("n"), col("v"))).as("p99_cents"))
      .orderBy(col("event_type"))
  }

  /** q148: BAG (multiset) set operations — q27 covers the set forms;
    * INTERSECT ALL / EXCEPT ALL respect multiplicities (min / truncated
    * difference of per-key counts), which is what reconciliation between
    * two feeds with legitimate duplicates needs. Spark's native
    * `intersectAll`/`exceptAll` plan this as count-aggregate + generate
    * (no row-pairing join); the fixture doubles even custkeys on one side
    * so multiplicities actually differ. */
  val q148BagSetOps: Q = Q(
    "q148_bag_set_ops",
    """WITH a AS (SELECT o_custkey AS k FROM orders),
      |b AS (SELECT c_custkey AS k FROM customer
      |      UNION ALL
      |      SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0)
      |SELECT 'intersect_all' AS op, count(*) AS n
      |FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b) t1
      |UNION ALL
      |SELECT 'except_all' AS op, count(*) AS n
      |FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b) t2
      |ORDER BY op""".stripMargin) { (s, dir) =>
    val a = Tables(s, dir, "orders").select(col("o_custkey").as("k"))
    val cust = Tables(s, dir, "customer")
    val b = cust.select(col("c_custkey").as("k"))
      .unionByName(cust.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey").as("k")))
    val ia = a.intersectAll(b).agg(count(lit(1)).as("n"))
      .select(lit("intersect_all").as("op"), col("n"))
    val ea = a.exceptAll(b).agg(count(lit(1)).as("n"))
      .select(lit("except_all").as("op"), col("n"))
    ia.unionByName(ea).orderBy(col("op"))
  }

  /** q156: median absolute deviation (MAD) — the robust dispersion
    * estimate that q136's σ-based tails can't give when the data itself
    * is contaminated (one wild outlier inflates σ and hides its peers;
    * the median absolute deviation barely moves). Two composed passes of
    * the q147 level-counting kernel, both exact in integer cents: (1)
    * per-group discrete median via level cumulative ≥ ⌈n/2⌉; (2) the
    * same kernel over |v − median| levels. Output includes the outlier
    * count at the standard |x − med| > 3·MAD fence — pure integer
    * comparison, no consistency-constant float.
    *
    * Scale: each pass is a map-side level reduction + group-partitioned
    * window; the per-group medians re-enter pass 2 as a broadcast. Never
    * a per-group value buffer, never a global window. */
  val q156MadOutliers: Q = Q(
    "q156_mad_outliers",
    """WITH lv AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |med AS (
      |  SELECT event_type, min(v) FILTER (WHERE 2 * cum >= n) AS med
      |  FROM (SELECT event_type, v,
      |               sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,
      |               sum(c) OVER (PARTITION BY event_type) AS n
      |        FROM lv) x
      |  GROUP BY 1),
      |dv AS (
      |  SELECT lv.event_type, abs(lv.v - med.med) AS d, sum(lv.c) AS c
      |  FROM lv JOIN med USING (event_type) GROUP BY 1, 2),
      |mad AS (
      |  SELECT event_type, min(d) FILTER (WHERE 2 * cum >= n) AS mad
      |  FROM (SELECT event_type, d,
      |               sum(c) OVER (PARTITION BY event_type ORDER BY d) AS cum,
      |               sum(c) OVER (PARTITION BY event_type) AS n
      |        FROM dv) x
      |  GROUP BY 1)
      |SELECT m.event_type, med.med AS median_cents, m.mad AS mad_cents,
      |       CAST(coalesce(sum(dv.c) FILTER (WHERE dv.d > 3 * m.mad), 0) AS BIGINT)
      |         AS n_outliers
      |FROM mad m JOIN med USING (event_type) JOIN dv USING (event_type)
      |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    def medianOf(levels: org.apache.spark.sql.DataFrame, vCol: String) = {
      val byG = Window.partitionBy(col("event_type"))
      levels.select(col("event_type"), col(vCol),
          sum(col("c")).over(byG.orderBy(col(vCol))).as("cum"),
          sum(col("c")).over(byG).as("n"))
        .groupBy(col("event_type"))
        .agg(min(when(lit(2) * col("cum") >= col("n"), col(vCol))).as("m"))
    }
    val lv = Tables(s, dir, "events")
      .groupBy(col("event_type"), round(col("value") * 100).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val med = medianOf(lv, "v").withColumnRenamed("m", "med")
    val dv = lv.join(broadcast(med), "event_type")
      .groupBy(col("event_type"), abs(col("v") - col("med")).as("d"))
      .agg(sum(col("c")).as("c"))
    val mad = medianOf(dv, "d").withColumnRenamed("m", "mad")
    dv.join(broadcast(mad), "event_type").join(broadcast(med), "event_type")
      .groupBy(col("event_type"), col("med").as("median_cents"),
        col("mad").as("mad_cents"))
      .agg(coalesce(sum(when(col("d") > lit(3) * col("mad"), col("c"))), lit(0L))
        .cast("long").as("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** q159: sketch MERGEABILITY audit — the pattern that makes distinct
    * counts tractable at 100 TB: build one DataSketches HLL per day
    * (`hll_sketch_agg`), union the stored sketches (`hll_union_agg`)
    * instead of rescanning history, and estimate. The audit computes the
    * EXACT distinct count alongside and asserts the merged estimate lands
    * within ±5% — far outside lgK=12's ~1.6% RSE, so the claim is robust;
    * the sketch pipeline is deterministic for a fixed input multiset
    * (hash-based, merge-order-insensitive). The oracle checks the exact
    * side and the claim; the estimate itself stays Spark-internal (DuckDB
    * has no DataSketches HLL to cross-check bytes against).
    *
    * Scale: per-day sketches are the STORED artifact (a few KB each);
    * month/quarter rollups union sketches, never raw rows. */
  val q159SketchMerge: Q = Q(
    "q159_sketch_merge",
    """SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      |       true AS within_5pct
      |FROM events""".stripMargin) { (s, dir) =>
    val ev = Tables(s, dir, "events")
    val daily = ev.groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = daily.agg(count(lit(1)).as("n_days"),
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = ev.agg(countDistinct(col("user_id")).as("exact_users"))
    merged.crossJoin(exact)
      .select(col("n_days"), col("exact_users"),
        (abs(col("est") - col("exact_users")) * 100
          <= lit(5) * col("exact_users")).as("within_5pct"))
  }

  /** q162: relative-rank windows — percent_rank and cume_dist round out
    * the rank family (q11 rank/dense_rank, q119 ntile): both are exact
    * rationals evaluated as one integer-division-free double each
    * ((rank−1)/(n−1), cum/n — identical IEEE results in both engines),
    * over the per-group ordered window. */
  val q162RelativeRank: Q = Q(
    "q162_relative_rank",
    """SELECT l_returnflag, l_orderkey, l_linenumber,
      |       round(percent_rank() OVER w, 6) AS pr,
      |       round(cume_dist() OVER w, 6) AS cd
      |FROM lineitem
      |WHERE l_orderkey % 61 = 0
      |WINDOW w AS (PARTITION BY l_returnflag
      |             ORDER BY l_quantity, l_orderkey, l_linenumber)
      |ORDER BY l_returnflag, l_quantity, l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    // Presentation sort = the window's own total order: (orderkey,
    // linenumber) alone is NOT unique in this data (duplicate pairs with
    // different quantities exist), and any residual full-row ties share
    // their rank, so pr/cd are identical however they interleave.
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
    Tables(s, dir, "lineitem")
      .filter(col("l_orderkey") % 61 === 0)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy(col("l_returnflag"), col("l_quantity"), col("l_orderkey"),
        col("l_linenumber"))
  }

  /** q163: group-wise MODE with pinned ties — the most frequent value per
    * group, ties broken to the SMALLEST value. Neither engine's built-in
    * mode() documents tie order, so both sides render the same explicit
    * kernel: level counts, then max_by over a single composite key
    * c·10⁹ − v (count major, SMALLER value wins ties; 10⁹ > any cents
    * level so the components can't interleave) — deterministic by
    * construction, immune to either engine changing its tie whim. Two
    * map-side-combining aggregates, no window. The key packing is only
    * valid for 0 ≤ v < 10⁹, so BOTH engines raise on a level outside
    * that range rather than silently interleaving the components — a
    * data drop with negative or ≥ $10M values fails loudly. */
  val q163GroupMode: Q = Q(
    "q163_group_mode",
    """WITH lv AS (
      |  SELECT event_type,
      |         CASE WHEN round(value * 100) IS NULL
      |                OR round(value * 100) BETWEEN 0 AND 999999999
      |              THEN CAST(round(value * 100) AS BIGINT)
      |              ELSE CAST(error('q163: cents level outside composite-key bounds')
      |                        AS BIGINT) END AS v,
      |         count(*) AS c
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type,
      |       max_by(v, c * 1000000000 - v) AS mode_cents,
      |       CAST(max(c) AS BIGINT) AS mode_count
      |FROM lv GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val cents = round(col("value") * 100).cast("long")
    Tables(s, dir, "events")
      // NULL passes through (it groups as its own level, as before the
      // guard); only a NON-NULL level outside [0, 1e9) aborts.
      .groupBy(col("event_type"),
        when(cents.isNull || cents.between(0L, 999999999L), cents)
          .otherwise(raise_error(concat(
            lit("q163: cents level outside composite-key bounds: "),
            cents.cast("string")))).as("v"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(max_by(col("v"), col("c") * 1000000000L - col("v")).as("mode_cents"),
        max(col("c")).cast("long").as("mode_count"))
      .orderBy(col("event_type"))
  }

  /** q164: Gini coefficient of revenue concentration — "what share of
    * revenue sits with the top customers" as one audited number. The
    * rank-sum formula G = (2·Σrᵢxᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) is computed
    * ENTIRELY in integers: per-customer totals reduce to (value, count)
    * levels; the level's rank mass Σr = c·cum_prev + c(c+1)/2 is an
    * arithmetic series off the two-phase cumulative (q135's bucket-offset
    * window — no global window over customers); ties share the series, so
    * duplicate totals can't skew either engine. Gini ships as ppm via one
    * integer division (DECIMAL(38,0) guards n·Σx·10⁶ at any scale).
    *
    * Scale: customer totals → levels → ~#bucket window → 3 scalars. */
  val q164GiniConcentration: Q = Q(
    "q164_gini_concentration",
    """WITH tot AS (
      |  SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
      |                         AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |lv AS (SELECT v, count(*) AS c FROM tot GROUP BY 1),
      |bk AS (SELECT CAST(floor(v / 1000000.0) AS BIGINT) AS b, v, c FROM lv),
      |bs AS (SELECT b, sum(c) AS s FROM bk GROUP BY 1),
      |off AS (SELECT b, sum(s) OVER (ORDER BY b) - s AS o FROM bs),
      |cum AS (
      |  SELECT v, c,
      |         o + sum(c) OVER (PARTITION BY bk.b ORDER BY v) - c AS cp
      |  FROM bk JOIN off USING (b)),
      |agg AS (
      |  SELECT CAST(sum(c) AS HUGEINT) AS n,
      |         CAST(sum(CAST(v AS HUGEINT) * c) AS HUGEINT) AS s0,
      |         CAST(sum(CAST(v AS HUGEINT) * (c * cp + c * (c + 1) // 2))
      |              AS HUGEINT) AS s1
      |  FROM cum)
      |SELECT CAST(n AS BIGINT) AS n_customers,
      |       CAST(s0 AS BIGINT) AS total_cents,
      |       CAST((2 * s1 - (n + 1) * s0) * 1000000 // (n * s0) AS BIGINT)
      |         AS gini_ppm
      |FROM agg""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val tot = Tables(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).cast("long").as("v"))
    val lv = tot.groupBy(col("v")).agg(count(lit(1)).as("c"))
      .withColumn("b", floor(col("v") / 1000000.0))
    val bs = lv.groupBy(col("b")).agg(sum(col("c")).as("s"))
    val off = bs.select(col("b"),
      (sum(col("s")).over(Window.orderBy(col("b"))) - col("s")).as("o"))
    val cum = lv.join(off, "b")
      .select(col("v"), col("c"),
        (col("o") + sum(col("c"))
          .over(Window.partitionBy(col("b")).orderBy(col("v"))) - col("c"))
          .as("cp"))
    cum.agg(
        sum(col("c")).cast(dec).as("n"),
        sum(col("v").cast(dec) * col("c")).as("s0"),
        sum(col("v").cast(dec)
          * (col("c") * col("cp") + expr("c * (c + 1) div 2"))).as("s1"))
      .select(col("n"), col("s0"),
        ((lit(2).cast(dec) * col("s1") - (col("n") + 1) * col("s0"))
          * lit(1000000).cast(dec)).as("num"),
        (col("n") * col("s0")).as("den"))
      // `div` (IntegralDivide) on decimals truncates the EXACT quotient —
      // a decimal `/` would round half-up at scale 6 first, which can
      // cross an integer boundary the oracle's `//` floor never crosses.
      .select(col("n").cast("long").as("n_customers"),
        col("s0").cast("long").as("total_cents"),
        expr("num div den").cast("long").as("gini_ppm"))
  }

  /** q166: A/B test readout — the two-proportion z-test, sqrt-free: with
    * variants by user parity and conversion = "made a purchase", the
    * α=0.05 decision z² > 1.96² cross-multiplies to
    * 10⁴·(x1·n2 − x2·n1)²·N > 38416·X·(N−X)·n1·n2 (N=n1+n2, X=x1+x2) —
    * exact 128-bit integers, so the verdict can never hinge on two libms'
    * sqrt. Rates ship as ppm via integer division. The q135/q136 family
    * discipline applied to experimentation analytics.
    *
    * Scale: users reduce map-side to one (variant, converted) pair each,
    * then to TWO rows. Everything after is scalar. */
  val q166AbTest: Q = Q(
    "q166_ab_test",
    s"""WITH u0 AS (
      |  SELECT user_id,
      |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY 1),
      |um AS (SELECT user_id, conv,
      |              md5(CAST(user_id AS VARCHAR) || '-graft-ab') AS m
      |       FROM u0),
      |u AS (SELECT user_id, (${PortableHash.hexHeadToLong("m", "strpos")}) % 2
      |               AS variant, conv
      |      FROM um),
      |v AS (SELECT variant, count(*) AS n, sum(conv) AS x FROM u GROUP BY 1),
      |w AS (SELECT max(CASE WHEN variant = 0 THEN n END) AS n1,
      |             max(CASE WHEN variant = 0 THEN x END) AS x1,
      |             max(CASE WHEN variant = 1 THEN n END) AS n2,
      |             max(CASE WHEN variant = 1 THEN x END) AS x2
      |      FROM v)
      |SELECT CAST(n1 AS BIGINT) AS n_a, CAST(x1 AS BIGINT) AS conv_a,
      |       CAST(n2 AS BIGINT) AS n_b, CAST(x2 AS BIGINT) AS conv_b,
      |       CAST(x1 * 1000000 // n1 AS BIGINT) AS rate_a_ppm,
      |       CAST(x2 * 1000000 // n2 AS BIGINT) AS rate_b_ppm,
      |       CAST(10000 AS HUGEINT) * (x1 * n2 - x2 * n1) * (x1 * n2 - x2 * n1)
      |         * (n1 + n2)
      |         > CAST(38416 AS HUGEINT) * (x1 + x2) * (n1 + n2 - x1 - x2)
      |           * n1 * n2 AS significant
      |FROM w""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val v = Tables(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
      .withColumn("m",
        md5(concat(col("user_id").cast("string"), lit("-graft-ab"))))
      .groupBy((expr(PortableHash.hexHeadToLong("m", "instr")) % 2).as("variant"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("x"))
    val w = v.agg(
      max(when(col("variant") === 0, col("n"))).as("n1"),
      max(when(col("variant") === 0, col("x"))).as("x1"),
      max(when(col("variant") === 1, col("n"))).as("n2"),
      max(when(col("variant") === 1, col("x"))).as("x2"))
    val d = (col("x1") * col("n2") - col("x2") * col("n1")).cast(dec)
    w.select(col("n1").cast("long").as("n_a"), col("x1").cast("long").as("conv_a"),
      col("n2").cast("long").as("n_b"), col("x2").cast("long").as("conv_b"),
      expr("x1 * 1000000 div n1").cast("long").as("rate_a_ppm"),
      expr("x2 * 1000000 div n2").cast("long").as("rate_b_ppm"),
      (lit(10000).cast(dec) * d * d * (col("n1") + col("n2")).cast(dec)
        > lit(38416).cast(dec) * (col("x1") + col("x2")).cast(dec)
          * (col("n1") + col("n2") - col("x1") - col("x2")).cast(dec)
          * col("n1").cast(dec) * col("n2").cast(dec)).as("significant"))
  }

  /** q167: audience-overlap matrix — pairwise Jaccard between event
    * types' USER SETS ("how much does the click audience overlap the
    * purchase audience"). Distinct (type, user) pairs self-join on user
    * for intersection sizes; |A∪B| = |A|+|B|−|A∩B|; Jaccard ships as ppm
    * by integer division. Upper triangle only (a < b), ordered pairs.
    *
    * Scale: the self-join runs on the DEDUPED (type, user) table —
    * per-user type lists are tiny (≤ #types), so the join output is
    * bounded by Σ_user types(u)², not rows². */
  val q167AudienceOverlap: Q = Q(
    "q167_audience_overlap",
    """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
      |sz AS (SELECT event_type, count(*) AS n FROM tu GROUP BY 1),
      |ix AS (
      |  SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS i
      |  FROM tu a JOIN tu b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT ix.ta, ix.tb, CAST(ix.i AS BIGINT) AS n_both,
      |       CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
      |       CAST(ix.i * 1000000 // (sa.n + sb.n - ix.i) AS BIGINT)
      |         AS jaccard_ppm
      |FROM ix JOIN sz sa ON ix.ta = sa.event_type
      |        JOIN sz sb ON ix.tb = sb.event_type
      |ORDER BY ta, tb""".stripMargin) { (s, dir) =>
    val tu = Tables(s, dir, "events")
      .select(col("event_type"), col("user_id")).distinct()
    val sz = tu.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val ix = tu.as("a").join(tu.as("b"),
      col("a.user_id") === col("b.user_id") &&
        col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
      .agg(count(lit(1)).as("i"))
    ix.join(broadcast(sz.withColumnsRenamed(Map("event_type" -> "ta", "n" -> "na"))), "ta")
      .join(broadcast(sz.withColumnsRenamed(Map("event_type" -> "tb", "n" -> "nb"))), "tb")
      .select(col("ta"), col("tb"), col("i").as("n_both"),
        col("na").as("n_a"), col("nb").as("n_b"),
        expr("i * 1000000 div (na + nb - i)").cast("long").as("jaccard_ppm"))
      .orderBy(col("ta"), col("tb"))
  }

  /** q168: WEIGHTED quantiles — "the price below which half the shipped
    * VOLUME sits" (weight = quantity), not half the line items: the q147
    * level kernel with the cumulative running over summed weights. Same
    * exactness story: integer cents, integer weights, rank test
    * 100·cumw ≥ q·W. */
  val q168WeightedQuantiles: Q = Q(
    "q168_weighted_quantiles",
    """WITH lv AS (
      |  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
      |         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS wt
      |  FROM lineitem GROUP BY 1, 2),
      |cum AS (
      |  SELECT l_returnflag, v,
      |         sum(wt) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw,
      |         sum(wt) OVER (PARTITION BY l_returnflag) AS tw
      |  FROM lv)
      |SELECT l_returnflag,
      |       min(CASE WHEN 100 * cw >= 50 * tw THEN v END) AS wp50_cents,
      |       min(CASE WHEN 100 * cw >= 90 * tw THEN v END) AS wp90_cents
      |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val lv = Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("v"))
      .agg(sum(round(col("l_quantity")).cast("long")).cast("long").as("wt"))
    val byG = Window.partitionBy(col("l_returnflag"))
    lv.select(col("l_returnflag"), col("v"),
        sum(col("wt")).over(byG.orderBy(col("v"))).as("cw"),
        sum(col("wt")).over(byG).as("tw"))
      .groupBy(col("l_returnflag"))
      .agg(
        min(when(lit(100) * col("cw") >= lit(50) * col("tw"), col("v")))
          .as("wp50_cents"),
        min(when(lit(100) * col("cw") >= lit(90) * col("tw"), col("v")))
          .as("wp90_cents"))
      .orderBy(col("l_returnflag"))
  }

  /** q176: Lorenz concentration points — q164's Gini as the three numbers
    * an exec actually asks for: what revenue share do the top 1% / 10% /
    * 50% of customers hold. Customers reduce to (total, count) levels,
    * the DESC cumulative runs through the two-phase bucket-offset window,
    * and a level straddling the top-k boundary contributes PARTIALLY —
    * v·(min(cc, k) − min(cc−c, k)), exact because customers within a
    * level are identical. k = ⌈n·p/100⌉ and shares ship as integer ppm;
    * no floats anywhere.
    *
    * Scale: same as q164 — levels, a ~#buckets window, then scalars. */
  val q176LorenzPoints: Q = Q(
    "q176_lorenz_points",
    """WITH tot AS (
      |  SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
      |                         AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |lv AS (SELECT v, count(*) AS c FROM tot GROUP BY 1),
      |bk AS (SELECT CAST(floor(v / 1000000.0) AS BIGINT) AS b, v, c FROM lv),
      |bs AS (SELECT b, sum(c) AS s FROM bk GROUP BY 1),
      |off AS (SELECT b, sum(s) OVER (ORDER BY b DESC) - s AS o FROM bs),
      |cum AS (
      |  SELECT v, c, o + sum(c) OVER (PARTITION BY bk.b ORDER BY v DESC) AS cc
      |  FROM bk JOIN off USING (b)),
      |t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
      |             CAST(sum(CAST(v AS HUGEINT) * c) AS HUGEINT) AS s0 FROM lv),
      |pts AS (
      |  SELECT p, (t.n * p + 99) // 100 AS k FROM (VALUES (1), (10), (50)) v(p)
      |  CROSS JOIN t)
      |SELECT CAST(pts.p AS BIGINT) AS top_pct, CAST(pts.k AS BIGINT) AS k_customers,
      |       CAST(sum(CAST(cum.v AS HUGEINT)
      |              * (least(cum.cc, pts.k) - least(cum.cc - cum.c, pts.k)))
      |            * 1000000 // max(t.s0) AS BIGINT) AS share_ppm
      |FROM cum CROSS JOIN pts CROSS JOIN t
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val tot = Tables(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).cast("long").as("v"))
    val lv = tot.groupBy(col("v")).agg(count(lit(1)).as("c"))
      .withColumn("b", floor(col("v") / 1000000.0))
    val bs = lv.groupBy(col("b")).agg(sum(col("c")).as("s"))
    val off = bs.select(col("b"),
      (sum(col("s")).over(Window.orderBy(col("b").desc)) - col("s")).as("o"))
    val cum = lv.join(off, "b")
      .select(col("v"), col("c"),
        (col("o") + sum(col("c"))
          .over(Window.partitionBy(col("b")).orderBy(col("v").desc))).as("cc"))
    val t = lv.agg(sum(col("c")).cast("long").as("n"),
      sum(col("v").cast(dec) * col("c")).as("s0"))
    val pts = s.createDataFrame(Seq(Tuple1(1L), Tuple1(10L), Tuple1(50L)))
      .toDF("p").crossJoin(broadcast(t))
      .select(col("p"), expr("(n * p + 99) div 100").as("k"), col("s0"))
    cum.crossJoin(broadcast(pts))
      .groupBy(col("p").as("top_pct"), col("k").as("k_customers"))
      .agg(sum(col("v").cast(dec)
          * (least(col("cc"), col("k")) - least(col("cc") - col("c"), col("k")))
            .cast(dec)).as("top_rev"),
        max(col("s0")).as("s0max"))
      .select(col("top_pct"), col("k_customers"),
        expr("(top_rev * 1000000) div s0max").cast("long").as("share_ppm"))
      .orderBy(col("top_pct"))
  }

  /** q205: Pareto point — q176 answers "what share do the top p% hold";
    * this inverts it: the SMALLEST number of customers covering 80% of
    * revenue (the "how concentrated is the book really" number). Levels
    * DESC with the two-phase cumulative carry BOTH running count and
    * running revenue; the boundary level contributes partial customers:
    * k = cc_prev + ceil((target − crev_prev) / v) on the first level
    * where 5·crev ≥ 4·total — all integer. */
  val q205ParetoPoint: Q = Q(
    "q205_pareto_point",
    """WITH tot AS (
      |  SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
      |                         AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |lv AS (SELECT v, count(*) AS c FROM tot GROUP BY 1),
      |bk AS (SELECT CAST(floor(v / 1000000.0) AS BIGINT) AS b, v, c FROM lv),
      |bs AS (SELECT b, sum(c) AS sc, sum(v * c) AS sv FROM bk GROUP BY 1),
      |off AS (SELECT b, sum(sc) OVER (ORDER BY b DESC) - sc AS oc,
      |               sum(sv) OVER (ORDER BY b DESC) - sv AS ov FROM bs),
      |cum AS (
      |  SELECT v, c,
      |         oc + sum(c) OVER (PARTITION BY bk.b ORDER BY v DESC) AS cc,
      |         ov + sum(v * c) OVER (PARTITION BY bk.b ORDER BY v DESC) AS crev
      |  FROM bk JOIN off USING (b)),
      |t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
      |             CAST(sum(v * c) AS BIGINT) AS total FROM lv),
      |hit AS (
      |  SELECT cum.v, cum.c, cum.cc, cum.crev, t.n, t.total
      |  FROM cum CROSS JOIN t
      |  WHERE 5 * cum.crev >= 4 * t.total
      |  ORDER BY cum.v DESC LIMIT 1)
      |SELECT n AS n_customers, total AS total_cents,
      |       CAST(cc - c + ((4 * total + 4) // 5 - (crev - v * c) + v - 1) // v
      |            AS BIGINT) AS k_for_80pct
      |FROM hit""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val tot = Tables(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).cast("long").as("v"))
    val lv = tot.groupBy(col("v")).agg(count(lit(1)).as("c"))
      .withColumn("b", floor(col("v") / 1000000.0))
    val bs = lv.groupBy(col("b"))
      .agg(sum(col("c")).as("sc"), sum(col("v") * col("c")).as("sv"))
    val wd = Window.orderBy(col("b").desc)
    val off = bs.select(col("b"),
      (sum(col("sc")).over(wd) - col("sc")).as("oc"),
      (sum(col("sv")).over(wd) - col("sv")).as("ov"))
    val byB = Window.partitionBy(col("b")).orderBy(col("v").desc)
    val cum = lv.join(off, "b")
      .select(col("v"), col("c"),
        (col("oc") + sum(col("c")).over(byB)).as("cc"),
        (col("ov") + sum(col("v") * col("c")).over(byB)).as("crev"))
    val t = lv.agg(sum(col("c")).cast("long").as("n"),
      sum(col("v") * col("c")).cast("long").as("total"))
    cum.crossJoin(broadcast(t))
      .filter(lit(5) * col("crev") >= lit(4) * col("total"))
      .orderBy(col("v").desc).limit(1)
      .select(col("n").as("n_customers"), col("total").as("total_cents"),
        expr("cc - c + ((4 * total + 4) div 5 - (crev - v * c) + v - 1) div v")
          .cast("long").as("k_for_80pct"))
  }

  /** q254: MERGEABLE quantiles via KLL sketches — the capability q43's
    * `approx_percentile` audit lacks: approx_percentile's buffer is not a
    * publishable artifact, so percentiles can't be pre-aggregated per
    * shard/day and combined later. DataSketches KLL sketches CAN: here
    * each order-parity "shard" of lineitem builds its own per-returnflag
    * sketch (the pre-aggregation a 1000-executor fleet would publish
    * per partition-day), `kll_merge_agg_double` folds the shard sketches,
    * and the merged sketch's p50/p90 are verified by q43's rank-counting
    * discipline against the FULL data — proving the merge preserved the
    * rank guarantee across shards (default k=200 → rank error ≈ 1.65%;
    * the ±5%-rank window is ≈3ε). Exact counts hash-gate; booleans carry
    * the envelope. At 100 TB this is how percentile dashboards avoid
    * re-scanning history: day-grain sketches are kilobytes, merge is
    * associative, and this gate is the correctness proof for that
    * pipeline shape. */
  val q254KllMergeQuantiles: Q = Q(
    "q254_kll_merge_quantiles",
    """SELECT l_returnflag, count(*) AS n, true AS p50_ok, true AS p90_ok
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val li = Tables(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_extendedprice"))
    // Shard-grain sketches (the published per-day artifacts)...
    val shard = li.groupBy(col("l_returnflag"), (col("l_orderkey") % 2).as("p"))
      .agg(expr("kll_sketch_agg_double(l_extendedprice)").as("sk"))
    // ...merged per group, quantiles read from the MERGED sketch only.
    val merged = shard.groupBy(col("l_returnflag"))
      .agg(expr("kll_merge_agg_double(sk)").as("msk"))
      .select(col("l_returnflag"),
        expr("kll_sketch_get_quantile_double(msk, 0.5)").as("q50"),
        expr("kll_sketch_get_quantile_double(msk, 0.9)").as("q90"))
    li.join(broadcast(merged), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        count_if(col("l_extendedprice") <= col("q50")).as("le50"),
        count_if(col("l_extendedprice") < col("q50")).as("lt50"),
        count_if(col("l_extendedprice") <= col("q90")).as("le90"),
        count_if(col("l_extendedprice") < col("q90")).as("lt90"))
      .select(col("l_returnflag"), col("n"),
        (col("le50") >= col("n") * 0.45 && col("lt50") <= col("n") * 0.55)
          .as("p50_ok"),
        (col("le90") >= col("n") * 0.85 && col("lt90") <= col("n") * 0.95)
          .as("p90_ok"))
      .orderBy(col("l_returnflag"))
  }

  /** q283: shuffle-key SKEW audit — the measurement that decides whether
    * a join/aggregation key needs the q149/q42 salting machinery BEFORE
    * a 100 TB run discovers it as one straggler reducer. Over the
    * l_partkey key of lineitem: per-key-count distribution (p50/p99/max
    * by rank counting over COUNT LEVELS — the q115/q164 bounded-level
    * trick, never a window over the key table), the keys breaching the
    * AQE-shaped skew threshold (count > 5× the mean per-partition load
    * at S=32 shuffle partitions: 32·cnt > 5·rows), and for the top-10
    * heaviest keys the integer salt factor ⌈cnt·S/rows⌉ a salted
    * repartition would use. Everything is BIGINT; the two global
    * windows run over bounded reductions (count levels; the
    * already-limited top-10).
    *
    * Scale shape: ONE map-side-combining aggregate to key grain; levels,
    * rollups, and the top-10 TakeOrdered all derive from it (persisted —
    * four consumers); nothing else touches the fact table. */
  val q283SkewAudit: Q = {
    val S = 32 // shuffle partitions the salt recommendation targets
    Q(
      "q283_skew_audit",
      s"""WITH k AS (SELECT l_partkey AS key, CAST(count(*) AS BIGINT) AS cnt
         |           FROM lineitem GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
         |               CAST(sum(cnt) AS BIGINT) AS n_rows,
         |               CAST(max(cnt) AS BIGINT) AS max_cnt FROM k),
         |lv AS (SELECT cnt, CAST(count(*) AS BIGINT) AS c FROM k GROUP BY 1),
         |cdf AS (SELECT cnt, CAST(sum(c) OVER (ORDER BY cnt) AS BIGINT) AS cum
         |        FROM lv),
         |p50 AS (SELECT min(cnt) AS p50_cnt FROM cdf, tot
         |        WHERE 100 * cum >= 50 * n_keys),
         |p99 AS (SELECT min(cnt) AS p99_cnt FROM cdf, tot
         |        WHERE 100 * cum >= 99 * n_keys),
         |sk AS (SELECT CAST(count(*) AS BIGINT) AS n_skewed FROM k, tot
         |       WHERE $S * cnt > 5 * n_rows),
         |top AS (SELECT key, cnt,
         |               CAST(row_number() OVER (ORDER BY cnt DESC, key)
         |                    AS BIGINT) AS rank
         |        FROM k QUALIFY rank <= 10)
         |SELECT rank, key, cnt,
         |       1000000 * cnt // n_rows AS share_ppm,
         |       greatest(1, (cnt * $S + n_rows - 1) // n_rows) AS salt_rec,
         |       n_keys, n_rows, max_cnt, p50_cnt, p99_cnt, n_skewed
         |FROM top, tot, p50, p99, sk ORDER BY rank""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val k = Tables(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("key"))
        .agg(count(lit(1)).as("cnt"))
        .persist(MEMORY_AND_DISK)
      val tot = k.agg(count(lit(1)).as("n_keys"),
        sum(col("cnt")).cast("long").as("n_rows"),
        max(col("cnt")).as("max_cnt"))
      val lv = k.groupBy(col("cnt")).agg(count(lit(1)).as("c"))
      val cdf = lv.select(col("cnt"),
        sum(col("c")).over(Window.orderBy(col("cnt"))).as("cum"))
      val p50 = cdf.crossJoin(broadcast(tot))
        .filter(lit(100) * col("cum") >= lit(50) * col("n_keys"))
        .agg(min(col("cnt")).as("p50_cnt"))
      val p99 = cdf.crossJoin(broadcast(tot))
        .filter(lit(100) * col("cum") >= lit(99) * col("n_keys"))
        .agg(min(col("cnt")).as("p99_cnt"))
      val sk = k.crossJoin(broadcast(tot))
        .filter(lit(S) * col("cnt") > lit(5) * col("n_rows"))
        .agg(count(lit(1)).as("n_skewed"))
      val top = k.orderBy(col("cnt").desc, col("key")).limit(10)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("cnt").desc, col("key")))
            .cast("long"))
      top.crossJoin(broadcast(tot)).crossJoin(broadcast(p50))
        .crossJoin(broadcast(p99)).crossJoin(broadcast(sk))
        .select(col("rank"), col("key"), col("cnt"),
          expr("(CAST(1000000 AS BIGINT) * cnt) div n_rows").as("share_ppm"),
          greatest(lit(1L),
            expr(s"(cnt * $S + n_rows - 1) div n_rows")).as("salt_rec"),
          col("n_keys"), col("n_rows"), col("max_cnt"), col("p50_cnt"),
          col("p99_cnt"), col("n_skewed"))
        .orderBy(col("rank"))
    }
  }

  /** q299: quantile-normalization mapping table — the distribution
    * aligner an ML feature pipeline applies when per-group value
    * distributions drift (batch effects, per-source score calibration,
    * bias correction): for each group and decile, the group's decile
    * value, the POOLED distribution's value at the same decile, and the
    * shift between them. Downstream the table broadcasts and a map-side
    * lookup replaces each value with its pooled equivalent — this query
    * builds the table, which is the part that touches the data.
    *
    * Exactness: both decile reads use the rank-selection level kernel
    * (q147's: min level whose cumulative count covers d/10 of the mass)
    * — never an interpolating percentile, so every surfaced value is an
    * integer that exists in the data and the engines agree bit-for-bit.
    *
    * Scale shape: one (group, cents-level) aggregate feeds the per-group
    * kernel (partitioned windows); the pooled kernel re-aggregates the
    * SAME level table to value grain — map-side combine on a
    * levels-bounded input, with its global cum window on value levels
    * (allow-listed bounded reduction). The decile expansion is a
    * broadcast 10-row cross join. Nothing row-scale ever sorts. */
  val q299QuantileNormalize: Q = Q(
    "q299_quantile_normalize",
    """WITH lv AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |cumg AS (
      |  SELECT event_type, v,
      |         sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,
      |         sum(c) OVER (PARTITION BY event_type) AS n
      |  FROM lv),
      |pool AS (SELECT v, sum(c) AS c FROM lv GROUP BY 1),
      |cump AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum,
      |                sum(c) OVER () AS n
      |         FROM pool),
      |d AS (SELECT unnest(generate_series(1, 10)) AS decile),
      |gq AS (SELECT event_type, decile, min(v) AS group_cents
      |       FROM cumg CROSS JOIN d WHERE 10 * cum >= decile * n
      |       GROUP BY 1, 2),
      |pq AS (SELECT decile, min(v) AS pooled_cents
      |       FROM cump CROSS JOIN d WHERE 10 * cum >= decile * n
      |       GROUP BY 1)
      |SELECT gq.event_type, CAST(gq.decile AS BIGINT) AS decile,
      |       gq.group_cents, pq.pooled_cents,
      |       gq.group_cents - pq.pooled_cents AS shift_cents
      |FROM gq JOIN pq USING (decile)
      |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val lv = Tables(s, dir, "events")
      .groupBy(col("event_type"), round(col("value") * 100).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val byType = Window.partitionBy(col("event_type"))
    val cumg = lv.select(col("event_type"), col("v"),
      sum(col("c")).over(byType.orderBy(col("v"))).as("cum"),
      sum(col("c")).over(byType).as("n"))
    val cump = lv.groupBy(col("v")).agg(sum(col("c")).as("c"))
      .select(col("v"),
        sum(col("c")).over(Window.orderBy(col("v"))).as("cum"),
        sum(col("c")).over(Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .as("n"))
    val d = s.range(1, 11).select(col("id").as("decile"))
    val gq = cumg.crossJoin(broadcast(d))
      .filter(lit(10) * col("cum") >= col("decile") * col("n"))
      .groupBy(col("event_type"), col("decile"))
      .agg(min(col("v")).as("group_cents"))
    val pq = cump.crossJoin(broadcast(d))
      .filter(lit(10) * col("cum") >= col("decile") * col("n"))
      .groupBy(col("decile")).agg(min(col("v")).as("pooled_cents"))
    gq.join(broadcast(pq), "decile")
      .select(col("event_type"), col("decile"), col("group_cents"),
        col("pooled_cents"),
        (col("group_cents") - col("pooled_cents")).as("shift_cents"))
      .orderBy(col("event_type"), col("decile"))
  }

  /** q304: sample-ratio-mismatch (SRM) check — the experimentation-
    * hygiene gate that must pass BEFORE q166's A/B effect test means
    * anything: if the 50/50 assignment didn't land 50/50, the effect
    * estimate is confounded by whatever broke the split (bot filtering,
    * logging loss, assignment bugs — the classic silent experiment
    * killers). χ² against the expected split reduces, for two cells, to
    * (n_a − n_b)²/n — held in HUGEINT/DECIMAL(38,0) (the difference
    * squares to n² in the worst case, which wraps BIGINT beyond ~3M
    * users — the q275 overflow lesson), surfaced in micro-units with the
    * 95% χ²₁ critical value as an integer-compare flag. Assignment is
    * the portable-hash bucket (q49's split discipline), so both engines
    * derive the identical enrollment.
    *
    * Scale shape: one distinct-user aggregate, one 2-row rollup, one
    * broadcast total — the check costs one pass at any population. */
  val q304SrmCheck: Q = {
    val h = PortableHash.hexHeadToLong("m", "strpos")
    Q(
      "q304_srm_check",
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
         |m AS (SELECT user_id,
         |             md5(CAST(user_id AS VARCHAR) || '-graft-ab') AS m
         |      FROM u),
         |a AS (SELECT user_id, ($h) % 2 AS variant FROM m),
         |c AS (SELECT variant, CAST(count(*) AS BIGINT) AS n_users
         |      FROM a GROUP BY 1),
         |t AS (SELECT CAST(coalesce(sum(CASE WHEN variant = 0 THEN n_users END), 0)
         |               AS HUGEINT) AS na,
         |             CAST(coalesce(sum(CASE WHEN variant = 1 THEN n_users END), 0)
         |               AS HUGEINT) AS nb
         |      FROM c)
         |SELECT CAST(c.variant AS BIGINT) AS variant, c.n_users,
         |       CAST((t.na - t.nb) * (t.na - t.nb) * 1000000 // (t.na + t.nb)
         |            AS BIGINT) AS chi2_micro,
         |       (t.na - t.nb) * (t.na - t.nb) * 1000000
         |         >= 3841459 * (t.na + t.nb) AS srm_flag
         |FROM c, t ORDER BY 1""".stripMargin) { (s, dir) =>
      val assign = Tables(s, dir, "events")
        .select(col("user_id")).distinct()
        .withColumn("m",
          md5(concat(col("user_id").cast("string"), lit("-graft-ab"))))
        .select((expr(PortableHash.hexHeadToLong("m", "instr")) % 2)
          .as("variant"))
      val c = assign.groupBy(col("variant")).agg(count(lit(1)).as("n_users"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val t = c.agg(
        coalesce(sum(when(col("variant") === 0, col("n_users"))), lit(0L))
          .cast("decimal(38,0)").as("na"),
        coalesce(sum(when(col("variant") === 1, col("n_users"))), lit(0L))
          .cast("decimal(38,0)").as("nb"))
      c.crossJoin(broadcast(t))
        .select(col("variant"), col("n_users"),
          expr("CAST((na - nb) * (na - nb) * 1000000 div (na + nb) AS LONG)")
            .as("chi2_micro"),
          expr("(na - nb) * (na - nb) * 1000000 >= 3841459 * (na + nb)")
            .as("srm_flag"))
        .orderBy(col("variant"))
    }
  }

  /** q305: CUPED variance reduction — the third leg of the
    * experimentation trio (q166 effect test, q304 SRM gate): adjust each
    * user's in-experiment metric Y by their PRE-period covariate X,
    * Y' = Y − θ(X − X̄), with θ = cov(X,Y)/var(X). The adjustment
    * removes the between-user variance X explains (routinely 30–50% in
    * practice), tightening the effect CI at zero cost to validity
    * (θ uses pooled data only, so E[Y'_A − Y'_B] = E[Y_A − Y_B]).
    *
    * Exactness: moments ride ×n in HUGEINT/DECIMAL(38,0) (q276's
    * discipline) — num = n·ΣXY − ΣX·ΣY, den = n·ΣX² − (ΣX)² — and θ
    * surfaces as ONE floor division (θ_ppm), after which the adjusted
    * means are a fixed chain of floor divisions both engines execute
    * identically (truncation toward zero, the q194 equivalence; the ppm
    * truncation is part of the operator's published contract). den = 0
    * (constant covariate) yields NULL via nullif, not a crash.
    *
    * Scale shape: one user-grain map-side-combined rollup (pre/post
    * split is a per-row predicate on a broadcast mid-day scalar), one
    * 1-row pooled-moment aggregate broadcast back, one 2-row variant
    * rollup. Nothing beyond user grain ever shuffles. */
  val q305CupedAdjust: Q = {
    val h = PortableHash.hexHeadToLong("m", "strpos")
    Q(
      "q305_cuped_adjust",
      s"""WITH b AS (SELECT (min(CAST(floor(epoch(ts)) AS BIGINT) // 86400)
         |                 + max(CAST(floor(epoch(ts)) AS BIGINT) // 86400) + 1) // 2
         |             AS mid FROM events),
         |u AS (SELECT user_id,
         |             CAST(sum(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) // 86400
         |                            < b.mid
         |                      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
         |               AS BIGINT) AS x,
         |             CAST(sum(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) // 86400
         |                            >= b.mid
         |                      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
         |               AS BIGINT) AS y
         |      FROM events, b GROUP BY 1),
         |um AS (SELECT user_id, x, y,
         |              md5(CAST(user_id AS VARCHAR) || '-graft-ab') AS m
         |       FROM u),
         |a AS (SELECT user_id, x, y, ($h) % 2 AS variant FROM um),
         |pool AS (SELECT CAST(count(*) AS HUGEINT) AS n,
         |                CAST(sum(x) AS HUGEINT) AS sx,
         |                CAST(sum(y) AS HUGEINT) AS sy,
         |                CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         |                CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
         |         FROM a),
         |th AS (SELECT n, sx,
         |              (n * sxy - sx * sy) * 1000000
         |                // nullif(n * sxx - sx * sx, 0) AS theta_ppm
         |       FROM pool),
         |v AS (SELECT variant, CAST(count(*) AS HUGEINT) AS nv,
         |             CAST(sum(x) AS HUGEINT) AS sxv,
         |             CAST(sum(y) AS HUGEINT) AS syv
         |      FROM a GROUP BY 1)
         |SELECT CAST(v.variant AS BIGINT) AS variant,
         |       CAST(v.nv AS BIGINT) AS n_users,
         |       CAST(v.syv * 1000000 // v.nv AS BIGINT) AS mean_y_micro,
         |       CAST(v.sxv * 1000000 // v.nv AS BIGINT) AS mean_x_micro,
         |       CAST(v.syv * 1000000 // v.nv
         |            - th.theta_ppm * (v.sxv * 1000000 // v.nv
         |                              - th.sx * 1000000 // th.n) // 1000000
         |            AS BIGINT) AS adjusted_micro,
         |       CAST(th.theta_ppm AS BIGINT) AS theta_ppm
         |FROM v, th ORDER BY 1""".stripMargin) { (s, dir) =>
      val dec = "decimal(38,0)"
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), expr("unix_timestamp(ts) div 86400").as("day"),
          round(col("value") * 100).cast("long").as("cents"))
      val b = ev.agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
      val u = ev.crossJoin(broadcast(b))
        .groupBy(col("user_id"))
        .agg(sum(when(col("day") < col("mid"), col("cents")).otherwise(0L))
            .as("x"),
          sum(when(col("day") >= col("mid"), col("cents")).otherwise(0L))
            .as("y"))
        .withColumn("m",
          md5(concat(col("user_id").cast("string"), lit("-graft-ab"))))
        .withColumn("variant",
          expr(PortableHash.hexHeadToLong("m", "instr")) % 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pool = u.agg(
        count(lit(1)).cast(dec).as("n"),
        // Cast BEFORE the sum: DuckDB sums BIGINT into HUGEINT, so in the
        // overflow regime a Spark LongType sum would wrap silently while
        // the oracle carries the true value (advice-pass finding).
        sum(col("x").cast(dec)).cast(dec).as("sx"),
        sum(col("y").cast(dec)).cast(dec).as("sy"),
        sum(col("x").cast(dec) * col("y")).cast(dec).as("sxy"),
        sum(col("x").cast(dec) * col("x")).cast(dec).as("sxx"))
      val th = pool.select(col("n"), col("sx"),
        expr("(n * sxy - sx * sy) * 1000000 div nullif(n * sxx - sx * sx, 0)")
          .as("theta_ppm"))
      u.groupBy(col("variant"))
        .agg(count(lit(1)).cast(dec).as("nv"),
          sum(col("x").cast(dec)).cast(dec).as("sxv"),
          sum(col("y").cast(dec)).cast(dec).as("syv"))
        .crossJoin(broadcast(th))
        .select(col("variant").cast("long").as("variant"),
          col("nv").cast("long").as("n_users"),
          expr("CAST(syv * 1000000 div nv AS LONG)").as("mean_y_micro"),
          expr("CAST(sxv * 1000000 div nv AS LONG)").as("mean_x_micro"),
          // theta_ppm is LONG (div's result type); lift it back to
          // decimal BEFORE the multiply — theta·Δx̄ reaches ~10¹⁹ when the
          // covariate is near-constant, which wraps a long*long product
          // while DuckDB's HUGEINT carries it (review-pass finding).
          expr("""CAST(syv * 1000000 div nv
                 - CAST(theta_ppm AS DECIMAL(38,0))
                   * (sxv * 1000000 div nv
                      - sx * 1000000 div n) div 1000000
                 AS LONG)""").as("adjusted_micro"),
          col("theta_ppm").cast("long").as("theta_ppm"))
        .orderBy(col("variant"))
    }
  }

  /** q309: Mann–Whitney U (Wilcoxon rank-sum) — the NONPARAMETRIC leg of
    * the experimentation tier (q166 tests a proportion, q305 adjusts a
    * mean; both assume the metric's scale matters). Here the metric is
    * per-user event count — skewed, integer, tie-heavy — and the test
    * asks only "does variant A stochastically dominate B", which is the
    * robust question when revenue-like metrics have power-law tails.
    *
    * Exactness without per-row ranks: ranks are never materialized at
    * row grain. The metric histogram (one row per distinct value v with
    * total n_v and variant-A count a_v) yields the doubled tied-rank sum
    * R2_A = Σ a_v·(2·c_v + n_v + 1) where c_v is the cumulative count
    * below v — doubling keeps average ranks integral (tied group at
    * min-rank r with size c averages r + (c−1)/2). U, the tie-corrected
    * normal approximation z², and the rank-biserial effect size are then
    * closed-form integer arithmetic in DECIMAL(38,0)/HUGEINT:
    * z² = 3(U2−n1n2)²·n(n−1) / (n1n2·(n³−n−T)), T = Σ(n_v³−n_v), with
    * the α=0.05 decision cross-multiplied (10⁴·num > 38416·den) so the
    * verdict never hinges on a libm sqrt. Both engines truncate integer
    * division toward zero (verified), so the signed rank-biserial ppm is
    * safe. The 38-digit surface carries to ~10⁶ users; beyond that the
    * decision margin dwarfs double rounding and a double path is fine.
    *
    * Scale shape: user-grain rollup (map-side combined), then a
    * histogram whose size is bounded by distinct metric values (≪ rows
    * for counts), then a global window over that bounded reduction
    * (PlanAuditSpec-audited) and a 1-row rollup. */
  val q309MannWhitney: Q = {
    val h = PortableHash.hexHeadToLong("m", "strpos")
    Q(
      "q309_mann_whitney",
      s"""WITH u0 AS (SELECT user_id, CAST(count(*) AS BIGINT) AS v
         |            FROM events GROUP BY 1),
         |um AS (SELECT v, md5(CAST(user_id AS VARCHAR) || '-graft-ab') AS m
         |       FROM u0),
         |u AS (SELECT v, ($h) % 2 AS variant FROM um),
         |hist AS (SELECT v, CAST(count(*) AS HUGEINT) AS nv,
         |                CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)
         |                  AS HUGEINT) AS av
         |         FROM u GROUP BY 1),
         |cum AS (SELECT v, nv, av,
         |               sum(nv) OVER (ORDER BY v) - nv AS c
         |        FROM hist),
         |t AS (SELECT CAST(sum(av) AS HUGEINT) AS n1,
         |             CAST(sum(nv - av) AS HUGEINT) AS n2,
         |             CAST(sum(nv) AS HUGEINT) AS n,
         |             CAST(sum(av * (2 * c + nv + 1)) AS HUGEINT) AS r2,
         |             CAST(sum(nv * nv * nv - nv) AS HUGEINT) AS tt
         |      FROM cum),
         |k AS (SELECT n1, n2, n, r2 - n1 * (n1 + 1) AS u2,
         |             n1 * n2 * (n * n * n - n - tt) AS den
         |      FROM t)
         |SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
         |       CAST(u2 AS BIGINT) AS u_a_x2,
         |       CAST((n1 * n2 - u2) * 1000000 // nullif(n1 * n2, 0) AS BIGINT)
         |         AS rank_biserial_ppm,
         |       CAST(3 * (u2 - n1 * n2) * (u2 - n1 * n2) * n * (n - 1)
         |              * 1000000 // nullif(den, 0) AS BIGINT) AS z2_micro,
         |       10000 * 3 * (u2 - n1 * n2) * (u2 - n1 * n2) * n * (n - 1)
         |         > 38416 * den AS significant
         |FROM k""".stripMargin) { (s, dir) =>
      val dec = "decimal(38,0)"
      val hist = Tables(s, dir, "events")
        .groupBy(col("user_id")).agg(count(lit(1)).as("v"))
        .withColumn("m",
          md5(concat(col("user_id").cast("string"), lit("-graft-ab"))))
        .withColumn("variant", expr(PortableHash.hexHeadToLong("m", "instr")) % 2)
        .groupBy(col("v"))
        .agg(count(lit(1)).cast(dec).as("nv"),
          sum(when(col("variant") === 0, 1L).otherwise(0L)).cast(dec).as("av"))
      val cum = hist.withColumn("c",
        sum(col("nv")).over(Window.orderBy(col("v"))) - col("nv"))
      cum.agg(
          sum(col("av")).cast(dec).as("n1"),
          sum(col("nv") - col("av")).cast(dec).as("n2"),
          sum(col("nv")).cast(dec).as("n"),
          sum(col("av") * (lit(2).cast(dec) * col("c") + col("nv") + 1))
            .cast(dec).as("r2"),
          sum(col("nv") * col("nv") * col("nv") - col("nv")).cast(dec).as("tt"))
        .select(col("n1"), col("n2"), col("n"),
          (col("r2") - col("n1") * (col("n1") + 1)).as("u2"),
          (col("n1") * col("n2") * (col("n") * col("n") * col("n") - col("n")
            - col("tt"))).as("den"))
        .select(col("n1").cast("long").as("n_a"),
          col("n2").cast("long").as("n_b"),
          col("u2").cast("long").as("u_a_x2"),
          expr("CAST((n1 * n2 - u2) * 1000000 div nullif(n1 * n2, 0) AS LONG)")
            .as("rank_biserial_ppm"),
          expr("""CAST(3 * (u2 - n1 * n2) * (u2 - n1 * n2) * n * (n - 1)
                 |     * 1000000 div nullif(den, 0) AS LONG)""".stripMargin)
            .as("z2_micro"),
          expr("""10000 * 3 * (u2 - n1 * n2) * (u2 - n1 * n2) * n * (n - 1)
                 |  > 38416 * den""".stripMargin).as("significant"))
    }
  }

  /** q313: Spearman rank correlation — the rank-based association measure
    * the stats tier lacked: q125 fits a LINE (Pearson-flavored OLS), q309
    * compares two groups' ranks; Spearman asks "is the relationship
    * MONOTONE" between two continuous columns (basket size vs basket
    * value at order grain), robust to outliers and any monotone
    * transform.
    *
    * Exactness without per-row rank windows: q309's doubled-tied-rank
    * histogram kernel, applied per variable — the value histogram yields
    * the centered doubled rank 2·c_v + n_v + 1 − (n+1) (ties averaged,
    * doubling keeps it integral; Σ over rows is exactly 0), rows join
    * their level's rank back by value, and ρ is Pearson on those integer
    * ranks: ρ² in ppm = num²·10⁶/(dx·dy), sign carried separately, the
    * α=0.05 decision as ρ²_ppm·(n−1) > 3841459 (z² = ρ²(n−1) vs χ²₁ —
    * the published contract is the decision on the micro-floored ρ²,
    * q311's discipline). DECIMAL(38,0)/HUGEINT carries num² ≤ n⁶·10⁶ to
    * ~10⁵ orders; beyond that swap the surface to double — the decision
    * margin dwarfs rounding long before 10³⁸ saturates.
    *
    * Scale shape: order-grain rollup (map-side combined), two value-level
    * histograms (≪ rows), two bounded-reduction global windows
    * (PlanAuditSpec-audited, q299's precedent), two level-grain joins
    * back, one 1-row rollup. */
  val q313Spearman: Q = Q(
    "q313_spearman",
    """WITH o AS (SELECT l_orderkey,
      |                  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x,
      |                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      |                    AS BIGINT) AS y
      |           FROM lineitem GROUP BY 1),
      |nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM o),
      |hx AS (SELECT x, CAST(count(*) AS HUGEINT) AS c FROM o GROUP BY 1),
      |cx AS (SELECT x, 2 * (sum(c) OVER (ORDER BY x) - c) + c + 1 - (n + 1)
      |                 AS cxv
      |       FROM hx, nn),
      |hy AS (SELECT y, CAST(count(*) AS HUGEINT) AS c FROM o GROUP BY 1),
      |cy AS (SELECT y, 2 * (sum(c) OVER (ORDER BY y) - c) + c + 1 - (n + 1)
      |                 AS cyv
      |       FROM hy, nn),
      |s AS (SELECT CAST(sum(cxv * cyv) AS HUGEINT) AS num,
      |             CAST(sum(cxv * cxv) AS HUGEINT) AS dx,
      |             CAST(sum(cyv * cyv) AS HUGEINT) AS dy
      |      FROM o JOIN cx USING (x) JOIN cy USING (y))
      |SELECT CAST(nn.n AS BIGINT) AS n,
      |       CAST(s.num AS BIGINT) AS num,
      |       CAST(s.dx AS BIGINT) AS dx, CAST(s.dy AS BIGINT) AS dy,
      |       CAST(CASE WHEN s.num < 0 THEN -1 WHEN s.num > 0 THEN 1 ELSE 0 END
      |         AS BIGINT) AS direction,
      |       CAST(s.num * s.num * 1000000 // nullif(s.dx * s.dy, 0) AS BIGINT)
      |         AS rho2_ppm,
      |       s.num * s.num * 1000000 // nullif(s.dx * s.dy, 0) * (nn.n - 1)
      |         > 3841459 AS significant
      |FROM s, nn""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val o = Tables(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("x"),
        sum(expr("CAST(round(l_extendedprice * 100) AS LONG)")).as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nn = o.agg(count(lit(1)).cast(dec).as("n"))
    def centered(vcol: String, out: String): org.apache.spark.sql.DataFrame =
      o.groupBy(col(vcol)).agg(count(lit(1)).cast(dec).as("c"))
        .crossJoin(broadcast(nn))
        .withColumn(out,
          lit(2).cast(dec)
            * (sum(col("c")).over(Window.orderBy(col(vcol))) - col("c"))
            + col("c") + 1 - (col("n") + 1))
        .select(col(vcol), col(out))
    val sdf = o.join(centered("x", "cxv"), "x").join(centered("y", "cyv"), "y")
      .agg(sum(col("cxv") * col("cyv")).cast(dec).as("num"),
        sum(col("cxv") * col("cxv")).cast(dec).as("dx"),
        sum(col("cyv") * col("cyv")).cast(dec).as("dy"))
    sdf.crossJoin(broadcast(nn))
      .select(col("n").cast("long").as("n"),
        col("num").cast("long").as("num"),
        col("dx").cast("long").as("dx"), col("dy").cast("long").as("dy"),
        signum(col("num")).cast("long").as("direction"),
        expr("CAST(num * num * 1000000 div nullif(dx * dy, 0) AS LONG)")
          .as("rho2_ppm"),
        expr("num * num * 1000000 div nullif(dx * dy, 0) * (n - 1) > 3841459")
          .as("significant"))
  }

  /** q316: Benford first-digit audit — the fraud/data-integrity screen:
    * organically-generated monetary amounts follow Benford's law
    * (P[first digit d] = log₁₀(1+1/d)); fabricated or truncated feeds
    * don't. The audit compares the observed first-significant-digit
    * distribution of order totals against the Benford expectation with a
    * χ² goodness-of-fit (df=8).
    *
    * Exactness: the first digit comes from the cents-integer's decimal
    * string (no leading zeros, no float log); expected proportions are
    * shared milli literals (log₁₀ values rounded once, stated in both
    * renderings); each χ² term is floor((1000·O − e·N)²·10⁶ /
    * (1000·e·N)) in DECIMAL(38,0)/HUGEINT — q311's micro-floored
    * contract. A digit spine (1..9) left-joins the counts so a digit
    * with ZERO observations still contributes its full expected-count
    * term instead of silently vanishing.
    *
    * Scale shape: one map-side-combined 9-row rollup; everything after
    * is constant-size. */
  val q316BenfordAudit: Q = {
    def expMilli(c: String) = s"CASE $c WHEN 1 THEN 301 WHEN 2 THEN 176" +
      " WHEN 3 THEN 125 WHEN 4 THEN 97 WHEN 5 THEN 79 WHEN 6 THEN 67" +
      " WHEN 7 THEN 58 WHEN 8 THEN 51 WHEN 9 THEN 46 END"
    Q(
      "q316_benford_audit",
      s"""WITH v AS (SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100)
         |                    AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS dg
         |           FROM orders WHERE o_totalprice > 0),
         |h AS (SELECT dg, CAST(count(*) AS HUGEINT) AS o FROM v GROUP BY 1),
         |nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM v),
         |sp AS (SELECT CAST(d.d AS BIGINT) AS dg, COALESCE(h.o, 0) AS o,
         |              CAST(${expMilli("d.d")} AS HUGEINT) AS e
         |       FROM range(1, 10) d(d) LEFT JOIN h ON h.dg = d.d),
         |terms AS (SELECT dg, o, e, nn.n,
         |                 (1000 * o - e * nn.n) * (1000 * o - e * nn.n)
         |                   * 1000000 // (1000 * e * nn.n) AS term_micro
         |          FROM sp, nn),
         |s AS (SELECT CAST(sum(term_micro) AS HUGEINT) AS chi2_micro FROM terms)
         |SELECT terms.dg AS digit, CAST(terms.o AS BIGINT) AS n,
         |       CAST(terms.o * 1000000 // terms.n AS BIGINT) AS obs_ppm,
         |       CAST(terms.e AS BIGINT) AS exp_milli,
         |       CAST(terms.term_micro AS BIGINT) AS term_micro,
         |       CAST(s.chi2_micro AS BIGINT) AS chi2_micro,
         |       s.chi2_micro > 15507000 AS significant
         |FROM terms, s ORDER BY digit""".stripMargin) { (s, dir) =>
      val dec = "decimal(38,0)"
      val v = Tables(s, dir, "orders").filter(col("o_totalprice") > 0)
        .select(expr("CAST(substring(CAST(CAST(round(o_totalprice * 100) AS LONG)" +
          " AS STRING), 1, 1) AS LONG)").as("dg"))
      val h = v.groupBy(col("dg")).agg(count(lit(1)).cast(dec).as("o"))
      val nn = v.agg(count(lit(1)).cast(dec).as("n"))
      val spine = s.range(1, 10).select(col("id").cast("long").as("dgs"))
      val sp = spine.join(h, col("dgs") === col("dg"), "left")
        .select(col("dgs").as("dg"),
          coalesce(col("o"), lit(0).cast(dec)).as("o"),
          expr(s"CAST((${expMilli("dgs")}) AS $dec)").as("e"))
      val terms = sp.crossJoin(broadcast(nn))
        .withColumn("term_micro",
          expr("""(1000 * o - e * n) * (1000 * o - e * n) * 1000000
                 |  div (1000 * e * n)""".stripMargin))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sm = terms.agg(sum(col("term_micro")).cast(dec).as("chi2_micro"))
      terms.crossJoin(broadcast(sm))
        .select(col("dg").as("digit"), col("o").cast("long").as("n"),
          expr("CAST(o * 1000000 div n AS LONG)").as("obs_ppm"),
          col("e").cast("long").as("exp_milli"),
          col("term_micro").cast("long").as("term_micro"),
          col("chi2_micro").cast("long").as("chi2_micro"),
          (col("chi2_micro") > lit(15507000L).cast(dec)).as("significant"))
        .orderBy(col("digit"))
    }
  }

  /** q319: SPRT sequential monitor — the SEQUENTIAL leg of the
    * experimentation tier: q166/q304/q309 are fixed-horizon tests (peek
    * early and the α inflates); Wald's sequential probability ratio test
    * is the classic always-valid monitor — after each day, accumulate
    * the log-likelihood ratio of H1 (purchase share p1=0.22) vs H0
    * (p0=0.18) and stop the moment it crosses ln((1−β)/α) (accept H1) or
    * ln(β/(1−α)) (accept H0), α=β=0.05.
    *
    * Exactness: the two per-observation LLR increments ln(p1/p0) and
    * ln((1−p1)/(1−p0)) are constants — round(ln(·),9) literals in both
    * renderings (the portable-libm idiom) carried as exact nano-units,
    * so each day's LLR is x·L1 + (n−x)·L0 in pure BIGINT (promote to
    * DECIMAL(38,0) beyond ~10⁹ daily events) and the running total is an
    * integer window sum over the day table. The published decision per
    * day is an integer compare against the nano-unit boundaries.
    *
    * Scale shape: one map-side-combined day rollup, then a global window
    * over ≤ calendar-span rows (bounded reduction, audited). The
    * streaming twin is [[graft.streaming.StreamGate.q322StreamSprt]],
    * folding the same totals per trigger from a replay-total store. */
  /** SPRT nano-unit constants, shared by q319 and the streaming q322 so
    * the two gates can never drift: per-observation LLR increments for
    * H1 p1=0.22 vs H0 p0=0.18, and the α=β=0.05 Wald boundaries. The
    * literals are CAST to DOUBLE before dividing — bare decimal literals
    * divide under DECIMAL rules whose precision differs across engines. */
  private[graft] val SprtL1 = "CAST(CAST(round(ln(CAST(0.22 AS DOUBLE) / CAST(0.18 AS DOUBLE)), 9) AS DECIMAL(28,9)) * 1000000000 AS BIGINT)"
  private[graft] val SprtL0 = "CAST(CAST(round(ln(CAST(0.78 AS DOUBLE) / CAST(0.82 AS DOUBLE)), 9) AS DECIMAL(28,9)) * 1000000000 AS BIGINT)"
  private[graft] val SprtUp = "CAST(CAST(round(ln(CAST(0.95 AS DOUBLE) / CAST(0.05 AS DOUBLE)), 9) AS DECIMAL(28,9)) * 1000000000 AS BIGINT)"
  private[graft] val SprtLo = "CAST(CAST(round(ln(CAST(0.05 AS DOUBLE) / CAST(0.95 AS DOUBLE)), 9) AS DECIMAL(28,9)) * 1000000000 AS BIGINT)"
  /** The SPRT decision CASE over a `cum_llr_nano` column (shared). */
  private[graft] val SprtDecision =
    s"""CASE WHEN cum_llr_nano >= ($SprtUp) THEN 'accept_h1'
       |     WHEN cum_llr_nano <= ($SprtLo) THEN 'accept_h0'
       |     ELSE 'continue' END""".stripMargin

  val q319SprtMonitor: Q = {
    val l1 = SprtL1
    val l0 = SprtL0
    val up = SprtUp
    val lo = SprtLo
    Q(
      "q319_sprt_monitor",
      s"""WITH d AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         |                  CAST(count(*) AS BIGINT) AS n,
         |                  CAST(sum(CASE WHEN event_type = 'purchase'
         |                                THEN 1 ELSE 0 END) AS BIGINT) AS x
         |           FROM events GROUP BY 1),
         |l AS (SELECT day, n, x, x * ($l1) + (n - x) * ($l0) AS llr_day_nano
         |      FROM d),
         |c AS (SELECT day, n, x, llr_day_nano,
         |             CAST(sum(llr_day_nano) OVER (ORDER BY day) AS BIGINT)
         |               AS cum_llr_nano
         |      FROM l)
         |SELECT day, n, x, llr_day_nano, cum_llr_nano,
         |       CASE WHEN cum_llr_nano >= ($up) THEN 'accept_h1'
         |            WHEN cum_llr_nano <= ($lo) THEN 'accept_h0'
         |            ELSE 'continue' END AS decision
         |FROM c ORDER BY day""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables(s, dir, "events")
        .groupBy(expr("unix_timestamp(ts) div 86400").as("day"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("x"))
      d.withColumn("llr_day_nano", expr(s"x * ($l1) + (n - x) * ($l0)"))
        .withColumn("cum_llr_nano",
          sum(col("llr_day_nano")).over(Window.orderBy(col("day"))).cast("long"))
        .withColumn("decision",
          expr(s"""CASE WHEN cum_llr_nano >= ($up) THEN 'accept_h1'
                  |     WHEN cum_llr_nano <= ($lo) THEN 'accept_h0'
                  |     ELSE 'continue' END""".stripMargin))
        .orderBy(col("day"))
    }
  }

  /** q320: empirical-Bayes rate shrinkage — the small-sample estimation
    * leg the segment-analytics tier lacked: a raw per-segment rate from
    * 40 observations swings wildly; the production fix is to shrink every
    * segment toward the global rate with a pseudo-count prior,
    * shrunk = (x + K·m)/(n + K) (a Beta(K·m, K·(1−m)) posterior mean) —
    * segments with little data ride the prior, big segments keep their
    * own signal. K=100 is a stated literal; production fits it by
    * method-of-moments on the segment-rate variance (same plan, two more
    * moments).
    *
    * Exactness: m = X/N is a ratio of exact counts, so
    * shrunk = (x·N + K·X)/(N·(n+K)) is ONE rational — published
    * micro-floored (both engines floor identically on positive ints).
    * Shrinkage magnitude (raw−shrunk) is surfaced so the mover segments
    * are visible. Products stay ≤ N²·10⁶ — BIGINT to ~10⁶ rows per
    * side, DECIMAL(38,0)/HUGEINT far beyond.
    *
    * Scale shape: one map-side-combined segment rollup + a 1-row global
    * broadcast; nothing else moves. */
  val q320EbShrinkage: Q = Q(
    "q320_eb_shrinkage",
    """WITH seg AS (SELECT c.c_mktsegment AS segment, c.c_nationkey AS nation,
      |                    CAST(count(*) AS HUGEINT) AS n,
      |                    CAST(sum(CASE WHEN o.o_orderstatus = 'F'
      |                                  THEN 1 ELSE 0 END) AS HUGEINT) AS x
      |             FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |             GROUP BY 1, 2),
      |g AS (SELECT CAST(sum(n) AS HUGEINT) AS nn,
      |             CAST(sum(x) AS HUGEINT) AS xx FROM seg)
      |SELECT segment, nation, CAST(n AS BIGINT) AS n, CAST(x AS BIGINT) AS x,
      |       CAST(x * 1000000 // n AS BIGINT) AS raw_ppm,
      |       CAST((x * nn + 100 * xx) * 1000000 // (nn * (n + 100)) AS BIGINT)
      |         AS shrunk_ppm,
      |       CAST(x * 1000000 // n
      |            - (x * nn + 100 * xx) * 1000000 // (nn * (n + 100))
      |         AS BIGINT) AS shift_ppm
      |FROM seg, g
      |ORDER BY segment, nation""".stripMargin) { (s, dir) =>
    val dec = "decimal(38,0)"
    val seg = Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer"),
        col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("c_nationkey").as("nation"))
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).cast(dec).as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val g = seg.agg(sum(col("n")).cast(dec).as("nn"), sum(col("x")).cast(dec).as("xx"))
    seg.crossJoin(broadcast(g))
      .select(col("segment"), col("nation"),
        col("n").cast("long").as("n"), col("x").cast("long").as("x"),
        expr("CAST(x * 1000000 div n AS LONG)").as("raw_ppm"),
        expr("CAST((x * nn + 100 * xx) * 1000000 div (nn * (n + 100)) AS LONG)")
          .as("shrunk_ppm"),
        expr("""CAST(x * 1000000 div n
               |     - (x * nn + 100 * xx) * 1000000 div (nn * (n + 100))
               |  AS LONG)""".stripMargin).as("shift_ppm"))
      .orderBy(col("segment"), col("nation"))
  }

  /** q321: experiment design audit (power / sample size) — the PLANNING
    * leg of the experimentation tier: q166/q304/q305/q309/q319 all
    * ANALYZE a finished experiment; the question a team asks FIRST is
    * "how long must we run to detect a 2-point lift at this traffic
    * level". Two-proportion test at α=0.05 two-sided, power 0.8:
    * n_per_arm = (z_{0.975}+z_{0.8})²·2p(1−p)/Δ² with
    * (z₁+z₂)² = 7.848886 stated micro-literal, Δ=0.02 absolute.
    *
    * Exactness: p(1−p) = X(N−X)/N² from exact counts, so
    * n_needed = ⌈7848886·2·2500·X(N−X)/(N²·10⁶)⌉ is one integer ceiling
    * division ((num+den−1)//den, identical in both engines on positive
    * ints); per-allocation daily arm volume and days-to-detect are the
    * same construction. One row per candidate traffic allocation
    * (10/50/100%, 50-50 split).
    *
    * Scale shape: a 1-row corpus rollup cross-joined with a 3-row
    * literal spine — constant-size everywhere past the scan. */
  val q321PowerDesign: Q = Q(
    "q321_power_design",
    """WITH g AS (SELECT CAST(count(*) AS HUGEINT) AS n,
      |                  CAST(sum(CASE WHEN event_type = 'purchase'
      |                                THEN 1 ELSE 0 END) AS HUGEINT) AS x,
      |                  CAST(count(DISTINCT CAST(floor(epoch(ts)) AS BIGINT)
      |                             // 86400) AS HUGEINT) AS d
      |           FROM events),
      |a AS (SELECT CAST(alloc AS BIGINT) AS alloc_pct
      |      FROM (VALUES (10), (50), (100)) t(alloc)),
      |k AS (SELECT a.alloc_pct, g.n, g.x, g.d,
      |             39244430000 * g.x * (g.n - g.x) AS num,
      |             g.n * g.n * 1000000 AS den
      |      FROM a, g)
      |SELECT alloc_pct,
      |       CAST(n // d AS BIGINT) AS daily_events,
      |       CAST(n * alloc_pct // (200 * d) AS BIGINT) AS daily_per_arm,
      |       CAST(x * 1000000 // n AS BIGINT) AS p_ppm,
      |       CAST((num + den - 1) // den AS BIGINT) AS n_needed_per_arm,
      |       CAST(((num + den - 1) // den * 200 * d + n * alloc_pct - 1)
      |              // (n * alloc_pct) AS BIGINT) AS days_to_detect
      |FROM k ORDER BY alloc_pct""".stripMargin) { (s, dir) =>
    val dec = "decimal(38,0)"
    val g = Tables(s, dir, "events")
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .cast(dec).as("x"),
        countDistinct(expr("unix_timestamp(ts) div 86400")).cast(dec).as("d"))
    val a = s.range(0, 3).select(
      expr("CAST(element_at(array(10, 50, 100), CAST(id AS INT) + 1) AS LONG)")
        .as("alloc_pct"))
    a.crossJoin(broadcast(g))
      .withColumn("num", expr(s"CAST(39244430000 AS $dec) * x * (n - x)"))
      .withColumn("den", expr(s"n * n * CAST(1000000 AS $dec)"))
      .select(col("alloc_pct"),
        expr("CAST(n div d AS LONG)").as("daily_events"),
        expr("CAST(n * alloc_pct div (200 * d) AS LONG)").as("daily_per_arm"),
        expr("CAST(x * 1000000 div n AS LONG)").as("p_ppm"),
        expr("CAST((num + den - 1) div den AS LONG)").as("n_needed_per_arm"),
        expr("""CAST(((num + den - 1) div den * 200 * d + n * alloc_pct - 1)
               |  div (n * alloc_pct) AS LONG)""".stripMargin)
          .as("days_to_detect"))
      .orderBy(col("alloc_pct"))
  }

  /** q323: coarsened-exact-matching ATT — the OBSERVATIONAL leg of the
    * experimentation tier: q166/q304/q305 analyze randomized assignment;
    * when treatment is self-selected (here: "early adopter" = ordered in
    * the first calendar year), a raw mean difference confounds treatment
    * with who opts in. CEM coarsens covariates (market segment ×
    * account-balance band), keeps only cells containing BOTH treated and
    * control units, and estimates the average treatment effect on the
    * treated as the treated-share-weighted per-cell mean difference —
    * ATT = Σ_c (T_c/T)·(ȳᵀ_c − ȳᶜ_c).
    *
    * Exactness: outcome sums are exact cents; each cell's contribution
    * ships floor((Yᵀ_c·C_c − T_c·Yᶜ_c)·10⁶ / (T·C_c)) — the per-cell
    * micro-floor is the published contract (q311's discipline), so the
    * ATT is reproducible to cell-count µ-units. Unmatched cells are
    * SURFACED with matched=false and excluded from the estimate (the
    * honesty column: how much support was pruned).
    *
    * Scale shape: one customer-grain rollup (map-side combined), one
    * cell rollup, a 1-row treated-total broadcast. Nothing beyond cell
    * grain shuffles. */
  /** Shared CEM cell table (q323 matching / q330 weighting): customers
    * bucketed into (segment × balance-band) covariate cells with
    * treated/control counts and outcome sums. One rendering per engine so
    * the two causal estimators can never disagree about the design. */
  private val duckCemCells: String =
    """u AS (SELECT o_custkey AS cid,
      |                  CAST(min(CAST(floor(epoch(o_orderdate)) AS BIGINT)
      |                           // 86400) AS BIGINT) AS fday,
      |                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
      |                    AS BIGINT) AS y
      |           FROM orders GROUP BY 1),
      |m AS (SELECT min(fday) AS d0 FROM u),
      |t AS (SELECT u.cid, u.y,
      |             CASE WHEN u.fday < m.d0 + 365 THEN 1 ELSE 0 END AS treated
      |      FROM u, m),
      |cov AS (SELECT t.cid, t.y, t.treated, c.c_mktsegment AS seg,
      |               CAST(round(c.c_acctbal) AS BIGINT) // 2000 AS bal_band
      |        FROM t JOIN customer c ON c.c_custkey = t.cid),
      |cells AS (SELECT seg, bal_band,
      |                 CAST(sum(treated) AS HUGEINT) AS tc,
      |                 CAST(sum(1 - treated) AS HUGEINT) AS cc,
      |                 CAST(sum(CASE WHEN treated = 1 THEN y ELSE 0 END)
      |                   AS HUGEINT) AS yt,
      |                 CAST(sum(CASE WHEN treated = 0 THEN y ELSE 0 END)
      |                   AS HUGEINT) AS yc
      |          FROM cov GROUP BY 1, 2)""".stripMargin

  private def cemCells(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    val dec = "decimal(38,0)"
    val u = Tables(s, dir, "orders")
      .groupBy(col("o_custkey").as("cid"))
      .agg(min(expr("unix_timestamp(o_orderdate) div 86400")).as("fday"),
        sum(expr("CAST(round(o_totalprice * 100) AS LONG)")).as("y"))
    val m = u.agg(min(col("fday")).as("d0"))
    val cov = u.crossJoin(broadcast(m))
      .select(col("cid"), col("y"),
        when(col("fday") < col("d0") + 365, 1L).otherwise(0L).as("treated"))
      .join(Tables(s, dir, "customer"), col("c_custkey") === col("cid"))
      .select(col("y"), col("treated"), col("c_mktsegment").as("seg"),
        expr("CAST(round(c_acctbal) AS LONG) div 2000").as("bal_band"))
    cov.groupBy(col("seg"), col("bal_band"))
      .agg(sum(col("treated")).cast(dec).as("tc"),
        sum(lit(1L) - col("treated")).cast(dec).as("cc"),
        sum(when(col("treated") === 1, col("y")).otherwise(0L)).cast(dec).as("yt"),
        sum(when(col("treated") === 0, col("y")).otherwise(0L)).cast(dec).as("yc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  val q323CemAtt: Q = Q(
    "q323_cem_att",
    s"""WITH $duckCemCells,
      |tt AS (SELECT CAST(sum(tc) AS HUGEINT) AS t_tot FROM cells
      |       WHERE tc > 0 AND cc > 0),
      |terms AS (SELECT seg, bal_band, tc, cc, yt, yc,
      |                 tc > 0 AND cc > 0 AS matched,
      |                 CASE WHEN tc > 0 AND cc > 0
      |                      THEN (yt * cc - tc * yc) * 1000000
      |                             // (tt.t_tot * cc)
      |                      ELSE NULL END AS term_micro
      |          FROM cells, tt),
      |s AS (SELECT CAST(sum(term_micro) AS HUGEINT) AS att_micro FROM terms)
      |SELECT terms.seg AS segment, terms.bal_band,
      |       CAST(terms.tc AS BIGINT) AS n_treated,
      |       CAST(terms.cc AS BIGINT) AS n_control,
      |       terms.matched,
      |       CAST(terms.term_micro AS BIGINT) AS term_micro,
      |       CAST(s.att_micro AS BIGINT) AS att_micro
      |FROM terms, s ORDER BY segment, bal_band""".stripMargin) { (s, dir) =>
    val dec = "decimal(38,0)"
    val cells = cemCells(s, dir)
    val tt = cells.filter(col("tc") > 0 && col("cc") > 0)
      .agg(sum(col("tc")).cast(dec).as("t_tot"))
    val terms = cells.crossJoin(broadcast(tt))
      .withColumn("matched", col("tc") > 0 && col("cc") > 0)
      .withColumn("term_micro",
        when(col("matched"),
          expr("(yt * cc - tc * yc) * 1000000 div (t_tot * cc)"))
          .otherwise(lit(null)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sm = terms.agg(sum(col("term_micro")).cast(dec).as("att_micro"))
    terms.crossJoin(broadcast(sm))
      .select(col("seg").as("segment"), col("bal_band"),
        col("tc").cast("long").as("n_treated"),
        col("cc").cast("long").as("n_control"),
        col("matched"),
        col("term_micro").cast("long").as("term_micro"),
        col("att_micro").cast("long").as("att_micro"))
      .orderBy(col("segment"), col("bal_band"))
  }

  /** q330: inverse-propensity-weighted ATE — the WEIGHTING counterpart
    * of q323's matching: instead of estimating the effect on the treated
    * with treated-share weights, IPW reweights each cell by its
    * propensity p_c = T_c/N_c to estimate the average effect over the
    * WHOLE population — Horvitz–Thompson at covariate-cell grain, where
    * the propensity is exact (cell frequencies), not a fitted model.
    * ATE = Σ_c (N_c/N)(Yᵀ_c/T_c − Yᶜ_c/C_c), overlap-violating cells
    * (T_c=0 or C_c=0) surfaced and excluded exactly as q323 does.
    *
    * Exactness: per-cell floor(N_c·(Yᵀ_c·C_c − Yᶜ_c·T_c)·10⁶ /
    * (N·T_c·C_c)) — the micro-floor contract; the cell table is the
    * SHARED [[duckCemCells]]/[[cemCells]] design, so the matching and
    * weighting estimators read the identical experiment.
    *
    * Scale shape: q323's — nothing beyond cell grain shuffles. */
  val q330IpwAte: Q = Q(
    "q330_ipw_ate",
    s"""WITH $duckCemCells,
       |nn AS (SELECT CAST(sum(tc + cc) AS HUGEINT) AS n FROM cells
       |       WHERE tc > 0 AND cc > 0),
       |terms AS (SELECT seg, bal_band, tc, cc,
       |                 tc > 0 AND cc > 0 AS overlap,
       |                 CASE WHEN tc > 0 AND cc > 0
       |                      THEN (tc + cc) * (yt * cc - yc * tc) * 1000000
       |                             // (nn.n * tc * cc)
       |                      ELSE NULL END AS term_micro
       |          FROM cells, nn),
       |s AS (SELECT CAST(sum(term_micro) AS HUGEINT) AS ate_micro FROM terms)
       |SELECT terms.seg AS segment, terms.bal_band,
       |       CAST(terms.tc AS BIGINT) AS n_treated,
       |       CAST(terms.cc AS BIGINT) AS n_control,
       |       terms.overlap,
       |       CAST(terms.term_micro AS BIGINT) AS term_micro,
       |       CAST(s.ate_micro AS BIGINT) AS ate_micro
       |FROM terms, s ORDER BY segment, bal_band""".stripMargin) { (s, dir) =>
    val dec = "decimal(38,0)"
    val cells = cemCells(s, dir)
    val nn = cells.filter(col("tc") > 0 && col("cc") > 0)
      .agg(sum(col("tc") + col("cc")).cast(dec).as("n"))
    val terms = cells.crossJoin(broadcast(nn))
      .withColumn("overlap", col("tc") > 0 && col("cc") > 0)
      .withColumn("term_micro",
        when(col("overlap"),
          expr("(tc + cc) * (yt * cc - yc * tc) * 1000000 div (n * tc * cc)"))
          .otherwise(lit(null)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sm = terms.agg(sum(col("term_micro")).cast(dec).as("ate_micro"))
    terms.crossJoin(broadcast(sm))
      .select(col("seg").as("segment"), col("bal_band"),
        col("tc").cast("long").as("n_treated"),
        col("cc").cast("long").as("n_control"),
        col("overlap"),
        col("term_micro").cast("long").as("term_micro"),
        col("ate_micro").cast("long").as("ate_micro"))
      .orderBy(col("segment"), col("bal_band"))
  }

  /** q324: difference-in-differences — the second causal leg: when a
    * "treatment" turns on for one group at a known time (here the
    * AUTOMOBILE segment after 1998-01-01, a stand-in for a mid-corpus
    * policy change), the treated-vs-control post-period gap still
    * contains the groups' PRE-EXISTING difference; DiD removes it:
    * (ȳᵀ₁−ȳᵀ₀) − (ȳᶜ₁−ȳᶜ₀). The published contract is the micro-floored
    * CELL MEANS (floor(10⁶·Σcents/n) per (group, period)) combined by
    * exact integer arithmetic — both engines floor identically, and the
    * 2×2 table itself is surfaced so the parallel-trends eyeball check
    * (pre-period gap) rides along.
    *
    * Scale shape: one order-grain scan into a 4-cell rollup; everything
    * after is constant-size. The BIGINT surface (Σcents·10⁶) holds to
    * ~10¹² cents per cell; beyond that promote the sum to DECIMAL(38,0)
    * — same plan. */
  val q324Did: Q = Q(
    "q324_did",
    """WITH o AS (SELECT CASE WHEN c.c_mktsegment = 'AUTOMOBILE'
      |                       THEN 'treat' ELSE 'control' END AS grp,
      |                  CAST(CASE WHEN o.o_orderdate >= TIMESTAMP '1998-01-01'
      |                       THEN 1 ELSE 0 END AS BIGINT) AS period,
      |                  CAST(round(o.o_totalprice * 100) AS BIGINT) AS v
      |           FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
      |cells AS (SELECT grp, period, CAST(count(*) AS BIGINT) AS n,
      |                 CAST(sum(v) AS BIGINT) AS sum_cents,
      |                 CAST(sum(v) * 1000000 // count(*) AS BIGINT) AS mean_micro
      |          FROM o GROUP BY 1, 2),
      |d AS (SELECT
      |        (SELECT mean_micro FROM cells WHERE grp = 'treat' AND period = 1)
      |      - (SELECT mean_micro FROM cells WHERE grp = 'treat' AND period = 0)
      |      - (SELECT mean_micro FROM cells WHERE grp = 'control' AND period = 1)
      |      + (SELECT mean_micro FROM cells WHERE grp = 'control' AND period = 0)
      |        AS did_micro,
      |        (SELECT mean_micro FROM cells WHERE grp = 'treat' AND period = 0)
      |      - (SELECT mean_micro FROM cells WHERE grp = 'control' AND period = 0)
      |        AS pre_gap_micro)
      |SELECT cells.grp, cells.period, cells.n, cells.sum_cents,
      |       cells.mean_micro, d.did_micro, d.pre_gap_micro
      |FROM cells, d ORDER BY grp, period""".stripMargin) { (s, dir) =>
    val o = Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
      .select(
        when(col("c_mktsegment") === "AUTOMOBILE", "treat").otherwise("control")
          .as("grp"),
        when(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"), 1L)
          .otherwise(0L).as("period"),
        expr("CAST(round(o_totalprice * 100) AS LONG)").as("v"))
    val cells = o.groupBy(col("grp"), col("period"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_cents"))
      .withColumn("mean_micro",
        expr("CAST(sum_cents * 1000000 div n AS LONG)"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def cell(g: String, p: Int): org.apache.spark.sql.Column =
      max(when(col("grp") === g && col("period") === p, col("mean_micro")))
    val d = cells.agg(
      (cell("treat", 1) - cell("treat", 0)
        - cell("control", 1) + cell("control", 0)).as("did_micro"),
      (cell("treat", 0) - cell("control", 0)).as("pre_gap_micro"))
    cells.crossJoin(broadcast(d))
      .select(col("grp"), col("period"), col("n"), col("sum_cents"),
        col("mean_micro"), col("did_micro"), col("pre_gap_micro"))
      .orderBy(col("grp"), col("period"))
  }

  /** q332: Mann–Kendall trend test — the SIGNIFICANCE companion to
    * q289's Theil–Sen slope: Theil–Sen says how steep, Mann–Kendall says
    * whether a monotone trend exists at all, with no distributional
    * assumption: S = Σ_{i<j} sign(v_j − v_i) over the daily-revenue
    * series, Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18 with the
    * tie correction, and the continuity-corrected z² = (|S|−1)²/Var
    * published micro-floored with the α=0.05 verdict as an integer
    * compare.
    *
    * Exactness: S and 18·Var are exact integers (the tie rollup comes
    * from the value histogram); z²_micro = (|S|−1)²·18·10⁶ // (18·Var).
    *
    * Scale shape: day-grain rollup, then an all-pairs self-join of the
    * ≤calendar-span day table (bounded — ~400 rows → 80k comparisons,
    * constant at any corpus size) and a value-histogram tie rollup. */
  val q332MannKendall: Q = Q(
    "q332_mann_kendall",
    """WITH d AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |                    AS v
      |           FROM events GROUP BY 1),
      |s AS (SELECT CAST(sum(CASE WHEN b.v > a.v THEN 1
      |                           WHEN b.v < a.v THEN -1 ELSE 0 END) AS HUGEINT)
      |               AS s_stat,
      |             CAST(count(*) AS HUGEINT) AS n_pairs
      |      FROM d a JOIN d b ON b.day > a.day),
      |nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM d),
      |ties AS (SELECT CAST(COALESCE(sum(t * (t - 1) * (2 * t + 5)), 0)
      |                  AS HUGEINT) AS tt
      |         FROM (SELECT CAST(count(*) AS HUGEINT) AS t FROM d GROUP BY v)
      |         WHERE t > 1),
      |k AS (SELECT s_stat, n,
      |             n * (n - 1) * (2 * n + 5) - tt AS var18
      |      FROM s, nn, ties)
      |SELECT CAST(n AS BIGINT) AS n_days, CAST(s_stat AS BIGINT) AS s_stat,
      |       CAST(var18 AS BIGINT) AS var18,
      |       CAST(CASE WHEN s_stat > 0 THEN 1 WHEN s_stat < 0 THEN -1 ELSE 0 END
      |         AS BIGINT) AS direction,
      |       CAST(CASE WHEN abs(s_stat) > 1
      |                 THEN (abs(s_stat) - 1) * (abs(s_stat) - 1) * 18000000
      |                        // var18
      |                 ELSE 0 END AS BIGINT) AS z2_micro,
      |       CASE WHEN abs(s_stat) > 1
      |            THEN (abs(s_stat) - 1) * (abs(s_stat) - 1) * 18000000
      |                   // var18 > 3841459
      |            ELSE FALSE END AS significant
      |FROM k""".stripMargin) { (s, dir) =>
    val dec = "decimal(38,0)"
    val d = Tables(s, dir, "events")
      .groupBy(expr("unix_timestamp(ts) div 86400").as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS LONG)")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sdf = d.select(col("day").as("da"), col("v").as("va"))
      .join(d.select(col("day").as("db"), col("v").as("vb")),
        col("db") > col("da"))
      .agg(sum(when(col("vb") > col("va"), 1L)
        .when(col("vb") < col("va"), -1L).otherwise(0L)).cast(dec).as("s_stat"))
    val nn = d.agg(count(lit(1)).cast(dec).as("n"))
    val ties = d.groupBy(col("v")).agg(count(lit(1)).cast(dec).as("t"))
      .filter(col("t") > 1)
      .agg(coalesce(sum(col("t") * (col("t") - 1) * (lit(2).cast(dec) * col("t") + 5)),
        lit(0).cast(dec)).as("tt"))
    sdf.crossJoin(broadcast(nn)).crossJoin(broadcast(ties))
      .withColumn("var18", expr("n * (n - 1) * (2 * n + 5) - tt"))
      .select(col("n").cast("long").as("n_days"),
        col("s_stat").cast("long").as("s_stat"),
        col("var18").cast("long").as("var18"),
        signum(col("s_stat")).cast("long").as("direction"),
        expr("""CAST(CASE WHEN abs(s_stat) > 1
               |     THEN (abs(s_stat) - 1) * (abs(s_stat) - 1) * 18000000
               |            div var18
               |     ELSE 0 END AS LONG)""".stripMargin).as("z2_micro"),
        expr("""CASE WHEN abs(s_stat) > 1
               |     THEN (abs(s_stat) - 1) * (abs(s_stat) - 1) * 18000000
               |            div var18 > 3841459
               |     ELSE FALSE END""".stripMargin).as("significant"))
  }

  /** q333: Kruskal–Wallis rank test — q309's Mann–Whitney generalized to
    * k groups: "do the five event types draw their per-event values from
    * the same distribution", tested on ranks so power-law value tails
    * don't dominate. Doubled tied ranks come from the SAME value-
    * histogram kernel as q309/q313 (one global window over value levels,
    * never row-grain ranks); with R2_g = Σ doubled ranks of group g,
    * H = 3·Σ_g R2_g²/n_g / (n(n+1)) − 3(n+1), published as per-group
    * micro-floored terms (q311's contract), tie-corrected by the exact
    * integer ratio (n³−n)/(n³−n−T), decided against χ²₄ at α=0.05.
    *
    * Scale shape: value-histogram grain throughout — one bounded global
    * window, one k-row group rollup, constant-size tail. */
  val q333KruskalWallis: Q = Q(
    "q333_kruskal_wallis",
    """WITH r AS (SELECT event_type AS g,
      |                  CAST(round(value * 100) AS BIGINT) AS v
      |           FROM events),
      |hist AS (SELECT v, CAST(count(*) AS HUGEINT) AS nv FROM r GROUP BY 1),
      |cum AS (SELECT v, nv, sum(nv) OVER (ORDER BY v) - nv AS c FROM hist),
      |rk AS (SELECT r.g, 2 * cum.c + cum.nv + 1 AS dr
      |       FROM r JOIN cum ON cum.v = r.v),
      |grp AS (SELECT g, CAST(count(*) AS HUGEINT) AS ng,
      |               CAST(sum(dr) AS HUGEINT) AS r2
      |        FROM rk GROUP BY 1),
      |nn AS (SELECT CAST(sum(ng) AS HUGEINT) AS n FROM grp),
      |tie AS (SELECT CAST(COALESCE(sum(nv * nv * nv - nv), 0) AS HUGEINT) AS t
      |        FROM hist WHERE nv > 1),
      |terms AS (SELECT g, ng, r2,
      |                 3 * r2 * r2 * 1000000 // (ng * nn.n * (nn.n + 1))
      |                   AS term_micro
      |          FROM grp, nn),
      |h AS (SELECT CAST(sum(term_micro) AS HUGEINT)
      |               - 3 * (nn.n + 1) * 1000000 AS h_micro
      |      FROM terms, nn GROUP BY nn.n),
      |hc AS (SELECT h.h_micro * (nn.n * nn.n * nn.n - nn.n)
      |              // (nn.n * nn.n * nn.n - nn.n - tie.t) AS hc_micro
      |       FROM h, nn, tie)
      |SELECT terms.g AS event_type, CAST(terms.ng AS BIGINT) AS n,
      |       CAST(terms.r2 AS BIGINT) AS rank2_sum,
      |       CAST(terms.term_micro AS BIGINT) AS term_micro,
      |       CAST(hc.hc_micro AS BIGINT) AS h_micro,
      |       hc.hc_micro > 9487729 AS significant
      |FROM terms, hc ORDER BY event_type""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val r = Tables(s, dir, "events")
      .select(col("event_type").as("g"),
        expr("CAST(round(value * 100) AS LONG)").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hist = r.groupBy(col("v")).agg(count(lit(1)).cast(dec).as("nv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cum = hist.withColumn("c",
      sum(col("nv")).over(Window.orderBy(col("v"))) - col("nv"))
    val grp = r.join(cum, "v")
      .select(col("g"),
        (lit(2).cast(dec) * col("c") + col("nv") + 1).as("dr"))
      .groupBy(col("g"))
      .agg(count(lit(1)).cast(dec).as("ng"), sum(col("dr")).cast(dec).as("r2"))
    val nn = grp.agg(sum(col("ng")).cast(dec).as("n"))
    val tie = hist.filter(col("nv") > 1)
      .agg(coalesce(sum(col("nv") * col("nv") * col("nv") - col("nv")),
        lit(0).cast(dec)).as("t"))
    // NOT persisted (r and hist below it are): a persist here would bury
    // the level-kernel window inside an InMemoryRelation where
    // PlanAuditSpec cannot audit it — q327's lesson.
    val terms = grp.crossJoin(broadcast(nn))
      .withColumn("term_micro",
        expr("3 * r2 * r2 * 1000000 div (ng * n * (n + 1))"))
    val h = terms.agg(sum(col("term_micro")).cast(dec).as("smt"))
      .crossJoin(broadcast(nn))
      .select((col("smt") - lit(3).cast(dec) * (col("n") + 1) * 1000000)
        .as("h_micro"))
    val hc = h.crossJoin(broadcast(nn)).crossJoin(broadcast(tie))
      .select(expr("h_micro * (n * n * n - n) div (n * n * n - n - t)")
        .as("hc_micro"))
    terms.crossJoin(broadcast(hc))
      .select(col("g").as("event_type"), col("ng").cast("long").as("n"),
        col("r2").cast("long").as("rank2_sum"),
        col("term_micro").cast("long").as("term_micro"),
        col("hc_micro").cast("long").as("h_micro"),
        (col("hc_micro") > lit(9487729L).cast(dec)).as("significant"))
      .orderBy(col("event_type"))
  }

  /** q334: permutation test — the resampling SIGNIFICANCE leg (q310
    * bootstraps a CI; the permutation test asks "how often would a
    * RANDOM split of these same users show a variant gap this large",
    * which is exact under the null with no normality or variance
    * assumptions). Metric = per-user event count, observed split =
    * q309's portable-hash enrollment; B=200 permutations re-assign each
    * user by hash(user, b).
    *
    * Exactness without floats: each split's mean gap is the rational
    * (S_A·n_B − S_B·n_A) / (n_A·n_B); "permutation at least as extreme"
    * is the cross-multiplied integer compare |num_b|·den_obs ≥
    * |num_obs|·den_b, and the p-value ships as the standard
    * add-one-protected (extreme+1)/(B+1) in exact milli units. The
    * α=0.05 decision is (extreme+1)·20 ≤ B+1.
    *
    * Scale shape: user-grain rollup once, then a B-way map-side
    * expansion of the user table (rows × 200 — embarrassingly parallel,
    * no extra shuffle: the per-b rollup is one map-side-combined
    * aggregation). At 100 TB swap the expansion to the day-cell grain
    * exactly as q310 does. */
  val q334PermutationTest: Q = {
    val hObs = PortableHash.hexHeadToLong("mo", "strpos")
    val hPerm = PortableHash.hexHeadToLong("mp", "strpos")
    val hObsS = PortableHash.hexHeadToLong("mo", "instr")
    val hPermS = PortableHash.hexHeadToLong("mp", "instr")
    Q(
      "q334_permutation_test",
      s"""WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS v
         |           FROM events GROUP BY 1),
         |um AS (SELECT v, md5(CAST(user_id AS VARCHAR) || '-graft-ab') AS mo,
         |              user_id
         |       FROM u),
         |obs AS (SELECT CAST(sum(CASE WHEN ($hObs) % 2 = 0 THEN v ELSE 0 END)
         |                 AS HUGEINT) AS sa,
         |               CAST(sum(CASE WHEN ($hObs) % 2 = 1 THEN v ELSE 0 END)
         |                 AS HUGEINT) AS sb,
         |               CAST(sum(CASE WHEN ($hObs) % 2 = 0 THEN 1 ELSE 0 END)
         |                 AS HUGEINT) AS na,
         |               CAST(sum(CASE WHEN ($hObs) % 2 = 1 THEN 1 ELSE 0 END)
         |                 AS HUGEINT) AS nb
         |        FROM um),
         |pm AS (SELECT t.b, u.v,
         |              md5(CAST(u.user_id AS VARCHAR) || '-graft-perm-'
         |                  || CAST(t.b AS VARCHAR)) AS mp
         |       FROM u, range(1, 201) t(b)),
         |perm AS (SELECT b,
         |               CAST(sum(CASE WHEN ($hPerm) % 2 = 0 THEN v ELSE 0 END)
         |                 AS HUGEINT) AS sa,
         |               CAST(sum(CASE WHEN ($hPerm) % 2 = 1 THEN v ELSE 0 END)
         |                 AS HUGEINT) AS sb,
         |               CAST(sum(CASE WHEN ($hPerm) % 2 = 0 THEN 1 ELSE 0 END)
         |                 AS HUGEINT) AS na,
         |               CAST(sum(CASE WHEN ($hPerm) % 2 = 1 THEN 1 ELSE 0 END)
         |                 AS HUGEINT) AS nb
         |        FROM pm GROUP BY 1),
         |x AS (SELECT CAST(count(*) AS BIGINT) AS extreme
         |      FROM perm, obs
         |      WHERE abs(perm.sa * perm.nb - perm.sb * perm.na)
         |              * (obs.na * obs.nb)
         |            >= abs(obs.sa * obs.nb - obs.sb * obs.na)
         |              * (perm.na * perm.nb))
         |SELECT CAST(obs.na AS BIGINT) AS n_a, CAST(obs.nb AS BIGINT) AS n_b,
         |       CAST((obs.sa * obs.nb - obs.sb * obs.na) * 1000000
         |              // nullif(obs.na * obs.nb, 0) AS BIGINT)
         |         AS obs_diff_ppm,
         |       x.extreme,
         |       CAST((x.extreme + 1) * 1000 // 201 AS BIGINT) AS p_milli,
         |       (x.extreme + 1) * 20 <= 201 AS significant
         |FROM obs, x""".stripMargin) { (s, dir) =>
      val dec = "decimal(38,0)"
      val u = Tables(s, dir, "events")
        .groupBy(col("user_id")).agg(count(lit(1)).as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val obs = u
        .withColumn("mo", md5(concat(col("user_id").cast("string"), lit("-graft-ab"))))
        .agg(
          sum(when(expr(s"($hObsS) % 2") === 0, col("v")).otherwise(0L)).cast(dec).as("sa"),
          sum(when(expr(s"($hObsS) % 2") === 1, col("v")).otherwise(0L)).cast(dec).as("sb"),
          sum(when(expr(s"($hObsS) % 2") === 0, 1L).otherwise(0L)).cast(dec).as("na"),
          sum(when(expr(s"($hObsS) % 2") === 1, 1L).otherwise(0L)).cast(dec).as("nb"))
      val perm = u
        .withColumn("b", explode(expr("sequence(1, 200)")))
        .withColumn("mp", md5(concat(col("user_id").cast("string"),
          lit("-graft-perm-"), col("b").cast("string"))))
        .groupBy(col("b"))
        .agg(
          sum(when(expr(s"($hPermS) % 2") === 0, col("v")).otherwise(0L)).cast(dec).as("psa"),
          sum(when(expr(s"($hPermS) % 2") === 1, col("v")).otherwise(0L)).cast(dec).as("psb"),
          sum(when(expr(s"($hPermS) % 2") === 0, 1L).otherwise(0L)).cast(dec).as("pna"),
          sum(when(expr(s"($hPermS) % 2") === 1, 1L).otherwise(0L)).cast(dec).as("pnb"))
      val x = perm.crossJoin(broadcast(obs))
        .filter(expr("""abs(psa * pnb - psb * pna) * (na * nb)
                       |  >= abs(sa * nb - sb * na) * (pna * pnb)""".stripMargin))
        .agg(count(lit(1)).as("extreme"))
      obs.crossJoin(broadcast(x))
        .select(col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
          expr("CAST((sa * nb - sb * na) * 1000000 div nullif(na * nb, 0) AS LONG)")
            .as("obs_diff_ppm"),
          col("extreme"),
          expr("CAST((extreme + 1) * 1000 div 201 AS LONG)").as("p_milli"),
          expr("(extreme + 1) * 20 <= 201").as("significant"))
    }
  }

  /** q310: bootstrap confidence interval for mean daily revenue — the
    * resampling leg of the stats tier: no normality assumption, just the
    * empirical distribution of the statistic under B=200 resamples of
    * the n daily-revenue cells. The CI is the (5th, 195th) order
    * statistic of the resample means (~2.5%/97.5%).
    *
    * Determinism: each draw (b, j) selects day index
    * portable_hash(md5(b||'-'||j||'-graft-boot')) mod n — both engines
    * derive the identical resample, so the CI hash-matches. A production
    * run swaps the seeded hash for a PRNG; every other expression holds.
    *
    * Scale shape: the unit of resampling is the AGGREGATED cell (days),
    * so the draw table is B×n_days, bounded and broadcast-joinable —
    * this is the honest way to bootstrap at 100 TB (row-grain bootstrap
    * would instead use per-partition Poisson(1) resampling; the cell
    * grain needs no such approximation). Sums ride DECIMAL(38,0)/
    * HUGEINT; the two global windows (day index, resample-mean rank) run
    * over ≤ max(n_days, B) rows — bounded reductions, audited. */
  val q310BootstrapCi: Q = {
    val h = PortableHash.hexHeadToLong("m", "strpos")
    Q(
      "q310_bootstrap_ci",
      s"""WITH d0 AS (SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400
         |               AS day,
         |             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
         |               AS HUGEINT) AS rev
         |      FROM orders GROUP BY 1),
         |d AS (SELECT day, rev,
         |             row_number() OVER (ORDER BY day) - 1 AS idx
         |      FROM d0),
         |nd AS (SELECT CAST(count(*) AS HUGEINT) AS n,
         |              CAST(sum(rev) AS HUGEINT) AS tot FROM d),
         |dm AS (SELECT d.idx AS j, b.b,
         |              md5(CAST(b.b AS VARCHAR) || '-' ||
         |                  CAST(d.idx AS VARCHAR) || '-graft-boot') AS m
         |       FROM d, generate_series(0, 199) b(b)),
         |draw AS (SELECT dm.b, ($h) % (SELECT n FROM nd) AS pick FROM dm),
         |means AS (SELECT draw.b,
         |                 CAST(sum(d.rev) AS HUGEINT)
         |                   // (SELECT n FROM nd) AS mean_cents
         |          FROM draw JOIN d ON d.idx = draw.pick
         |          GROUP BY draw.b),
         |ranked AS (SELECT mean_cents,
         |                  row_number() OVER (ORDER BY mean_cents, b) AS rn
         |           FROM means)
         |SELECT CAST(nd.n AS BIGINT) AS n_days,
         |       CAST(200 AS BIGINT) AS n_resamples,
         |       CAST(nd.tot // nd.n AS BIGINT) AS mean_cents,
         |       CAST(max(CASE WHEN rn = 5 THEN mean_cents END) AS BIGINT)
         |         AS lo_cents,
         |       CAST(max(CASE WHEN rn = 195 THEN mean_cents END) AS BIGINT)
         |         AS hi_cents
         |FROM ranked, nd GROUP BY nd.n, nd.tot""".stripMargin) { (s, dir) =>
      val dec = "decimal(38,0)"
      val d = Tables(s, dir, "orders")
        .groupBy(expr("unix_timestamp(o_orderdate) div 86400").as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).cast(dec)
          .as("rev"))
        .withColumn("idx",
          row_number().over(Window.orderBy(col("day"))) - 1)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nd = d.agg(count(lit(1)).cast(dec).as("n"),
        sum(col("rev")).cast(dec).as("tot"))
      val draw = d.select(col("idx").as("j"),
          explode(expr("sequence(0, 199)")).as("b"))
        .withColumn("m",
          md5(concat(col("b").cast("string"), lit("-"),
            col("j").cast("string"), lit("-graft-boot"))))
        .crossJoin(broadcast(nd))
        .select(col("b"), col("n"), col("tot"),
          (expr(PortableHash.hexHeadToLong("m", "instr")) % col("n").cast("long"))
            .as("pick"))
      val means = draw
        .join(broadcast(d.select(col("idx"), col("rev"))),
          col("pick") === col("idx"))
        .groupBy(col("b"), col("n"), col("tot"))
        .agg(expr("CAST(sum(rev) AS DECIMAL(38,0)) div n").as("mean_cents"))
      means
        .withColumn("rn",
          row_number().over(Window.orderBy(col("mean_cents"), col("b"))))
        .groupBy(col("n"), col("tot"))
        .agg(max(when(col("rn") === 5, col("mean_cents"))).as("lo"),
          max(when(col("rn") === 195, col("mean_cents"))).as("hi"))
        .select(col("n").cast("long").as("n_days"),
          lit(200L).as("n_resamples"),
          expr("CAST(tot div n AS LONG)").as("mean_cents"),
          col("lo").cast("long").as("lo_cents"),
          col("hi").cast("long").as("hi_cents"))
    }
  }

  /** q311: χ² test of independence (priority × status on orders) — the
    * categorical-association audit the tier lacked: q304's SRM check is
    * the one-dimensional χ² against a fixed split; this is the full
    * R×C contingency test ("does order priority predict status").
    *
    * Exactness: χ² = Σ (O−E)²/E with E = r·c/N is a sum of rationals;
    * each cell ships floor(10⁶·(O·N − r·c)²/(N·r·c)) — both engines
    * execute the identical per-cell floor, so the statistic is exact by
    * construction (the published contract is the micro-floored sum, a
    * lower bound within R·C µ-units of the real value). The α=0.05
    * decision compares against a literal χ²-critical lookup (df 1..12,
    * milli-units) shared by both renderings; df outside the lookup
    * yields NULL, not a wrong verdict.
    *
    * Scale shape: one map-side-combined cell rollup (R·C rows), then
    * broadcast joins against the two marginal rollups and the 1-row
    * total — nothing beyond cell grain shuffles, at any N. */
  val q311Chi2Independence: Q = {
    val crit = "CASE df WHEN 1 THEN 3841 WHEN 2 THEN 5991 WHEN 3 THEN 7815" +
      " WHEN 4 THEN 9488 WHEN 5 THEN 11070 WHEN 6 THEN 12592" +
      " WHEN 7 THEN 14067 WHEN 8 THEN 15507 WHEN 9 THEN 16919" +
      " WHEN 10 THEN 18307 WHEN 11 THEN 19675 WHEN 12 THEN 21026 END"
    Q(
      "q311_chi2_independence",
      s"""WITH cells AS (SELECT o_orderpriority AS pri, o_orderstatus AS st,
         |                    CAST(count(*) AS HUGEINT) AS o
         |             FROM orders GROUP BY 1, 2),
         |rt AS (SELECT pri, CAST(sum(o) AS HUGEINT) AS r,
         |              count(*) AS nc FROM cells GROUP BY 1),
         |ct AS (SELECT st, CAST(sum(o) AS HUGEINT) AS c FROM cells GROUP BY 1),
         |tot AS (SELECT CAST(sum(o) AS HUGEINT) AS n,
         |               CAST((count(DISTINCT pri) - 1)
         |                  * (count(DISTINCT st) - 1) AS BIGINT) AS df
         |        FROM cells),
         |terms AS (SELECT cells.pri, cells.st, cells.o, rt.r, ct.c, tot.n,
         |                 tot.df,
         |                 (cells.o * tot.n - rt.r * ct.c)
         |                   * (cells.o * tot.n - rt.r * ct.c) * 1000000
         |                   // (tot.n * rt.r * ct.c) AS term_micro
         |          FROM cells JOIN rt USING (pri) JOIN ct USING (st), tot),
         |s AS (SELECT CAST(sum(term_micro) AS HUGEINT) AS chi2_micro
         |      FROM terms)
         |SELECT terms.pri AS o_orderpriority, terms.st AS o_orderstatus,
         |       CAST(terms.o AS BIGINT) AS n,
         |       CAST(terms.r * terms.c * 1000 // terms.n AS BIGINT)
         |         AS expected_milli,
         |       CAST(terms.term_micro AS BIGINT) AS term_micro,
         |       CAST(s.chi2_micro AS BIGINT) AS chi2_micro,
         |       terms.df,
         |       s.chi2_micro > 1000 * ($crit) AS significant
         |FROM terms, s ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val dec = "decimal(38,0)"
      val cells = Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"))
        .agg(count(lit(1)).cast(dec).as("o"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val rt = cells.groupBy(col("pri")).agg(sum(col("o")).cast(dec).as("r"))
      val ct = cells.groupBy(col("st")).agg(sum(col("o")).cast(dec).as("c"))
      val tot = cells.agg(sum(col("o")).cast(dec).as("n"),
        ((countDistinct(col("pri")) - 1) * (countDistinct(col("st")) - 1))
          .cast("long").as("df"))
      val terms = cells
        .join(broadcast(rt), "pri").join(broadcast(ct), "st")
        .crossJoin(broadcast(tot))
        .withColumn("term_micro",
          expr("""(o * n - r * c) * (o * n - r * c) * 1000000
                 |  div (n * r * c)""".stripMargin))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sm = terms.agg(sum(col("term_micro")).cast(dec).as("chi2_micro"))
      terms.crossJoin(broadcast(sm))
        .select(col("pri").as("o_orderpriority"), col("st").as("o_orderstatus"),
          col("o").cast("long").as("n"),
          expr("CAST(r * c * 1000 div n AS LONG)").as("expected_milli"),
          col("term_micro").cast("long").as("term_micro"),
          col("chi2_micro").cast("long").as("chi2_micro"),
          col("df"),
          (col("chi2_micro") > lit(1000).cast(dec) * expr(crit))
            .as("significant"))
        .orderBy(col("o_orderpriority"), col("o_orderstatus"))
    }
  }

  /** q348: mutual information I(nation; order status) with normalized MI
    * — the feature-selection metric that RANKS what q311's χ² only
    * tests: MI is the actual information (bits) a categorical feature
    * carries about the target, the quantity a target-encoding pipeline
    * (q336) should screen features by. NMI = I/min(H_X, H_Y) makes it
    * comparable across features of different cardinality.
    *
    * Determinism: every log₂ argument is an exact integer rational cast
    * once to double ((O·N)/(r·c), r/N — IEEE-deterministic); each term
    * rounds to 9 decimals before the DECIMAL(28,9) accumulation and the
    * sums surface as nano integers (q343's device — ×10⁹ of a scale-9
    * decimal is exactly integral in both engines). NMI is one integer
    * division of nanos.
    *
    * Scale shape: the fact-dim join collapses map-side to R×C cells;
    * marginals and the total are cell-grain rollups; the output is one
    * audit row at any N. */
  val q348MutualInformation: Q = Q(
    "q348_mutual_information",
    """WITH cells AS (SELECT c.c_nationkey AS x, o.o_orderstatus AS y,
      |                      CAST(count(*) AS BIGINT) AS o
      |               FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |               GROUP BY 1, 2),
      |rt AS (SELECT x, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
      |ct AS (SELECT y, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
      |mi AS (SELECT CAST(sum(CAST(round(
      |                (CAST(cells.o AS DOUBLE) / CAST(tot.n AS DOUBLE))
      |                  * log2(CAST(cells.o * tot.n AS DOUBLE)
      |                         / CAST(rt.r * ct.c AS DOUBLE)), 9)
      |                AS DECIMAL(28,9))) * 1000000000 AS BIGINT) AS mi_nano
      |       FROM cells JOIN rt USING (x) JOIN ct USING (y), tot),
      |hx AS (SELECT CAST(sum(CAST(round(
      |                0 - (CAST(r AS DOUBLE) / CAST(tot.n AS DOUBLE))
      |                  * log2(CAST(r AS DOUBLE) / CAST(tot.n AS DOUBLE)), 9)
      |                AS DECIMAL(28,9))) * 1000000000 AS BIGINT) AS hx_nano
      |       FROM rt, tot),
      |hy AS (SELECT CAST(sum(CAST(round(
      |                0 - (CAST(c AS DOUBLE) / CAST(tot.n AS DOUBLE))
      |                  * log2(CAST(c AS DOUBLE) / CAST(tot.n AS DOUBLE)), 9)
      |                AS DECIMAL(28,9))) * 1000000000 AS BIGINT) AS hy_nano
      |       FROM ct, tot)
      |SELECT tot.n, (SELECT count(*) FROM rt) AS x_levels,
      |       (SELECT count(*) FROM ct) AS y_levels,
      |       mi.mi_nano, hx.hx_nano, hy.hy_nano,
      |       mi.mi_nano * 1000000
      |         // nullif(least(hx.hx_nano, hy.hy_nano), 0) AS nmi_ppm
      |FROM tot, mi, hx, hy""".stripMargin) { (s, dir) =>
    val cells = Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_nationkey").as("x"), col("o_orderstatus").as("y"))
      .agg(count(lit(1)).as("o"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rt = cells.groupBy(col("x")).agg(sum(col("o")).as("r"))
    val ct = cells.groupBy(col("y")).agg(sum(col("o")).as("c"))
    val tot = cells.agg(sum(col("o")).as("n"))
    val mi = cells.join(broadcast(rt), "x").join(broadcast(ct), "y")
      .crossJoin(broadcast(tot))
      .agg((sum(round(
        (col("o").cast("double") / col("n").cast("double"))
          * log2((col("o") * col("n")).cast("double")
            / (col("r") * col("c")).cast("double")), 9)
        .cast("decimal(28,9)")) * 1000000000L).cast("long").as("mi_nano"))
    def marg(m: org.apache.spark.sql.DataFrame, cn: String, out: String) =
      m.crossJoin(broadcast(tot))
        .agg((sum(round(
          (lit(0) - (col(cn).cast("double") / col("n").cast("double")))
            * log2(col(cn).cast("double") / col("n").cast("double")), 9)
          .cast("decimal(28,9)")) * 1000000000L).cast("long").as(out))
    val hx = marg(rt, "r", "hx_nano")
    val hy = marg(ct, "c", "hy_nano")
    val xl = rt.agg(count(lit(1)).as("x_levels"))
    val yl = ct.agg(count(lit(1)).as("y_levels"))
    tot.crossJoin(broadcast(xl)).crossJoin(broadcast(yl))
      .crossJoin(broadcast(mi)).crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
      .select(col("n"), col("x_levels"), col("y_levels"),
        col("mi_nano"), col("hx_nano"), col("hy_nano"),
        // nullif-guarded like q349/q361: a degenerate single-level marginal
        // has entropy 0, and DuckDB errors on // 0 while Spark's div
        // returns NULL — both engines must emit NULL instead.
        expr("mi_nano * 1000000 div nullif(least(hx_nano, hy_nano), 0)")
          .as("nmi_ppm"))
  }

  /** q365: mix-shift decomposition (Oaxaca–Blinder / BI "mix vs rate")
    * of the change in revenue-per-order between the first and second
    * half of the order history, by customer nation: Δ(overall rate) =
    * Σ_i Δshare_i·rate1_i  (MIX — the portfolio moved)
    * + Σ_i share1_i·Δrate_i (RATE — nations themselves changed)
    * + Σ_i Δshare_i·Δrate_i (interaction). The question every metric
    * review asks ("did revenue/order drop because customers shifted to
    * cheap segments, or because segments got cheaper?") as one exact
    * table.
    *
    * Determinism: every term is an integer rational of period cell
    * stats (counts, cents), µ-floored per term; the per-nation total
    * contribution ships alongside so the ≤3µ floor slack is visible.
    * Periods split at the (min+max+1)/2 order-day midpoint (q305's
    * device). Nations must appear in both periods (inner join; this
    * corpus always has all 25).
    *
    * Scale shape: one fact-dim join collapses map-side to
    * (nation, period) cells; totals broadcast back; ≤25 output rows. */
  val q365MixShift: Q = Q(
    "q365_mix_shift",
    """WITH j AS (SELECT c.c_nationkey AS nation,
      |                  CAST(floor(epoch(o.o_orderdate)) AS BIGINT) // 86400
      |                    AS day,
      |                  CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      |           FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
      |b AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM j),
      |cell AS (SELECT nation, CASE WHEN day < b.mid THEN 1 ELSE 2 END AS p,
      |                CAST(count(*) AS HUGEINT) AS n,
      |                CAST(sum(cents) AS HUGEINT) AS c
      |         FROM j, b GROUP BY 1, 2),
      |w AS (SELECT a.nation, a.n AS n1, a.c AS c1, z.n AS n2, z.c AS c2
      |      FROM cell a JOIN cell z ON z.nation = a.nation
      |      WHERE a.p = 1 AND z.p = 2),
      |t AS (SELECT sum(n1) AS nt1, sum(n2) AS nt2 FROM w)
      |SELECT CAST(w.nation AS BIGINT) AS nation,
      |       CAST(w.n1 AS BIGINT) AS n1, CAST(w.n2 AS BIGINT) AS n2,
      |       CAST(w.c1 // w.n1 AS BIGINT) AS rate1_cents,
      |       CAST(w.c2 // w.n2 AS BIGINT) AS rate2_cents,
      |       CAST((w.n2 * t.nt1 - w.n1 * t.nt2) * w.c1 * 1000000
      |            // (t.nt1 * t.nt2 * w.n1) AS BIGINT) AS mix_micro,
      |       CAST((w.c2 * w.n1 - w.c1 * w.n2) * 1000000
      |            // (t.nt1 * w.n2) AS BIGINT) AS rate_micro,
      |       CAST((w.n2 * t.nt1 - w.n1 * t.nt2)
      |            * (w.c2 * w.n1 - w.c1 * w.n2) * 1000000
      |            // (t.nt1 * t.nt2 * w.n1 * w.n2) AS BIGINT) AS inter_micro,
      |       CAST((w.c2 * t.nt1 - w.c1 * t.nt2) * 1000000
      |            // (t.nt1 * t.nt2) AS BIGINT) AS total_micro
      |FROM w, t ORDER BY 1""".stripMargin) { (s, dir) =>
    val dec = "decimal(38,0)"
    val j = Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
      .select(col("c_nationkey").as("nation"),
        expr("unix_timestamp(o_orderdate) div 86400").as("day"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val b = j.agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
    val cell = j.crossJoin(broadcast(b))
      .groupBy(col("nation"),
        when(col("day") < col("mid"), 1).otherwise(2).as("p"))
      .agg(count(lit(1)).cast(dec).as("n"), sum(col("cents").cast(dec)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = cell.filter(col("p") === 1)
      .select(col("nation"), col("n").as("n1"), col("c").as("c1"))
      .join(cell.filter(col("p") === 2)
        .select(col("nation"), col("n").as("n2"), col("c").as("c2")), "nation")
    val t = w.agg(sum(col("n1")).as("nt1"), sum(col("n2")).as("nt2"))
    w.crossJoin(broadcast(t))
      .select(col("nation").cast("long").as("nation"),
        col("n1").cast("long").as("n1"), col("n2").cast("long").as("n2"),
        expr("CAST(c1 div n1 AS LONG)").as("rate1_cents"),
        expr("CAST(c2 div n2 AS LONG)").as("rate2_cents"),
        expr("""CAST((n2 * nt1 - n1 * nt2) * c1 * 1000000
               |     div (nt1 * nt2 * n1) AS LONG)""".stripMargin).as("mix_micro"),
        expr("""CAST((c2 * n1 - c1 * n2) * 1000000
               |     div (nt1 * n2) AS LONG)""".stripMargin).as("rate_micro"),
        expr("""CAST((n2 * nt1 - n1 * nt2) * (c2 * n1 - c1 * n2) * 1000000
               |     div (nt1 * nt2 * n1 * n2) AS LONG)""".stripMargin)
          .as("inter_micro"),
        expr("""CAST((c2 * nt1 - c1 * nt2) * 1000000
               |     div (nt1 * nt2) AS LONG)""".stripMargin).as("total_micro"))
      .orderBy(col("nation"))
  }

  /** q366: Laspeyres and Paasche price indices per order-year against
    * the base (first) year — the canonical "did PRICES move or did the
    * BASKET move" separation, over part-level unit prices from
    * lineitem: L_t = Σp_t·q₀ / Σp₀·q₀ (base-year basket at current
    * prices), P_t = Σp_t·q_t / Σp₀·q_t (current basket at base prices).
    * L ≥ actual inflation ≥ P under substitution — reading both brackets
    * the truth; Fisher's geometric mean needs a sqrt and is left to the
    * consumer.
    *
    * Determinism: unit prices are milli-cent FLOORS of per-(year, part)
    * revenue/quantity rationals (the documented precision contract);
    * the indices are then single integer rationals in ppm. Quantities
    * are integral in this corpus (cast asserted by equality with
    * round()).
    *
    * Scale shape: lineitem collapses map-side to (year, part) cells
    * (catalog × years bounded); the base-year cell table joins each
    * year's cells by part; two cell-grain rollups per year. */
  val q366PriceIndex: Q = Q(
    "q366_price_index",
    """WITH l AS (SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
      |                  l.l_partkey AS pk,
      |                  CAST(round(l.l_quantity) AS BIGINT) AS q,
      |                  CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
      |           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
      |cell AS (SELECT yr, pk, CAST(sum(q) AS HUGEINT) AS q,
      |                CAST(sum(cents) AS HUGEINT) AS c
      |         FROM l GROUP BY 1, 2),
      |p AS (SELECT yr, pk, q, c * 1000 // q AS pm FROM cell),
      |b AS (SELECT pk, q AS q0, pm AS p0 FROM p
      |      WHERE yr = (SELECT min(yr) FROM p)),
      |ix AS (SELECT p.yr,
      |              CAST(count(*) AS BIGINT) AS n_parts,
      |              sum(p.pm * b.q0) AS ptq0, sum(b.p0 * b.q0) AS p0q0,
      |              sum(p.pm * p.q) AS ptqt, sum(b.p0 * p.q) AS p0qt
      |       FROM p JOIN b USING (pk) GROUP BY 1)
      |SELECT yr, n_parts,
      |       CAST(ptq0 * 1000000 // p0q0 AS BIGINT) AS laspeyres_ppm,
      |       CAST(ptqt * 1000000 // p0qt AS BIGINT) AS paasche_ppm
      |FROM ix ORDER BY yr""".stripMargin) { (s, dir) =>
    val dec = "decimal(38,0)"
    val l = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey").as("pk"),
        round(col("l_quantity")).cast("long").as("q"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .join(Tables(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"),
          expr("CAST(year(o_orderdate) AS LONG)").as("yr")), "l_orderkey")
    val cell = l.groupBy(col("yr"), col("pk"))
      .agg(sum(col("q").cast(dec)).as("q"), sum(col("cents").cast(dec)).as("c"))
      .withColumn("pm", expr("CAST(c * 1000 div q AS decimal(38,0))"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val y0 = cell.agg(min(col("yr"))).collect()(0).getLong(0)
    val b = cell.filter(col("yr") === y0)
      .select(col("pk"), col("q").as("q0"), col("pm").as("p0"))
    val ix = cell.join(b, "pk")
      .groupBy(col("yr"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("pm") * col("q0")).as("ptq0"), sum(col("p0") * col("q0")).as("p0q0"),
        sum(col("pm") * col("q")).as("ptqt"), sum(col("p0") * col("q")).as("p0qt"))
    ix.select(col("yr"), col("n_parts"),
        expr("CAST(ptq0 * 1000000 div p0q0 AS LONG)").as("laspeyres_ppm"),
        expr("CAST(ptqt * 1000000 div p0qt AS LONG)").as("paasche_ppm"))
      .orderBy(col("yr"))
  }

  /** q371: delete-1 jackknife for a RATIO metric (revenue per order) —
    * the resampling-free uncertainty estimate the bootstrap (q310) family
    * was missing: leave each order-day out once, recompute the ratio,
    * and combine. Ratios are where the naive per-cell variance is wrong
    * (the denominator varies too), and the jackknife handles that with
    * ZERO randomness — every replicate is determined by the data, so the
    * cross-engine gate needs no seed discipline at all. Ships the
    * bias-corrected point estimate d·θ̂ − (d−1)·θ̄ and the jackknife
    * variance (d−1)/d · Σ(θ_i − θ̄)².
    *
    * Determinism: day cells are integer (count, cents) pairs; each
    * replicate θ_i is one micro-floor division of exact complements; the
    * squared deviations go through DECIMAL(38,0)/HUGEINT so no square
    * ever truncates.
    *
    * Scale shape: rows collapse map-side to day cells (calendar-bounded);
    * replicates are cell arithmetic against broadcast totals — the
    * classic "jackknife over partitions" shape that needs no second pass
    * over the data. */
  val q371JackknifeRatio: Q = Q(
    "q371_jackknife_ratio",
    """WITH o AS (SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400
      |                    AS day,
      |                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |           FROM orders),
      |cell AS (SELECT day, CAST(count(*) AS BIGINT) AS n,
      |                CAST(sum(cents) AS BIGINT) AS c
      |         FROM o GROUP BY 1),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS d,
      |             CAST(sum(n) AS BIGINT) AS nt,
      |             CAST(sum(c) AS BIGINT) AS ct FROM cell),
      |rep AS (SELECT (ct - c) * 1000000 // nullif(nt - n, 0) AS theta_i
      |        FROM cell, t),
      |m AS (SELECT CAST(sum(theta_i) // count(*) AS BIGINT) AS theta_bar
      |      FROM rep),
      |sq AS (SELECT CAST(sum(CAST((theta_i - theta_bar) AS HUGEINT)
      |                        * (theta_i - theta_bar)) AS HUGEINT) AS ssq
      |       FROM rep, m)
      |SELECT t.d AS n_days, t.nt AS n_orders,
      |       CAST(t.ct * 1000000 // t.nt AS BIGINT) AS theta_micro,
      |       CAST(t.d * (t.ct * 1000000 // t.nt) - (t.d - 1) * m.theta_bar
      |         AS BIGINT) AS theta_jack_micro,
      |       CAST(CAST(sq.ssq // 1000000000000 AS BIGINT) * (t.d - 1) // t.d
      |         AS BIGINT) AS jack_var_cents2
      |FROM t, m, sq""".stripMargin) { (s, dir) =>
    val dec = "decimal(38,0)"
    val cell = Tables(s, dir, "orders")
      .select(expr("unix_timestamp(o_orderdate) div 86400").as("day"),
        expr("CAST(round(o_totalprice * 100) AS LONG)").as("cents"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val t = cell.agg(count(lit(1)).as("d"), sum(col("n")).as("nt"),
      sum(col("c")).as("ct"))
    val rep = cell.crossJoin(broadcast(t))
      .select(expr("(ct - c) * 1000000 div nullif(nt - n, 0)").as("theta_i"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = rep.agg(expr("CAST(sum(theta_i) div count(*) AS LONG)")
      .as("theta_bar"))
    val sq = rep.crossJoin(broadcast(m))
      .agg(sum((col("theta_i") - col("theta_bar")).cast("decimal(19,0)")
        * (col("theta_i") - col("theta_bar")).cast("decimal(19,0)"))
        .cast(dec).as("ssq"))
    t.crossJoin(broadcast(m)).crossJoin(broadcast(sq))
      .select(col("d").as("n_days"), col("nt").as("n_orders"),
        expr("CAST(ct * 1000000 div nt AS LONG)").as("theta_micro"),
        expr("CAST(d * (ct * 1000000 div nt) - (d - 1) * theta_bar AS LONG)")
          .as("theta_jack_micro"),
        // micro² deviations re-scale to cents² BEFORE the (d-1)/d factor
        // (identical floor order in both engines; the raw micro² sum can
        // exceed INT64 at small SF where single-day deletion moves the
        // ratio a lot).
        expr("CAST(CAST(ssq div 1000000000000 AS LONG) * (d - 1) div d AS LONG)")
          .as("jack_var_cents2"))
  }

  /** q372: 1-D Wasserstein (earth-mover) drift between the order-value
    * distributions of the first and second order-history halves — the
    * magnitude-aware companion to KS (q135 reports the max CDF gap; W1
    * reports the AREA between the CDFs, in cents, which is what a
    * finance review can act on). W1 = Σ_levels |F1 − F2|·Δx, computed
    * EXACTLY by cross-multiplying the CDFs over pooled value levels:
    * |c1·N2 − c2·N1|·gap summed in HUGEINT, divided once at the surface.
    *
    * Determinism: counts, cross-products, and gaps are integers
    * end-to-end; the only division is the final milli-cent floor.
    *
    * Scale shape: rows collapse map-side to (cents-level, period) cells;
    * the cum runs over value LEVELS (the q299/q313 bounded-reduction
    * precedent), never rows. */
  val q372WassersteinDrift: Q = Q(
    "q372_wasserstein_drift",
    """WITH o AS (SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400
      |                    AS day,
      |                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |           FROM orders),
      |b AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM o),
      |cell AS (SELECT cents,
      |                CAST(sum(CASE WHEN day < b.mid THEN 1 ELSE 0 END)
      |                  AS BIGINT) AS n1,
      |                CAST(sum(CASE WHEN day >= b.mid THEN 1 ELSE 0 END)
      |                  AS BIGINT) AS n2
      |         FROM o, b GROUP BY 1),
      |t AS (SELECT CAST(sum(n1) AS BIGINT) AS nt1,
      |             CAST(sum(n2) AS BIGINT) AS nt2,
      |             CAST(count(*) AS BIGINT) AS n_levels FROM cell),
      |w AS (SELECT cents,
      |             sum(n1) OVER (ORDER BY cents) AS c1,
      |             sum(n2) OVER (ORDER BY cents) AS c2,
      |             lead(cents) OVER (ORDER BY cents) AS nxt
      |      FROM cell),
      |s AS (SELECT CAST(sum(CAST(abs(c1 * t.nt2 - c2 * t.nt1) AS HUGEINT)
      |                        * (coalesce(nxt, cents) - cents)) AS HUGEINT)
      |               AS area
      |      FROM w, t)
      |SELECT t.nt1 AS n_first, t.nt2 AS n_second, t.n_levels,
      |       CAST(s.area * 1000 // (t.nt1 * t.nt2) AS BIGINT)
      |         AS w1_milli_cents
      |FROM t, s""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val o = Tables(s, dir, "orders")
      .select(expr("unix_timestamp(o_orderdate) div 86400").as("day"),
        expr("CAST(round(o_totalprice * 100) AS LONG)").as("cents"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val b = o.agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
    val cell = o.crossJoin(broadcast(b))
      .groupBy(col("cents"))
      .agg(sum(when(col("day") < col("mid"), 1).otherwise(0)).as("n1"),
        sum(when(col("day") >= col("mid"), 1).otherwise(0)).as("n2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val t = cell.agg(sum(col("n1")).as("nt1"), sum(col("n2")).as("nt2"),
      count(lit(1)).as("n_levels"))
    val win = Window.orderBy(col("cents"))
    val w = cell.select(col("cents"),
      sum(col("n1")).over(win).as("c1"),
      sum(col("n2")).over(win).as("c2"),
      lead(col("cents"), 1).over(win).as("nxt"))
    // Widen BEFORE the cross-multiply: the oracle's window sums are
    // HUGEINT, so its products never wrap — a LongType c1*nt2 here would
    // silently wrap (non-ANSI) once a half exceeds ~3e9 rows. Same for
    // the nt1*nt2 normalizer below.
    val area = w.crossJoin(broadcast(t))
      .agg(sum(expr(
        "abs(CAST(c1 AS DECIMAL(20,0)) * nt2 - CAST(c2 AS DECIMAL(20,0)) * nt1)")
        * expr("coalesce(nxt, cents) - cents").cast("decimal(10,0)"))
        .cast("decimal(38,0)").as("area"))
    t.crossJoin(broadcast(area))
      .select(col("nt1").as("n_first"), col("nt2").as("n_second"),
        col("n_levels"),
        expr("CAST(area * 1000 div (CAST(nt1 AS DECIMAL(20,0)) * nt2) AS LONG)")
          .as("w1_milli_cents"))
  }

  /** q374: Benjamini–Hochberg FDR control over the exposure-metric
    * family — the MULTIPLICITY layer the per-test kernels (q166 z-test,
    * q311 χ², q319 SPRT) stop short of: test every non-purchase event
    * type for association with conversion and control the false-discovery
    * rate at 5% across the m=4 family. Each statistic is q166's sqrt-free
    * pooled z² as an exact rational, FLOORED once to milli-units; BH's
    * step-up compares p_(i) ≤ α·i/m, rendered as z² ≥ χ²₁(1 − α·i/m)
    * against the four precomputed critical constants (6238, 5023, 4327,
    * 3841 milli — χ²₁ quantiles at .0125/.025/.0375/.05, fixed by the
    * test DESIGN, not the data), and rejects every rank ≤ the largest
    * passing rank. Rank comes from a 4-row self-join count, not a window.
    *
    * Determinism: integer counts, HUGEINT cross-multiplies, one milli
    * floor per statistic; ties rank by event_type asc in both engines.
    *
    * Scale shape: users collapse map-side to (user, conv) + distinct
    * (type, user); the family table is ≤ |event types| rows. */
  val q374FdrBh: Q = Q(
    "q374_fdr_bh",
    """WITH u AS (SELECT user_id,
      |                  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
      |                      END) AS conv
      |           FROM events GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS nu,
      |               CAST(sum(conv) AS BIGINT) AS xu FROM u),
      |tu AS (SELECT DISTINCT e.event_type, e.user_id FROM events e
      |       WHERE e.event_type <> 'purchase'),
      |g AS (SELECT tu.event_type,
      |             CAST(count(*) AS BIGINT) AS n1,
      |             CAST(sum(u.conv) AS BIGINT) AS x1
      |      FROM tu JOIN u ON u.user_id = tu.user_id GROUP BY 1),
      |z AS (SELECT g.event_type, g.n1, g.x1,
      |             tot.nu - g.n1 AS n2, tot.xu - g.x1 AS x2,
      |             CAST(CAST(g.x1 * (tot.nu - g.n1)
      |                       - (tot.xu - g.x1) * g.n1 AS HUGEINT)
      |                  * (g.x1 * (tot.nu - g.n1)
      |                     - (tot.xu - g.x1) * g.n1)
      |                  * tot.nu * 1000
      |                  // nullif(CAST(tot.xu AS HUGEINT)
      |                           * (tot.nu - tot.xu)
      |                           * g.n1 * (tot.nu - g.n1), 0)
      |               AS BIGINT) AS z2_milli
      |      FROM g, tot),
      |r AS (SELECT a.*,
      |             CAST(1 + (SELECT count(*) FROM z b
      |                       WHERE coalesce(b.z2_milli, -1)
      |                               > coalesce(a.z2_milli, -1)
      |                          OR (coalesce(b.z2_milli, -1)
      |                                = coalesce(a.z2_milli, -1)
      |                              AND b.event_type < a.event_type))
      |               AS BIGINT) AS rnk
      |      FROM z a),
      |crit AS (SELECT * FROM (VALUES (1, 6238), (2, 5023), (3, 4327),
      |                               (4, 3841)) AS c(rnk, crit_milli)),
      |p AS (SELECT r.*, crit.crit_milli,
      |             coalesce(r.z2_milli >= crit.crit_milli, FALSE) AS passes
      |      FROM r JOIN crit ON crit.rnk = r.rnk),
      |kmax AS (SELECT coalesce(max(CASE WHEN passes THEN rnk END), 0) AS k
      |         FROM p)
      |SELECT p.event_type, p.n1 AS n_exposed, p.x1 AS conv_exposed,
      |       p.n2 AS n_rest, p.x2 AS conv_rest, p.z2_milli, p.rnk,
      |       p.rnk <= kmax.k AS bh_reject
      |FROM p, kmax ORDER BY p.rnk""".stripMargin) { (s, dir) =>
    val dec = "decimal(38,0)"
    val ev = Tables(s, dir, "events")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val u = ev.groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = u.agg(count(lit(1)).as("nu"), sum(col("conv")).as("xu"))
    val tu = ev.filter(col("event_type") =!= "purchase")
      .select(col("event_type"), col("user_id")).distinct()
    val g = tu.join(u, "user_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n1"), sum(col("conv")).as("x1"))
    val z = g.crossJoin(broadcast(tot))
      .select(col("event_type"), col("n1"), col("x1"),
        (col("nu") - col("n1")).as("n2"), (col("xu") - col("x1")).as("x2"),
        expr(s"""CAST(CAST(x1 * (nu - n1) - (xu - x1) * n1 AS $dec)
                |     * (x1 * (nu - n1) - (xu - x1) * n1)
                |     * nu * 1000
                |     div nullif(CAST(xu AS $dec) * (nu - xu)
                |                * n1 * (nu - n1), 0)
                |  AS LONG)""".stripMargin).as("z2_milli"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Null-safe rank key: a degenerate family (everyone converts →
    // denominator 0 → NULL statistic) must still produce a TOTAL order,
    // or the two engines tie-break differently. z² ≥ 0, so −1 sorts
    // every NULL stat last deterministically.
    val zb = broadcast(z.select(coalesce(col("z2_milli"), lit(-1L)).as("bz"),
      col("event_type").as("bt")))
    val r = z.withColumn("rz", coalesce(col("z2_milli"), lit(-1L)))
      .join(zb,
        col("bz") > col("rz") ||
          (col("bz") === col("rz") && col("bt") < col("event_type")),
        "left")
      .groupBy(col("event_type"), col("n1"), col("x1"), col("n2"),
        col("x2"), col("z2_milli"))
      .agg((count(col("bt")) + 1).as("rnk"))
    // The critical table IS the test design: χ²₁ quantiles at 1 − α·i/m
    // for m = 4. A 5th event type would both silently vanish through the
    // rnk inner join AND invalidate every α·i/m threshold — the result
    // would quietly stop being BH at 5%. Fail loudly instead (driver-side
    // scalar over the ≤|event types|-row family frame, not a data-volume
    // collect); the paired oracle SQL hardcodes the same design, so a
    // family change surfaces as this error, never as a green-but-wrong
    // gate.
    val m = z.count()
    require(m == 4, s"q374: BH critical table is designed for a family of " +
      s"4 non-purchase event types; data has $m — regenerate crit " +
      "(chi-sq_1 quantiles at 1 - 0.05*i/m) before trusting the thresholds")
    val crit = s.createDataFrame(Seq((1L, 6238L), (2L, 5023L), (3L, 4327L),
      (4L, 3841L))).toDF("rnk", "crit_milli")
    val p = r.join(broadcast(crit), "rnk")
      .withColumn("passes",
        coalesce(col("z2_milli") >= col("crit_milli"), lit(false)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kmax = p.agg(coalesce(max(when(col("passes"), col("rnk"))), lit(0L))
      .as("k"))
    p.crossJoin(broadcast(kmax))
      .select(col("event_type"), col("n1").as("n_exposed"),
        col("x1").as("conv_exposed"), col("n2").as("n_rest"),
        col("x2").as("conv_rest"), col("z2_milli"), col("rnk"),
        (col("rnk") <= col("k")).as("bh_reject"))
      .orderBy(col("rnk"))
  }

  /** q379: Atkinson inequality index (ε = 1) over per-customer spend —
    * the WELFARE-weighted inequality measure the Gini/Lorenz pair (q164/
    * q176) doesn't give: at ε=1, A = 1 − geomean/mean, so it answers
    * "what fraction of total spend could be discarded if it were spread
    * evenly, at log utility". Surfaced in LOG space (the gap
    * ln(mean) − mean(ln) = −ln(1−A) ≥ 0, in nanos) because exp() is the
    * one libm call the cross-engine discipline cannot make exact —
    * the gap is the index in nats, 0 ⟺ perfect equality, monotone in A.
    *
    * Determinism: each ln takes an exact-integer-valued double (cents,
    * and the mean as one exact rational division), rounds to 9 decimals
    * before the DECIMAL(28,9) sum (q335's device); the mean-of-logs
    * divides once in nano space.
    *
    * Scale shape: customer totals are one map-side-combined rollup; the
    * log moments are a second map-side pass over customer grain. */
  val q379Atkinson: Q = Q(
    "q379_atkinson",
    """WITH s AS (SELECT o_custkey,
      |                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
      |                    AS BIGINT) AS cents
      |           FROM orders GROUP BY 1),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |             CAST(sum(cents) AS BIGINT) AS ct FROM s),
      |l AS (SELECT CAST(sum(CAST(round(ln(CAST(cents AS DOUBLE)), 9)
      |                          AS DECIMAL(28,9))) * 1000000000 AS HUGEINT)
      |               AS sum_ln_nano
      |      FROM s)
      |SELECT t.n AS n_customers, CAST(t.ct // t.n AS BIGINT) AS mean_cents,
      |       CAST(l.sum_ln_nano // t.n AS BIGINT) AS mean_ln_nano,
      |       CAST(CAST(round(ln(CAST(t.ct AS DOUBLE) / CAST(t.n AS DOUBLE)),
      |                       9) AS DECIMAL(28,9)) * 1000000000 AS BIGINT)
      |         AS ln_mean_nano,
      |       CAST(CAST(round(ln(CAST(t.ct AS DOUBLE) / CAST(t.n AS DOUBLE)),
      |                       9) AS DECIMAL(28,9)) * 1000000000 AS BIGINT)
      |         - CAST(l.sum_ln_nano // t.n AS BIGINT) AS atkinson_gap_nano
      |FROM t, l""".stripMargin) { (s, dir) =>
    val sp = Tables(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS LONG)")).as("cents"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val t = sp.agg(count(lit(1)).as("n"), sum(col("cents")).as("ct"))
    val l = sp.agg((sum(round(log(col("cents").cast("double")), 9)
        .cast("decimal(28,9)")) * 1000000000L).cast("decimal(38,0)")
      .as("sum_ln_nano"))
    t.crossJoin(broadcast(l))
      .select(col("n").as("n_customers"),
        expr("CAST(ct div n AS LONG)").as("mean_cents"),
        expr("CAST(sum_ln_nano div n AS LONG)").as("mean_ln_nano"),
        // DECIMAL route for the ×10⁹ shift (q343's nano trick): a raw
        // double×1e9 cast truncates in Spark but rounds in DuckDB.
        (round(log(col("ct").cast("double") / col("n").cast("double")), 9)
          .cast("decimal(28,9)") * 1000000000L).cast("long")
          .as("ln_mean_nano"))
      .withColumn("atkinson_gap_nano",
        col("ln_mean_nano") - col("mean_ln_nano"))
  }

  val all: Seq[Q] = Seq(
    q371JackknifeRatio, q372WassersteinDrift, q374FdrBh, q379Atkinson,
    q348MutualInformation, q365MixShift, q366PriceIndex,
    q299QuantileNormalize, q304SrmCheck, q305CupedAdjust,
    q309MannWhitney, q310BootstrapCi, q311Chi2Independence, q313Spearman,
    q316BenfordAudit, q319SprtMonitor, q320EbShrinkage, q321PowerDesign,
    q323CemAtt, q324Did, q330IpwAte, q332MannKendall, q333KruskalWallis,
    q334PermutationTest,
    q25Percentiles, q26StringAgg, q27SetOps, q28Pivot, q29WindowFuncs,
    q42SaltedAgg, q43ApproxSketches, q44GroupingSets, q45CorrelatedSubquery,
    q88MomentStats, q89Winsorized, q91TopKAggregate, q125GroupRegression,
    q127Skyline, q136SigmaOutliers, q140Unpivot, q147GroupQuantiles,
    q148BagSetOps, q156MadOutliers, q159SketchMerge, q162RelativeRank,
    q163GroupMode, q164GiniConcentration, q166AbTest, q167AudienceOverlap,
    q168WeightedQuantiles, q176LorenzPoints, q205ParetoPoint,
    q254KllMergeQuantiles, q283SkewAudit)
}
