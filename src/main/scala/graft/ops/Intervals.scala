package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Interval/range join: match rows of a big fact table against arbitrary
  * time intervals with NO equi-key — the join predicate is pure
  * containment (`lo <= ts < hi`). Spark has no native range-join
  * optimization (a raw θ-join plans as BroadcastNestedLoopJoin, O(N×M)
  * predicate evaluations), so the scale path is the classic *bin
  * bucketing* rewrite:
  *
  *   1. explode each interval into the fixed-width bins (days) it overlaps
  *      — O(span/width) rows per interval, bounded and tiny;
  *   2. key each probe row by its own bin — a pure map-side projection;
  *   3. hash equi-join on the bin key (broadcast here: the exploded
  *      interval table is intervals × days — if intervals are huge, the
  *      same plan shuffles on the bin key instead);
  *   4. re-check the exact containment predicate to discard same-bin
  *      near-misses.
  *
  * This turns the nested-loop into one codegen'd hash join whose probe
  * side streams straight off the parquet scan — linear in fact rows,
  * independent of interval count. Bin width trades interval-side blowup
  * (span/width rows) against probe-side false candidates (≤ 2 bins'
  * worth); day-width fits date-shaped intervals.
  */
object Intervals {

  /** q61: for each 14-day promotion window anchored at a sampled order's
    * date (o_orderkey % 997 = 0 — a deterministic ~0.1% of orders), count
    * the lineitems shipped inside the window and their total quantity.
    * There is deliberately no l_orderkey = o_orderkey condition: the match
    * is containment-only, which is what makes this a range join. The
    * DuckDB oracle states the predicate directly (its IEJoin handles
    * ranges natively); the Spark plan is the binned rewrite above. */
  val q61RangeJoin: Q = Q(
    "q61_range_join",
    s"""WITH iv AS (SELECT o_orderkey, o_orderdate AS lo,
       |                   o_orderdate + INTERVAL 14 DAY AS hi
       |            FROM orders WHERE o_orderkey % 997 = 0)
       |SELECT o_orderkey, count(*) AS n_items, ${Q.oSum2("l_quantity")} AS sum_qty
       |FROM iv JOIN lineitem ON l_shipdate >= lo AND l_shipdate < hi
       |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val iv = Tables(s, dir, "orders")
      .filter(col("o_orderkey") % 997 === 0)
      .select(
        col("o_orderkey"),
        col("o_orderdate").as("lo"),
        (col("o_orderdate") + expr("INTERVAL 14 DAYS")).as("hi"))
    // 1-2: interval → day bins (15 rows per interval); probe rows carry
    // their own day. The exploded interval table is provably small
    // (intervals × 15), so it broadcasts; the lineitem side never shuffles.
    val bins = iv.select(
      col("o_orderkey"), col("lo"), col("hi"),
      explode(expr("sequence(to_date(lo), to_date(hi), interval 1 day)")).as("day"))
    Tables(s, dir, "lineitem")
      .select(col("l_shipdate"), col("l_quantity"))
      .withColumn("day", to_date(col("l_shipdate")))
      .join(broadcast(bins), Seq("day"))
      // 4: exact containment re-check (bins are coarser than the interval).
      .filter(col("l_shipdate") >= col("lo") && col("l_shipdate") < col("hi"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_items"), Q.dsum2(col("l_quantity")).as("sum_qty"))
      .orderBy(col("o_orderkey"))
  }

  /** q80: interval OVERLAP join — the two-sided generalization of q61.
    * Both inputs are interval tables and the predicate is pure overlap
    * (`a.lo < b.hi AND b.lo < a.hi`, half-open semantics); there is no
    * equi-key at all, so Spark would plan a raw θ-join as a nested loop.
    *
    * Same bin-bucketing rewrite, applied to BOTH sides: explode each
    * interval into the month bins it covers, equi-join on the bin, dedupe
    * the (pair) hits (an overlapping pair shares every month of its
    * intersection — distinct collapses the multiplicity), then re-check
    * the exact predicate to kill same-bin near-misses. Month width fits
    * these spans: customer activity windows cover ≤ ~84 months (bounded
    * per interval), promo windows ≤ 2.
    *
    * Inputs: A = per-customer activity windows [first_order,
    * last_order + 5d) over a deterministic 10% customer sample; B = 21-day
    * promo windows anchored at sampled orders. Output: customers whose
    * activity window overlaps each promo. The DuckDB oracle states the
    * overlap predicate directly (IEJoin). */
  val q80IntervalOverlap: Q = Q(
    "q80_interval_overlap",
    """WITH a AS (SELECT o_custkey AS cust, min(o_orderdate) AS lo,
      |                  max(o_orderdate) + INTERVAL 5 DAY AS hi
      |           FROM orders WHERE o_custkey % 10 = 0 GROUP BY 1),
      |b AS (SELECT o_orderkey, o_orderdate AS lo,
      |             o_orderdate + INTERVAL 21 DAY AS hi
      |      FROM orders WHERE o_orderkey % 499 = 0)
      |SELECT b.o_orderkey, count(*) AS n_custs
      |FROM b JOIN a ON a.lo < b.hi AND b.lo < a.hi
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val orders = Tables(s, dir, "orders")
    val a = orders.filter(col("o_custkey") % 10 === 0)
      .groupBy(col("o_custkey").as("cust"))
      .agg(
        min(col("o_orderdate")).as("lo"),
        (max(col("o_orderdate")) + expr("INTERVAL 5 DAYS")).as("hi"))
    val b = orders.filter(col("o_orderkey") % 499 === 0)
      .select(
        col("o_orderkey"),
        col("o_orderdate").as("lo"),
        (col("o_orderdate") + expr("INTERVAL 21 DAYS")).as("hi"))
    // Half-open [lo, hi): the last covered month bin is month(hi - 1 day)
    // (all boundary values are midnight timestamps).
    def monthBins(df: org.apache.spark.sql.DataFrame) = df.withColumn(
      "mon",
      explode(expr(
        "sequence(date_trunc('month', lo), date_trunc('month', hi - INTERVAL 1 DAY), interval 1 month)")))
    val aBins = monthBins(a).withColumnsRenamed(Map("lo" -> "a_lo", "hi" -> "a_hi"))
    val bBins = monthBins(b).withColumnsRenamed(Map("lo" -> "b_lo", "hi" -> "b_hi"))
    aBins.join(broadcast(bBins), Seq("mon"))
      .filter(col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi"))
      .select(col("o_orderkey"), col("cust"))
      .distinct()
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_custs"))
      .orderBy(col("o_orderkey"))
  }

  /** q139: interval coalescing (gaps-and-islands MERGE) — each event opens
    * a fixed 10-minute availability interval [ts, ts+600); overlapping or
    * touching intervals per user merge into maximal islands. The classic
    * exact form: a row starts a new island iff its `lo` exceeds the
    * running max of all PRIOR `hi` (running max, not lag — an earlier long
    * interval can swallow several later short ones, which lag-based
    * sessionization like q22 would wrongly split). Island id = running sum
    * of the start flags; islands then collapse to (start, end, size).
    * Everything is exact epoch-second integers.
    *
    * Scale shape: one shuffle on user_id serves both window passes AND the
    * final groupBy (same partitioning, no second exchange); per-user
    * timelines sort independently, nothing global. At 100 TB this is the
    * availability/uptime-merge kernel: state per task = one running max. */
  val q139IntervalCoalesce: Q = Q(
    "q139_interval_coalesce",
    """WITH iv AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS lo,
      |         CAST(floor(epoch(ts)) + 600 AS BIGINT) AS hi
      |  FROM events),
      |m AS (
      |  SELECT user_id, lo, hi,
      |         CASE WHEN lo > coalesce(max(hi) OVER (
      |                PARTITION BY user_id ORDER BY lo, hi
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
      |              THEN 1 ELSE 0 END AS new_isl
      |  FROM iv),
      |g AS (
      |  SELECT user_id, lo, hi,
      |         sum(new_isl) OVER (PARTITION BY user_id ORDER BY lo, hi
      |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS isl
      |  FROM m)
      |SELECT user_id, min(lo) AS island_start, max(hi) AS island_end,
      |       count(*) AS n_intervals
      |FROM g GROUP BY user_id, isl
      |ORDER BY user_id, island_start""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("lo"), col("hi"))
    val iv = Tables(s, dir, "events")
      .select(col("user_id"), unix_timestamp(col("ts")).as("lo"))
      .withColumn("hi", col("lo") + 600)
    iv.withColumn("new_isl",
        when(col("lo") > coalesce(
          max(col("hi")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(-1L)), 1).otherwise(0))
      .withColumn("isl",
        sum(col("new_isl")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("isl"))
      .agg(min(col("lo")).as("island_start"), max(col("hi")).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .drop("isl")
      .orderBy(col("user_id"), col("island_start"))
  }

  /** q152: nearest-neighbor join in one dimension — each order price
    * matches the part with the CLOSEST retail price, either direction
    * (q24/q60's as-of join is the backward-only special case). The
    * classic merge trick: tag refs 0 / probes 1, "sort" by (price, tag),
    * carry the last-ref-seen forward (prev ≤) and, in reverse, backward
    * (next >); the nearer side wins, ties to the lower price and an
    * equal-price ref lands on the prev side (diff 0). Refs reduce to
    * price LEVELS (min partkey per level) and probes to distinct levels
    * first, so ties are total-ordered in both engines.
    *
    * Scale shape: the global sorted merge is decomposed by coarse price
    * buckets — within-bucket carries are windows PARTITIONED by bucket,
    * and cross-bucket carry-in/out comes from a per-bucket summary (max
    * ref / min ref struct) cascaded through a tiny window over ~#buckets
    * rows, broadcast back. No single-partition window touches row-scale
    * data; the oracle runs the same logic as one global window, so gate
    * equality proves the bucket decomposition lossless. */
  val q152NearestJoin: Q = Q(
    "q152_nearest_join",
    """WITH refs AS (
      |  SELECT CAST(round(p_retailprice * 100) AS BIGINT) AS price,
      |         min(p_partkey) AS rk
      |  FROM part GROUP BY 1),
      |pr AS (SELECT DISTINCT CAST(round(o_totalprice * 100) AS BIGINT) AS price
      |       FROM orders),
      |u AS (SELECT price, 0 AS tag, rk FROM refs
      |      UNION ALL SELECT price, 1, NULL FROM pr),
      |w AS (
      |  SELECT price, tag,
      |    last_value(CASE WHEN tag = 0 THEN price END IGNORE NULLS)
      |      OVER (ORDER BY price, tag
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_p,
      |    last_value(CASE WHEN tag = 0 THEN rk END IGNORE NULLS)
      |      OVER (ORDER BY price, tag
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_k,
      |    last_value(CASE WHEN tag = 0 THEN price END IGNORE NULLS)
      |      OVER (ORDER BY price DESC, tag DESC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS next_p,
      |    last_value(CASE WHEN tag = 0 THEN rk END IGNORE NULLS)
      |      OVER (ORDER BY price DESC, tag DESC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS next_k
      |  FROM u)
      |SELECT price AS order_price_cents,
      |  CASE WHEN next_p IS NULL
      |         OR (prev_p IS NOT NULL AND price - prev_p <= next_p - price)
      |       THEN prev_p ELSE next_p END AS part_price_cents,
      |  CASE WHEN next_p IS NULL
      |         OR (prev_p IS NOT NULL AND price - prev_p <= next_p - price)
      |       THEN prev_k ELSE next_k END AS p_partkey,
      |  CASE WHEN next_p IS NULL
      |         OR (prev_p IS NOT NULL AND price - prev_p <= next_p - price)
      |       THEN price - prev_p ELSE next_p - price END AS dist_cents
      |FROM w WHERE tag = 1 ORDER BY price""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val refs = Tables(s, dir, "part")
      .groupBy(round(col("p_retailprice") * 100).cast("long").as("price"))
      .agg(min(col("p_partkey")).as("rk"))
    val probes = Tables(s, dir, "orders")
      .select(round(col("o_totalprice") * 100).cast("long").as("price"))
      .distinct()
    val u = refs.select(col("price"), lit(0).as("tag"), col("rk"))
      .unionByName(probes.select(col("price"), lit(1).as("tag"),
        lit(null).cast("long").as("rk")))
      .withColumn("b", expr("price div 100000"))
    val refP = when(col("tag") === 0, col("price"))
    val refK = when(col("tag") === 0, col("rk"))
    val wAsc = Window.partitionBy(col("b"))
      .orderBy(col("price"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wDesc = Window.partitionBy(col("b"))
      .orderBy(col("price").desc, col("tag").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // Each direction's (price, key) pair rides ONE WindowExec: a
    // withColumn chain would interleave Projects between same-spec
    // windows and defeat window collapsing — four data passes where two
    // suffice (PlanShapeSpec asserts the 2-node shape).
    val inBucket = u
      .select(col("*"),
        last(refP, ignoreNulls = true).over(wAsc).as("prev_p"),
        last(refK, ignoreNulls = true).over(wAsc).as("prev_k"))
      .select(col("*"),
        last(refP, ignoreNulls = true).over(wDesc).as("next_p"),
        last(refK, ignoreNulls = true).over(wDesc).as("next_k"))
    // Cross-bucket carries: per-bucket extreme ref (struct orders by
    // price first; ref prices are unique levels), cascaded through a
    // window over the ~#buckets summary rows only.
    val summary = u.groupBy(col("b")).agg(
      max(when(col("tag") === 0, struct(col("price"), col("rk")))).as("hi_ref"),
      min(when(col("tag") === 0, struct(col("price"), col("rk")))).as("lo_ref"))
    val wPrevB = Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)
    val wNextB = Window.orderBy(col("b").desc).rowsBetween(Window.unboundedPreceding, -1)
    val carries = summary
      .withColumn("carry_prev", last(col("hi_ref"), ignoreNulls = true).over(wPrevB))
      .withColumn("carry_next", last(col("lo_ref"), ignoreNulls = true).over(wNextB))
      .select(col("b"), col("carry_prev"), col("carry_next"))
    val full = inBucket.join(broadcast(carries), "b")
      .select(col("price"), col("tag"),
        coalesce(col("prev_p"), col("carry_prev.price")).as("prev_p"),
        coalesce(col("prev_k"), col("carry_prev.rk")).as("prev_k"),
        coalesce(col("next_p"), col("carry_next.price")).as("next_p"),
        coalesce(col("next_k"), col("carry_next.rk")).as("next_k"))
    val usePrev = col("next_p").isNull ||
      (col("prev_p").isNotNull && col("price") - col("prev_p") <= col("next_p") - col("price"))
    full.filter(col("tag") === 1)
      .select(col("price").as("order_price_cents"),
        when(usePrev, col("prev_p")).otherwise(col("next_p")).as("part_price_cents"),
        when(usePrev, col("prev_k")).otherwise(col("next_k")).as("p_partkey"),
        when(usePrev, col("price") - col("prev_p"))
          .otherwise(col("next_p") - col("price")).as("dist_cents"))
      .orderBy(col("order_price_cents"))
  }

  val all: Seq[Q] = Seq(q61RangeJoin, q80IntervalOverlap, q139IntervalCoalesce,
    q152NearestJoin)
}
