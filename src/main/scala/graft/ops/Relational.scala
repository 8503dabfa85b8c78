package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q._

/** Reference-parity analytical surface (SURVEY.md §2.9 Q1–Q5, §2.4 A1/A2/A5,
  * §2.3/§2.5 extension joins/windows/set-ops), expressed over the driver
  * testdata star schema.
  *
  * Mapping of the reference's git domain onto the testdata (FIXTURES.md):
  * `orders` plays `commits` (o_custkey ≈ author, o_orderdate ≈ committed_at),
  * `lineitem` plays `file_changes`. Every query is a pure
  * `(SparkSession, sfDir) => DataFrame` with a deterministic total order so
  * the DuckDB-oracle hash compare is stable.
  *
  * Scale design: group-bys shuffle on their grouping keys only after a
  * codegen'd partial aggregate (map-side combine); dimension joins are
  * explicitly broadcast; top-k queries compile to TakeOrderedAndProject
  * (no global sort materialization).
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Q1 "commits-by-author leaderboard" (README.md:59-63; A1 src/transforms.ts:11-39).
    * min_by tie-broken on a unique key, mirroring SURVEY §7.5 risk #1. */
  val q1Authors: Q = Q(
    "q1_authors_leaderboard",
    """SELECT o_custkey AS author_key,
      |       count(*) AS total_commits,
      |       min(o_orderdate) AS first_commit_at,
      |       max(o_orderdate) AS last_commit_at,
      |       arg_min(o_orderstatus, o_orderkey) AS first_status
      |FROM orders GROUP BY o_custkey
      |ORDER BY total_commits DESC, author_key""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_custkey").as("author_key"))
      .agg(
        count(lit(1)).as("total_commits"),
        min(col("o_orderdate")).as("first_commit_at"),
        max(col("o_orderdate")).as("last_commit_at"),
        min_by(col("o_orderstatus"), col("o_orderkey")).as("first_status"))
      .orderBy(col("total_commits").desc, col("author_key"))
  }

  /** Q2 "most active days" (README.md:66-73): date-trunc group, count+sum, top-10. */
  val q2ActiveDays: Q = Q(
    "q2_active_days",
    s"""SELECT CAST(o_orderdate AS DATE) AS day,
       |       count(*) AS n_orders,
       |       ${oSum2("o_totalprice")} AS total_price
       |FROM orders GROUP BY 1
       |ORDER BY n_orders DESC, day LIMIT 10""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"), dsum2(col("o_totalprice")).as("total_price"))
      .orderBy(col("n_orders").desc, col("day"))
      .limit(10)
  }

  /** Q3 "hot files" (README.md:76-83): two-key group, count+sums, top-20. */
  val q3HotPairs: Q = Q(
    "q3_hot_pairs",
    s"""SELECT l_suppkey, l_partkey,
       |       count(*) AS n_changes,
       |       ${oSum2("l_quantity")} AS sum_qty,
       |       ${oSum2("l_extendedprice")} AS sum_price
       |FROM lineitem GROUP BY l_suppkey, l_partkey
       |ORDER BY n_changes DESC, l_suppkey, l_partkey LIMIT 20""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(
        count(lit(1)).as("n_changes"),
        dsum2(col("l_quantity")).as("sum_qty"),
        dsum2(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("n_changes").desc, col("l_suppkey"), col("l_partkey"))
      .limit(20)
  }

  /** Q4 "commits per repo" (README.md:86-88): single group-count. */
  val q4CountsPerGroup: Q = Q(
    "q4_counts_per_group",
    """SELECT o_orderstatus AS grp, count(*) AS n
      |FROM orders GROUP BY 1 ORDER BY grp""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus").as("grp"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("grp"))
  }

  /** Q5 "tag stats" (README.md:91-94): count + conditional count (count_if). */
  val q5ConditionalAgg: Q = Q(
    "q5_conditional_agg",
    """SELECT o_orderpriority AS grp,
      |       count(*) AS n_total,
      |       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished
      |FROM orders GROUP BY 1 ORDER BY grp""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("grp"))
      .agg(
        count(lit(1)).as("n_total"),
        count_if(col("o_orderstatus") === "F").as("n_finished"))
      .orderBy(col("grp"))
  }

  /** A2 "summary stats" (src/transforms.ts:41-62): one global row —
    * count, sums, conditional count, distinct count, date range. */
  val q6SummaryStats: Q = Q(
    "q6_summary_stats",
    s"""SELECT count(*) AS n_rows,
       |       ${oSum2("l_quantity")} AS sum_qty,
       |       ${oSum2("l_extendedprice")} AS sum_price,
       |       count(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
       |       count(DISTINCT l_orderkey) AS n_orders,
       |       min(l_shipdate) AS first_ship,
       |       max(l_shipdate) AS last_ship
       |FROM lineitem""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      dsum2(col("l_quantity")).as("sum_qty"),
      dsum2(col("l_extendedprice")).as("sum_price"),
      count_if(col("l_returnflag") === "R").as("n_returned"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      min(col("l_shipdate")).as("first_ship"),
      max(col("l_shipdate")).as("last_ship"))
  }

  /** Extension (SURVEY §2.3): star-schema join, revenue per region/nation.
    * region+nation broadcast (tiny dims at any SF); customer/orders joins
    * shuffle on their keys, AQE free to convert when small. */
  val q7StarJoin: Q = Q(
    "q7_star_join_revenue",
    s"""SELECT r_name, n_name,
       |       count(*) AS n_items,
       |       ${oSum6("l_extendedprice * (1 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation   ON c_nationkey = n_nationkey
       |JOIN region   ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name
       |ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_items"),
        dsum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Semi-join (reference S5/J2 author-presence gate shape, main.ts:30-77). */
  val q8SemiJoin: Q = Q(
    "q8_semi_join",
    """SELECT c_nationkey, count(*) AS n_customers
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_nationkey"))
  }

  /** Anti-join (reference J1 ignore-list filter shape, main.ts:283-296). */
  val q9AntiJoin: Q = Q(
    "q9_anti_join",
    """SELECT p_brand, count(*) AS n_parts
      |FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |                  WHERE l_partkey = p_partkey
      |                    AND l_shipdate >= TIMESTAMP '2001-06-01')
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, dir) =>
    t(s, dir, "part")
      .join(
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("2001-06-01 00:00:00"))),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"))
      .orderBy(col("p_brand"))
  }

  /** Top-k without aggregation (README LIMIT queries): must plan as
    * TakeOrderedAndProject — per-partition heap + driver merge, no global sort. */
  val q10TopK: Q = Q(
    "q10_topk_rows",
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(10)
  }

  /** Window: top-3 per group by rank (extension surface, SURVEY §2.5). */
  val q11WindowRank: Q = Q(
    "q11_window_rank",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) x
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long")) // DuckDB row_number() is BIGINT
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Window: lag — avg days between consecutive orders per customer.
    * Integer day-gaps keep the avg an exact int/int division in both engines. */
  val q12WindowLag: Q = Q(
    "q12_window_lag",
    """WITH g AS (
      |  SELECT o_custkey,
      |         date_diff('day',
      |           lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
      |                                                ORDER BY o_orderdate, o_orderkey),
      |           CAST(o_orderdate AS DATE)) AS gap
      |  FROM orders)
      |SELECT o_custkey, count(gap) AS n_gaps, avg(gap) AS avg_gap_days
      |FROM g GROUP BY o_custkey HAVING count(gap) > 0
      |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("gap",
        datediff(to_date(col("o_orderdate")), lag(to_date(col("o_orderdate")), 1).over(w))
          .cast("long"))
      .groupBy(col("o_custkey"))
      .agg(count(col("gap")).as("n_gaps"), avg(col("gap")).as("avg_gap_days"))
      .filter(col("n_gaps") > 0)
      .orderBy(col("o_custkey"))
  }

  /** Window: running sum (frame-based). DECIMAL accumulation so the
    * incremental (Spark) vs segment-tree (DuckDB) evaluation orders agree. */
  val q13RunningSum: Q = Q(
    "q13_running_sum",
    """SELECT o_custkey, o_orderkey,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |         AS running_total
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").as("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Distinct (reference J4, main.ts:277). */
  val q14Distinct: Q = Q(
    "q14_distinct",
    """SELECT DISTINCT l_returnflag, l_linestatus
      |FROM lineitem ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Union-all then re-aggregate (reference E2 multi-repo union shape). */
  val q15Union: Q = Q(
    "q15_union_agg",
    """SELECT nationkey, kind, count(*) AS n FROM (
      |  SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
      |  UNION ALL
      |  SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier) u
      |GROUP BY nationkey, kind ORDER BY nationkey, kind""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"), lit("customer").as("kind"))
    val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"), lit("supplier").as("kind"))
    c.unionByName(sup)
      .groupBy(col("nationkey"), col("kind"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("nationkey"), col("kind"))
  }

  /** Rollup (grouping-sets surface; NULL group keys coalesced to a sentinel
    * so the hash compare is unambiguous). */
  val q16Rollup: Q = Q(
    "q16_rollup",
    s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       |       coalesce(l_linestatus, 'ALL') AS linestatus,
       |       count(*) AS n, ${oSum2("l_quantity")} AS sum_qty
       |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY returnflag, linestatus""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum2(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))
  }

  /** String functions (reference P4/P9/P12/P13 shapes: regexp_replace, split,
    * element_at(-1), lower — SURVEY §2.7). DuckDB regexp_replace needs the
    * 'g' flag to match Spark's global-by-default semantics. */
  val q17StringFuncs: Q = Q(
    "q17_string_funcs",
    """SELECT lower(list_extract(string_split(p_type, ' '), -1)) AS type_word,
      |       regexp_replace(p_brand, '[^0-9]', '', 'g') AS brand_num,
      |       count(*) AS n
      |FROM part GROUP BY 1, 2 ORDER BY type_word, brand_num""".stripMargin) { (s, dir) =>
    t(s, dir, "part")
      .groupBy(
        lower(element_at(split(col("p_type"), " "), -1)).as("type_word"),
        regexp_replace(col("p_brand"), "[^0-9]", "").as("brand_num"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("type_word"), col("brand_num"))
  }

  /** Date-part functions (reference P6/P14 shapes). */
  val q18DateParts: Q = Q(
    "q18_date_parts",
    s"""SELECT CAST(date_part('year', o_orderdate) AS INTEGER) AS yr,
       |       CAST(date_part('month', o_orderdate) AS INTEGER) AS mo,
       |       count(*) AS n, ${oSum2("o_totalprice")} AS total
       |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .groupBy(
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n"), dsum2(col("o_totalprice")).as("total"))
      .orderBy(col("yr"), col("mo"))
  }

  /** CASE WHEN bucketing (reference README.md:92 conditional-sum shape). */
  val q19CaseBuckets: Q = Q(
    "q19_case_buckets",
    s"""SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
       |            WHEN o_totalprice < 150000 THEN 'mid'
       |            ELSE 'high' END AS bucket,
       |       count(*) AS n, ${oSum2("o_totalprice")} AS total
       |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .groupBy(
        when(col("o_totalprice") < 50000, "low")
          .when(col("o_totalprice") < 150000, "mid")
          .otherwise("high").as("bucket"))
      .agg(count(lit(1)).as("n"), dsum2(col("o_totalprice")).as("total"))
      .orderBy(col("bucket"))
  }

  /** q149: SALTED skew join — q42 salts an aggregation; this salts a JOIN,
    * the harder production case: a fact stream where ~70% of rows hit ONE
    * key (every `user_id % 10 < 7` row maps to key 1) sort-merge-joined to
    * a dimension. Unsalted, one task gets 70% of the probe side and the
    * stage runs at straggler speed; salting appends `hash(event_id) % 8`
    * to the fact key and EXPLODES the dimension row across all 8 salt
    * values, so the hot key's rows spread over 8 tasks. The oracle is the
    * plain unsalted join — gate equality proves the salt+replicate
    * rewrite is lossless. The `merge` hint pins a shuffled sort-merge
    * join: at this test size Spark would broadcast the dim (also correct,
    * but then nothing is demonstrated); at 100 TB with a non-broadcastable
    * dim, this salted SMJ IS the plan you want, complementing AQE's
    * coarser split-by-size skew handling. */
  val q149SaltedJoin: Q = Q(
    "q149_salted_join",
    s"""WITH f AS (
       |  SELECT CASE WHEN user_id % 10 < 7 THEN 1
       |              ELSE 1 + (user_id % 100) END AS k,
       |         value
       |  FROM events)
       |SELECT c.c_mktsegment, count(*) AS n, ${oSum6("f.value")} AS sum_value
       |FROM f JOIN customer c ON f.k = c.c_custkey
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val f = Tables(s, dir, "events")
      .select(
        expr("CASE WHEN user_id % 10 < 7 THEN 1 ELSE 1 + (user_id % 100) END")
          .cast("long").as("k"),
        col("value"),
        pmod(hash(col("event_id")), lit(8)).as("salt"))
    val dim = Tables(s, dir, "customer")
      .select(col("c_custkey").as("k"), col("c_mktsegment"))
      .withColumn("salt", explode(expr("sequence(0, 7)")))
    f.join(dim.hint("merge"), Seq("k", "salt"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), dsum6(col("value")).as("sum_value"))
      .orderBy(col("c_mktsegment"))
  }

  /** q203: cross-sell lift on a JOINED fact-dim — q146's independence
    * screen lifted to the star schema: does customer segment predict
    * order priority? Cells from orders ⋈ customer (broadcast dim),
    * marginals re-aggregated from the ≤ segments×priorities cells, lift
    * and flag in the same integer-exact form (o·N·10⁶ div r·c;
    * 10·|o·N − r·c| > r·c). */
  val q203CrosssellLift: Q = Q(
    "q203_crosssell_lift",
    """WITH cells AS (
      |  SELECT c.c_mktsegment AS seg, o.o_orderpriority AS prio,
      |         count(*) AS o
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2),
      |r AS (SELECT seg, sum(o) AS rt FROM cells GROUP BY 1),
      |c AS (SELECT prio, sum(o) AS ct FROM cells GROUP BY 1),
      |t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells)
      |SELECT cells.seg, cells.prio, CAST(cells.o AS BIGINT) AS n_orders,
      |       CAST(cells.o * t.n * 1000000 // (r.rt * c.ct) AS BIGINT)
      |         AS lift_ppm,
      |       10 * abs(cells.o * t.n - r.rt * c.ct) > r.rt * c.ct AS flagged
      |FROM cells JOIN r USING (seg) JOIN c USING (prio) CROSS JOIN t
      |ORDER BY seg, prio""".stripMargin) { (s, dir) =>
    val cells = Tables(s, dir, "orders")
      .join(broadcast(Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("seg"), col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("o"))
    val r = cells.groupBy(col("seg")).agg(sum(col("o")).as("rt"))
    val c = cells.groupBy(col("prio")).agg(sum(col("o")).as("ct"))
    val t = cells.agg(sum(col("o")).cast("long").as("n"))
    cells.join(broadcast(r), "seg").join(broadcast(c), "prio")
      .crossJoin(broadcast(t))
      .select(col("seg"), col("prio"), col("o").as("n_orders"),
        expr("o * n * 1000000 div (rt * ct)").cast("long").as("lift_ppm"),
        (lit(10) * abs(col("o") * col("n") - col("rt") * col("ct"))
          > col("rt") * col("ct")).as("flagged"))
      .orderBy(col("seg"), col("prio"))
  }

  /** q204: SLA lead-time audit — ship date minus order date per line,
    * breach = beyond 30 days: breach rate in ppm plus the exact p90 lead
    * time (level kernel over integer day gaps, partitioned by priority)
    * per order priority — the fulfillment-ops readout. */
  val q204SlaLeadtime: Q = Q(
    "q204_sla_leadtime",
    """WITH d AS (
      |  SELECT o.o_orderpriority AS prio,
      |         (CAST(floor(epoch(l.l_shipdate)) AS BIGINT)
      |          - CAST(floor(epoch(o.o_orderdate)) AS BIGINT)) // 86400 AS lead_d
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |lv AS (SELECT prio, lead_d, count(*) AS c FROM d GROUP BY 1, 2),
      |cum AS (
      |  SELECT prio, lead_d, c,
      |         sum(c) OVER (PARTITION BY prio ORDER BY lead_d) AS cum,
      |         sum(c) OVER (PARTITION BY prio) AS n
      |  FROM lv)
      |SELECT prio, CAST(max(n) AS BIGINT) AS n_lines,
      |       CAST(coalesce(sum(c) FILTER (WHERE lead_d > 30), 0) AS BIGINT)
      |         AS n_breach,
      |       min(CASE WHEN 100 * cum >= 90 * n THEN lead_d END) AS p90_days
      |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val lv = Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("prio"),
        expr("(unix_timestamp(l_shipdate) - unix_timestamp(o_orderdate)) div 86400")
          .as("lead_d"))
      .groupBy(col("prio"), col("lead_d")).agg(count(lit(1)).as("c"))
    val byP = Window.partitionBy(col("prio"))
    val cum = lv.select(col("prio"), col("lead_d"), col("c"),
      sum(col("c")).over(byP.orderBy(col("lead_d"))).as("cum"),
      sum(col("c")).over(byP).as("n"))
    cum.groupBy(col("prio"))
      .agg(max(col("n")).cast("long").as("n_lines"),
        coalesce(sum(when(col("lead_d") > 30, col("c"))), lit(0L)).cast("long")
          .as("n_breach"),
        min(when(lit(100) * col("cum") >= lit(90) * col("n"), col("lead_d")))
          .as("p90_days"))
      .orderBy(col("prio"))
  }

  /** q211: basket-size distribution — lines per order: p50/p90 via the
    * level kernel (≤ ~7 levels — line counts are tiny integers, the
    * extreme case of level compression) plus the exact mean as one
    * division. The commerce "how big is an order" readout. */
  val q211BasketSize: Q = Q(
    "q211_basket_size",
    """WITH o AS (
      |  SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY 1),
      |lv AS (SELECT n_lines AS v, count(*) AS c FROM o GROUP BY 1),
      |cum AS (SELECT v, c, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n
      |        FROM lv)
      |SELECT CAST(max(n) AS BIGINT) AS n_orders,
      |       CAST(sum(v * c) AS BIGINT) AS total_lines,
      |       min(CASE WHEN 2 * cum >= n THEN v END) AS p50_lines,
      |       min(CASE WHEN 10 * cum >= 9 * n THEN v END) AS p90_lines
      |FROM cum""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val lv = Tables(s, dir, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    val cum = Kernels.levelCdf(lv, "v")
    cum.agg(max(col("n")).cast("long").as("n_orders"),
      sum(col("v") * col("c")).cast("long").as("total_lines"),
      min(when(lit(2) * col("cum") >= col("n"), col("v"))).as("p50_lines"),
      min(when(lit(10) * col("cum") >= lit(9) * col("n"), col("v")))
        .as("p90_lines"))
  }

  /** q212: discount-policy audit — revenue-WEIGHTED average discount per
    * return flag (an unweighted mean over-counts cheap lines), plus the
    * share of revenue on lines discounted beyond the 8% policy. Discounts
    * pin to exact basis points (round(disc·10⁴)), prices to cents, the
    * weighted average is one integer division of Σ(bp·cents) by Σcents,
    * and the policy flag is integer (bp > 800). */
  val q212DiscountAudit: Q = Q(
    "q212_discount_audit",
    """WITH l AS (
      |  SELECT l_returnflag,
      |         CAST(round(l_discount * 10000) AS BIGINT) AS bp,
      |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem)
      |SELECT l_returnflag, count(*) AS n_lines,
      |       CAST(sum(bp * cents) // sum(cents) AS BIGINT) AS wavg_discount_bp,
      |       CAST(coalesce(sum(cents) FILTER (WHERE bp > 800), 0) * 1000000
      |            // sum(cents) AS BIGINT) AS over_policy_rev_ppm
      |FROM l GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .select(col("l_returnflag"),
        round(col("l_discount") * 10000).cast("long").as("bp"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("bp") * col("cents")).as("s1"), sum(col("cents")).as("s0"),
        coalesce(sum(when(col("bp") > 800, col("cents"))), lit(0L)).as("sp"))
      .select(col("l_returnflag"), col("n_lines"),
        expr("s1 div s0").cast("long").as("wavg_discount_bp"),
        expr("sp * 1000000 div s0").cast("long").as("over_policy_rev_ppm"))
      .orderBy(col("l_returnflag"))
  }

  /** q213: return-rate analysis — the share of lines and of revenue
    * flagged returned ('R'), per order priority (joined fact-dim): the
    * quality-of-fulfillment readout. Rates in ppm, revenue in exact
    * cents; one join shuffle with map-side partials. */
  val q213ReturnRates: Q = Q(
    "q213_return_rates",
    """WITH j AS (
      |  SELECT o.o_orderpriority AS prio,
      |         l.l_returnflag = 'R' AS ret,
      |         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
      |SELECT prio, count(*) AS n_lines,
      |       CAST(count(*) FILTER (WHERE ret) * 1000000 // count(*) AS BIGINT)
      |         AS return_rate_ppm,
      |       CAST(coalesce(sum(cents) FILTER (WHERE ret), 0) * 1000000
      |            // sum(cents) AS BIGINT) AS returned_rev_ppm
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("prio"),
        (col("l_returnflag") === "R").as("ret"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n_lines"),
        count_if(col("ret")).as("nr"),
        sum(col("cents")).as("s0"),
        coalesce(sum(when(col("ret"), col("cents"))), lit(0L)).as("sr"))
      .select(col("prio"), col("n_lines"),
        expr("nr * 1000000 div n_lines").cast("long").as("return_rate_ppm"),
        expr("sr * 1000000 div s0").cast("long").as("returned_rev_ppm"))
      .orderBy(col("prio"))
  }

  /** q215: single-source supply risk — per part, how many suppliers ship
    * it and what share the biggest one carries; rolled up to the risk
    * profile (parts by supplier-count level, single-sourced count, and
    * how many have a >80% dominant supplier via 5·top > 4·total in
    * integer quantities). Two aggregates over (part, supplier) partials —
    * the procurement-risk readout. */
  val q215SupplierRisk: Q = Q(
    "q215_supplier_risk",
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey,
      |         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
      |  FROM lineitem GROUP BY 1, 2),
      |p AS (
      |  SELECT l_partkey, count(*) AS n_supp,
      |         CAST(max(qty) AS BIGINT) AS top_qty,
      |         CAST(sum(qty) AS BIGINT) AS tot_qty
      |  FROM ps GROUP BY 1)
      |SELECT n_supp, count(*) AS n_parts,
      |       count(*) FILTER (WHERE n_supp = 1) AS n_single_sourced,
      |       count(*) FILTER (WHERE 5 * top_qty > 4 * tot_qty) AS n_dominated
      |FROM p GROUP BY 1 ORDER BY n_supp""".stripMargin) { (s, dir) =>
    val ps = Tables(s, dir, "lineitem")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(round(col("l_quantity")).cast("long")).cast("long").as("qty"))
    ps.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_supp"),
        max(col("qty")).cast("long").as("top_qty"),
        sum(col("qty")).cast("long").as("tot_qty"))
      .groupBy(col("n_supp"))
      .agg(count(lit(1)).as("n_parts"),
        count_if(col("n_supp") === 1).as("n_single_sourced"),
        count_if(lit(5) * col("top_qty") > lit(4) * col("tot_qty"))
          .as("n_dominated"))
      .orderBy(col("n_supp"))
  }

  /** q219: dead-stock detection — parts with NO sales in the analysis
    * window (part LEFT ANTI lineitem-sales), with their locked-up retail
    * value. Every part sells somewhere in this data, so dead stock is
    * PLANTED (every 13th part's lines excluded from the sales view) —
    * detection and the no-false-positive side both proven. Anti-join
    * ships distinct part keys only. */
  val q219DeadStock: Q = Q(
    "q219_dead_stock",
    """WITH sales AS (
      |  SELECT DISTINCT l_partkey FROM lineitem WHERE l_partkey % 13 <> 0)
      |SELECT p.p_partkey, CAST(round(p.p_retailprice * 100) AS BIGINT)
      |         AS retail_cents
      |FROM part p LEFT JOIN sales s ON p.p_partkey = s.l_partkey
      |WHERE s.l_partkey IS NULL
      |ORDER BY p.p_partkey""".stripMargin) { (s, dir) =>
    val sales = Tables(s, dir, "lineitem")
      .filter(col("l_partkey") % 13 =!= 0)
      .select(col("l_partkey")).distinct()
    Tables(s, dir, "part")
      .join(sales, col("p_partkey") === col("l_partkey"), "left_anti")
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long").as("retail_cents"))
      .orderBy(col("p_partkey"))
  }

  /** q220: dimension-coverage density — how much of the (nation ×
    * segment × priority) combination space actually occurs in the data:
    * observed combos vs the full cross product (ppm density) and the
    * per-nation coverage profile. The data-modeling audit behind "can I
    * safely cube on these dimensions". Distinct-combo reduction
    * map-side; the possible-space size is a product of three tiny
    * distinct counts. */
  val q220CoverageDensity: Q = Q(
    "q220_coverage_density",
    """WITH obs AS (
      |  SELECT DISTINCT c.c_nationkey AS nat, c.c_mktsegment AS seg,
      |         o.o_orderpriority AS prio
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |dims AS (
      |  SELECT (SELECT count(DISTINCT c_nationkey) FROM customer) AS n_nat,
      |         (SELECT count(DISTINCT c_mktsegment) FROM customer) AS n_seg,
      |         (SELECT count(DISTINCT o_orderpriority) FROM orders) AS n_prio)
      |SELECT CAST(count(*) AS BIGINT) AS observed_combos,
      |       CAST(max(d.n_nat * d.n_seg * d.n_prio) AS BIGINT) AS possible_combos,
      |       CAST(count(*) * 1000000 // max(d.n_nat * d.n_seg * d.n_prio)
      |            AS BIGINT) AS density_ppm
      |FROM obs CROSS JOIN dims d""".stripMargin) { (s, dir) =>
    val obs = Tables(s, dir, "orders")
      .join(broadcast(Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey").as("nat"),
          col("c_mktsegment").as("seg"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("nat"), col("seg"), col("o_orderpriority").as("prio"))
      .distinct()
    val cust = Tables(s, dir, "customer")
    val dims = cust.agg(countDistinct(col("c_nationkey")).as("n_nat"),
        countDistinct(col("c_mktsegment")).as("n_seg"))
      .crossJoin(Tables(s, dir, "orders")
        .agg(countDistinct(col("o_orderpriority")).as("n_prio")))
    obs.crossJoin(broadcast(dims))
      .agg(count(lit(1)).as("observed_combos"),
        max(col("n_nat") * col("n_seg") * col("n_prio")).as("possible_combos"))
      .select(col("observed_combos"), col("possible_combos"),
        expr("observed_combos * 1000000 div possible_combos").cast("long")
          .as("density_ppm"))
  }

  /** q222: nation value index — each nation's average order value vs the
    * global average, the q209 cross-multiplication on the customer dim:
    * index_ppm = (rev_n · N) · 10⁶ div (n_n · total_rev), so the two
    * rational averages never materialize as floats. Two broadcast dims,
    * cells ≤ #nations. */
  val q222NationValueIndex: Q = Q(
    "q222_nation_value_index",
    """WITH j AS (
      |  SELECT n.n_name AS nation,
      |         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |                JOIN nation n ON c.c_nationkey = n.n_nationkey),
      |g AS (SELECT nation, count(*) AS n_orders,
      |             CAST(sum(cents) AS BIGINT) AS rev FROM j GROUP BY 1),
      |t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS nn,
      |             CAST(sum(rev) AS BIGINT) AS total FROM g)
      |SELECT g.nation, g.n_orders, g.rev AS revenue_cents,
      |       CAST(CAST(g.rev AS HUGEINT) * t.nn * 1000000
      |            // (CAST(g.n_orders AS HUGEINT) * t.total) AS BIGINT)
      |         AS value_index_ppm
      |FROM g CROSS JOIN t ORDER BY nation""".stripMargin) { (s, dir) =>
    val g = Tables(s, dir, "orders")
      .join(broadcast(Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name").as("nation"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("nation"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).cast("long").as("rev"))
    val t = g.agg(sum(col("n_orders")).cast("long").as("nn"),
      sum(col("rev")).cast("long").as("total"))
    g.crossJoin(broadcast(t))
      .select(col("nation"), col("n_orders"), col("rev").as("revenue_cents"),
        // rev·N·10⁶ overflows int64 already at sf0.01 — 128-bit products.
        expr("""CAST(rev AS DECIMAL(38,0)) * nn * 1000000
                div (CAST(n_orders AS DECIMAL(38,0)) * total)""")
          .cast("long").as("value_index_ppm"))
      .orderBy(col("nation"))
  }

  /** q223: keyword revenue attribution — revenue per part-NAME token
    * ("which words sell"): explode names to (word, part), join line
    * revenue, roll up per word. The token-level attribution readout
    * merchandising runs on catalog text; per-part revenue reduces FIRST
    * so the explode multiplies a part-grain table, not line rows. */
  val q223KeywordRevenue: Q = Q(
    "q223_keyword_revenue",
    """WITH pr AS (
      |  SELECT l_partkey, CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      |                         AS BIGINT) AS rev
      |  FROM lineitem GROUP BY 1),
      |w AS (
      |  SELECT unnest(string_split(p.p_name, ' ')) AS word, pr.rev
      |  FROM part p JOIN pr ON p.p_partkey = pr.l_partkey)
      |SELECT word, count(*) AS n_parts,
      |       CAST(sum(rev) AS BIGINT) AS revenue_cents
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val pr = Tables(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).cast("long")
        .as("rev"))
    Tables(s, dir, "part")
      .join(pr, col("p_partkey") === col("l_partkey"))
      .select(explode(split(col("p_name"), " ")).as("word"), col("rev"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("rev")).cast("long").as("revenue_cents"))
      .orderBy(col("word"))
  }

  /** q224: supplier scorecard — per supplier nation: supplier count,
    * shipped revenue, and the return rate of their shipments in ppm (the
    * vendor-management league table). Fact rows reduce per supplier
    * first, then the supplier⋈nation dims broadcast — the fact shuffle
    * is on s_suppkey once. */
  val q224SupplierScorecard: Q = Q(
    "q224_supplier_scorecard",
    """WITH f AS (
      |  SELECT l_suppkey, count(*) AS n_lines,
      |         count(*) FILTER (WHERE l_returnflag = 'R') AS n_ret,
      |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |           AS rev
      |  FROM lineitem GROUP BY 1),
      |j AS (
      |  SELECT n.n_name AS nation, f.n_lines, f.n_ret, f.rev
      |  FROM f JOIN supplier s ON f.l_suppkey = s.s_suppkey
      |         JOIN nation n ON s.s_nationkey = n.n_nationkey)
      |SELECT nation, count(*) AS n_suppliers,
      |       CAST(sum(rev) AS BIGINT) AS revenue_cents,
      |       CAST(sum(n_ret) * 1000000 // sum(n_lines) AS BIGINT)
      |         AS return_rate_ppm
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val f = Tables(s, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_lines"),
        count_if(col("l_returnflag") === "R").as("n_ret"),
        sum(round(col("l_extendedprice") * 100).cast("long")).cast("long")
          .as("rev"))
    f.join(broadcast(Tables(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name").as("nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("nation"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("rev")).cast("long").as("revenue_cents"),
        expr("sum(n_ret) * 1000000 div sum(n_lines)").cast("long")
          .as("return_rate_ppm"))
      .orderBy(col("nation"))
  }

  /** q225: catalog independence screen — does brand predict type in the
    * part catalog? The q146 lift machinery on the (brand × type) cells:
    * integer-exact lift ppm and the 10·|o·N − r·c| > r·c flag. A skewed
    * catalog (brands specializing in types) changes how safely either
    * dim can be used as a blocking key. */
  val q225BrandTypeLift: Q = Q(
    "q225_brand_type_lift",
    """WITH cells AS (
      |  SELECT p_brand AS brand, p_type AS typ, count(*) AS o
      |  FROM part GROUP BY 1, 2),
      |r AS (SELECT brand, sum(o) AS rt FROM cells GROUP BY 1),
      |c AS (SELECT typ, sum(o) AS ct FROM cells GROUP BY 1),
      |t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells)
      |SELECT cells.brand, cells.typ, CAST(cells.o AS BIGINT) AS n_parts,
      |       CAST(cells.o * t.n * 1000000 // (r.rt * c.ct) AS BIGINT)
      |         AS lift_ppm,
      |       10 * abs(cells.o * t.n - r.rt * c.ct) > r.rt * c.ct AS flagged
      |FROM cells JOIN r USING (brand) JOIN c USING (typ) CROSS JOIN t
      |ORDER BY brand, typ""".stripMargin) { (s, dir) =>
    val cells = Tables(s, dir, "part")
      .groupBy(col("p_brand").as("brand"), col("p_type").as("typ"))
      .agg(count(lit(1)).as("o"))
    val r = cells.groupBy(col("brand")).agg(sum(col("o")).as("rt"))
    val c = cells.groupBy(col("typ")).agg(sum(col("o")).as("ct"))
    val t = cells.agg(sum(col("o")).cast("long").as("n"))
    cells.join(broadcast(r), "brand").join(broadcast(c), "typ")
      .crossJoin(broadcast(t))
      .select(col("brand"), col("typ"), col("o").as("n_parts"),
        expr("o * n * 1000000 div (rt * ct)").cast("long").as("lift_ppm"),
        (lit(10) * abs(col("o") * col("n") - col("rt") * col("ct"))
          > col("rt") * col("ct")).as("flagged"))
      .orderBy(col("brand"), col("typ"))
  }

  /** q226: price-size monotonicity audit — within a brand, does the
    * median retail price rise with size? Median per (brand, size) via
    * the level kernel, then a lag over the ≤ sizes-per-brand cells
    * counts INVERSIONS (median dropping as size grows) — the catalog
    * data-quality check behind "is size priced sanely". All exact
    * integers; medians make one wild SKU per cell harmless. */
  val q226PriceSizeMonotonic: Q = Q(
    "q226_price_size_monotonic",
    """WITH lv AS (
      |  SELECT p_brand AS brand, p_size AS sz,
      |         CAST(round(p_retailprice * 100) AS BIGINT) AS v, count(*) AS c
      |  FROM part GROUP BY 1, 2, 3),
      |med AS (
      |  SELECT brand, sz, min(CASE WHEN 2 * cum >= n THEN v END) AS med
      |  FROM (SELECT brand, sz, v,
      |               sum(c) OVER (PARTITION BY brand, sz ORDER BY v) AS cum,
      |               sum(c) OVER (PARTITION BY brand, sz) AS n
      |        FROM lv) x
      |  GROUP BY 1, 2),
      |g AS (
      |  SELECT brand, sz, med,
      |         lag(med) OVER (PARTITION BY brand ORDER BY sz) AS prev_med
      |  FROM med)
      |SELECT brand, count(*) AS n_sizes,
      |       count(*) FILTER (WHERE prev_med IS NOT NULL AND med < prev_med)
      |         AS n_inversions
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val lv = Tables(s, dir, "part")
      .groupBy(col("p_brand").as("brand"), col("p_size").as("sz"),
        round(col("p_retailprice") * 100).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val byCell = Window.partitionBy(col("brand"), col("sz"))
    val med = lv.select(col("brand"), col("sz"), col("v"),
        sum(col("c")).over(byCell.orderBy(col("v"))).as("cum"),
        sum(col("c")).over(byCell).as("n"))
      .groupBy(col("brand"), col("sz"))
      .agg(min(when(lit(2) * col("cum") >= col("n"), col("v"))).as("med"))
    med.withColumn("prev_med",
        lag(col("med"), 1).over(Window.partitionBy(col("brand"))
          .orderBy(col("sz"))))
      .groupBy(col("brand"))
      .agg(count(lit(1)).as("n_sizes"),
        count_if(col("prev_med").isNotNull && col("med") < col("prev_med"))
          .as("n_inversions"))
      .orderBy(col("brand"))
  }

  /** q229: region revenue rollup — the full four-table star (orders ⋈
    * customer ⋈ nation ⋈ region) collapsed to region share-of-revenue in
    * ppm: the executive top-line. Fact reduces per custkey first; all
    * three dims broadcast; products in 128-bit (the q222 lesson). */
  val q229RegionRollup: Q = Q(
    "q229_region_rollup",
    """WITH f AS (
      |  SELECT o_custkey, count(*) AS n_orders,
      |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |           AS rev
      |  FROM orders GROUP BY 1),
      |g AS (
      |  SELECT r.r_name AS region, CAST(sum(f.n_orders) AS BIGINT) AS n_orders,
      |         CAST(sum(f.rev) AS BIGINT) AS rev
      |  FROM f JOIN customer c ON f.o_custkey = c.c_custkey
      |         JOIN nation n ON c.c_nationkey = n.n_nationkey
      |         JOIN region r ON n.n_regionkey = r.r_regionkey
      |  GROUP BY 1),
      |t AS (SELECT CAST(sum(rev) AS HUGEINT) AS total FROM g)
      |SELECT g.region, g.n_orders, g.rev AS revenue_cents,
      |       CAST(CAST(g.rev AS HUGEINT) * 1000000 // t.total AS BIGINT)
      |         AS share_ppm
      |FROM g CROSS JOIN t ORDER BY region""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.types.DecimalType
    val f = Tables(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).cast("long").as("rev"))
    val g = f
      .join(broadcast(Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(s, dir, "nation")
        .select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(s, dir, "region")
        .select(col("r_regionkey"), col("r_name").as("region"))),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("region"))
      .agg(sum(col("n_orders")).cast("long").as("n_orders"),
        sum(col("rev")).cast("long").as("rev"))
    val t = g.agg(sum(col("rev")).cast(DecimalType(38, 0)).as("total"))
    g.crossJoin(broadcast(t))
      .select(col("region"), col("n_orders"), col("rev").as("revenue_cents"),
        expr("CAST(rev AS DECIMAL(38,0)) * 1000000 div total").cast("long")
          .as("share_ppm"))
      .orderBy(col("region"))
  }

  /** q230: repeat-buyer economics — the retention-economics headline:
    * what share of revenue comes from customers with 2+ orders. One
    * customer-grain aggregate classifies buyers; the split is two cells
    * plus ppm shares with 128-bit products. */
  val q230RepeatRevenue: Q = Q(
    "q230_repeat_revenue",
    """WITH u AS (
      |  SELECT o_custkey, count(*) AS n_orders,
      |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |           AS rev
      |  FROM orders GROUP BY 1),
      |g AS (
      |  SELECT CASE WHEN n_orders >= 2 THEN 'repeat' ELSE 'one_time' END
      |           AS buyer_class,
      |         count(*) AS n_buyers, CAST(sum(rev) AS BIGINT) AS rev
      |  FROM u GROUP BY 1),
      |t AS (SELECT CAST(sum(rev) AS HUGEINT) AS total FROM g)
      |SELECT g.buyer_class, g.n_buyers, g.rev AS revenue_cents,
      |       CAST(CAST(g.rev AS HUGEINT) * 1000000 // t.total AS BIGINT)
      |         AS revenue_share_ppm
      |FROM g CROSS JOIN t ORDER BY buyer_class""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.types.DecimalType
    val g = Tables(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).cast("long").as("rev"))
      .groupBy(when(col("n_orders") >= 2, "repeat").otherwise("one_time")
        .as("buyer_class"))
      .agg(count(lit(1)).as("n_buyers"), sum(col("rev")).cast("long").as("rev"))
    val t = g.agg(sum(col("rev")).cast(DecimalType(38, 0)).as("total"))
    g.crossJoin(broadcast(t))
      .select(col("buyer_class"), col("n_buyers"), col("rev").as("revenue_cents"),
        expr("CAST(rev AS DECIMAL(38,0)) * 1000000 div total").cast("long")
          .as("revenue_share_ppm"))
      .orderBy(col("buyer_class"))
  }

  val all: Seq[Q] = Seq(
    q1Authors, q2ActiveDays, q3HotPairs, q4CountsPerGroup, q5ConditionalAgg,
    q6SummaryStats, q7StarJoin, q8SemiJoin, q9AntiJoin, q10TopK,
    q11WindowRank, q12WindowLag, q13RunningSum, q14Distinct, q15Union,
    q16Rollup, q17StringFuncs, q18DateParts, q19CaseBuckets, q149SaltedJoin,
    q203CrosssellLift, q204SlaLeadtime, q211BasketSize, q212DiscountAudit,
    q213ReturnRates, q215SupplierRisk, q219DeadStock, q220CoverageDensity,
    q222NationValueIndex, q223KeywordRevenue, q224SupplierScorecard,
    q225BrandTypeLift, q226PriceSizeMonotonic, q229RegionRollup,
    q230RepeatRevenue)
}
