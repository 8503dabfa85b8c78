package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q._

/** Event-time analytics over the `events` table (SURVEY §2.8 extension
  * surface): JSON field extraction, epoch-aligned tumbling windows, and
  * gap-based sessionization.
  *
  * The batch aggregations here are watermark-compatible (count/sum/min/max
  * over event-time buckets), so the same code runs under Structured
  * Streaming — see graft.streaming.EventStream.
  *
  * Note on timestamps: `events.ts` is parquet timestamp[ns]; Spark reads µs,
  * DuckDB reads ns. All oracle comparisons therefore bucket to ≥1 s
  * granularity (FIXTURES.md).
  */
object Events {

  /** JSON scalar extraction (testdata `props` is `{"k": <int>}`) — Spark
    * get_json_object; oracle uses a regexp so it needs no DuckDB JSON
    * extension (offline environment). */
  val q20Json: Q = Q(
    "q20_json_extract",
    """SELECT event_type,
      |       count(*) AS n,
      |       CAST(sum(CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
      |       count(*) FILTER (WHERE regexp_extract(props, '"k":\s*(-?\d+)', 1) = '') AS n_missing
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    val k = get_json_object(col("props"), "$.k").cast("long")
    Tables(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(k).as("sum_k"),
        count_if(k.isNull).as("n_missing"))
      .orderBy(col("event_type"))
  }

  /** Epoch-aligned 10-minute tumbling windows. The window key is surfaced as
    * epoch seconds (BIGINT) so Spark-µs vs DuckDB-ns precision can't skew the
    * comparison. Spark side uses the native `window()` event-time bucketing
    * operator (streaming-compatible). */
  val q21Tumbling: Q = Q(
    "q21_tumbling_windows",
    s"""SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS win_start,
       |       event_type,
       |       count(*) AS n,
       |       ${oSum6("value")} AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum6(col("value")).as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("win_start"), col("event_type"))
  }

  /** Gap-based sessionization (30-minute inactivity gap) via Spark's native
    * `session_window`, rolled up per user. The oracle reproduces the
    * semantics with a lag/running-sum session id — the classic equivalence
    * (new session iff gap ≥ 30 min). */
  val q22Sessionize: Q = Q(
    "q22_sessionize",
    """WITH marks AS (
      |  SELECT user_id, ts,
      |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                   >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
      |  FROM events),
      |sess AS (
      |  SELECT user_id,
      |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM marks),
      |per_sess AS (
      |  SELECT user_id, sess_id, count(*) AS n_events
      |  FROM sess GROUP BY user_id, sess_id)
      |SELECT user_id, count(*) AS n_sessions,
      |       CAST(sum(n_events) AS BIGINT) AS n_events,
      |       max(n_events) AS max_session_events
      |FROM per_sess GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("n_events")).as("max_session_events"))
      .orderBy(col("user_id"))
  }

  /** Event funnel: per user, did a `view` precede a `purchase`? Window
    * min-over-type + conditional compare; counts funnel conversion. */
  val q23Funnel: Q = Q(
    "q23_funnel",
    """WITH f AS (
      |  SELECT user_id,
      |         min(ts) FILTER (WHERE event_type = 'view') AS first_view,
      |         min(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase
      |  FROM events GROUP BY user_id)
      |SELECT count(*) AS n_users,
      |       count(*) FILTER (WHERE first_view IS NOT NULL) AS n_viewers,
      |       count(*) FILTER (WHERE first_view IS NOT NULL AND first_purchase > first_view)
      |         AS n_converted
      |FROM f""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("first_view"),
        min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
      .agg(
        count(lit(1)).as("n_users"),
        count_if(col("first_view").isNotNull).as("n_viewers"),
        count_if(col("first_view").isNotNull && col("first_purchase") > col("first_view"))
          .as("n_converted"))
  }

  /** As-of join (operator Spark lacks natively — SURVEY §7.4 "custom by
    * necessity" candidate): for each `purchase`, the most recent prior-or-equal
    * `click` by the same user. Composed from existing ops (union + window
    * last-value carry-forward) per the preference order: one shuffle on
    * user_id, no range cross-join — this scales linearly at 100 TB, unlike
    * the naive inequality join which Spark would plan as BNL.
    * DuckDB has native ASOF JOIN as the oracle. */
  val q24AsofJoin: Q = Q(
    "q24_asof_join",
    """SELECT p.event_id AS purchase_id,
      |       CAST(floor(epoch(c.ts)) AS BIGINT) AS click_epoch
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY purchase_id""".stripMargin) { (s, dir) =>
    val ev = Tables(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("is_left"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("is_left"))
    // Union sorted by (ts, is_left): each left row picks up the running "last
    // right ts ≤ its ts" via last_value(ignoreNulls) — right rows sort first
    // at equal ts so prior-or-equal semantics hold.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_left"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(clicks)
      .withColumn("asof_ts",
        last(when(col("is_left") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("is_left") === 1)
      .select(
        col("event_id").as("purchase_id"),
        unix_timestamp(col("asof_ts")).as("click_epoch"))
      .orderBy(col("purchase_id"))
  }

  /** Sliding windows (10-minute length, 5-minute slide): each event lands in
    * exactly two overlapping windows. Spark's native sliding `window()`;
    * the oracle unnests the two epoch-aligned window starts per event. */
  val q46Sliding: Q = Q(
    "q46_sliding_windows",
    s"""WITH ex AS (
       |  SELECT event_type, value,
       |         unnest([CAST(floor(epoch(ts) / 300) * 300 AS BIGINT),
       |                 CAST(floor(epoch(ts) / 300) * 300 - 300 AS BIGINT)]) AS win_start
       |  FROM events)
       |SELECT win_start, event_type, count(*) AS n, ${oSum6("value")} AS sum_value
       |FROM ex GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum6(col("value")).as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("win_start"), col("event_type"))
  }

  /** The same as-of semantics as q24, but through the custom first-class
    * operator (graft.plans.AsOfJoin: LogicalPlan + Rule + Strategy +
    * sort-merge SparkPlan) instead of the union+window composition — one
    * streaming merge pass, no union materialization, no window buffer.
    * The post-join filter on a left column is written ABOVE the join here
    * and lands below it via PushFilterThroughAsOfJoin (asserted in
    * AsOfJoinSpec). Oracle: DuckDB native ASOF LEFT JOIN. */
  val q60AsofCustom: Q = Q(
    "q60_asof_custom",
    """SELECT p.event_id AS purchase_id,
      |       CAST(floor(epoch(c.ts)) AS BIGINT) AS click_epoch
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |WHERE p.value > 100
      |ORDER BY purchase_id""".stripMargin) { (s, dir) =>
    val ev = Tables(s, dir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    graft.plans.AsOf.joinBackward(p, c, Seq("user_id"), "ts", "ts")
      .filter(col("value") > 100)
      .select(
        col("event_id").as("purchase_id"),
        unix_timestamp(col("ts_r")).as("click_epoch"))
      .orderBy(col("purchase_id"))
  }

  /** Retention cohorts — the classic product-analytics rollup: users are
    * cohorted by their first-seen day; each later active day increments
    * that cohort's retention counter at its day offset (bounded at 7 here).
    *
    * Scale shape: the cohort table is one row per user (a groupBy that
    * combines map-side); the events-to-cohort join keys on user_id, the
    * same partitioning the cohort aggregate just produced, so AQE reuses
    * the exchange; the final (cohort_day, offset) aggregate is tiny. The
    * countDistinct is per (cohort, offset) — bounded keyspace, no skew
    * (a user contributes each active day once via the date projection). */
  val q71RetentionCohorts: Q = Q(
    "q71_retention_cohorts",
    """WITH e AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
      |f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id)
      |SELECT cohort_day,
      |       CAST(datediff('day', cohort_day, day) AS BIGINT) AS day_offset,
      |       count(DISTINCT e.user_id) AS n_users
      |FROM e JOIN f USING (user_id)
      |WHERE datediff('day', cohort_day, day) <= 7
      |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin) { (s, dir) =>
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohorts = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    ev.join(cohorts, "user_id")
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")).cast("long"))
      .filter(col("day_offset") <= 7)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** q90: rolling 7-day active users per day — the metric shape a window
    * frame CANNOT compute, because COUNT(DISTINCT) doesn't decompose over
    * sliding frames (you can't subtract the day that fell out of the
    * window). The scale rewrite is contribution-explode: each (user, day)
    * activity row contributes to the 7 window-END days it stays visible
    * in, then one distinct-count per window-end day. Cost is bounded at
    * 7× the DAILY-DEDUPED activity rows (dedupe first — raw events can be
    * billions/day, (user, day) pairs are orders of magnitude fewer).
    *
    * Only windows fully inside the observed range are reported (the first
    * 6 days are ramp-up with partial history — both engines drop them with
    * the same min-day bound). Days are epoch-day integers end to end
    * (date_diff from epoch), so no date-type coercion is compared.
    *
    * Scale shape: dedupe is one (user, day) aggregate with map-side
    * combine; the explode is a map-side 7-row Generate; the final
    * distinct-count is Spark's standard two-level aggregate — keyed on
    * (day, user) FIRST (high cardinality, skew-free), then day. */
  val q90RollingActive: Q = Q(
    "q90_rolling_active",
    """WITH ud AS (SELECT DISTINCT user_id,
      |                   date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
      |            FROM events),
      |bounds AS (SELECT min(d) AS dmin, max(d) AS dmax FROM ud),
      |c AS (SELECT user_id, d + i AS wend
      |      FROM ud, range(0, 7) t(i)),
      |w AS (SELECT wend, count(DISTINCT user_id) AS n_active_7d
      |      FROM c GROUP BY wend)
      |SELECT wend AS epoch_day, n_active_7d
      |FROM w, bounds WHERE wend >= dmin + 6 AND wend <= dmax
      |ORDER BY epoch_day""".stripMargin) { (s, dir) =>
    val ud = Tables(s, dir, "events")
      .select(col("user_id"), datediff(to_date(col("ts")), lit("1970-01-01")).as("d"))
      .distinct()
    val bounds = ud.agg(min(col("d")).as("dmin"), max(col("d")).as("dmax"))
    ud.select(col("user_id"), explode(expr("sequence(0, 6)")).as("i"),
        col("d"))
      .select(col("user_id"), (col("d") + col("i")).as("wend"))
      .groupBy(col("wend"))
      .agg(countDistinct(col("user_id")).as("n_active_7d"))
      .join(broadcast(bounds))
      .filter(col("wend") >= col("dmin") + 6 && col("wend") <= col("dmax"))
      .select(col("wend").cast("long").as("epoch_day"), col("n_active_7d"))
      .orderBy(col("epoch_day"))
  }

  /** q107: SCD type-2 dimension build — the warehouse pattern that turns an
    * event log into validity-interval history rows. Entity = user, tracked
    * attribute = the event_type stream; CONSECUTIVE equal observations
    * collapse into one version (that collapse is what distinguishes SCD2
    * from raw event storage), each version carries
    * [valid_from, valid_to) with valid_to = the next version's start and
    * NULL marking the current row.
    *
    * Scale shape: ONE shuffle on user_id serves both window passes (the
    * change-flag lag and the running version sum share the same
    * partitioning+sort, Spark plans one Sort); the post-aggregation lead
    * runs over version rows — already collapsed, orders of magnitude
    * smaller. No self-join: the naive "match each row with its successor"
    * rendering is a range self-join that dies at scale; lag/lead over a
    * sorted partition is the same answer in one pass. */
  val q107Scd2History: Q = Q(
    "q107_scd2_history",
    """WITH m AS (
      |  SELECT user_id, event_type AS attr, ts, event_id,
      |         CASE WHEN lag(event_type) OVER
      |                (PARTITION BY user_id ORDER BY ts, event_id)
      |              IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
      |  FROM events),
      |v AS (
      |  SELECT user_id, attr, ts,
      |         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS ver
      |  FROM m),
      |g AS (
      |  SELECT user_id, CAST(ver AS BIGINT) AS version, attr,
      |         CAST(floor(epoch(min(ts))) AS BIGINT) AS valid_from,
      |         count(*) AS n_events
      |  FROM v GROUP BY user_id, ver, attr)
      |SELECT user_id, version, attr, valid_from,
      |       lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
      |         AS valid_to,
      |       n_events,
      |       lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
      |         IS NULL AS is_current
      |FROM g ORDER BY user_id, version""".stripMargin) { (s, dir) =>
    scd2Of(Tables(s, dir, "events")).orderBy(col("user_id"), col("version"))
  }

  /** The SCD2 build as a function of any (user_id, event_type, ts,
    * event_id) event set — shared by the full rebuild (q107), the
    * incremental merge (q113), and the streaming load (q114). */
  private[graft] def scd2Of(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val byVer = Window.partitionBy(col("user_id")).orderBy(col("version"))
    val m = events
      .select(col("user_id"), col("event_type").as("attr"), col("ts"), col("event_id"))
      .withColumn("chg",
        when(!(lag(col("attr"), 1).over(byUser) <=> col("attr")), 1L).otherwise(0L))
    val g = m
      .withColumn("ver",
        sum(col("chg")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("ver").as("version"), col("attr"))
      .agg(unix_timestamp(min(col("ts"))).as("valid_from"),
        count(lit(1)).as("n_events"))
    g.select(col("user_id"), col("version"), col("attr"), col("valid_from"),
      lead(col("valid_from"), 1).over(byVer).as("valid_to"), col("n_events"),
      lead(col("valid_from"), 1).over(byVer).isNull.as("is_current"))
  }

  /** q111: time-series resampling with forward fill — turn an irregular
    * event stream into a dense per-(user, day) series carrying the last
    * observed value across gaps (the feature-engineering prerequisite for
    * any fixed-cadence model input). Three stages, all partitioned by
    * user: (1) last observation per present day via row_number over
    * (ts, event_id) — a deterministic total order, not max(ts) ties;
    * (2) a per-user day SCAFFOLD from sequence(min_day, max_day) — the
    * scaffold explodes to the user's own span only, never a global
    * calendar cross join; (3) forward fill = last(value, ignoreNulls)
    * over rows-unbounded-preceding. One user_id shuffle serves the
    * row_number, the span aggregate, and the fill window.
    *
    * `filled` marks carried-forward rows — downstream quality checks
    * count them (a user 90% filled is a dead sensor, not a series). */
  val q111ForwardFill: Q = Q(
    "q111_forward_fill",
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, value
      |  FROM (SELECT user_id, ts, value,
      |               row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
      |                                  ORDER BY ts DESC, event_id DESC) AS rn
      |        FROM events) WHERE rn = 1),
      |span AS (
      |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id),
      |scaffold AS (
      |  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      |  FROM span),
      |joined AS (
      |  SELECT s.user_id, s.day, d.value, d.value IS NULL AS filled
      |  FROM scaffold s LEFT JOIN daily d
      |    ON d.user_id = s.user_id AND d.day = s.day)
      |SELECT user_id,
      |       CAST(day - DATE '1970-01-01' AS BIGINT) AS epoch_day,
      |       last_value(value IGNORE NULLS)
      |         OVER (PARTITION BY user_id ORDER BY day
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
      |       filled
      |FROM joined ORDER BY user_id, epoch_day""".stripMargin) { (s, dir) =>
    val byDay = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val daily = Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("ts").cast("date").as("day"),
        col("value"), col("event_id"))
      .withColumn("rn", row_number().over(byDay))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("day"), col("value"))
    val scaffold = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val fillW = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    scaffold.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"),
        datediff(col("day"), lit("1970-01-01").cast("date")).cast("long")
          .as("epoch_day"),
        last(col("value"), ignoreNulls = true).over(fillW).as("value"),
        col("value").isNull.as("filled"))
      .orderBy(col("user_id"), col("epoch_day"))
  }

  /** Apply a STRICTLY-LATER event batch to a stored SCD2 history — the
    * day-2 form of q107. Only the history's CURRENT rows participate in
    * the merge (closed rows pass through untouched — at scale they are
    * never read: store current rows in their own partition); the batch is
    * SCD2-built on its own, then stitched at the per-user boundary:
    * same attribute ⇒ the open run EXTENDS (versions keep their numbers,
    * counts add); different ⇒ the open run closes at the batch's first
    * observation and batch versions renumber after it. Because the split
    * is by time, the stitched result equals a full rebuild exactly —
    * that equality is q113's oracle.
    *
    * Both inputs should arrive PERSISTED (callers own the lifecycle — the
    * streaming load unpersists per trigger): `history` feeds three
    * branches (closed pass-through, untouched currents, the boundary
    * join) and the batch SCD2 feeds two (boundary + renumber); without a
    * persist every branch re-runs the 3-window build. */
  private[graft] def scd2Merge(history: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val hCur = history.filter(col("is_current"))
      .select(col("user_id"), col("version").as("hv"), col("attr").as("ha"),
        col("valid_from").as("hf"), col("n_events").as("hn"))
    // scd2Of versions are 1-based: the first row's lag-change flag fires
    // (lag is null), so the running sum starts at 1.
    val bFirst = b.filter(col("version") === 1)
      .select(col("user_id"), col("attr").as("ba"), col("valid_from").as("bf"),
        col("valid_to").as("bt"), col("n_events").as("bn"),
        col("is_current").as("bc"))
    val boundary = hCur.join(bFirst, Seq("user_id"), "full_outer")
    val cols = Seq("user_id", "version", "attr", "valid_from", "valid_to",
      "n_events", "is_current").map(col)
    // Closed history rows and current rows of users the batch never saw.
    val keepClosed = history.filter(!col("is_current")).select(cols: _*)
    val keepCurrent = history.filter(col("is_current"))
      .join(bFirst.select(col("user_id")), Seq("user_id"), "left_anti")
      .select(cols: _*)
    val both = boundary.filter(col("hv").isNotNull && col("ba").isNotNull)
    val mergedRow = both.filter(col("ha") === col("ba"))
      .select(col("user_id"), col("hv").as("version"), col("ha").as("attr"),
        col("hf").as("valid_from"), col("bt").as("valid_to"),
        (col("hn") + col("bn")).as("n_events"), col("bc").as("is_current"))
    val closedRow = both.filter(col("ha") =!= col("ba"))
      .select(col("user_id"), col("hv").as("version"), col("ha").as("attr"),
        col("hf").as("valid_from"), col("bf").as("valid_to"),
        col("hn").as("n_events"), lit(false).as("is_current"))
    // Batch rows renumbered past the history: merged runs drop their v1
    // (absorbed above, so batch v2 lands at hv+1); a closed run keeps the
    // batch's v1 at hv+1; users without history shift by 0.
    val offsets = boundary.select(col("user_id"),
      (col("hv").isNotNull && col("ha") === col("ba")).as("was_merged"),
      when(col("hv").isNull, 0L)
        .when(col("ha") === col("ba"), col("hv") - 1L)
        .otherwise(col("hv")).as("offset"))
    val bAdj = b.join(offsets, Seq("user_id"), "left")
      .filter(!(coalesce(col("was_merged"), lit(false)) && col("version") === 1))
      .select(col("user_id"), (col("version") + col("offset")).as("version"),
        col("attr"), col("valid_from"), col("valid_to"), col("n_events"),
        col("is_current"))
    keepClosed.unionByName(keepCurrent).unionByName(mergedRow)
      .unionByName(closedRow).unionByName(bAdj)
  }

  /** q113: the incremental SCD2 merge gated against the full rebuild —
    * archive = events before 2024-01-08, batch = the rest; the stitched
    * history must hash-match q107's full-rebuild oracle over ALL events.
    * At 100 TB this is the nightly dimension load: cost ∝ batch + the
    * store's CURRENT rows, never the closed history. */
  val q113Scd2Incremental: Q = Q(
    "q113_scd2_incremental",
    q107Scd2History.oracle.get) { (s, dir) =>
    val ev = Tables(s, dir, "events")
    val cut = lit("2024-01-08").cast("timestamp")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val history = scd2Of(ev.filter(col("ts") < cut)).persist(lvl)
    val batch = scd2Of(ev.filter(col("ts") >= cut)).persist(lvl)
    scd2Merge(history, batch)
      .orderBy(col("user_id"), col("version"))
  }

  /** q129: sliding-window rate limiting — per-user quota enforcement
    * (abuse / scraper detection, API throttling): every event is annotated
    * with how many events its user produced in the trailing 10 minutes
    * (inclusive) and flagged once that count exceeds the quota. The window
    * is a value-RANGE frame over epoch seconds, so it is gap-aware (a user
    * idle for an hour starts fresh) and tie-consistent (same-second events
    * are frame peers in both engines — no order ambiguity).
    *
    * Scale shape: the window is partitioned BY USER — per-user event
    * streams sort independently inside their hash partition, nothing is
    * global. This is the partitioned-window shape that's safe at any
    * scale (contrast q119's docstring: it exists because UNPARTITIONED
    * ntile is not). Skewed users (one bot = millions of rows) would next
    * get the q42 salt treatment: split the user's timeline into chunks
    * carrying 10 minutes of overlap, count within chunks, keep rows past
    * the overlap. */
  val q129RateLimit: Q = Q(
    "q129_rate_limit",
    """WITH e AS (
      |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |  FROM events),
      |w AS (
      |  SELECT event_id, user_id, sec,
      |         CAST(count(*) OVER (PARTITION BY user_id ORDER BY sec
      |           RANGE BETWEEN 599 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_recent
      |  FROM e)
      |SELECT event_id, user_id, sec, n_recent, n_recent > 5 AS throttled
      |FROM w ORDER BY event_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
      .rangeBetween(-599L, Window.currentRow)
    Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("sec"))
      .withColumn("n_recent", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"), col("sec"), col("n_recent"),
        (col("n_recent") > 5).as("throttled"))
      .orderBy(col("event_id"))
  }

  /** q131: CUSUM changepoint detection — did a series' daily rate SHIFT,
    * and when? (q98/q108 ask "do two distributions differ"; this asks
    * "where in time did this one break".) The classic CUSUM statistic
    * Σ(cᵢ − mean) is kept EXACT by scaling out the division: with D days
    * and total T, dev_k = D·cum_k − k·T is D× the raw CUSUM — same argmax,
    * same relative threshold, pure BIGINT. A series drifts when
    * max|dev| · 10 > D·T (max excursion above 10% of total mass), and the
    * changepoint is the FIRST day attaining the max (deterministic
    * tie-break via a min over the max-equal rows — engine arg_max tie
    * order is unspecified, so it's never used).
    *
    * Scale shape: raw events collapse to (series, day) counts map-side —
    * everything after runs on ~D rows per series, windows partitioned BY
    * series. Linear in events, then independent of them. */
  val q131CusumChangepoint: Q = Q(
    "q131_cusum_changepoint",
    """WITH d AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |             CAST(sum(c) AS BIGINT) AS total FROM d GROUP BY 1),
      |cum AS (
      |  SELECT event_type, day,
      |         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS cumc,
      |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS k
      |  FROM d),
      |dev AS (
      |  SELECT c.event_type, c.day, abs(t.n_days * c.cumc - c.k * t.total) AS adev
      |  FROM cum c JOIN t USING (event_type)),
      |mx AS (SELECT event_type, max(adev) AS max_adev FROM dev GROUP BY 1)
      |SELECT t.event_type, n_days, total, max_adev,
      |       (SELECT min(day) FROM dev
      |        WHERE dev.event_type = t.event_type AND dev.adev = mx.max_adev) AS cp_day,
      |       max_adev * 10 > n_days * total AS drifted
      |FROM t JOIN mx USING (event_type) ORDER BY event_type""".stripMargin) { (s, dir) =>
    cusumOf(Tables(s, dir, "events")
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("c")))
      .orderBy(col("event_type"))
  }

  /** The q131 core over any (event_type, day, c) daily-count frame. */
  private[ops] def cusumOf(d: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val dev = d
      .withColumn("cumc", sum(col("c")).over(w))
      .withColumn("k", row_number().over(w).cast("long"))
      .withColumn("n_days", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .withColumn("total", sum(col("c")).over(Window.partitionBy(col("event_type"))))
      .withColumn("adev", abs(col("n_days") * col("cumc") - col("k") * col("total")))
      .withColumn("max_adev",
        max(col("adev")).over(Window.partitionBy(col("event_type"))))
      .persist(lvl)
    dev.groupBy(col("event_type"))
      .agg(
        max(col("n_days")).as("n_days"), max(col("total")).as("total"),
        max(col("max_adev")).as("max_adev"),
        min(when(col("adev") === col("max_adev"), col("day"))).as("cp_day"))
      .select(col("event_type"), col("n_days"), col("total"), col("max_adev"),
        col("cp_day"),
        (col("max_adev") * 10 > col("n_days") * col("total")).as("drifted"))
  }

  /** q137: time-weighted average (TWAP) — the correct mean for a sampled
    * signal with irregular gaps (sensor readings, prices, gauges): each
    * observation's value holds until the next one, so it contributes
    * value·duration, not value·1 (a plain AVG over-weights bursts — q111
    * forward-fills the timeline; this integrates it). Per user:
    * TWA = Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_last − t_first) over second-grain event
    * time, values as exact cents. The numerator accumulates in exact
    * 128-bit integers and the single IEEE division at the end is the
    * COVERAGE.md determinism rule. Same-second ties carry duration 0 and
    * the ORDER BY is pinned to (sec, event_id) in both engines, so tie
    * order can never shift the integral.
    *
    * Scale shape: one window partitioned BY USER (per-user timelines sort
    * independently — the q129 shape), then a per-user aggregate. Nothing
    * global, one shuffle on user_id serving both steps. */
  val q137TimeWeighted: Q = Q(
    "q137_time_weighted",
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |         CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events),
      |d AS (
      |  SELECT user_id, v,
      |         lead(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) - sec
      |           AS dur
      |  FROM e)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(dur) AS BIGINT) AS span_s,
      |       CAST(CAST(sum(CAST(v AS HUGEINT) * dur) AS DOUBLE)
      |            / CAST(sum(dur) AS DOUBLE) AS DOUBLE) AS twa_cents
      |FROM d GROUP BY 1 HAVING sum(dur) > 0
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
    Tables(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"),
        round(col("value") * 100).cast("long").as("v"))
      .withColumn("dur", lead(col("sec"), 1).over(w) - col("sec"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("dur")).cast("long").as("span_s"),
        (sum(col("v").cast(dec) * col("dur")).cast("double")
          / sum(col("dur")).cast("double")).as("twa_cents"))
      .filter(col("span_s") > 0)
      .orderBy(col("user_id"))
  }

  /** q145: calendar-spine gap detection — the "which days are MISSING"
    * audit a delivery pipeline runs before publishing: per event_type,
    * generate the full day spine [min_day, max_day] and anti-join the
    * observed days away. Absence can't be grouped for, so the spine is
    * generated (sequence + explode, one row per type from the bounds agg)
    * and the check inverts to an anti-join. Days ship as 'yyyy-MM-dd'
    * strings (date formatting is engine-identical; date VALUES cross
    * pandas/DuckDB less cleanly). The test data has no natural gaps, so a
    * deterministic OUTAGE is planted (every 5th epoch-day dropped) —
    * detection is proven, not vacuously green on an empty result.
    *
    * Scale: observed days collapse map-side to (type, day) — bounded by
    * types × calendar, not rows; the spine is tiny and the anti-join
    * broadcasts. The 100 TB scan reduces before anything wide. */
  val q145MissingDays: Q = Q(
    "q145_missing_days",
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day FROM events
      |  WHERE (CAST(floor(epoch(ts)) AS BIGINT) // 86400) % 5 <> 0
      |  GROUP BY 1, 2),
      |b AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM d GROUP BY 1),
      |spine AS (
      |  SELECT event_type,
      |         CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM b)
      |SELECT s.event_type, CAST(s.day AS VARCHAR) AS day
      |FROM spine s LEFT JOIN d ON s.event_type = d.event_type AND s.day = d.day
      |WHERE d.day IS NULL
      |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val d = Tables(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
      .filter(expr("(sec div 86400) % 5 <> 0"))
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .distinct()
    val b = d.groupBy(col("event_type"))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val spine = b.select(col("event_type"),
      explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    spine.join(d, Seq("event_type", "day"), "left_anti")
      .select(col("event_type"), col("day").cast("string").as("day"))
      .orderBy(col("event_type"), col("day"))
  }

  /** q146: contingency lift audit — independence screening over the
    * event_type × day-of-week table: cell lift = P(type, dow) /
    * (P(type)·P(dow)), flagged when it deviates >10% from 1. All exact:
    * dow is pure epoch arithmetic ((days+3) mod 7, Monday=0 — the two
    * engines' dayofweek() builtins disagree on numbering, arithmetic
    * can't), lift ships as o·N·10⁶ div r·c ppm, and the flag
    * cross-multiplies 10·|o·N − r·c| > r·c — int64 end to end.
    *
    * Scale: one map-side count to ≤ types×7 cells; marginals and N are
    * re-aggregates of the CELLS (9 rows), not rescans; everything after
    * the first agg is broadcast-sized. */
  val q146LiftAudit: Q = Q(
    "q146_lift_audit",
    """WITH cells AS (
      |  SELECT event_type,
      |         (CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 3) % 7 AS dow,
      |         count(*) AS o
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT event_type, sum(o) AS rt FROM cells GROUP BY 1),
      |c AS (SELECT dow, sum(o) AS ct FROM cells GROUP BY 1),
      |t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells)
      |SELECT cells.event_type, CAST(cells.dow AS BIGINT) AS dow,
      |       CAST(cells.o AS BIGINT) AS n_events,
      |       CAST(cells.o * t.n * 1000000 // (r.rt * c.ct) AS BIGINT) AS lift_ppm,
      |       10 * abs(cells.o * t.n - r.rt * c.ct) > r.rt * c.ct AS flagged
      |FROM cells JOIN r USING (event_type) JOIN c USING (dow) CROSS JOIN t
      |ORDER BY event_type, dow""".stripMargin) { (s, dir) =>
    val cells = Tables(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy(col("event_type"),
        expr("(sec div 86400 + 3) % 7").cast("long").as("dow"))
      .agg(count(lit(1)).as("o"))
    val r = cells.groupBy(col("event_type")).agg(sum(col("o")).as("rt"))
    val c = cells.groupBy(col("dow")).agg(sum(col("o")).as("ct"))
    val t = cells.agg(sum(col("o")).cast("long").as("n"))
    cells.join(broadcast(r), "event_type").join(broadcast(c), "dow")
      .crossJoin(broadcast(t))
      .select(col("event_type"), col("dow"), col("o").as("n_events"),
        expr("o * n * 1000000 div (rt * ct)").cast("long").as("lift_ppm"),
        (lit(10) * abs(col("o") * col("n") - col("rt") * col("ct"))
          > col("rt") * col("ct")).as("flagged"))
      .orderBy(col("event_type"), col("dow"))
  }

  /** q151: multi-touch attribution — each purchase's value splits equally
    * across the same user's clicks in the preceding 30 minutes (the q94
    * attribution join, carried through to the CREDIT feed marketers
    * actually consume). The split is conservation-exact in integer cents:
    * every click gets v div m and the remainder v mod m goes to the
    * EARLIEST click (row_number over (click_ts, click_id) — total order,
    * so both engines pick the same row). No float division anywhere, so
    * credits sum back to the purchase value cent-for-cent by
    * construction.
    *
    * Scale: the θ-join is watermark-evictable in its streaming form
    * (q94); the per-purchase window partitions by buy_id — millions of
    * tiny partitions, nothing global — and the final rollup shuffles on
    * (user, click). */
  val q151Attribution: Q = Q(
    "q151_attribution",
    """WITH p AS (
      |  SELECT user_id, event_id AS buy_id, ts AS buy_ts,
      |         CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id, event_id AS click_id, ts AS click_ts
      |  FROM events WHERE event_type = 'click'),
      |j AS (
      |  SELECT p.user_id, p.buy_id, p.v, c.click_id, c.click_ts
      |  FROM p JOIN c ON p.user_id = c.user_id
      |   AND p.buy_ts >= c.click_ts
      |   AND p.buy_ts <= c.click_ts + INTERVAL 30 MINUTE),
      |j2 AS (
      |  SELECT *, count(*) OVER (PARTITION BY buy_id) AS m,
      |         row_number() OVER (PARTITION BY buy_id
      |                            ORDER BY click_ts, click_id) AS rn
      |  FROM j)
      |SELECT user_id, click_id,
      |       CAST(sum(v // m + CASE WHEN rn = 1 THEN v % m ELSE 0 END)
      |            AS BIGINT) AS credit_cents,
      |       count(*) AS n_purchases
      |FROM j2 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(s, dir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("buy_id"),
        col("ts").as("buy_ts"), round(col("value") * 100).cast("long").as("v"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val j = p.join(c, Seq("user_id"))
      .filter(col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
    val byBuy = Window.partitionBy(col("buy_id"))
    val j2 = j
      .withColumn("m", count(lit(1)).over(byBuy))
      .withColumn("rn", row_number().over(
        byBuy.orderBy(col("click_ts"), col("click_id"))))
    j2.groupBy(col("user_id"), col("click_id"))
      .agg(
        sum(expr("v div m") + when(col("rn") === 1, expr("v % m")).otherwise(0L))
          .cast("long").as("credit_cents"),
        count(lit(1)).as("n_purchases"))
      .orderBy(col("user_id"), col("click_id"))
  }

  /** q325: position-based (U-shaped) multi-touch attribution — the model
    * upgrade over q151's linear split: marketing attribution credits the
    * FIRST touch (discovery) and the LAST touch (conversion) 40% each and
    * splits the middle 20% — the industry's U-shaped model. Degenerate
    * path lengths renormalize exactly: m=1 → 100%, m=2 → 50/50.
    *
    * Exactness: weights are ppm integers by CASE; each touch's credit is
    * floor(v·w/10⁶) and the FLOOR RESIDUAL v − Σfloor(·) goes to the
    * first touch (q151's remainder discipline generalized — credits sum
    * to v exactly, so total credited cents ≡ total purchase cents, an
    * invariant both engines enforce identically). Middle weight uses
    * 200000/(m−2) integer division; the resulting sub-ppm loss lands in
    * the residual, not in a drifting float.
    *
    * The lookback is 7 DAYS (q151 uses 30 minutes): the synthetic stream
    * has no multi-click half-hours, and an attribution MODEL gate must
    * actually execute its m>=3 branch — at 7 days paths reach length 10.
    *
    * Scale shape: q151's topology unchanged — the theta join blocks on
    * user_id, windows partition by buy_id (path-bounded), the rollup is
    * map-side combined. */
  val q325PositionAttribution: Q = Q(
    "q325_position_attribution",
    """WITH p AS (
      |  SELECT user_id, event_id AS buy_id, ts AS buy_ts,
      |         CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id, event_id AS click_id, ts AS click_ts
      |  FROM events WHERE event_type = 'click'),
      |j AS (
      |  SELECT p.user_id, p.buy_id, p.v, c.click_id, c.click_ts
      |  FROM p JOIN c ON p.user_id = c.user_id
      |   AND p.buy_ts >= c.click_ts
      |   AND p.buy_ts <= c.click_ts + INTERVAL 7 DAY),
      |j2 AS (
      |  SELECT *, count(*) OVER (PARTITION BY buy_id) AS m,
      |         row_number() OVER (PARTITION BY buy_id
      |                            ORDER BY click_ts, click_id) AS rn
      |  FROM j),
      |w AS (
      |  SELECT *, CASE WHEN m = 1 THEN 1000000
      |                 WHEN m = 2 THEN 500000
      |                 WHEN rn = 1 OR rn = m THEN 400000
      |                 ELSE 200000 // (m - 2) END AS w_ppm
      |  FROM j2),
      |f AS (
      |  SELECT *, v * w_ppm // 1000000 AS c0,
      |         v - sum(v * w_ppm // 1000000) OVER (PARTITION BY buy_id) AS resid
      |  FROM w)
      |SELECT user_id, click_id,
      |       CAST(sum(c0 + CASE WHEN rn = 1 THEN resid ELSE 0 END) AS BIGINT)
      |         AS credit_cents,
      |       count(*) AS n_purchases
      |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(s, dir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("buy_id"),
        col("ts").as("buy_ts"), round(col("value") * 100).cast("long").as("v"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val j = p.join(c, Seq("user_id"))
      .filter(col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr("INTERVAL 7 DAYS"))
    val byBuy = Window.partitionBy(col("buy_id"))
    val f = j
      .withColumn("m", count(lit(1)).over(byBuy))
      .withColumn("rn", row_number().over(
        byBuy.orderBy(col("click_ts"), col("click_id"))))
      .withColumn("w_ppm",
        expr("""CASE WHEN m = 1 THEN 1000000
               |     WHEN m = 2 THEN 500000
               |     WHEN rn = 1 OR rn = m THEN 400000
               |     ELSE 200000 div (m - 2) END""".stripMargin))
      .withColumn("c0", expr("v * w_ppm div 1000000"))
      .withColumn("resid", col("v") - sum(col("c0")).over(byBuy))
    f.groupBy(col("user_id"), col("click_id"))
      .agg(
        sum(col("c0") + when(col("rn") === 1, col("resid")).otherwise(0L))
          .cast("long").as("credit_cents"),
        count(lit(1)).as("n_purchases"))
      .orderBy(col("user_id"), col("click_id"))
  }

  /** q326: Holt–Winters additive forecast — the seasonal completion of
    * the smoothing family: q271 (Holt) tracks level+trend but a weekly
    * cycle bleeds into its trend; HW adds a 7-slot seasonal state
    * s_t = γ(v_t − l_t) + (1−γ)s_{t−7}, carried as a ROTATING 7-QUEUE
    * (head = the factor due now, each step pops the head and pushes the
    * refreshed value), so the recursion is a single fold — Spark runs it
    * as `aggregate` over each type's collected day array (bounded by the
    * calendar, q271's device), DuckDB as a recursive CTE over the same
    * ordered series.
    *
    * Determinism: α=β=γ=1/2 — but the REAL guarantee is that both
    * engines execute the IDENTICAL IEEE operation sequence (same
    * parenthesization, same fold order), so every intermediate double is
    * bit-equal; round(,6) on the surface is belt-and-braces, not the
    * mechanism. Init: l₁=v₁, b₁=0, s=0⁷ (the first week trains the
    * seasonal slots from zero — a stated contract, as in q271's b₁=0).
    *
    * Scale shape: the fold state is 9 doubles per GROUP; collect_list
    * holds one group's day series (≤ calendar span) in one buffer —
    * exactly q271's footprint plus 7 doubles. Groups parallelize
    * independently; nothing row-grain shuffles twice. */
  val q326HoltWinters: Q = Q(
    "q326_holt_winters",
    """WITH RECURSIVE d AS (
      |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2),
      |ser AS (SELECT event_type, v,
      |               row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
      |        FROM d),
      |nmax AS (SELECT event_type, max(t) AS tn FROM ser GROUP BY 1),
      |rec AS (
      |  SELECT event_type, t, CAST(v AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS b,
      |         [0e0, 0e0, 0e0, 0e0, 0e0, 0e0, 0e0] AS s
      |  FROM ser WHERE t = 1
      |  UNION ALL
      |  SELECT s2.event_type, s2.t,
      |         0.5e0 * (s2.v - r.s[1]) + 0.5e0 * (r.l + r.b),
      |         0.5e0 * ((0.5e0 * (s2.v - r.s[1]) + 0.5e0 * (r.l + r.b)) - r.l)
      |           + 0.5e0 * r.b,
      |         r.s[2:7] || [0.5e0 * (s2.v - (0.5e0 * (s2.v - r.s[1])
      |                        + 0.5e0 * (r.l + r.b))) + 0.5e0 * r.s[1]]
      |  FROM rec r JOIN ser s2 ON s2.event_type = r.event_type
      |                        AND s2.t = r.t + 1)
      |SELECT r.event_type, CAST(n.tn AS BIGINT) AS n_days,
      |       round(r.l, 6) AS level_cents, round(r.b, 6) AS trend_cents,
      |       round(r.l + r.b + r.s[1], 6) AS forecast_1,
      |       round(r.l + 7 * r.b + r.s[7], 6) AS forecast_7
      |FROM rec r JOIN nmax n USING (event_type) WHERE r.t = n.tn
      |ORDER BY r.event_type""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy(col("event_type"), expr("sec div 86400").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).cast("long").as("v"))
      .groupBy(col("event_type"))
      .agg(expr("array_sort(collect_list(struct(day, v)))").as("arr"))
      .withColumn("st", expr(
        """aggregate(slice(arr, 2, size(arr) - 1),
          |  named_struct('l', CAST(element_at(arr, 1).v AS DOUBLE),
          |               'b', CAST(0.0 AS DOUBLE),
          |               's', array(0D, 0D, 0D, 0D, 0D, 0D, 0D)),
          |  (st, e) -> named_struct(
          |    'l', 0.5D * (CAST(e.v AS DOUBLE) - element_at(st.s, 1))
          |           + 0.5D * (st.l + st.b),
          |    'b', 0.5D * ((0.5D * (CAST(e.v AS DOUBLE) - element_at(st.s, 1))
          |           + 0.5D * (st.l + st.b)) - st.l) + 0.5D * st.b,
          |    's', concat(slice(st.s, 2, 6),
          |           array(0.5D * (CAST(e.v AS DOUBLE)
          |                   - (0.5D * (CAST(e.v AS DOUBLE) - element_at(st.s, 1))
          |                      + 0.5D * (st.l + st.b)))
          |                 + 0.5D * element_at(st.s, 1)))))""".stripMargin))
      .select(col("event_type"), size(col("arr")).cast("long").as("n_days"),
        round(col("st.l"), 6).as("level_cents"),
        round(col("st.b"), 6).as("trend_cents"),
        expr("round(st.l + st.b + element_at(st.s, 1), 6)").as("forecast_1"),
        expr("round(st.l + 7 * st.b + element_at(st.s, 7), 6)").as("forecast_7"))
      .orderBy(col("event_type"))
  }

  /** q327: split-conformal prediction interval — the UNCERTAINTY leg of
    * the forecasting family: q165/q271/q326 emit point forecasts;
    * conformal prediction wraps ANY forecaster in a distribution-free
    * interval with finite-sample coverage ≥ 1−α, by taking q̂ = the
    * ⌈(1−α)(n+1)⌉-th smallest absolute residual on a held-out
    * calibration window and shipping [pred−q̂, pred+q̂]. Here the wrapped
    * model is the seasonal-naive predictor (q165's shape: day d's
    * revenue = day d−7's), calibration = the first 24 days, test = the
    * rest; α = 0.1.
    *
    * Exactness: residuals are cents integers; the order statistic comes
    * from the rank-selection kernel (10·cum ≥ 9·(n+1) picks exactly
    * ⌈0.9(n+1)⌉ because cum is integral); coverage is a micro-floored
    * ratio. If k > n (calibration too small) q̂ is NULL and the interval
    * honestly vanishes rather than under-covering.
    *
    * Scale shape: day-grain rollup, a self-join on day−7 (both sides the
    * same bounded day table), a global window over the ≤|calibration|
    * residual levels (audited), constant-size everything after. */
  val q327ConformalInterval: Q = Q(
    "q327_conformal_interval",
    """WITH dd AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |                     AS v
      |            FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |p AS (SELECT a.day, a.v AS actual, b.v AS pred
      |      FROM dd a JOIN dd b ON b.day = a.day - 7),
      |m AS (SELECT min(day) AS d0 FROM dd),
      |cal AS (SELECT abs(actual - pred) AS sc FROM p, m WHERE day < d0 + 24),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cal),
      |lv AS (SELECT sc, CAST(count(*) AS BIGINT) AS c FROM cal GROUP BY 1),
      |cum AS (SELECT sc, CAST(sum(c) OVER (ORDER BY sc) AS BIGINT) AS cum
      |        FROM lv),
      |k AS (SELECT min(sc) AS qhat FROM cum, n WHERE 10 * cum >= 9 * (n + 1)),
      |tst AS (SELECT day, actual, pred, pred - qhat AS lo, pred + qhat AS hi,
      |               actual >= pred - qhat AND actual <= pred + qhat AS covered
      |        FROM p, m, k WHERE day >= d0 + 24),
      |cov AS (SELECT CAST(sum(CASE WHEN covered THEN 1 ELSE 0 END) * 1000000
      |                      // count(*) AS BIGINT) AS coverage_ppm FROM tst)
      |SELECT tst.day, tst.actual, tst.pred, tst.lo, tst.hi, tst.covered,
      |       cov.coverage_ppm
      |FROM tst, cov ORDER BY day""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val dd = Tables(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(expr("unix_timestamp(ts) div 86400").as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS LONG)")).as("v"))
      .persist(MEMORY_AND_DISK)
    val p = dd.select(col("day"), col("v").as("actual"))
      .join(dd.select((col("day") + 7).as("day"), col("v").as("pred")), "day")
      .persist(MEMORY_AND_DISK)
    val m = dd.agg(min(col("day")).as("d0"))
    val cal = p.crossJoin(broadcast(m)).filter(col("day") < col("d0") + 24)
      .select(abs(col("actual") - col("pred")).as("sc"))
    val n = cal.agg(count(lit(1)).as("n"))
    val cum = cal.groupBy(col("sc")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(Window.orderBy(col("sc"))))
    val k = cum.crossJoin(broadcast(n))
      .filter(lit(10) * col("cum") >= lit(9) * (col("n") + 1))
      .agg(min(col("sc")).as("qhat"))
    val tst = p.crossJoin(broadcast(m)).filter(col("day") >= col("d0") + 24)
      .crossJoin(broadcast(k))
      .select(col("day"), col("actual"), col("pred"),
        (col("pred") - col("qhat")).as("lo"), (col("pred") + col("qhat")).as("hi"),
        (col("actual") >= col("pred") - col("qhat") &&
          col("actual") <= col("pred") + col("qhat")).as("covered"))
    // NOT persisted: p (the expensive part) already is, and a persist here
    // would bury the rank-selection window inside an InMemoryRelation
    // where PlanAuditSpec's traversal cannot audit it.
    val cov = tst.agg(
      expr("CAST(sum(CASE WHEN covered THEN 1 ELSE 0 END) * 1000000"
        + " div count(1) AS LONG)").as("coverage_ppm"))
    tst.crossJoin(broadcast(cov)).orderBy(col("day"))
  }

  /** q328: behavioral sequence-pattern match — the complex-event-
    * processing leg (SQL-standard MATCH_RECOGNIZE territory): q23 counts
    * funnel STAGES and q180 tallies fixed journey prefixes, but "did the
    * user view, then click, then purchase WITH NO ERROR in between" is a
    * pattern with an exclusion, which neither stage counting nor prefix
    * tallies can express. Each user's event history becomes a character
    * sequence (first letter of the event type — the five types are
    * distinct on it) in deterministic (ts, event_id) order, and the
    * pattern is one regex: `v[^e]*c[^e]*p`.
    *
    * Determinism: the sequence string is built with an ORDER BY inside
    * the aggregation (DuckDB string_agg ORDER BY; Spark array_sort over
    * (ts, event_id, ch) structs — struct order IS field order), so both
    * engines agree byte-for-byte; the regex subset used (literals,
    * negated char class, star) has identical semantics in RE2 (DuckDB)
    * and java.util.regex (Spark), and both `regexp_matches`/`rlike` are
    * find-anywhere.
    *
    * Scale shape: one user_id shuffle into a per-user buffer — the
    * sessionize-class footprint (state = one user's history, bounded by
    * per-user activity, NOT corpus size); the regex runs once per user.
    * At 100 TB the same plan holds wherever per-user histories fit a
    * buffer — the same envelope q22/q180 already assume — and the
    * streaming twin would be flatMapGroupsWithState keeping the tail of
    * the sequence. */
  val q328SequenceMatch: Q = Q(
    "q328_sequence_match",
    """WITH s AS (
      |  SELECT user_id,
      |         CAST(count(*) AS BIGINT) AS n_events,
      |         string_agg(substring(event_type, 1, 1), ''
      |                    ORDER BY ts, event_id) AS seq
      |  FROM events GROUP BY 1)
      |SELECT user_id, n_events, seq,
      |       regexp_matches(seq, 'v[^e]*c[^e]*p') AS clean_funnel
      |FROM s ORDER BY user_id""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        expr("""array_join(transform(
               |  array_sort(collect_list(struct(ts, event_id,
               |    substring(event_type, 1, 1) AS ch))),
               |  x -> x.ch), '')""".stripMargin).as("seq"))
      .withColumn("clean_funnel", col("seq").rlike("v[^e]*c[^e]*p"))
      .select(col("user_id"), col("n_events"), col("seq"), col("clean_funnel"))
      .orderBy(col("user_id"))
  }

  /** q155: Markov transition counts — the behavioral matrix behind
    * next-action prediction and anomaly scoring: within a session (same
    * 30-minute inactivity rule as q22), count (previous event_type →
    * event_type) transitions, with each session's first event entering
    * from the '<start>' state. One lag window per user ordered by
    * (ts, event_id) — the tie order is pinned so same-second events
    * transition identically in both engines — and the session break
    * rewrites prev to '<start>' instead of dropping the row.
    *
    * Scale: one user_id shuffle for the lag, then the transition rollup
    * collapses to ≤ (types+1)² cells map-side. */
  val q155MarkovTransitions: Q = Q(
    "q155_markov_transitions",
    """WITH m AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         lag(event_type) OVER w AS prev_type,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS is_start
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |t AS (
      |  SELECT CASE WHEN is_start = 1 THEN '<start>' ELSE prev_type END
      |           AS from_type,
      |         event_type AS to_type
      |  FROM m)
      |SELECT from_type, to_type, count(*) AS n
      |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        lag(col("ts"), 1).over(w).as("prev_ts"))
      .select(
        when(col("prev_ts").isNull ||
          col("ts") >= col("prev_ts") + expr("INTERVAL 30 MINUTES"),
          lit("<start>")).otherwise(col("prev_type")).as("from_type"),
        col("event_type").as("to_type"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** q157: cohort LTV curve — q71 tracks cohort RETENTION (who came
    * back); this tracks cohort VALUE: users cohorted by first-purchase
    * WEEK, revenue accumulated by cohort age in weeks, the curve a
    * growth team reads payback periods off. The week index is pure
    * integer epoch arithmetic (epoch-day div 7 — date_diff/
    * months_between semantics differ across engines; the test window
    * spans one calendar month, so week grain also makes the curve real),
    * revenue is exact cents, and the cumulative runs per cohort over
    * ≤ #weeks rows. Cohorts are labeled by their week's start date.
    *
    * Scale: purchases reduce to (cohort, age) cells after a user-grain
    * first-purchase agg; the only windows touch cohort×age cells. The
    * user→cohort join shuffles on user_id once. */
  val q157CohortLtv: Q = Q(
    "q157_cohort_ltv",
    """WITH p AS (
      |  SELECT user_id,
      |         (CAST(floor(epoch(ts)) AS BIGINT) // 86400) // 7 AS wi,
      |         CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, min(wi) AS cwi FROM p GROUP BY 1),
      |r AS (SELECT c.cwi, p.wi - c.cwi AS age, sum(p.v) AS rev,
      |             count(DISTINCT p.user_id) AS n_active
      |      FROM p JOIN c USING (user_id) GROUP BY 1, 2),
      |u AS (SELECT cwi, count(*) AS n_users FROM c GROUP BY 1)
      |SELECT CAST(DATE '1970-01-01' + (r.cwi * 7)::INT AS VARCHAR)
      |         AS cohort_week,
      |       CAST(r.age AS BIGINT) AS age_weeks,
      |       CAST(u.n_users AS BIGINT) AS n_users,
      |       CAST(r.n_active AS BIGINT) AS n_active,
      |       CAST(sum(r.rev) OVER (PARTITION BY r.cwi ORDER BY r.age) AS BIGINT)
      |         AS cum_revenue_cents
      |FROM r JOIN u USING (cwi)
      |ORDER BY cohort_week, age_weeks""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val p = Tables(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .withColumn("sec", unix_timestamp(col("ts")))
      .select(col("user_id"),
        expr("(sec div 86400) div 7").as("wi"),
        round(col("value") * 100).cast("long").as("v"))
    val c = p.groupBy(col("user_id")).agg(min(col("wi")).as("cwi"))
    val r = p.join(c, "user_id")
      .groupBy(col("cwi"), (col("wi") - col("cwi")).as("age"))
      .agg(sum(col("v")).as("rev"), countDistinct(col("user_id")).as("n_active"))
    val u = c.groupBy(col("cwi")).agg(count(lit(1)).as("n_users"))
    r.join(u, "cwi")
      .select(
        date_add(lit("1970-01-01").cast("date"),
          (col("cwi") * 7).cast("int")).cast("string").as("cohort_week"),
        col("age").as("age_weeks"), col("n_users"), col("n_active"),
        sum(col("rev")).over(Window.partitionBy(col("cwi")).orderBy(col("age")))
          .cast("long").as("cum_revenue_cents"))
      .orderBy(col("cohort_week"), col("age_weeks"))
  }

  /** q165: seasonal-naive forecast evaluation — before shipping any
    * forecaster you beat the baseline, and the baseline for daily data is
    * "same day last week". Per event_type: daily revenue totals in exact
    * cents, naive(t) = actual(t−7), error = Σ|actual − naive| over the
    * evaluable days (a self-join on day−7 at day-cell grain), MAE as the
    * one final IEEE division. This is the denominator of MASE — the
    * anomaly-alert threshold feed.
    *
    * Scale: rows collapse to (type, day) cells map-side; the lag-7
    * self-join and everything after touch only those cells. */
  val q165SeasonalNaive: Q = Q(
    "q165_seasonal_naive",
    """WITH d AS (
      |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2),
      |j AS (SELECT a.event_type, a.v, b.v AS naive
      |      FROM d a JOIN d b
      |        ON a.event_type = b.event_type AND b.day = a.day - 7)
      |SELECT event_type, count(*) AS n_days,
      |       CAST(sum(abs(v - naive)) AS BIGINT) AS total_abs_err_cents,
      |       CAST(CAST(sum(abs(v - naive)) AS DOUBLE) / count(*) AS DOUBLE)
      |         AS mae_cents
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val d = Tables(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy(col("event_type"), expr("sec div 86400").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).cast("long").as("v"))
    val j = d.as("a").join(d.as("b"),
      col("a.event_type") === col("b.event_type") &&
        col("b.day") === col("a.day") - 7)
      .select(col("a.event_type").as("event_type"), col("a.v").as("v"),
        col("b.v").as("naive"))
    j.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("v") - col("naive"))).cast("long").as("total_abs_err_cents"),
        (sum(abs(col("v") - col("naive"))).cast("double") / count(lit(1)))
          .as("mae_cents"))
      .orderBy(col("event_type"))
  }

  /** q271: Holt double-exponential smoothing (level + linear trend) —
    * the forecasting step past q165's seasonal-naive baseline: per
    * event_type, fold the daily cents series through
    * l_t = ½·y_t + ½·(l + b), b_t = ½·(l_t − l) + ½·b (α = β = ½) and
    * surface the final state plus 1- and 3-step-ahead forecasts.
    *
    * Determinism: the recursion is SEQUENTIAL by construction (no
    * reordering for an engine to disagree on) and every step is IEEE
    * basic ops (+, ×½) — correctly rounded and bit-identical in both
    * engines, so no round-before-sum discipline is needed; the halving
    * coefficients also keep early iterates exactly representable
    * (dyadic). DuckDB renders the same fold as a recursive CTE stepping
    * t → t+1 per key.
    *
    * Scale: the series is DAY-cardinality per key — bounded by the
    * calendar, not the row count — so the per-key collect_list + O(days)
    * aggregate HOF is a bounded reduction at any corpus size; the daily
    * rollup beneath it combines map-side. */
  val q271HoltForecast: Q = Q(
    "q271_holt_forecast",
    """WITH RECURSIVE d AS (
      |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2),
      |ser AS (SELECT event_type, v,
      |               row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
      |        FROM d),
      |nmax AS (SELECT event_type, max(t) AS tn FROM ser GROUP BY 1),
      |rec AS (
      |  SELECT event_type, t, CAST(v AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS b
      |  FROM ser WHERE t = 1
      |  UNION ALL
      |  SELECT s.event_type, s.t,
      |         0.5e0 * s.v + 0.5e0 * (r.l + r.b),
      |         0.5e0 * ((0.5e0 * s.v + 0.5e0 * (r.l + r.b)) - r.l) + 0.5e0 * r.b
      |  FROM rec r JOIN ser s ON s.event_type = r.event_type AND s.t = r.t + 1)
      |SELECT r.event_type, CAST(n.tn AS BIGINT) AS n_days,
      |       round(r.l, 6) AS level_cents,
      |       round(r.b, 6) AS trend_cents,
      |       round(r.l + r.b, 6) AS forecast_1,
      |       round(r.l + 3 * r.b, 6) AS forecast_3
      |FROM rec r JOIN nmax n USING (event_type) WHERE r.t = n.tn
      |ORDER BY r.event_type""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy(col("event_type"), expr("sec div 86400").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).cast("long").as("v"))
      .groupBy(col("event_type"))
      .agg(expr("array_sort(collect_list(struct(day, v)))").as("arr"))
      .withColumn("st", expr(
        """aggregate(slice(arr, 2, size(arr) - 1),
          |  named_struct('l', CAST(element_at(arr, 1).v AS DOUBLE),
          |               'b', CAST(0.0 AS DOUBLE)),
          |  (st, e) -> named_struct(
          |    'l', 0.5D * CAST(e.v AS DOUBLE) + 0.5D * (st.l + st.b),
          |    'b', 0.5D * ((0.5D * CAST(e.v AS DOUBLE) + 0.5D * (st.l + st.b))
          |                 - st.l) + 0.5D * st.b))""".stripMargin))
      .select(col("event_type"), size(col("arr")).cast("long").as("n_days"),
        round(col("st.l"), 6).as("level_cents"),
        round(col("st.b"), 6).as("trend_cents"),
        round(col("st.l") + col("st.b"), 6).as("forecast_1"),
        round(col("st.l") + lit(3) * col("st.b"), 6).as("forecast_3"))
      .orderBy(col("event_type"))
  }

  /** q276: exact autocorrelation function (ACF, lags 1–7) of the daily
    * revenue series per event_type — the diagnostic that DECIDES between
    * q165's seasonal-naive and q271's Holt (a spike at lag 7 says
    * "seasonal", fast decay says "trend model suffices"), and the
    * standard residual-whiteness check after either.
    *
    * Exactness: ACF(k) = Σ(y_t−ȳ)(y_{t−k}−ȳ) / Σ(y_t−ȳ)² is computed
    * with both sides multiplied through by n² — centered terms become
    * the exact integers (n·y_t − S) — so numerator and denominator are
    * integer sums (DECIMAL(38,0)/HUGEINT: n·y ≈ 90·10⁹ cents squared
    * exceeds BIGINT) and the surfaced acf_ppm is ONE integer division.
    * Missing days are handled by indexing on the observation order t
    * (q271's convention), not the calendar day.
    *
    * Scale shape: the raw table collapses to (type, day) cells map-side;
    * the per-type stats broadcast back; the 7 lags come from ONE
    * broadcast-lag cross join over the day-grain table (bounded by
    * calendar × 7, never row count). */
  val q276AcfDaily: Q = Q(
    "q276_acf_daily",
    """WITH d AS (
      |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2),
      |ser AS (SELECT event_type, v,
      |               row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
      |        FROM d),
      |st AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
      |              CAST(sum(v) AS HUGEINT) AS sv
      |       FROM ser GROUP BY 1),
      |cen AS (SELECT s.event_type, s.t, st.n * s.v - st.sv AS c
      |        FROM ser s JOIN st USING (event_type)),
      |den AS (SELECT event_type, sum(c * c) AS den FROM cen GROUP BY 1),
      |k AS (SELECT unnest(generate_series(1, 7)) AS lag),
      |num AS (SELECT a.event_type, k.lag,
      |               CAST(count(*) AS BIGINT) AS n_pairs,
      |               sum(a.c * b.c) AS num
      |        FROM cen a CROSS JOIN k
      |             JOIN cen b ON b.event_type = a.event_type
      |                       AND b.t = a.t - k.lag
      |        GROUP BY 1, 2)
      |SELECT n.event_type, CAST(n.lag AS BIGINT) AS lag, n.n_pairs,
      |       CAST(1000000 * n.num // d2.den AS BIGINT) AS acf_ppm
      |FROM num n JOIN den d2 USING (event_type)
      |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val d = Tables(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy(col("event_type"), expr("sec div 86400").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).cast("long").as("v"))
    val ser = d.withColumn("t",
      row_number().over(Window.partitionBy(col("event_type")).orderBy(col("day"))))
    val st = ser.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("v")).cast("decimal(38,0)").as("sv"))
    val cen = ser.join(broadcast(st), "event_type")
      .select(col("event_type"), col("t"),
        (col("n") * col("v") - col("sv")).as("c"))
    val den = cen.groupBy(col("event_type")).agg(sum(col("c") * col("c")).as("den"))
    val lags = s.range(1, 8).select(col("id").as("lag"))
    val num = cen.as("a").crossJoin(broadcast(lags))
      .join(cen.as("b"),
        col("b.event_type") === col("a.event_type") &&
          col("b.t") === col("a.t") - col("lag"))
      .groupBy(col("a.event_type").as("event_type"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("a.c") * col("b.c")).as("num"))
    num.join(broadcast(den), "event_type")
      .select(col("event_type"), col("lag"), col("n_pairs"),
        expr("(1000000 * num) div den").cast("long").as("acf_ppm"))
      .orderBy(col("event_type"), col("lag"))
  }

  /** Shared rendering of the q306 decomposition CTE chain (through
    * `sc`); q306 surfaces it, q307 consumes its residuals. One string —
    * the two oracles cannot drift. */
  private val duckDecomposeCtes: String =
    """d AS (
      |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT event_type, day, v,
      |             CASE WHEN count(*) OVER w = 7
      |                   AND max(day) OVER w - min(day) OVER w = 6
      |                  THEN CAST(sum(v) OVER w * 1000 // 7 AS BIGINT)
      |             END AS trend_milli
      |      FROM d
      |      WINDOW w AS (PARTITION BY event_type ORDER BY day
      |                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |dt AS (SELECT event_type, day, day % 7 AS dow, v,
      |              trend_milli, v * 1000 - trend_milli AS det_milli
      |       FROM t WHERE trend_milli IS NOT NULL),
      |sraw AS (SELECT event_type, dow,
      |                CAST(sum(det_milli) AS BIGINT)
      |                  // count(*) AS s_milli
      |         FROM dt GROUP BY 1, 2),
      |sc AS (SELECT event_type, dow,
      |              s_milli - CAST(sum(s_milli) OVER (PARTITION BY event_type)
      |                             AS BIGINT)
      |                        // CAST(count(*) OVER (PARTITION BY event_type)
      |                                AS BIGINT) AS seasonal_milli
      |       FROM sraw),
      |dec AS (SELECT dt.event_type, dt.day, dt.v, dt.trend_milli,
      |               sc.seasonal_milli,
      |               dt.det_milli - sc.seasonal_milli AS resid_milli
      |        FROM dt JOIN sc ON sc.event_type = dt.event_type
      |                       AND sc.dow = dt.dow)""".stripMargin

  /** Spark side of the same chain: (event_type, day, v, trend_milli,
    * seasonal_milli, resid_milli) for every trend-bearing day. */
  private def decompose(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy(col("event_type"), expr("sec div 86400").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).cast("long").as("v"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val t = d.withColumn("t7", sum(col("v")).over(w) * 1000)
      .withColumn("wn", count(lit(1)).over(w))
      .withColumn("wspan", max(col("day")).over(w) - min(col("day")).over(w))
      .withColumn("trend_milli",
        when(col("wn") === 7 && col("wspan") === 6, expr("t7 div 7"))
          .cast("long"))
    val dt = t.filter(col("trend_milli").isNotNull)
      .withColumn("dow", col("day") % 7)
      .withColumn("det_milli", col("v") * 1000 - col("trend_milli"))
    val sraw = dt.groupBy(col("event_type"), col("dow"))
      .agg(expr("sum(det_milli) div count(*)").as("s_milli"))
    // Center over the dows that EXIST for the type (a calendar that
    // never trends on some weekday must not under-subtract via /7 —
    // review-pass finding: the bias is invisible to the oracle).
    val sc = sraw.withColumn("seasonal_milli",
        col("s_milli") - expr(
          "sum(s_milli) OVER (PARTITION BY event_type)" +
            " div count(*) OVER (PARTITION BY event_type)"))
      .select(col("event_type"), col("dow"), col("seasonal_milli"))
    dt.join(sc, Seq("event_type", "dow"))
      .select(col("event_type"), col("day"), col("v"),
        col("trend_milli"), col("seasonal_milli"),
        (col("det_milli") - col("seasonal_milli")).as("resid_milli"))
  }

  /** q306: seasonal decomposition (classical additive, weekly period) —
    * the model-selection companion that completes the time-series
    * family: q165 assumes seasonality, q271 assumes trend, q276
    * diagnoses which exists; this one SEPARATES them. value = trend
    * (centered 7-day moving average) + seasonal (centered day-of-week
    * index of the detrended series) + residual, all in exact milli-unit
    * integers (milli, not micro: daily cents ≈ 10¹³ at the 100 TB
    * grain, and ×10⁶ would overflow the BIGINT surface; every division
    * is a floor div both engines truncate identically).
    *
    * Gap honesty: the moving average only exists where the 7-row frame
    * is CALENDAR-contiguous (frame max−min = 6) — a gap row gets no
    * trend and contributes nothing to the seasonal fit, rather than a
    * frame silently spanning the hole (q289's calendar-distance
    * lesson in window form).
    *
    * Scale shape: day-grain rollup (map-side), per-key ordered windows
    * (partitioned by event_type — never global), one (type, dow)
    * aggregate joined back at day grain, one per-type centering. */
  val q306SeasonalDecompose: Q = Q(
    "q306_seasonal_decompose",
    s"""WITH $duckDecomposeCtes
      |SELECT event_type, day, v AS v_cents, trend_milli,
      |       seasonal_milli, resid_milli
      |FROM dec ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    decompose(s, dir)
      .withColumnRenamed("v", "v_cents")
      .orderBy(col("event_type"), col("day"))
  }

  /** q307: seasonal-adjusted anomaly detection — the composition that
    * makes q306 operational: raw-value outlier flags (q136/q156) fire
    * on every weekly peak; flagging on the DECOMPOSITION's residuals
    * alarms only on what trend+seasonality cannot explain. Center and
    * scale are the rank-selected LOW median and MAD of the residuals
    * (robust — one bad day cannot move its own threshold much), and the
    * flag |resid − med| > 3·MAD is an exact integer comparison.
    *
    * Scale shape: everything beyond the shared decomposition lives at
    * (type, day) grain — two partitioned rank windows and one per-type
    * rollup. */
  val q307SeasonalAnomaly: Q = Q(
    "q307_seasonal_anomaly",
    s"""WITH $duckDecomposeCtes,
      |r1 AS (SELECT event_type, day, resid_milli,
      |              row_number() OVER (PARTITION BY event_type
      |                                 ORDER BY resid_milli, day) AS rn,
      |              count(*) OVER (PARTITION BY event_type) AS n
      |       FROM dec),
      |med AS (SELECT event_type, resid_milli AS med_milli
      |        FROM r1 WHERE rn = (n + 1) // 2),
      |ad AS (SELECT r1.event_type, r1.day,
      |              abs(r1.resid_milli - med.med_milli) AS adev
      |       FROM r1 JOIN med USING (event_type)),
      |r2 AS (SELECT event_type, day, adev,
      |              row_number() OVER (PARTITION BY event_type
      |                                 ORDER BY adev, day) AS rn,
      |              count(*) OVER (PARTITION BY event_type) AS n
      |       FROM ad),
      |mad AS (SELECT event_type, adev AS mad_milli
      |        FROM r2 WHERE rn = (n + 1) // 2)
      |SELECT ad.event_type,
      |       CAST(count(*) AS BIGINT) AS n_days,
      |       med.med_milli, mad.mad_milli,
      |       CAST(count(*) FILTER (WHERE ad.adev > 3 * mad.mad_milli)
      |            AS BIGINT) AS n_anomalies
      |FROM ad JOIN med USING (event_type) JOIN mad USING (event_type)
      |GROUP BY 1, 3, 4 ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val dec = decompose(s, dir)
    val byType = Window.partitionBy(col("event_type"))
    val r1 = dec.select(col("event_type"), col("day"), col("resid_milli"))
      .withColumn("rn", row_number().over(
        byType.orderBy(col("resid_milli"), col("day"))))
      .withColumn("n", count(lit(1)).over(byType))
    val med = r1.filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("event_type"), col("resid_milli").as("med_milli"))
    val ad = r1.join(broadcast(med), "event_type")
      .select(col("event_type"), col("day"),
        abs(col("resid_milli") - col("med_milli")).as("adev"))
    val mad = ad
      .withColumn("rn", row_number().over(
        byType.orderBy(col("adev"), col("day"))))
      .withColumn("n", count(lit(1)).over(byType))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("event_type"), col("adev").as("mad_milli"))
    ad.join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
      .groupBy(col("event_type"), col("med_milli"), col("mad_milli"))
      .agg(count(lit(1)).as("n_days"),
        count_if(col("adev") > lit(3) * col("mad_milli")).as("n_anomalies"))
      .select(col("event_type"), col("n_days"), col("med_milli"),
        col("mad_milli"), col("n_anomalies"))
      .orderBy(col("event_type"))
  }

  /** q302: restatement audit — q298's disorder profile translated into
    * the number a finance owner actually feels: for each business day,
    * revenue as KNOWN at an arrival cutoff (here the first 80% of the
    * arrival sequence, event_id order — the same proxy q298 uses) vs the
    * final figure once stragglers landed, and the restated delta. A day
    * with large restated_cents is a day whose early report was wrong —
    * the business-visible cost of the lateness q298 measures in seconds.
    *
    * Scale shape: one metadata-cheap min/max broadcast derives the
    * cutoff; the split is a per-row predicate inside one
    * map-side-combined day rollup — both views of every day in a single
    * pass, no second scan, no window. */
  val q302RestatementAudit: Q = Q(
    "q302_restatement_audit",
    """WITH b AS (SELECT min(event_id) + (max(event_id) - min(event_id)) * 8 // 10
      |             AS cut FROM events),
      |e AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |             CAST(round(value * 100) AS BIGINT) AS cents, event_id
      |      FROM events WHERE event_type = 'purchase')
      |SELECT day,
      |       CAST(sum(CASE WHEN event_id <= b.cut THEN cents ELSE 0 END)
      |            AS BIGINT) AS rev_at_cutoff_cents,
      |       CAST(sum(cents) AS BIGINT) AS rev_final_cents,
      |       CAST(sum(CASE WHEN event_id > b.cut THEN cents ELSE 0 END)
      |            AS BIGINT) AS restated_cents
      |FROM e, b GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val ev = Tables(s, dir, "events")
    val cut = ev.agg((min(col("event_id"))
      + expr("(max(event_id) - min(event_id)) * 8 div 10")).as("cut"))
    ev.filter(col("event_type") === "purchase")
      .select(expr("unix_timestamp(ts) div 86400").as("day"),
        round(col("value") * 100).cast("long").as("cents"), col("event_id"))
      .crossJoin(broadcast(cut))
      .groupBy(col("day"))
      .agg(sum(when(col("event_id") <= col("cut"), col("cents")).otherwise(0L))
          .as("rev_at_cutoff_cents"),
        sum(col("cents")).as("rev_final_cents"),
        sum(when(col("event_id") > col("cut"), col("cents")).otherwise(0L))
          .as("restated_cents"))
      .orderBy(col("day"))
  }

  /** q298: event-time DISORDER profile — the measurement that should
    * precede every watermark choice in the streaming tier (q92's 1-hour
    * watermark is an assumption; this derives it from data): per event in
    * ARRIVAL order (event_id), lateness = high-water event time seen so
    * far minus own event time, then the lateness distribution and the
    * p99-derived watermark recommendation. An event's state is dropped
    * iff it is later than the watermark — so p99 lateness IS the
    * business-visible drop-rate dial.
    *
    * Scale shape: "running max over a global order" is the textbook
    * one-reducer trap (q192's lesson); the distributed form is the same
    * bucket stitch — ≤ 4097 bucket summaries (width derived from the id
    * range) take the prefix max EXCLUDING self on the summary table, each
    * bucket computes its within-bucket running max in parallel, and
    * greatest(prefix, within) is exact. The percentile read is the level
    * kernel (≤ distinct-lateness rows), not a row-grain sort. At another
    * 1000× the stitch recurses: summaries of summaries, same shape. */
  val q298DisorderProfile: Q = Q(
    "q298_disorder_profile",
    """WITH e AS (SELECT event_id, epoch_us(ts) AS us FROM events),
      |lat AS (SELECT (max(us) OVER (ORDER BY event_id) - us) // 1000000
      |          AS late_s
      |        FROM e),
      |lv AS (SELECT late_s, CAST(count(*) AS BIGINT) AS cnt
      |       FROM lat GROUP BY 1),
      |cum AS (SELECT late_s, cnt,
      |               sum(cnt) OVER (ORDER BY late_s) AS cum,
      |               sum(cnt) OVER () AS n
      |        FROM lv)
      |SELECT CAST(max(n) AS BIGINT) AS n_events,
      |       CAST(sum(CASE WHEN late_s > 0 THEN cnt ELSE 0 END) AS BIGINT)
      |         AS n_late,
      |       min(CASE WHEN cum * 100 >= 50 * n THEN late_s END) AS p50_s,
      |       min(CASE WHEN cum * 100 >= 90 * n THEN late_s END) AS p90_s,
      |       min(CASE WHEN cum * 100 >= 99 * n THEN late_s END) AS p99_s,
      |       max(late_s) AS max_s,
      |       ((min(CASE WHEN cum * 100 >= 99 * n THEN late_s END) + 59)
      |        // 60) * 60 AS wm_recommend_s
      |FROM cum""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = Tables(s, dir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val bounds = e.agg(min(col("event_id")), max(col("event_id"))).first()
    // Empty-input guard (q192's): a null aggregate row must not NPE the
    // driver — the oracle's rendering degrades to one all-NULL row.
    val width =
      if (bounds.isNullAt(0)) 512L
      else math.max(512L, (bounds.getLong(1) - bounds.getLong(0)) / 4096L + 1L)
    val b = e.withColumn("b", expr(s"event_id div $width"))
    val stitch = b.groupBy(col("b")).agg(max(col("us")).as("bmax"))
      .withColumn("prefix_us", max(col("bmax")).over(Window.orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("b"), col("prefix_us"))
    val lat = b.join(broadcast(stitch), "b")
      .withColumn("run_us", max(col("us")).over(
        Window.partitionBy(col("b")).orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select((greatest(col("run_us"), coalesce(col("prefix_us"), col("run_us")))
        - col("us")).as("late_us"))
      .select(expr("late_us div 1000000").as("late_s"))
    val lv = lat.groupBy(col("late_s")).agg(count(lit(1)).as("cnt"))
    val cum = lv
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("late_s"))))
      .withColumn("n", sum(col("cnt")).over(
        Window.orderBy(col("late_s"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    def pct(p: Int) = min(when(col("cum") * 100 >= col("n") * p, col("late_s")))
    cum.agg(max(col("n")).as("n_events"),
        sum(when(col("late_s") > 0, col("cnt")).otherwise(lit(0L)))
          .as("n_late"),
        pct(50).as("p50_s"), pct(90).as("p90_s"), pct(99).as("p99_s"),
        max(col("late_s")).as("max_s"))
      .withColumn("wm_recommend_s", expr("((p99_s + 59) div 60) * 60"))
  }

  /** q289: Theil–Sen robust trend — the slope estimator a monitoring
    * pipeline wants when q271's Holt fit is dragged by outlier days: the
    * median over ALL pairwise day slopes has a 29% breakdown point, so a
    * single corrupted day cannot move it. Exact across engines because
    * each pairwise slope is one HUGEINT/DECIMAL(38,0) cross-multiply and
    * one truncating division (engines agree on toward-zero truncation —
    * the q194 discipline), and the median is the LOW median selected by
    * rank, never an average of two middles (which would reintroduce a
    * float).
    *
    * Scale shape: slopes live at DAY²-grain per series — calendar-
    * bounded (a decade is ~6.7M pairs per key), so the self-join and the
    * per-key rank window cost O(days²) regardless of corpus row count;
    * the raw events fold into the day grain map-side first. Slope uses
    * CALENDAR distance (b.day − a.day), not observation index — missing
    * days must widen the run, or a gap would masquerade as a steep step. */
  val q289TheilSen: Q = Q(
    "q289_theil_sen",
    """WITH d AS (
      |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2),
      |nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
      |       FROM d GROUP BY 1),
      |p AS (SELECT a.event_type, a.day AS d1, b.day AS d2,
      |             CAST((CAST(b.v AS HUGEINT) - a.v) * 1000000
      |                  // (b.day - a.day) AS BIGINT) AS slope_ppm
      |      FROM d a JOIN d b ON b.event_type = a.event_type
      |                       AND b.day > a.day),
      |r AS (SELECT event_type, slope_ppm,
      |             row_number() OVER (PARTITION BY event_type
      |                                ORDER BY slope_ppm, d1, d2) AS rn,
      |             count(*) OVER (PARTITION BY event_type) AS np
      |      FROM p)
      |SELECT r.event_type, nd.n_days, CAST(np AS BIGINT) AS n_pairs,
      |       slope_ppm AS median_slope_ppm
      |FROM r JOIN nd USING (event_type)
      |WHERE rn = (np + 1) // 2
      |ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val d = Tables(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy(col("event_type"), expr("sec div 86400").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).cast("long").as("v"))
    val pairs = d.as("a").join(d.as("b"),
        col("b.event_type") === col("a.event_type") &&
          col("b.day") > col("a.day"))
      .select(col("a.event_type").as("event_type"),
        ((col("b.v").cast("decimal(38,0)") - col("a.v")) * lit(1000000)).as("num"),
        (col("b.day") - col("a.day")).as("dd"),
        col("a.day").as("d1"), col("b.day").as("d2"))
      .select(col("event_type"),
        expr("CAST(num div dd AS LONG)").as("slope_ppm"), col("d1"), col("d2"))
    val ranked = pairs
      .withColumn("rn", row_number().over(Window.partitionBy(col("event_type"))
        .orderBy(col("slope_ppm"), col("d1"), col("d2"))))
      .withColumn("np",
        count(lit(1)).over(Window.partitionBy(col("event_type"))).cast("long"))
    val nd = d.groupBy(col("event_type")).agg(count(lit(1)).as("n_days"))
    ranked.filter(col("rn") === expr("(np + 1) div 2"))
      .join(broadcast(nd), "event_type")
      .select(col("event_type"), col("n_days"), col("np").as("n_pairs"),
        col("slope_ppm").as("median_slope_ppm"))
      .orderBy(col("event_type"))
  }

  /** q285: exponentially time-decayed engagement — the feature-store
    * kernel behind "recent activity counts more" ranking signals: per
    * user, Σ cents·½^age_weeks anchored at the corpus's newest day.
    * Exponential decay is normally a float accumulation (order-
    * dependent, never hash-matchable) — but a HALF-LIFE decay is
    * DYADIC: multiply through by 2^16 and every weight 2^(16−k) is an
    * integer (age capped at 16 weeks ≈ the decay floor; the events
    * window spans about a month, so the cap is slack, and at the floor
    * an event contributes 1/65536 of its value — operationally zero
    * either way). The surfaced double is ONE exact division by 65536
    * (a power of two — no rounding at all).
    *
    * Scale shape: one 1-row max-day broadcast, one map-side projection
    * (shift, multiply), one user-grain map-side-combined aggregate. */
  val q285DecayedEngagement: Q = Q(
    "q285_decayed_engagement",
    """WITH mx AS (SELECT max(CAST(floor(epoch(ts)) AS BIGINT) // 86400)
      |              AS mday FROM events),
      |e AS (SELECT user_id,
      |             CAST(round(value * 100) AS BIGINT) AS cents,
      |             least((mx.mday
      |                    - CAST(floor(epoch(ts)) AS BIGINT) // 86400) // 7,
      |                   16) AS k
      |      FROM events, mx)
      |SELECT user_id, count(*) AS n_events,
      |       CAST(sum(cents * (CAST(1 AS BIGINT) << CAST(16 - k AS INT)))
      |            AS BIGINT) AS decayed_x65536,
      |       CAST(sum(cents * (CAST(1 AS BIGINT) << CAST(16 - k AS INT)))
      |            AS DOUBLE) / 65536 AS decayed_cents
      |FROM e GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val ev = Tables(s, dir, "events")
      .withColumn("day", expr("unix_timestamp(ts) div 86400"))
    val mx = ev.agg(max(col("day")).as("mday"))
    ev.crossJoin(broadcast(mx))
      .select(col("user_id"),
        round(col("value") * 100).cast("long").as("cents"),
        least(expr("(mday - day) div 7"), lit(16L)).as("k"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cents * shiftleft(CAST(1 AS BIGINT), CAST(16 - k AS INT))"))
          .cast("long").as("decayed_x65536"))
      .select(col("user_id"), col("n_events"), col("decayed_x65536"),
        (col("decayed_x65536").cast("double") / 65536).as("decayed_cents"))
      .orderBy(col("user_id"))
  }

  /** q169: automation (bot) detection — humans don't fire events
    * back-to-back for long: per user, count consecutive-event gaps under
    * 2 seconds (µs-exact via unix_micros; a floor-seconds gap would call
    * 1.9 s "1"), flag users where ≥ 3 such gaps occur. The inter-event
    * delta is the same one-lag-window shape as q155 with the (ts,
    * event_id) tie order pinned; sub-second ties count as gap 0 — the
    * strongest bot signal, not an edge case to drop.
    *
    * Scale: one user_id shuffle, then a per-user rollup; the flagged
    * output is the review queue, ∝ suspicious users. */
  val q169BotDetection: Q = Q(
    "q169_bot_detection",
    """WITH g AS (
      |  SELECT user_id,
      |         epoch_us(ts) - lag(epoch_us(ts))
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      |  FROM events)
      |SELECT user_id, count(*) AS n_gaps,
      |       count(*) FILTER (WHERE gap_us < 2000000) AS n_fast,
      |       count(*) FILTER (WHERE gap_us < 2000000) >= 3 AS flagged
      |FROM g WHERE gap_us IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        count_if(col("gap_us") < 2000000).as("n_fast"),
        (count_if(col("gap_us") < 2000000) >= 3).as("flagged"))
      .orderBy(col("user_id"))
  }

  /** q170: double-charge detection — the payments-dedup classic: the SAME
    * user charged the SAME amount within 5 minutes is a retry/duplicate
    * suspect. One lag window over (user, amount) partitions ordered by
    * (ts, event_id): each row pairs with its nearest same-amount
    * predecessor, µs-exact window test, both event ids shipped for the
    * refund queue. Distinct from q96's id-dedup: these are DIFFERENT
    * events whose PAYLOAD collides. Continuous amounts collide ~never in
    * the test data, so deterministic RETRIES are planted (every 5th
    * purchase re-fires 90 s later under event_id + 10⁹) — the gate proves
    * detection, and that un-planted rows produce no false positives.
    *
    * Scale: the window partitions by (user, cents) — finer than user, so
    * skew is even less plausible; no self-join row blowup. */
  val q170DoubleCharge: Q = Q(
    "q170_double_charge",
    """WITH p0 AS (
      |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
      |         event_id, epoch_us(ts) AS us
      |  FROM events WHERE event_type = 'purchase'),
      |p AS (
      |  SELECT * FROM p0
      |  UNION ALL
      |  SELECT user_id, cents, event_id + 1000000000, us + 90000000
      |  FROM p0 WHERE event_id % 5 = 0),
      |g AS (
      |  SELECT user_id, cents, event_id, us,
      |         lag(event_id) OVER w AS prev_id,
      |         us - lag(us) OVER w AS gap_us
      |  FROM p WINDOW w AS (PARTITION BY user_id, cents ORDER BY us, event_id))
      |SELECT user_id, cents, prev_id AS first_charge, event_id AS retry_charge,
      |       CAST(gap_us // 1000000 AS BIGINT) AS gap_s
      |FROM g WHERE gap_us IS NOT NULL AND gap_us <= 300000000
      |ORDER BY user_id, cents, retry_charge""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("cents"))
      .orderBy(col("us"), col("event_id"))
    val p0 = Tables(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), round(col("value") * 100).cast("long").as("cents"),
        col("event_id"), unix_micros(col("ts")).as("us"))
    p0.unionByName(p0.filter(col("event_id") % 5 === 0)
        .select(col("user_id"), col("cents"),
          (col("event_id") + 1000000000L).as("event_id"),
          (col("us") + 90000000L).as("us")))
      .select(col("*"),
        lag(col("event_id"), 1).over(w).as("prev_id"),
        (col("us") - lag(col("us"), 1).over(w)).as("gap_us"))
      .filter(col("gap_us").isNotNull && col("gap_us") <= 300000000L)
      .select(col("user_id"), col("cents"), col("prev_id").as("first_charge"),
        col("event_id").as("retry_charge"),
        expr("gap_us div 1000000").cast("long").as("gap_s"))
      .orderBy(col("user_id"), col("cents"), col("retry_charge"))
  }

  /** q171: time-to-convert distribution — for each converting user, the
    * seconds from their FIRST click to their FIRST subsequent purchase;
    * p50/p90 of that across users via the q147 level kernel (exact
    * integer seconds, no per-group buffer). The product-funnel latency
    * metric: "how long does conversion take", robust to the long tail by
    * construction.
    *
    * Scale: two min-aggregates at user grain, one broadcast-joined level
    * cumulative over distinct delta values. */
  val q171TimeToConvert: Q = Q(
    "q171_time_to_convert",
    """WITH fc AS (
      |  SELECT user_id, min(epoch_us(ts)) AS click_us
      |  FROM events WHERE event_type = 'click' GROUP BY 1),
      |fp AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS buy_us
      |  FROM events e JOIN fc ON e.user_id = fc.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= fc.click_us
      |  GROUP BY 1),
      |d AS (
      |  SELECT (fp.buy_us - fc.click_us) // 1000000 AS delta_s
      |  FROM fp JOIN fc ON fp.user_id = fc.user_id),
      |lv AS (SELECT delta_s, count(*) AS c FROM d GROUP BY 1),
      |cum AS (SELECT delta_s,
      |               sum(c) OVER (ORDER BY delta_s) AS cum,
      |               sum(c) OVER () AS n
      |        FROM lv)
      |SELECT CAST(max(n) AS BIGINT) AS n_converters,
      |       min(CASE WHEN 100 * cum >= 50 * n THEN delta_s END) AS p50_s,
      |       min(CASE WHEN 100 * cum >= 90 * n THEN delta_s END) AS p90_s
      |FROM cum""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(s, dir, "events")
      .withColumn("us", unix_micros(col("ts")))
    val fc = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(col("us")).as("click_us"))
    val fp = ev.filter(col("event_type") === "purchase")
      .join(fc, "user_id")
      .filter(col("us") >= col("click_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("buy_us"),
        min(col("click_us")).as("click_us2"))
    val lv = fp.select(expr("(buy_us - click_us2) div 1000000").as("delta_s"))
      .groupBy(col("delta_s")).agg(count(lit(1)).as("c"))
    // The single-partition window is over DISTINCT delta levels of the
    // converter set — bounded; at true scale this takes the q135
    // bucket-offset decomposition.
    val cum = Kernels.levelCdf(lv, "delta_s")
    cum.agg(max(col("n")).cast("long").as("n_converters"),
      min(when(lit(100) * col("cum") >= lit(50) * col("n"), col("delta_s")))
        .as("p50_s"),
      min(when(lit(100) * col("cum") >= lit(90) * col("n"), col("delta_s")))
        .as("p90_s"))
  }

  /** q177: process-conformance audit — q155's observed transition matrix
    * checked against a declared process model (the whitelist a
    * session-flow owner maintains): any session may open with anything;
    * view→{view, click}, click→{view, click, purchase, error},
    * purchase→{view, signup?no}… the model here is a literal 14-pair
    * table, identical in both engines. Violations = observed LEFT ANTI
    * model, with counts — the process-mining "deviation report".
    *
    * Scale: the observed side is q155's ≤(types+1)² cells; the model
    * broadcasts. Everything after the transition rollup is tiny. */
  val q177Conformance: Q = Q(
    "q177_conformance",
    """WITH m AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         lag(event_type) OVER w AS prev_type,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS is_start
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |t AS (
      |  SELECT CASE WHEN is_start = 1 THEN '<start>' ELSE prev_type END
      |           AS from_type,
      |         event_type AS to_type
      |  FROM m),
      |obs AS (SELECT from_type, to_type, count(*) AS n FROM t GROUP BY 1, 2),
      |model AS (
      |  SELECT * FROM (VALUES
      |    ('<start>', 'view'), ('<start>', 'click'), ('<start>', 'signup'),
      |    ('<start>', 'purchase'), ('<start>', 'error'),
      |    ('view', 'view'), ('view', 'click'), ('view', 'error'),
      |    ('click', 'view'), ('click', 'click'), ('click', 'purchase'),
      |    ('click', 'error'), ('signup', 'view'), ('purchase', 'view'))
      |  AS v(from_type, to_type))
      |SELECT obs.from_type, obs.to_type, CAST(obs.n AS BIGINT) AS n
      |FROM obs LEFT JOIN model
      |  ON obs.from_type = model.from_type AND obs.to_type = model.to_type
      |WHERE model.from_type IS NULL
      |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val obs = Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        lag(col("ts"), 1).over(w).as("prev_ts"))
      .select(
        when(col("prev_ts").isNull ||
          col("ts") >= col("prev_ts") + expr("INTERVAL 30 MINUTES"),
          lit("<start>")).otherwise(col("prev_type")).as("from_type"),
        col("event_type").as("to_type"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val model = s.createDataFrame(Seq(
      ("<start>", "view"), ("<start>", "click"), ("<start>", "signup"),
      ("<start>", "purchase"), ("<start>", "error"),
      ("view", "view"), ("view", "click"), ("view", "error"),
      ("click", "view"), ("click", "click"), ("click", "purchase"),
      ("click", "error"), ("signup", "view"), ("purchase", "view")))
      .toDF("from_type", "to_type")
    obs.join(broadcast(model), Seq("from_type", "to_type"), "left_anti")
      .orderBy(col("from_type"), col("to_type"))
  }

  /** q180: top user journeys — q155's first-order transitions extended to
    * 3-step paths (two lags over the same single window pass; a session
    * break resets the path). The top-15 most-travelled (a→b→c) paths by
    * count, ties to path order — the "what do users actually do"
    * readout. One user_id shuffle; paths collapse to ≤ types³ cells. */
  val q180JourneyPaths: Q = Q(
    "q180_journey_paths",
    """WITH m AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         lag(event_type, 1) OVER w AS p1,
      |         lag(event_type, 2) OVER w AS p2,
      |         CASE WHEN lag(ts, 1) OVER w IS NULL
      |                OR ts - lag(ts, 1) OVER w >= INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS brk1,
      |         CASE WHEN lag(ts, 2) OVER w IS NULL
      |                OR lag(ts, 1) OVER w - lag(ts, 2) OVER w >= INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS brk2
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |t AS (
      |  SELECT p2 AS s1, p1 AS s2, event_type AS s3 FROM m
      |  WHERE brk1 = 0 AND brk2 = 0)
      |SELECT s1, s2, s3, count(*) AS n
      |FROM t GROUP BY 1, 2, 3
      |ORDER BY n DESC, s1, s2, s3 LIMIT 15""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // All four lags in ONE select → one WindowExec pass (a withColumn
    // chain interleaves Projects and defeats window collapsing — the
    // q152 lesson, row-scale here).
    Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("p1"),
        lag(col("event_type"), 2).over(w).as("p2"),
        lag(col("ts"), 1).over(w).as("t1"),
        lag(col("ts"), 2).over(w).as("t2"))
      .filter(col("t1").isNotNull &&
        col("ts") < col("t1") + expr("INTERVAL 30 MINUTES") &&
        col("t2").isNotNull &&
        col("t1") < col("t2") + expr("INTERVAL 30 MINUTES"))
      .groupBy(col("p2").as("s1"), col("p1").as("s2"),
        col("event_type").as("s3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
      .limit(15)
  }

  /** q181: churn detection — users active in the FIRST week of the window
    * who then go silent for its remainder (last activity inside week 1).
    * Absence again inverts to per-user bounds: one min/max aggregate, no
    * anti-join over raw rows. The test users are active continuously, so
    * CHURNERS ARE PLANTED: every 13th user's post-week-1 events are
    * dropped from the analysis stream (deterministic in both engines) —
    * the gate proves those users are detected and, equally, that the
    * always-active rest produce no false positives. */
  val q181ChurnDetection: Q = Q(
    "q181_churn_detection",
    """WITH b AS (
      |  SELECT min(CAST(floor(epoch(ts)) AS BIGINT)) AS t0 FROM events),
      |e AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |  FROM events CROSS JOIN b
      |  WHERE NOT (user_id % 13 = 0
      |             AND CAST(floor(epoch(ts)) AS BIGINT) >= b.t0 + 604800)),
      |u AS (
      |  SELECT user_id, min(sec) AS first_s, max(sec) AS last_s,
      |         count(*) AS n_events
      |  FROM e GROUP BY 1)
      |SELECT u.user_id, u.last_s, CAST(u.n_events AS BIGINT) AS n_events
      |FROM u CROSS JOIN b
      |WHERE u.first_s < b.t0 + 604800 AND u.last_s < b.t0 + 604800
      |ORDER BY u.user_id""".stripMargin) { (s, dir) =>
    val ev0 = Tables(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
    val b = ev0.agg(min(col("sec")).as("t0"))
    val ev = ev0.crossJoin(broadcast(b))
      .filter(!(col("user_id") % 13 === 0 && col("sec") >= col("t0") + 604800))
    ev.groupBy(col("user_id"))
      .agg(min(col("sec")).as("first_s"), max(col("sec")).as("last_s"),
        count(lit(1)).as("n_events"))
      .crossJoin(broadcast(b))
      .filter(col("first_s") < col("t0") + 604800 &&
        col("last_s") < col("t0") + 604800)
      .select(col("user_id"), col("last_s"), col("n_events"))
      .orderBy(col("user_id"))
  }

  /** q182: repeat-purchase cadence — median and p90 days between a user's
    * consecutive purchases (the replenishment-cycle metric behind "when
    * to remind"). Per-user gaps from one lag window, then the q147 level
    * kernel over integer day gaps. */
  val q182PurchaseCadence: Q = Q(
    "q182_purchase_cadence",
    """WITH p AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id
      |  FROM events WHERE event_type = 'purchase'),
      |g AS (
      |  SELECT (sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id))
      |           // 86400 AS gap_d
      |  FROM p),
      |lv AS (SELECT gap_d, count(*) AS c FROM g WHERE gap_d IS NOT NULL GROUP BY 1),
      |cum AS (SELECT gap_d, sum(c) OVER (ORDER BY gap_d) AS cum,
      |               sum(c) OVER () AS n
      |        FROM lv)
      |SELECT CAST(max(n) AS BIGINT) AS n_gaps,
      |       min(CASE WHEN 100 * cum >= 50 * n THEN gap_d END) AS p50_days,
      |       min(CASE WHEN 100 * cum >= 90 * n THEN gap_d END) AS p90_days
      |FROM cum""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    val lv = Tables(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_timestamp(col("ts")).as("sec"), col("event_id"))
      .withColumn("gap_d",
        expr("(sec - lag(sec, 1) OVER (PARTITION BY user_id ORDER BY sec, event_id)) div 86400"))
      .filter(col("gap_d").isNotNull)
      .groupBy(col("gap_d")).agg(count(lit(1)).as("c"))
    val cum = Kernels.levelCdf(lv, "gap_d")
    cum.agg(max(col("n")).cast("long").as("n_gaps"),
      min(when(lit(100) * col("cum") >= lit(50) * col("n"), col("gap_d")))
        .as("p50_days"),
      min(when(lit(100) * col("cum") >= lit(90) * col("n"), col("gap_d")))
        .as("p90_days"))
  }

  /** q185: cumulative BUYER reach curve — distinct users who have EVER
    * purchased, by day: first-purchase day per user (one user-grain min),
    * new-buyer counts per day, running sum over the ≤ #days cells. The
    * conversion-growth curve, computed without any distinct-over-window
    * (which would re-count the full buyer set per day). Purchases, not
    * all events: everyone fires SOME event on day 1, so all-event reach
    * is a degenerate one-point curve in this data. */
  val q185ReachCurve: Q = Q(
    "q185_reach_curve",
    """WITH fs AS (
      |  SELECT user_id, min(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS d0
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |nd AS (SELECT d0 AS day, count(*) AS new_buyers FROM fs GROUP BY 1)
      |SELECT day, CAST(new_buyers AS BIGINT) AS new_buyers,
      |       CAST(sum(new_buyers) OVER (ORDER BY day) AS BIGINT) AS cum_reach
      |FROM nd ORDER BY day""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    Tables(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy(col("user_id"))
      .agg(min(expr("sec div 86400")).as("d0"))
      .groupBy(col("d0").as("day"))
      .agg(count(lit(1)).as("new_buyers"))
      .select(col("day"), col("new_buyers"),
        sum(col("new_buyers")).over(Window.orderBy(col("day")))
          .cast("long").as("cum_reach"))
      .orderBy(col("day"))
  }

  /** q191: point-in-time (AS OF) dimension lookup — the read side of
    * q107's SCD2 history: reconstruct every user's attribute exactly as
    * it stood at 2024-01-15 00:00 UTC. The version whose
    * [valid_from, valid_to) interval covers the instant is, equivalently,
    * the MAX version with valid_from ≤ t — one max_by per user over the
    * history, no interval join needed. Users whose history starts after
    * t are correctly ABSENT (they did not exist yet). */
  val q191PointInTime: Q = Q(
    "q191_point_in_time",
    """WITH m AS (
      |  SELECT user_id, event_type AS attr, ts, event_id,
      |         CASE WHEN lag(event_type) OVER
      |                (PARTITION BY user_id ORDER BY ts, event_id)
      |              IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
      |  FROM events),
      |v AS (
      |  SELECT user_id, attr, ts,
      |         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS ver
      |  FROM m),
      |g AS (
      |  SELECT user_id, CAST(ver AS BIGINT) AS version, attr,
      |         CAST(floor(epoch(min(ts))) AS BIGINT) AS valid_from
      |  FROM v GROUP BY user_id, ver, attr)
      |SELECT user_id,
      |       max_by(version, version) AS version,
      |       max_by(attr, version) AS attr,
      |       max_by(valid_from, version) AS valid_from
      |FROM g WHERE valid_from <= 1705276800
      |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val g = Tables(s, dir, "events")
      .select(col("user_id"), col("event_type").as("attr"), col("ts"),
        col("event_id"))
      .withColumn("chg",
        when(!(lag(col("attr"), 1).over(w) <=> col("attr")), 1).otherwise(0))
      .withColumn("ver", sum(col("chg"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
      .groupBy(col("user_id"), col("ver").as("version"), col("attr"))
      .agg(min(unix_timestamp(col("ts"))).as("valid_from"))
    g.filter(col("valid_from") <= 1705276800L)
      .groupBy(col("user_id"))
      .agg(max_by(col("version"), col("version")).as("version"),
        max_by(col("attr"), col("version")).as("attr"),
        max_by(col("valid_from"), col("version")).as("valid_from"))
      .orderBy(col("user_id"))
  }

  /** q192: id-sequence gap detection — completeness over a delivery's
    * supposedly-contiguous id space: adjacent distinct ids more than 1
    * apart bound a missing range. Gaps are PLANTED (every id %97 = 0 is
    * dropped) so detection is proven. Distinct ids are ROW-scale
    * (≈ every event), so NO global-ordered lag: the q150 two-phase form —
    * coarse id buckets → per-bucket lag (window PARTITIONED by bucket)
    * closes every within-bucket adjacency; the ONE cross-bucket adjacency
    * per bucket (its min id vs the previous non-empty bucket's max)
    * stitches through a tiny summary window over ≤ #buckets rows,
    * broadcast back. Lossless by construction: every adjacent distinct-id
    * pair is either same-bucket (the partitioned lag sees it) or spans a
    * bucket boundary (exactly the stitched bmin/prev_max pair — buckets
    * between them are empty by definition of "previous NON-EMPTY").
    * The oracle IS the global lag — gate equality proves the
    * decomposition. EventsSpec plan-asserts no unpartitioned window
    * touches the row-scale id set. */
  val q192IdGapDetection: Q = Q(
    "q192_id_gap_detection",
    """WITH ids AS (
      |  SELECT DISTINCT event_id FROM events WHERE event_id % 97 <> 0),
      |g AS (
      |  SELECT lag(event_id) OVER (ORDER BY event_id) AS prev_id, event_id
      |  FROM ids)
      |SELECT prev_id + 1 AS gap_start, event_id - 1 AS gap_end,
      |       event_id - prev_id - 1 AS n_missing
      |FROM g WHERE prev_id IS NOT NULL AND event_id - prev_id > 1
      |ORDER BY gap_start""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val idsRaw = Tables(s, dir, "events")
      .filter(col("event_id") % 97 =!= 0)
      .select(col("event_id"))
    // Width derives from the OBSERVED id range (one scalar min/max agg —
    // column-pruned scan), so #buckets ≤ 4097 at ANY scale: a fixed width
    // would make the stitch summary itself row-scale at a 10¹²-id range.
    val bounds = idsRaw.agg(min(col("event_id")), max(col("event_id"))).first()
    val width =
      if (bounds.isNullAt(0)) 512L
      else math.max(512L, (bounds.getLong(1) - bounds.getLong(0)) / 4096L + 1L)
    val ids = idsRaw.distinct().withColumn("b", expr(s"event_id div $width"))
    val stitch = ids.groupBy(col("b"))
      .agg(min(col("event_id")).as("bmin"), max(col("event_id")).as("bmax"))
      .withColumn("prev_max",
        lag(col("bmax"), 1).over(Window.orderBy(col("b"))))
      .select(col("b"), col("prev_max"))
    ids.join(broadcast(stitch), "b")
      // lag is NULL exactly on each bucket's first id — the stitched
      // prev_max (previous non-empty bucket's last id) completes it.
      .withColumn("prev_id", coalesce(
        lag(col("event_id"), 1).over(
          Window.partitionBy(col("b")).orderBy(col("event_id"))),
        col("prev_max")))
      .filter(col("prev_id").isNotNull && col("event_id") - col("prev_id") > 1)
      .select((col("prev_id") + 1).as("gap_start"),
        (col("event_id") - 1).as("gap_end"),
        (col("event_id") - col("prev_id") - 1).as("n_missing"))
      .orderBy(col("gap_start"))
  }

  /** q193: week-over-week growth — revenue per epoch week with the
    * percent change vs the prior week in ppm (integer division of exact
    * cents; NULL for the first week rather than a fake 0). The standard
    * BI trend readout, on ≤ #weeks cells. */
  val q193WowChange: Q = Q(
    "q193_wow_change",
    """WITH w AS (
      |  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) // 7 AS wk,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
      |SELECT wk, rev,
      |       (rev - lag(rev) OVER (ORDER BY wk)) * 1000000
      |         // lag(rev) OVER (ORDER BY wk) AS wow_change_ppm
      |FROM w ORDER BY wk""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("wk"))
    Tables(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy(expr("(sec div 86400) div 7").as("wk"))
      .agg(sum(round(col("value") * 100).cast("long")).cast("long").as("rev"))
      .withColumn("wow_change_ppm",
        expr("(rev - lag(rev, 1) OVER (ORDER BY wk)) * 1000000 div lag(rev, 1) OVER (ORDER BY wk)"))
      .orderBy(col("wk"))
  }

  /** q194: maximum drawdown — peak-to-trough decline of the cumulative
    * revenue-minus-baseline series per event type (the risk metric:
    * "how far below its best has this stream fallen"). Drawdown IS
    * window-expressible: dd(t) = runmax(cum) − cum, max over t — two
    * stacked windows per type over ≤ #days cells, exact cents. The
    * series is daily revenue minus its own mean-ish baseline (first
    * day's revenue) so it actually goes down somewhere. */
  val q194MaxDrawdown: Q = Q(
    "q194_max_drawdown",
    """WITH d AS (
      |  SELECT event_type, (CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS day,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev
      |  FROM events GROUP BY 1, 2),
      |b AS (
      |  SELECT event_type,
      |         min_by(rev, day) AS base
      |  FROM d GROUP BY 1),
      |c AS (
      |  SELECT d.event_type, d.day,
      |         sum(d.rev - b.base) OVER (PARTITION BY d.event_type
      |                                   ORDER BY d.day) AS cum
      |  FROM d JOIN b USING (event_type)),
      |m AS (
      |  SELECT event_type, day, cum,
      |         max(cum) OVER (PARTITION BY event_type ORDER BY day) AS peak
      |  FROM c)
      |SELECT event_type,
      |       CAST(max(peak - cum) AS BIGINT) AS max_drawdown_cents,
      |       CAST(max_by(day, (peak - cum) * 100000 + day) AS BIGINT)
      |         AS trough_day
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val d = Tables(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy(col("event_type"), expr("sec div 86400").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).cast("long").as("rev"))
    val b = d.groupBy(col("event_type"))
      .agg(min_by(col("rev"), col("day")).as("base"))
    val byT = Window.partitionBy(col("event_type")).orderBy(col("day"))
    d.join(broadcast(b), "event_type")
      .withColumn("cum", sum(col("rev") - col("base")).over(byT))
      .withColumn("peak", max(col("cum")).over(byT))
      .groupBy(col("event_type"))
      .agg(max(col("peak") - col("cum")).cast("long").as("max_drawdown_cents"),
        // Composite tie key: several days can share the max drawdown
        // (notably 0 on a monotone series) — pin to the LATEST such day.
        max_by(col("day"), (col("peak") - col("cum")) * 100000 + col("day"))
          .cast("long").as("trough_day"))
      .orderBy(col("event_type"))
  }

  /** q196: weekly trending — top-3 event types per epoch week by exact
    * revenue, rank ties broken by type name: the "what's hot this week"
    * feed. Spark 4 plans the rank ≤ 3 filter as WindowGroupLimit, so no
    * week ever fully sorts its types (trivial here, the point at types →
    * items scale). */
  val q196WeeklyTrending: Q = Q(
    "q196_weekly_trending",
    """WITH w AS (
      |  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) // 7 AS wk,
      |         event_type,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT wk, event_type, rev,
      |         row_number() OVER (PARTITION BY wk ORDER BY rev DESC, event_type)
      |           AS rk
      |  FROM w)
      |SELECT wk, CAST(rk AS BIGINT) AS rk, event_type, rev
      |FROM r WHERE rk <= 3 ORDER BY wk, rk""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    Tables(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy(expr("(sec div 86400) div 7").as("wk"), col("event_type"))
      .agg(sum(round(col("value") * 100).cast("long")).cast("long").as("rev"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("wk")).orderBy(col("rev").desc, col("event_type"))))
      .filter(col("rk") <= 3)
      .select(col("wk"), col("rk").cast("long").as("rk"), col("event_type"),
        col("rev"))
      .orderBy(col("wk"), col("rk"))
  }

  /** q197: activity heatmap — the dow×hour event-count matrix behind
    * every "when are users active" dashboard. Both axes are pure epoch
    * arithmetic ((days+3) mod 7 Monday=0, the q146 rule; hour = sec div
    * 3600 mod 24 — builtins' numbering/timezone conventions never enter).
    * Collapses map-side to ≤ 168 cells. */
  val q197ActivityHeatmap: Q = Q(
    "q197_activity_heatmap",
    """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 3) % 7 AS dow,
      |       (CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 24 AS hour,
      |       count(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy(expr("(sec div 86400 + 3) % 7").as("dow"),
        expr("(sec div 3600) % 24").as("hour"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("dow"), col("hour"))
  }

  /** q198: RFM segmentation — the marketing workhorse: each buyer scored
    * on Recency (days since last purchase at the window's end), Frequency
    * (purchase count) and Monetary (exact cents), each bucketed 1-3 by
    * FIXED thresholds (fixed, not quantile — segment definitions must be
    * stable period over period), concatenated to a segment code, rolled
    * up to segment profiles. All integer arithmetic.
    *
    * Scale: one user-grain aggregate, then a ≤27-cell rollup. */
  val q198RfmSegmentation: Q = Q(
    "q198_rfm_segmentation",
    """WITH mx AS (
      |  SELECT max(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS d_end
      |  FROM events),
      |u AS (
      |  SELECT user_id,
      |         mx.d_end - max(CAST(floor(epoch(ts)) AS BIGINT) // 86400)
      |           AS recency_d,
      |         count(*) AS freq,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS monet
      |  FROM events CROSS JOIN mx
      |  WHERE event_type = 'purchase'
      |  GROUP BY user_id, mx.d_end),
      |sc AS (
      |  SELECT user_id,
      |         CASE WHEN recency_d <= 7 THEN 3 WHEN recency_d <= 14 THEN 2
      |              ELSE 1 END AS r,
      |         CASE WHEN freq >= 8 THEN 3 WHEN freq >= 4 THEN 2 ELSE 1 END AS f,
      |         CASE WHEN monet >= 40000 THEN 3 WHEN monet >= 20000 THEN 2
      |              ELSE 1 END AS m
      |  FROM u)
      |SELECT CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
      |         AS segment,
      |       count(*) AS n_users
      |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val ev = Tables(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
    val mx = ev.agg(max(expr("sec div 86400")).as("d_end"))
    ev.filter(col("event_type") === "purchase")
      .crossJoin(broadcast(mx))
      .groupBy(col("user_id"), col("d_end"))
      .agg(max(expr("sec div 86400")).as("last_d"),
        count(lit(1)).as("freq"),
        sum(round(col("value") * 100).cast("long")).cast("long").as("monet"))
      .withColumn("recency_d", col("d_end") - col("last_d"))
      .select(
        when(col("recency_d") <= 7, 3).when(col("recency_d") <= 14, 2)
          .otherwise(1).as("r"),
        when(col("freq") >= 8, 3).when(col("freq") >= 4, 2).otherwise(1).as("f"),
        when(col("monet") >= 40000, 3).when(col("monet") >= 20000, 2)
          .otherwise(1).as("m"))
      .groupBy(concat(col("r").cast("string"), col("f").cast("string"),
        col("m").cast("string")).as("segment"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("segment"))
  }

  /** q199: ratio-to-report — each event type's share of its WEEK's
    * revenue, in ppm by integer division: the named analytic
    * (RATIO_TO_REPORT) as one window-sum over the ≤ weeks×types cells.
    * Shares within a week sum to ≤ 10⁶ with the truncation remainder —
    * exactness over prettiness. */
  val q199RatioToReport: Q = Q(
    "q199_ratio_to_report",
    """WITH w AS (
      |  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) // 7 AS wk,
      |         event_type,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev
      |  FROM events GROUP BY 1, 2)
      |SELECT wk, event_type, rev,
      |       CAST(rev * 1000000 // sum(rev) OVER (PARTITION BY wk) AS BIGINT)
      |         AS share_ppm
      |FROM w ORDER BY wk, event_type""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    Tables(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy(expr("(sec div 86400) div 7").as("wk"), col("event_type"))
      .agg(sum(round(col("value") * 100).cast("long")).cast("long").as("rev"))
      .withColumn("wk_total",
        sum(col("rev")).over(Window.partitionBy(col("wk"))))
      .select(col("wk"), col("event_type"), col("rev"),
        expr("rev * 1000000 div wk_total").as("share_ppm"))
      .orderBy(col("wk"), col("event_type"))
  }

  /** q201: bounce rate by entry type — sessions (q22's 30-min gap rule)
    * that end after ONE event, grouped by how they began: the landing-
    * quality metric. Session ids from the lag/running-sum derivation; a
    * session's entry type = its first event by (ts, event_id); bounce =
    * size 1; rates in ppm. One user_id shuffle serves the session
    * windows; the rollup is ≤ types cells. */
  val q201BounceRate: Q = Q(
    "q201_bounce_rate",
    """WITH marks AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS new_sess
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                             ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marks),
      |g AS (
      |  SELECT user_id, sid,
      |         min_by(event_type,
      |                lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '|'
      |                  || lpad(CAST(event_id AS VARCHAR), 10, '0'))
      |           AS entry_type,
      |         count(*) AS sz
      |  FROM sess GROUP BY 1, 2)
      |SELECT entry_type, count(*) AS n_sessions,
      |       count(*) FILTER (WHERE sz = 1) AS n_bounces,
      |       CAST(count(*) FILTER (WHERE sz = 1) * 1000000 // count(*) AS BIGINT)
      |         AS bounce_ppm
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sess = Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("new_sess",
        when(lag(col("ts"), 1).over(w).isNull ||
          col("ts") >= lag(col("ts"), 1).over(w) + expr("INTERVAL 30 MINUTES"),
          1).otherwise(0))
      .withColumn("sid", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
    sess.groupBy(col("user_id"), col("sid"))
      // Composite scalar key, not a struct: DuckDB's min_by rejects
      // tuple/list ordering keys (the q163 lesson), zero-padded strings
      // order identically in both engines.
      .agg(min_by(col("event_type"),
        concat(lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
          lit("|"), lpad(col("event_id").cast("string"), 10, "0")))
        .as("entry_type"), count(lit(1)).as("sz"))
      .groupBy(col("entry_type"))
      .agg(count(lit(1)).as("n_sessions"),
        count_if(col("sz") === 1).as("n_bounces"))
      .select(col("entry_type"), col("n_sessions"), col("n_bounces"),
        expr("n_bounces * 1000000 div n_sessions").cast("long").as("bounce_ppm"))
      .orderBy(col("entry_type"))
  }

  /** q202: path-to-purchase length — how many events a converting user
    * fires BEFORE their first purchase (strictly before, any type);
    * p50/p90 across converters via the level kernel. The
    * effort-to-convert metric complementing q171's time-to-convert. */
  val q202PathLength: Q = Q(
    "q202_path_length",
    """WITH fp AS (
      |  SELECT user_id, min(epoch_us(ts)) AS p_us
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |pre AS (
      |  SELECT e.user_id, count(*) AS n_before
      |  FROM events e JOIN fp ON e.user_id = fp.user_id
      |  WHERE epoch_us(e.ts) < fp.p_us
      |  GROUP BY 1),
      |lv AS (SELECT n_before AS v, count(*) AS c FROM pre GROUP BY 1),
      |cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n
      |        FROM lv)
      |SELECT CAST(max(n) AS BIGINT) AS n_converters,
      |       min(CASE WHEN 100 * cum >= 50 * n THEN v END) AS p50_events,
      |       min(CASE WHEN 100 * cum >= 90 * n THEN v END) AS p90_events
      |FROM cum""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(s, dir, "events")
      .withColumn("us", unix_micros(col("ts")))
    val fp = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("us")).as("p_us"))
    val lv = ev.join(fp, "user_id")
      .filter(col("us") < col("p_us"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    val cum = Kernels.levelCdf(lv, "v")
    cum.agg(max(col("n")).cast("long").as("n_converters"),
      min(when(lit(100) * col("cum") >= lit(50) * col("n"), col("v")))
        .as("p50_events"),
      min(when(lit(100) * col("cum") >= lit(90) * col("n"), col("v")))
        .as("p90_events"))
  }

  /** q208: session-value distribution — purchase revenue per SESSION
    * (q22's gap rule), then p50/p90 across purchasing sessions via the
    * level kernel: "what is a session worth". Sessions with no purchase
    * are excluded (their value isn't 0, it's not-a-purchase-session —
    * mixing them in would answer a different question). */
  val q208SessionValue: Q = Q(
    "q208_session_value",
    """WITH marks AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         CAST(round(value * 100) AS BIGINT) AS cents,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS new_sess
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, event_type, cents,
      |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                             ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marks),
      |sv AS (
      |  SELECT user_id, sid, sum(cents) AS v
      |  FROM sess WHERE event_type = 'purchase' GROUP BY 1, 2),
      |lv AS (SELECT v, count(*) AS c FROM sv GROUP BY 1),
      |cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n
      |        FROM lv)
      |SELECT CAST(max(n) AS BIGINT) AS n_sessions,
      |       CAST(min(CASE WHEN 2 * cum >= n THEN v END) AS BIGINT)
      |         AS p50_cents,
      |       CAST(min(CASE WHEN 10 * cum >= 9 * n THEN v END) AS BIGINT)
      |         AS p90_cents
      |FROM cum""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val lv = Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("new_sess",
        when(lag(col("ts"), 1).over(w).isNull ||
          col("ts") >= lag(col("ts"), 1).over(w) + expr("INTERVAL 30 MINUTES"),
          1).otherwise(0))
      .withColumn("sid", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("sid"))
      .agg(sum(col("cents")).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    val cum = Kernels.levelCdf(lv, "v")
    cum.agg(max(col("n")).cast("long").as("n_sessions"),
      min(when(lit(2) * col("cum") >= col("n"), col("v"))).cast("long")
        .as("p50_cents"),
      min(when(lit(10) * col("cum") >= lit(9) * col("n"), col("v"))).cast("long")
        .as("p90_cents"))
  }

  /** q209: day-of-week seasonality index — each dow's average daily
    * revenue vs the all-days average, as ppm (index 1e6 = a flat week).
    * Two levels of exactness care: per-dow totals divide by the COUNT OF
    * THAT DOW'S DAYS (a 31-day month has unequal dow counts — dividing
    * by total days inflates the four-occurrence dows), and the index
    * cross-multiplies the two rational averages into one integer
    * division: (rev_d · n_days · 10⁶) div (n_d · total_rev). */
  val q209SeasonalityIndex: Q = Q(
    "q209_seasonality_index",
    """WITH d AS (
      |  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS day,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |w AS (SELECT (day + 3) % 7 AS dow, count(*) AS n_d,
      |             CAST(sum(rev) AS BIGINT) AS rev_d
      |      FROM d GROUP BY 1),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
      |             CAST(sum(rev) AS BIGINT) AS total FROM d)
      |SELECT w.dow, CAST(w.n_d AS BIGINT) AS n_days,
      |       w.rev_d AS revenue_cents,
      |       CAST(w.rev_d * t.n_days * 1000000 // (w.n_d * t.total) AS BIGINT)
      |         AS index_ppm
      |FROM w CROSS JOIN t ORDER BY dow""".stripMargin) { (s, dir) =>
    val d = Tables(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy(expr("sec div 86400").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).cast("long").as("rev"))
    val w = d.groupBy(expr("(day + 3) % 7").as("dow"))
      .agg(count(lit(1)).as("n_d"), sum(col("rev")).cast("long").as("rev_d"))
    val t = d.agg(count(lit(1)).cast("long").as("n_days"),
      sum(col("rev")).cast("long").as("total"))
    w.crossJoin(broadcast(t))
      .select(col("dow"), col("n_d").cast("long").as("n_days"),
        col("rev_d").as("revenue_cents"),
        expr("rev_d * n_days * 1000000 div (n_d * total)").cast("long")
          .as("index_ppm"))
      .orderBy(col("dow"))
  }

  /** q210: peak-day detection — days whose revenue exceeds 1.2× the
    * median daily revenue (the flash-sale / incident flag; median, not
    * mean — one monster day shouldn't raise the bar for the others).
    * Median via the level kernel over the ≤ #days cells; the threshold
    * is the integer cross-multiplication 5·rev > 6·med — a 2× bar flags
    * nothing at sf0.01, and a detector that never fires is untested. */
  val q210PeakDays: Q = Q(
    "q210_peak_days",
    """WITH d AS (
      |  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS day,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |lv AS (SELECT rev AS v, count(*) AS c FROM d GROUP BY 1),
      |med AS (
      |  SELECT min(CASE WHEN 2 * cum >= n THEN v END) AS m
      |  FROM (SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n
      |        FROM lv) x)
      |SELECT d.day, d.rev, med.m AS median_rev
      |FROM d CROSS JOIN med
      |WHERE 5 * d.rev > 6 * med.m
      |ORDER BY d.day""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val d = Tables(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy(expr("sec div 86400").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).cast("long").as("rev"))
    val lv = d.groupBy(col("rev").as("v")).agg(count(lit(1)).as("c"))
    val med = Kernels.levelCdf(lv, "v")
      .agg(min(when(lit(2) * col("cum") >= col("n"), col("v"))).as("m"))
    d.crossJoin(broadcast(med))
      .filter(lit(5) * col("rev") > lit(6) * col("m"))
      .select(col("day"), col("rev"), col("m").as("median_rev"))
      .orderBy(col("day"))
  }

  /** q214: purchase-regularity detector — subscription-like users: the
    * coefficient of variation of a user's inter-purchase gaps, decided
    * WITHOUT floats or sqrt: CV² < ¼ ⟺ 4·(n·SS − S²) < n·S² over exact
    * gap seconds (q136's cross-multiplication discipline applied to a
    * behavioral signal). Users need ≥ 3 purchases (≥ 2 gaps) for the
    * variance to mean anything; mean gap ships as one integer division.
    * The replenishment-targeting feed: regular users get reminders, not
    * promotions. */
  val q214Regularity: Q = Q(
    "q214_regularity",
    """WITH p AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id
      |  FROM events WHERE event_type = 'purchase'),
      |g AS (
      |  SELECT user_id,
      |         sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id)
      |           AS gap
      |  FROM p),
      |u AS (
      |  SELECT user_id, count(*) AS n,
      |         CAST(sum(gap) AS HUGEINT) AS s,
      |         CAST(sum(gap * gap) AS HUGEINT) AS ss
      |  FROM g WHERE gap IS NOT NULL GROUP BY 1 HAVING count(*) >= 2)
      |SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
      |       CAST(s // n AS BIGINT) AS mean_gap_s,
      |       4 * (n * ss - s * s) < n * s * s AS regular
      |FROM u ORDER BY user_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    Tables(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_timestamp(col("ts")).as("sec"), col("event_id"))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("gap").cast(dec)).as("s"),
        sum((col("gap") * col("gap")).cast(dec)).as("ss"))
      .filter(col("n") >= 2)
      .select(col("user_id"), col("n").cast("long").as("n_gaps"),
        expr("s div n").cast("long").as("mean_gap_s"),
        (lit(4).cast(dec) * (col("n") * col("ss") - col("s") * col("s"))
          < col("n").cast(dec) * col("s") * col("s")).as("regular"))
      .orderBy(col("user_id"))
  }

  /** q216: growth accounting — the canonical weekly user-state ledger:
    * per week, NEW (first week ever), RETAINED (also active last week),
    * RESURRECTED (active before, silent last week); churned is last
    * week's actives minus this week's retained, derivable from the same
    * table. (week, user) activity cells join their own lag — no per-user
    * history scan — and each user carries a first-week tag from one
    * min-aggregate. */
  val q216GrowthAccounting: Q = Q(
    "q216_growth_accounting",
    """WITH wu AS (
      |  SELECT DISTINCT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) // 7 AS wk,
      |         user_id
      |  FROM events),
      |fw AS (SELECT user_id, min(wk) AS w0 FROM wu GROUP BY 1),
      |j AS (
      |  SELECT a.wk, a.user_id,
      |         fw.w0 = a.wk AS is_new,
      |         b.user_id IS NOT NULL AS was_last_week
      |  FROM wu a
      |  JOIN fw ON a.user_id = fw.user_id
      |  LEFT JOIN wu b ON b.user_id = a.user_id AND b.wk = a.wk - 1)
      |SELECT wk, count(*) AS active_users,
      |       count(*) FILTER (WHERE is_new) AS new_users,
      |       count(*) FILTER (WHERE NOT is_new AND was_last_week) AS retained,
      |       count(*) FILTER (WHERE NOT is_new AND NOT was_last_week)
      |         AS resurrected
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val wu = Tables(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
      .select(expr("(sec div 86400) div 7").as("wk"), col("user_id"))
      .distinct()
    val fw = wu.groupBy(col("user_id")).agg(min(col("wk")).as("w0"))
    val prev = wu.select((col("wk") + 1).as("wk"), col("user_id"),
      lit(true).as("was_last_week"))
    wu.join(fw, "user_id")
      .join(prev, Seq("wk", "user_id"), "left")
      .select(col("wk"), (col("w0") === col("wk")).as("is_new"),
        coalesce(col("was_last_week"), lit(false)).as("was_last_week"))
      .groupBy(col("wk"))
      .agg(count(lit(1)).as("active_users"),
        count_if(col("is_new")).as("new_users"),
        count_if(!col("is_new") && col("was_last_week")).as("retained"),
        count_if(!col("is_new") && !col("was_last_week")).as("resurrected"))
      .orderBy(col("wk"))
  }

  /** q218: behavioral diversity — how varied is each user's event mix,
    * as the Gini-Simpson index 1 − Σpᵢ², EXACT: diversity_ppm =
    * (n² − Σcᵢ²)·10⁶ div n² over per-type counts (entropy needs logs;
    * Simpson is the rational diversity measure, so it gates). Rolled up
    * to a distribution: users by diversity decile band. */
  val q218BehaviorDiversity: Q = Q(
    "q218_behavior_diversity",
    """WITH tc AS (
      |  SELECT user_id, event_type, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |u AS (
      |  SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
      |         CAST(sum(c * c) AS BIGINT) AS ss
      |  FROM tc GROUP BY 1),
      |d AS (
      |  SELECT user_id, (n * n - ss) * 1000000 // (n * n) AS div_ppm
      |  FROM u)
      |SELECT CAST(div_ppm // 100000 AS BIGINT) AS decile_band,
      |       count(*) AS n_users,
      |       CAST(min(div_ppm) AS BIGINT) AS min_ppm,
      |       CAST(max(div_ppm) AS BIGINT) AS max_ppm
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(sum(col("c")).as("n"), sum(col("c") * col("c")).as("ss"))
      .select(col("user_id"),
        expr("(n * n - ss) * 1000000 div (n * n)").as("div_ppm"))
      .groupBy(expr("div_ppm div 100000").cast("long").as("decile_band"))
      .agg(count(lit(1)).as("n_users"),
        min(col("div_ppm")).cast("long").as("min_ppm"),
        max(col("div_ppm")).cast("long").as("max_ppm"))
      .orderBy(col("decile_band"))
  }

  /** q231: weekly top movers — the event types whose share of weekly
    * revenue swung hardest vs the prior week (q199's ratio-to-report
    * composed with a per-type lag): the "what changed this week" alert
    * feed. Share deltas in ppm; top-10 by |delta| with a total (|delta|
    * DESC, wk, type) tie order so the cut is deterministic. */
  val q231TopMovers: Q = Q(
    "q231_top_movers",
    """WITH w AS (
      |  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) // 7 AS wk,
      |         event_type,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev
      |  FROM events GROUP BY 1, 2),
      |sh AS (
      |  SELECT wk, event_type,
      |         CAST(rev * 1000000 // sum(rev) OVER (PARTITION BY wk) AS BIGINT)
      |           AS share_ppm
      |  FROM w),
      |d AS (
      |  SELECT wk, event_type, share_ppm,
      |         share_ppm - lag(share_ppm)
      |           OVER (PARTITION BY event_type ORDER BY wk) AS delta_ppm
      |  FROM sh)
      |SELECT wk, event_type, share_ppm, delta_ppm
      |FROM d WHERE delta_ppm IS NOT NULL
      |ORDER BY abs(delta_ppm) DESC, wk, event_type LIMIT 10""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val sh = Tables(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy(expr("(sec div 86400) div 7").as("wk"), col("event_type"))
      .agg(sum(round(col("value") * 100).cast("long")).cast("long").as("rev"))
      .withColumn("wt", sum(col("rev")).over(Window.partitionBy(col("wk"))))
      .select(col("wk"), col("event_type"),
        expr("rev * 1000000 div wt").cast("long").as("share_ppm"))
    sh.withColumn("delta_ppm",
        col("share_ppm") - lag(col("share_ppm"), 1).over(
          Window.partitionBy(col("event_type")).orderBy(col("wk"))))
      .filter(col("delta_ppm").isNotNull)
      .orderBy(abs(col("delta_ppm")).desc, col("wk"), col("event_type"))
      .limit(10)
  }

  /** q315: Kaplan–Meier survival estimate — the time-to-event leg the
    * lifecycle tier lacked: q181 flags churned customers as a POINT
    * verdict, q171 measures time-to-convert for converters only; the KM
    * estimator is how production answers "what fraction of customers
    * survive past t" when many subjects are CENSORED (still active at
    * the observation cutoff — dropping them biases survival down,
    * counting them as churned biases it up; KM handles them exactly by
    * shrinking the risk set).
    *
    * Subjects are customers; duration = weeks between first and last
    * order; churned iff the last order predates the corpus max date by
    * >90 days (else right-censored). Per death-week t: risk set n_t =
    * Σ_{s≥t}(d_s+c_s) (one DESC-ordered cumulative over the week
    * histogram), and the survival CURVE is carried in log space —
    * step = round(ln((n−d)/n), 9) (the portable-libm idiom) in exact
    * nano-units, cumulated by an integer window sum — because the
    * engines' exp/product paths differ where their ln-rounded sums
    * cannot. S(t) = exp(cum_log_nano·10⁻⁹) for human eyes. A terminal
    * all-churned step (n=d, log −∞) would be dropped by the n>d guard —
    * production surfaces it as a zero-survival flag; the censoring
    * convention here (deaths before censors at equal t) makes it
    * unreachable except at the maximum week.
    *
    * Scale shape: customer-grain rollup (map-side combined), a 1-row max
    * broadcast, a week histogram bounded by the calendar span (~350
    * rows), and two global windows over that bounded reduction
    * (PlanAuditSpec-audited). Nothing row-grain crosses a window. */
  val q315KaplanMeier: Q = Q(
    "q315_kaplan_meier",
    """WITH o AS (SELECT o_custkey AS cid,
      |                  CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS d
      |           FROM orders),
      |cust AS (SELECT cid, min(d) AS f, max(d) AS l FROM o GROUP BY 1),
      |mx AS (SELECT max(d) AS md FROM o),
      |subj AS (SELECT cid, (l - f) // 7 AS t,
      |                l <= md - 90 AS churned
      |         FROM cust, mx),
      |h AS (SELECT t,
      |             CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS d,
      |             CAST(sum(CASE WHEN churned THEN 0 ELSE 1 END) AS BIGINT) AS c
      |      FROM subj GROUP BY 1),
      |steps AS (SELECT t, d, c,
      |                 CAST(sum(d + c) OVER (ORDER BY t DESC) AS BIGINT) AS n
      |          FROM h),
      |km AS (SELECT t, n, d, c,
      |              CAST(CAST(round(ln(CAST(n - d AS DOUBLE)
      |                                 / CAST(n AS DOUBLE)), 9)
      |                     AS DECIMAL(28,9)) * 1000000000 AS BIGINT)
      |                AS step_log_nano
      |       FROM steps WHERE d > 0 AND n > d)
      |SELECT t AS t_weeks, n AS n_risk, d AS d_churn, c AS c_censored,
      |       step_log_nano,
      |       CAST(sum(step_log_nano) OVER (ORDER BY t) AS BIGINT)
      |         AS cum_log_nano
      |FROM km ORDER BY t_weeks""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val o = Tables(s, dir, "orders")
      .select(col("o_custkey").as("cid"),
        expr("unix_timestamp(o_orderdate) div 86400").as("d"))
    val cust = o.groupBy(col("cid")).agg(min(col("d")).as("f"), max(col("d")).as("l"))
    val mx = o.agg(max(col("d")).as("md"))
    val subj = cust.crossJoin(broadcast(mx))
      .select(expr("(l - f) div 7").as("t"), (col("l") <= col("md") - 90).as("churned"))
    val h = subj.groupBy(col("t"))
      .agg(sum(when(col("churned"), 1L).otherwise(0L)).as("d"),
        sum(when(col("churned"), 0L).otherwise(1L)).as("c"))
    val steps = h.withColumn("n",
      sum(col("d") + col("c")).over(Window.orderBy(col("t").desc)).cast("long"))
    val km = steps.filter(col("d") > 0 && col("n") > col("d"))
      .withColumn("step_log_nano",
        expr("""CAST(CAST(round(ln(CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE)), 9)
               |     AS DECIMAL(28,9)) * 1000000000 AS LONG)""".stripMargin))
    km.select(col("t").as("t_weeks"), col("n").as("n_risk"),
        col("d").as("d_churn"), col("c").as("c_censored"), col("step_log_nano"),
        sum(col("step_log_nano")).over(Window.orderBy(col("t")))
          .cast("long").as("cum_log_nano"))
      .orderBy(col("t_weeks"))
  }

  /** q339: Ljung–Box portmanteau whiteness test over q276's ACF — the
    * decision rule on top of the diagnostic: Q = n(n+2)·Σ_{k=1..7}
    * ρ̂_k²/(n−k), compared against the χ²₇ 0.95 critical value. q276
    * ships the correlogram; this ships the yes/no ("is there ANY serial
    * structure worth modeling?") that routes a series to q165/q271/q326
    * versus a plain mean model.
    *
    * Determinism: ρ̂_k enters as q276's exact integer acf_ppm; each
    * lag's term n(n+2)ρ̂²/((n−k)·10⁶) is µ-floored before the 7-term sum
    * (documented µ-unit contract, ≤7 µ total); the critical value is the
    * literal 14067140 µ (χ²₇ at 0.95 = 14.067140…), identical in both
    * engines.
    *
    * Scale shape: q276's exactly — day-grain cells, broadcast per-type
    * stats, the 7-lag self-join bounded by calendar × 7. The test adds
    * one ≤7-row-per-type rollup. n is calendar-bounded, so
    * n(n+2)·ρ_ppm² ≈ 10¹⁶·n stays inside DECIMAL(38,0)/HUGEINT. */
  val q339LjungBox: Q = Q(
    "q339_ljung_box",
    """WITH d AS (
      |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2),
      |ser AS (SELECT event_type, v,
      |               row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
      |        FROM d),
      |st AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
      |              CAST(sum(v) AS HUGEINT) AS sv
      |       FROM ser GROUP BY 1),
      |cen AS (SELECT s.event_type, s.t, st.n * s.v - st.sv AS c
      |        FROM ser s JOIN st USING (event_type)),
      |den AS (SELECT event_type, sum(c * c) AS den FROM cen GROUP BY 1),
      |k AS (SELECT unnest(generate_series(1, 7)) AS lag),
      |num AS (SELECT a.event_type, k.lag, sum(a.c * b.c) AS num
      |        FROM cen a CROSS JOIN k
      |             JOIN cen b ON b.event_type = a.event_type
      |                       AND b.t = a.t - k.lag
      |        GROUP BY 1, 2),
      |rho AS (SELECT n.event_type, n.lag,
      |               1000000 * n.num // d2.den AS rho_ppm
      |        FROM num n JOIN den d2 USING (event_type)),
      |lb AS (SELECT r.event_type,
      |              sum(st.n * (st.n + 2) * r.rho_ppm * r.rho_ppm
      |                  // ((st.n - r.lag) * 1000000)) AS q_micro
      |       FROM rho r JOIN st USING (event_type) GROUP BY 1)
      |SELECT lb.event_type, CAST(st.n AS BIGINT) AS n_days,
      |       CAST(lb.q_micro AS BIGINT) AS q_micro,
      |       CAST(7 AS BIGINT) AS df,
      |       lb.q_micro > 14067140 AS reject_white
      |FROM lb JOIN st USING (event_type) ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val dec38 = "decimal(38,0)"
    val d = Tables(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy(col("event_type"), expr("sec div 86400").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).cast("long").as("v"))
    val ser = d.withColumn("t",
      row_number().over(Window.partitionBy(col("event_type")).orderBy(col("day"))))
    val st = ser.groupBy(col("event_type"))
      .agg(count(lit(1)).cast(dec38).as("n"), sum(col("v").cast(dec38)).as("sv"))
    val cen = ser.join(broadcast(st), "event_type")
      .select(col("event_type"), col("t"),
        (col("n") * col("v") - col("sv")).as("c"))
    val den = cen.groupBy(col("event_type")).agg(sum(col("c") * col("c")).as("den"))
    val lags = s.range(1, 8).select(col("id").as("lag"))
    val num = cen.as("a").crossJoin(broadcast(lags))
      .join(cen.as("b"),
        col("b.event_type") === col("a.event_type") &&
          col("b.t") === col("a.t") - col("lag"))
      .groupBy(col("a.event_type").as("event_type"), col("lag"))
      .agg(sum(col("a.c") * col("b.c")).as("num"))
    val rho = num.join(broadcast(den), "event_type")
      .select(col("event_type"), col("lag").cast(dec38).as("lag"),
        expr("CAST((1000000 * num) div den AS decimal(38,0))").as("rho_ppm"))
    rho.join(broadcast(st), "event_type")
      .groupBy(col("event_type"))
      .agg(first(col("n")).cast("long").as("n_days"),
        sum(expr("n * (n + 2) * rho_ppm * rho_ppm div ((n - lag) * 1000000)"))
          .cast("long").as("q_micro"))
      .select(col("event_type"), col("n_days"), col("q_micro"),
        lit(7L).as("df"), (col("q_micro") > 14067140L).as("reject_white"))
      .orderBy(col("event_type"))
  }

  /** q340: EWMA control chart (λ=0.2, L=3) over the daily revenue series
    * per event_type — the small-shift monitor that complements q131's
    * CUSUM: the EWMA statistic z_t = λy_t + (1−λ)z_{t−1} (z₀ = series
    * mean) drifts out of ±L·σ_z(t) bands on sustained small shifts that
    * per-point σ-rules never see. With λ=1/5 and L=3 the band constant
    * L²·λ/(2−λ) is EXACTLY 1, so the out-of-control test collapses to
    * (n·z_t − S)² > (n·Σy² − S²)·(1 − 0.8^{2t}) — integer series stats
    * on the right, the recursion on the left.
    *
    * Determinism: the q326/q271 device — both engines execute the
    * IDENTICAL IEEE sequence (Spark: ordered-array fold appending
    * (z, w=0.8^{2t}) states; DuckDB: recursive CTE stepping the same two
    * multiplies), and every other quantity is an exact integer cast once
    * to double. +, ×, / and integer→double casts are all correctly
    * rounded per IEEE 754, so equality is bit-level, not approximate;
    * w advances by repeated ×0.64 (never libm pow). Literals are CAST to
    * DOUBLE on the DuckDB side (bare 0.2 parses as DECIMAL — the q319
    * gotcha).
    *
    * Scale shape: the row stream collapses map-side to day-grain cells
    * (calendar-bounded); the per-type fold is a ≤n_days list op, the
    * flags a day-grain select, the output a per-type rollup. */
  val q340EwmaControl: Q = Q(
    "q340_ewma_control",
    """WITH RECURSIVE d AS (
      |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2),
      |ser AS (SELECT event_type, v,
      |               row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
      |        FROM d),
      |st AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
      |              CAST(sum(v) AS HUGEINT) AS sv,
      |              CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS svv
      |       FROM ser GROUP BY 1),
      |r AS (
      |  SELECT st.event_type, 0 AS t,
      |         CAST(st.sv AS DOUBLE) / CAST(st.n AS DOUBLE) AS z,
      |         CAST(1 AS DOUBLE) AS w
      |  FROM st
      |  UNION ALL
      |  SELECT r.event_type, r.t + 1,
      |         CAST(0.2 AS DOUBLE) * CAST(s.v AS DOUBLE)
      |           + CAST(0.8 AS DOUBLE) * r.z,
      |         r.w * CAST(0.64 AS DOUBLE)
      |  FROM r JOIN ser s ON s.event_type = r.event_type AND s.t = r.t + 1),
      |fl AS (SELECT r.event_type, r.t, r.z,
      |              (CAST(st.n AS DOUBLE) * r.z - CAST(st.sv AS DOUBLE))
      |                * (CAST(st.n AS DOUBLE) * r.z - CAST(st.sv AS DOUBLE))
      |                > CAST(st.n * st.svv - st.sv * st.sv AS DOUBLE)
      |                  * (CAST(1 AS DOUBLE) - r.w) AS flag
      |       FROM r JOIN st USING (event_type) WHERE r.t >= 1)
      |SELECT fl.event_type, CAST(st.n AS BIGINT) AS n_days,
      |       CAST(count(*) FILTER (WHERE fl.flag) AS BIGINT) AS n_flagged,
      |       CAST(coalesce(min(fl.t) FILTER (WHERE fl.flag), 0) AS BIGINT)
      |         AS first_flag_t,
      |       arg_max(round(fl.z, 4), fl.t) AS z_final,
      |       CAST(st.sv // st.n AS BIGINT) AS mean_cents
      |FROM fl JOIN st USING (event_type)
      |GROUP BY 1, st.n, st.sv
      |ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val dec38 = "decimal(38,0)"
    val d = Tables(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy(col("event_type"), expr("sec div 86400").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).cast("long").as("v"))
    val ser = d.withColumn("t",
      row_number().over(Window.partitionBy(col("event_type")).orderBy(col("day"))))
    val st = ser.groupBy(col("event_type"))
      .agg(count(lit(1)).cast(dec38).as("n"), sum(col("v").cast(dec38)).as("sv"),
        sum(col("v").cast(dec38) * col("v")).as("svv"))
    val arr = ser.groupBy(col("event_type"))
      .agg(expr("transform(array_sort(collect_list(struct(t, v))), p -> p.v)")
        .as("arr"))
      .join(broadcast(st), "event_type")
    // Fold appends one (z, w) state per day; index i in the exploded
    // array is the day index t (position 0 = the z0/w0 seed, dropped).
    val states = arr.withColumn("sts",
      expr("""aggregate(arr,
             |  array(named_struct(
             |    'z', CAST(sv AS DOUBLE) / CAST(n AS DOUBLE),
             |    'w', CAST(1 AS DOUBLE))),
             |  (acc, e) -> array_append(acc, named_struct(
             |    'z', 0.2D * CAST(e AS DOUBLE) + 0.8D * element_at(acc, -1).z,
             |    'w', element_at(acc, -1).w * 0.64D)))""".stripMargin))
      .select(col("event_type"), col("n"), col("sv"), col("svv"),
        posexplode(col("sts")).as(Seq("t", "st")))
      .filter(col("t") >= 1)
    val fl = states.select(col("event_type"), col("n"), col("sv"),
      col("t").cast("long").as("t"), col("st.z").as("z"),
      ((expr("CAST(n AS DOUBLE)") * col("st.z") - expr("CAST(sv AS DOUBLE)"))
        * (expr("CAST(n AS DOUBLE)") * col("st.z") - expr("CAST(sv AS DOUBLE)"))
        > expr("CAST(n * svv - sv * sv AS DOUBLE)")
          * (expr("CAST(1 AS DOUBLE)") - col("st.w"))).as("flag"))
    fl.groupBy(col("event_type"))
      .agg(first(col("n")).cast("long").as("n_days"),
        count(when(col("flag"), 1)).as("n_flagged"),
        coalesce(min(when(col("flag"), col("t"))), lit(0L)).as("first_flag_t"),
        expr("max_by(round(z, 4), t)").as("z_final"),
        expr("CAST(first(sv) div first(n) AS LONG)").as("mean_cents"))
      .orderBy(col("event_type"))
  }

  /** q349: seasonal/trend STRENGTH features (Wang–Hyndman's STL feature
    * pair) over q306's decomposition — the two numbers that summarize a
    * whole correlogram: F_seasonal = max(0, 1 − Var(R)/Var(S+R)) and
    * F_trend = max(0, 1 − Var(R)/Var(T+R)). They are what a forecasting
    * ROUTER thresholds on (q339 answers "any structure?"; this answers
    * "which kind, how much") and what a feature store extracts per
    * series at fleet scale.
    *
    * Determinism: every variance enters as the exact integer
    * SS(s) = n·Σs² − (Σs)² over milli-unit components, so each strength
    * is ONE integer rational surfaced in ppm (greatest(0,·) applied to
    * the exact numerator, not a float).
    *
    * Scale shape: q306's — day-grain cells, 7-day windows per type, dow
    * cells; the strengths are per-type rollups of the decomposed day
    * table. Milli² sums reach ~10²⁴ — DECIMAL(38,0)/HUGEINT territory,
    * far inside both engines' width. */
  val q349SeasonalStrength: Q = Q(
    "q349_seasonal_strength",
    s"""WITH $duckDecomposeCtes,
       |comp AS (SELECT event_type,
       |                CAST(resid_milli AS HUGEINT) AS r,
       |                CAST(seasonal_milli + resid_milli AS HUGEINT) AS dt,
       |                CAST(v * 1000 - seasonal_milli AS HUGEINT) AS tr
       |         FROM dec),
       |g AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
       |             sum(r) AS sr, sum(r * r) AS srr,
       |             sum(dt) AS sd, sum(dt * dt) AS sdd,
       |             sum(tr) AS st, sum(tr * tr) AS stt
       |      FROM comp GROUP BY 1)
       |SELECT event_type, CAST(n AS BIGINT) AS n_days,
       |       CAST(greatest(0, ((n * sdd - sd * sd) - (n * srr - sr * sr))
       |            * 1000000 // nullif(n * sdd - sd * sd, 0)) AS BIGINT)
       |         AS f_seasonal_ppm,
       |       CAST(greatest(0, ((n * stt - st * st) - (n * srr - sr * sr))
       |            * 1000000 // nullif(n * stt - st * st, 0)) AS BIGINT)
       |         AS f_trend_ppm
       |FROM g ORDER BY 1""".stripMargin) { (s, dir) =>
    val dec38 = "decimal(38,0)"
    val comp = decompose(s, dir)
      .select(col("event_type"),
        col("resid_milli").cast(dec38).as("r"),
        (col("seasonal_milli") + col("resid_milli")).cast(dec38).as("dt"),
        (col("v") * 1000 - col("seasonal_milli")).cast(dec38).as("tr"))
    comp.groupBy(col("event_type"))
      .agg(count(lit(1)).cast(dec38).as("n"),
        sum(col("r")).as("sr"), sum(col("r") * col("r")).as("srr"),
        sum(col("dt")).as("sd"), sum(col("dt") * col("dt")).as("sdd"),
        sum(col("tr")).as("st"), sum(col("tr") * col("tr")).as("stt"))
      .select(col("event_type"), col("n").cast("long").as("n_days"),
        expr("""CAST(greatest(0, ((n * sdd - sd * sd) - (n * srr - sr * sr))
               |     * 1000000 div nullif(n * sdd - sd * sd, 0)) AS LONG)"""
          .stripMargin).as("f_seasonal_ppm"),
        expr("""CAST(greatest(0, ((n * stt - st * st) - (n * srr - sr * sr))
               |     * 1000000 div nullif(n * stt - st * st, 0)) AS LONG)"""
          .stripMargin).as("f_trend_ppm"))
      .orderBy(col("event_type"))
  }

  /** Durbin–Levinson recursion, fully unrolled for lags 1..7 as ONE
    * sequence of SQL expression strings shared verbatim by the Spark
    * program and the DuckDB oracle (the q319 shared-literal device at
    * expression scale): level k derives φ_kk from (num_k/den_k) and
    * rewrites φ_k,j = φ_{k−1},j − φ_kk·φ_{k−1},k−j. Each level is two
    * projection steps (pkk first, then the φ updates that reference it),
    * so every +, ×, / executes in the identical left-associated order in
    * both engines — IEEE-deterministic without any integerization.
    * Returns (stepExprs, pacf column names). */
  private def durbinLevinson: (Seq[Seq[String]], Seq[String]) = {
    val steps = scala.collection.mutable.Buffer[Seq[String]]()
    steps += Seq("r1 AS pacf1", "r1 AS p1x1")
    for (k <- 2 to 7) {
      val num = (1 until k).map(j => s"p${k - 1}x$j * r${k - j}").mkString(" + ")
      val den = (1 until k).map(j => s"p${k - 1}x$j * r$j").mkString(" + ")
      steps += Seq(
        s"(r$k - ($num)) / (CAST(1 AS DOUBLE) - ($den)) AS pacf$k")
      steps += (Seq(s"pacf$k AS p${k}x$k") ++ (1 until k).map(j =>
        s"p${k - 1}x$j - pacf$k * p${k - 1}x${k - j} AS p${k}x$j"))
    }
    (steps.toSeq, (1 to 7).map(k => s"pacf$k"))
  }

  /** q352: partial autocorrelation function (PACF, lags 1–7) — the AR
    * order-selection companion to q276's ACF and q339's portmanteau: the
    * ACF of an AR(p) series decays forever, but its PACF CUTS OFF at lag
    * p, so this is the diagnostic that picks the autoregressive order.
    * Computed by the Durbin–Levinson recursion from the exact ACF.
    *
    * Determinism: ρ_k enters as one division of exact integer-cast
    * doubles (q276's num/den pair — no ppm floor in between); the
    * recursion is [[durbinLevinson]]'s unrolled expression sequence,
    * shared verbatim by both engines, so every IEEE op executes in the
    * same order; output rounds to 9 only at the surface.
    *
    * Scale shape: q276's day-grain/calendar-bounded machinery ends in a
    * 7-row-per-type frame pivoted to ONE row per type; the recursion is
    * 12 projection steps over that tiny frame — free at any scale. */
  val q352Pacf: Q = {
    val (dlSteps, pacfCols) = durbinLevinson
    val duckChain = dlSteps.zipWithIndex.map { case (exprs, i) =>
      val prev = if (i == 0) "base" else s"lvl${i - 1}"
      s"lvl$i AS (SELECT *, ${exprs.mkString(", ")} FROM $prev)"
    }.mkString(",\n")
    Q(
      "q352_pacf",
      s"""WITH d AS (
         |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |ser AS (SELECT event_type, v,
         |               row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
         |        FROM d),
         |st AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
         |              CAST(sum(v) AS HUGEINT) AS sv
         |       FROM ser GROUP BY 1),
         |cen AS (SELECT s.event_type, s.t, st.n * s.v - st.sv AS c
         |        FROM ser s JOIN st USING (event_type)),
         |den AS (SELECT event_type, sum(c * c) AS den FROM cen GROUP BY 1),
         |k AS (SELECT unnest(generate_series(1, 7)) AS lag),
         |num AS (SELECT a.event_type, k.lag, sum(a.c * b.c) AS num
         |        FROM cen a CROSS JOIN k
         |             JOIN cen b ON b.event_type = a.event_type
         |                       AND b.t = a.t - k.lag
         |        GROUP BY 1, 2),
         |rho AS (SELECT n.event_type, n.lag,
         |               CAST(n.num AS DOUBLE) / CAST(d2.den AS DOUBLE) AS rho
         |        FROM num n JOIN den d2 USING (event_type)),
         |base AS (SELECT event_type,
         |                ${(1 to 7).map(k =>
                            s"max(CASE WHEN lag = $k THEN rho END) AS r$k")
                            .mkString(", ")}
         |         FROM rho GROUP BY 1),
         |$duckChain,
         |wide AS (SELECT event_type, ${pacfCols.mkString(", ")}
         |         FROM lvl${dlSteps.size - 1})
         |SELECT event_type, CAST(k.lag AS BIGINT) AS lag,
         |       round(CASE k.lag ${(1 to 7).map(k =>
                        s"WHEN $k THEN pacf$k").mkString(" ")} END, 9) AS pacf
         |FROM wide, k ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val dec38 = "decimal(38,0)"
      val d = Tables(s, dir, "events")
        .withColumn("sec", unix_timestamp(col("ts")))
        .groupBy(col("event_type"), expr("sec div 86400").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).cast("long").as("v"))
      val ser = d.withColumn("t",
        row_number().over(Window.partitionBy(col("event_type")).orderBy(col("day"))))
      val st = ser.groupBy(col("event_type"))
        .agg(count(lit(1)).cast(dec38).as("n"), sum(col("v").cast(dec38)).as("sv"))
      val cen = ser.join(broadcast(st), "event_type")
        .select(col("event_type"), col("t"),
          (col("n") * col("v") - col("sv")).as("c"))
      val den = cen.groupBy(col("event_type")).agg(sum(col("c") * col("c")).as("den"))
      val lags = s.range(1, 8).select(col("id").as("lag"))
      val num = cen.as("a").crossJoin(broadcast(lags))
        .join(cen.as("b"),
          col("b.event_type") === col("a.event_type") &&
            col("b.t") === col("a.t") - col("lag"))
        .groupBy(col("a.event_type").as("event_type"), col("lag"))
        .agg(sum(col("a.c") * col("b.c")).as("num"))
      val rho = num.join(broadcast(den), "event_type")
        .select(col("event_type"), col("lag"),
          (col("num").cast("double") / col("den").cast("double")).as("rho"))
      val base = rho.groupBy(col("event_type"))
        .agg((1 to 7).map(k =>
          max(when(col("lag") === k, col("rho"))).as(s"r$k")).head,
          (2 to 7).map(k =>
            max(when(col("lag") === k, col("rho"))).as(s"r$k")): _*)
      val wide = dlSteps.foldLeft(base)((df, exprs) =>
        df.selectExpr(Seq("*") ++ exprs: _*))
        .select((col("event_type") +: pacfCols.map(col)): _*)
      wide.crossJoin(broadcast(lags))
        .select(col("event_type"), col("lag"),
          round(expr(s"CASE lag ${(1 to 7).map(k =>
            s"WHEN $k THEN pacf$k").mkString(" ")} END"), 9).as("pacf"))
        .orderBy(col("event_type"), col("lag"))
    }
  }

  /** q357: binary-segmentation changepoint — the POINT-estimate
    * companion to q131's CUSUM detector and q340's EWMA monitor: those
    * say "a shift happened"; this says WHERE, by the classic first split
    * of binary segmentation (the τ maximizing the between-segment sum of
    * squares, equivalently minimizing within-segment SSE). gain(τ) =
    * (S_L·n_R − S_R·n_L)² / (n_L·n_R·n) in cents² — one exact integer
    * rational per candidate, µ-floored.
    *
    * Determinism: integer cents end to end; argmax tie-breaks (gain
    * desc, τ asc); segment means floored to cents.
    *
    * Scale shape: day-grain cells (calendar-bounded) with PARTITIONED
    * cumulative windows per type; the candidate table is ≤ n_days rows
    * per type. Recursing into segments (full binary segmentation) reruns
    * the same kernel on each side — same plan shape. */
  val q357BinarySeg: Q = Q(
    "q357_binary_seg",
    """WITH d AS (
      |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2),
      |ser AS (SELECT event_type, day, v,
      |               row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
      |               sum(v) OVER (PARTITION BY event_type ORDER BY day
      |                            ROWS UNBOUNDED PRECEDING) AS sl
      |        FROM d),
      |st AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
      |              CAST(sum(v) AS HUGEINT) AS s
      |       FROM ser GROUP BY 1),
      |cand AS (SELECT ser.event_type, ser.t, ser.day, ser.sl, st.n, st.s,
      |                (ser.sl * (st.n - ser.t) - (st.s - ser.sl) * ser.t)
      |                  * (ser.sl * (st.n - ser.t) - (st.s - ser.sl) * ser.t)
      |                  * 1000000
      |                  // (ser.t * (st.n - ser.t) * st.n) AS gain_micro
      |         FROM ser JOIN st USING (event_type)
      |         WHERE ser.t < st.n)
      |SELECT event_type, CAST(t AS BIGINT) AS tau, CAST(day AS BIGINT)
      |         AS split_day,
      |       CAST(gain_micro AS BIGINT) AS gain_micro,
      |       CAST(sl // t AS BIGINT) AS mean_left_cents,
      |       CAST((s - sl) // (n - t) AS BIGINT) AS mean_right_cents
      |FROM cand
      |QUALIFY row_number() OVER (PARTITION BY event_type
      |          ORDER BY gain_micro DESC, t) = 1
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val dec38 = "decimal(38,0)"
    val d = Tables(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy(col("event_type"), expr("sec div 86400").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).cast("long").as("v"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val ser = d
      .withColumn("t", row_number().over(w).cast(dec38))
      .withColumn("sl",
        sum(col("v").cast(dec38)).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val st = ser.groupBy(col("event_type"))
      .agg(count(lit(1)).cast(dec38).as("n"), sum(col("v").cast(dec38)).as("s"))
    val cand = ser.join(broadcast(st), "event_type")
      .filter(col("t") < col("n"))
      .select(col("event_type"), col("t"), col("day"),
        expr("""CAST((sl * (n - t) - (s - sl) * t)
               |     * (sl * (n - t) - (s - sl) * t) * 1000000
               |     div (t * (n - t) * n) AS LONG)""".stripMargin)
          .as("gain_micro"),
        expr("CAST(sl div t AS LONG)").as("mean_left_cents"),
        expr("CAST((s - sl) div (n - t) AS LONG)").as("mean_right_cents"))
    cand.withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("gain_micro").desc, col("t"))))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("t").cast("long").as("tau"),
        col("day").cast("long").as("split_day"), col("gain_micro"),
        col("mean_left_cents"), col("mean_right_cents"))
      .orderBy(col("event_type"))
  }

  /** q358: rolling-origin forecast BACKTEST — the model-selection step
    * the forecasting tier (q165 seasonal-naive, q271 Holt, q326 HW)
    * never shipped: over the last 10 days of each series, score three
    * zero-fit baselines — seasonal-naive (y_{t−7}), naive (y_{t−1}),
    * and the expanding mean — by MAE in cents, and name the winner.
    * This is how a fleet picks a forecaster per series without a
    * modeling loop: baselines first, upgrade only where they lose.
    *
    * Determinism: predictions are exact integers (lags and a floored
    * expanding mean); MAEs are floored integer cents; the winner
    * tie-breaks seasonal-naive > naive > mean (the cheaper/simpler
    * model wins ties).
    *
    * Scale shape: day-grain cells with partitioned lag/cumsum windows;
    * the backtest is a ≤10-row-per-type rollup. */
  val q358ForecastBacktest: Q = Q(
    "q358_forecast_backtest",
    """WITH d AS (
      |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2),
      |ser AS (SELECT event_type, v,
      |               row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
      |               lag(v, 7) OVER (PARTITION BY event_type ORDER BY day) AS p_sn,
      |               lag(v, 1) OVER (PARTITION BY event_type ORDER BY day) AS p_nv,
      |               (sum(v) OVER (PARTITION BY event_type ORDER BY day
      |                             ROWS UNBOUNDED PRECEDING) - v)
      |                 // nullif(row_number() OVER (PARTITION BY event_type
      |                             ORDER BY day) - 1, 0) AS p_mean
      |        FROM d),
      |nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ser GROUP BY 1),
      |test AS (SELECT ser.* FROM ser JOIN nn USING (event_type)
      |         WHERE ser.t > nn.n - 10 AND ser.t >= 8),
      |mae AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_test,
      |               CAST(sum(abs(v - p_sn)) // count(*) AS BIGINT) AS mae_snaive,
      |               CAST(sum(abs(v - p_nv)) // count(*) AS BIGINT) AS mae_naive,
      |               CAST(sum(abs(v - p_mean)) // count(*) AS BIGINT) AS mae_mean
      |        FROM test GROUP BY 1)
      |SELECT event_type, n_test, mae_snaive, mae_naive, mae_mean,
      |       CASE WHEN mae_snaive <= mae_naive AND mae_snaive <= mae_mean
      |            THEN 'snaive'
      |            WHEN mae_naive <= mae_mean THEN 'naive' ELSE 'mean' END
      |         AS winner
      |FROM mae ORDER BY event_type""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val d = Tables(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy(col("event_type"), expr("sec div 86400").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).cast("long").as("v"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val ser2 = d
      .withColumn("t", row_number().over(w).cast("long"))
      .withColumn("sl",
        sum(col("v")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("p_sn", lag(col("v"), 7).over(w))
      .withColumn("p_nv", lag(col("v"), 1).over(w))
      .withColumn("p_mean", expr("(sl - v) div nullif(t - 1, 0)"))
    val nn = ser2.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    ser2.join(broadcast(nn), "event_type")
      .filter(col("t") > col("n") - 10 && col("t") >= 8)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_test"),
        expr("CAST(sum(abs(v - p_sn)) div count(1) AS LONG)").as("mae_snaive"),
        expr("CAST(sum(abs(v - p_nv)) div count(1) AS LONG)").as("mae_naive"),
        expr("CAST(sum(abs(v - p_mean)) div count(1) AS LONG)").as("mae_mean"))
      .withColumn("winner",
        expr("""CASE WHEN mae_snaive <= mae_naive AND mae_snaive <= mae_mean
               |     THEN 'snaive'
               |     WHEN mae_naive <= mae_mean THEN 'naive' ELSE 'mean' END"""
          .stripMargin))
      .orderBy(col("event_type"))
  }

  /** q362: index of dispersion (variance-to-mean, Fano factor) of daily
    * event COUNTS per type — the burstiness diagnostic: Poisson traffic
    * has D = 1; D ≫ 1 is bursty (campaign spikes, bot storms — the
    * volume-shape complement to q169's per-user bot heuristics), D ≪ 1
    * is suspiciously regular (rate-limited or synthetic feeds). The
    * number that decides whether a volume anomaly detector can assume
    * Poisson noise.
    *
    * Determinism: D = Var/Mean over counts is ONE integer rational —
    * (n·Σc² − (Σc)²)·10⁶ // (n·Σc) in ppm; verdict thresholds are
    * integer ppm literals.
    *
    * Scale shape: rows collapse map-side to day-count cells
    * (calendar-bounded); the statistic is a per-type rollup. */
  val q362DispersionIndex: Q = Q(
    "q362_dispersion_index",
    """WITH d AS (
      |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |g AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
      |             CAST(sum(c) AS HUGEINT) AS s,
      |             CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS ss
      |      FROM d GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n_days,
      |       CAST(s // n AS BIGINT) AS mean_per_day,
      |       CAST((n * ss - s * s) * 1000000 // (n * s) AS BIGINT) AS d_ppm,
      |       CASE WHEN (n * ss - s * s) * 1000000 // (n * s) > 1500000
      |            THEN 'bursty'
      |            WHEN (n * ss - s * s) * 1000000 // (n * s) < 500000
      |            THEN 'regular' ELSE 'poisson-like' END AS verdict
      |FROM g ORDER BY event_type""".stripMargin) { (s, dir) =>
    val dec38 = "decimal(38,0)"
    val d = Tables(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy(col("event_type"), expr("sec div 86400").as("day"))
      .agg(count(lit(1)).as("c"))
    d.groupBy(col("event_type"))
      .agg(count(lit(1)).cast(dec38).as("n"),
        sum(col("c").cast(dec38)).as("s"),
        sum(col("c").cast(dec38) * col("c")).as("ss"))
      .select(col("event_type"), col("n").cast("long").as("n_days"),
        expr("CAST(s div n AS LONG)").as("mean_per_day"),
        expr("CAST((n * ss - s * s) * 1000000 div (n * s) AS LONG)").as("d_ppm"),
        expr("""CASE WHEN CAST((n * ss - s * s) * 1000000 div (n * s) AS LONG)
               |          > 1500000 THEN 'bursty'
               |     WHEN CAST((n * ss - s * s) * 1000000 div (n * s) AS LONG)
               |          < 500000 THEN 'regular'
               |     ELSE 'poisson-like' END""".stripMargin).as("verdict"))
      .orderBy(col("event_type"))
  }

  /** q364: dynamic time warping distance between the daily-revenue
    * series of every event-type pair — the sequence-similarity measure
    * that Euclidean day-by-day comparison cannot give (a one-day phase
    * shift destroys pointwise distance but barely moves DTW). The
    * pairwise DTW matrix is what series CLUSTERING consumes; at fleet
    * scale the same kernel runs per (pair of series) with each DP
    * strictly local.
    *
    * Exactness: costs are integer cents and the DP is min/+ arithmetic
    * — exact in both engines with NO float anywhere. Both series are
    * pinned to their first 28 days so every pair solves the same 28×28
    * problem.
    *
    * Two genuinely independent implementations under one gate: Spark
    * evaluates the classic O(n·m) rolling-row DP through the custom
    * codegen'd Catalyst expression [[graft.functions.DtwI64]]
    * (`dtw_i64` — the (b) extension tier: the loop inlines into
    * whole-stage codegen, no Row boxing, no closure serialization);
    * the DuckDB oracle executes the SAME recurrence as an
    * anti-diagonal recursion whose working row carries one diagonal as
    * a LIST (plus each cell's left-neighbor cost, so the d−1 diagonal
    * is never needed), with out-of-range list_extract → NULL → BIG
    * handling the DP boundary for free.
    *
    * Scale shape: the row stream collapses to day-grain cells; pair
    * construction is |types|²-bounded; each DP is O(28²) local work. */
  val q364DtwDistance: Q = Q(
    "q364_dtw_distance",
    """WITH RECURSIVE d AS (
      |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2),
      |ser AS (SELECT * FROM (
      |          SELECT event_type, v,
      |                 row_number() OVER (PARTITION BY event_type
      |                                    ORDER BY day) AS t
      |          FROM d) WHERE t <= 28),
      |ok AS (SELECT event_type FROM ser GROUP BY 1 HAVING count(*) = 28),
      |pairs AS (SELECT a.event_type AS ta, b.event_type AS tb
      |          FROM ok a JOIN ok b ON a.event_type < b.event_type),
      |rw AS (SELECT p.ta, p.tb, x.t AS i,
      |              list(abs(x.v - y.v) ORDER BY y.t) AS rowc
      |       FROM pairs p JOIN ser x ON x.event_type = p.ta
      |            JOIN ser y ON y.event_type = p.tb
      |       GROUP BY 1, 2, 3),
      |pm AS (SELECT ta, tb, list(rowc ORDER BY i) AS cmat FROM rw GROUP BY 1, 2),
      |r AS (
      |  SELECT ta, tb, 2 AS dg,
      |         [CAST(cmat[1][1] AS BIGINT)] AS costs,
      |         [CAST(1000000000000000 AS BIGINT)] AS lcs
      |  FROM pm
      |  UNION ALL
      |  SELECT r.ta, r.tb, r.dg + 1,
      |         list_transform(range(1, least(28, r.dg) - greatest(1, r.dg + 1 - 28) + 2),
      |           k -> pm.cmat[CAST(greatest(1, r.dg + 1 - 28) + k - 1 AS INT)]
      |                       [CAST(r.dg + 1 - (greatest(1, r.dg + 1 - 28) + k - 1) AS INT)]
      |                + least(
      |                    coalesce(r.costs[CAST(greatest(1, r.dg + 1 - 28) + k - 1
      |                                          - greatest(1, r.dg - 28) AS INT)],
      |                             1000000000000000),
      |                    coalesce(r.costs[CAST(greatest(1, r.dg + 1 - 28) + k
      |                                          - greatest(1, r.dg - 28) AS INT)],
      |                             1000000000000000),
      |                    coalesce(r.lcs[CAST(greatest(1, r.dg + 1 - 28) + k - 1
      |                                        - greatest(1, r.dg - 28) AS INT)],
      |                             1000000000000000))),
      |         list_transform(range(1, least(28, r.dg) - greatest(1, r.dg + 1 - 28) + 2),
      |           k -> coalesce(r.costs[CAST(greatest(1, r.dg + 1 - 28) + k
      |                                      - greatest(1, r.dg - 28) AS INT)],
      |                         1000000000000000))
      |  FROM r JOIN pm ON pm.ta = r.ta AND pm.tb = r.tb
      |  WHERE r.dg < 56)
      |SELECT ta AS type_a, tb AS type_b, costs[1] AS dtw_cents,
      |       costs[1] // 55 AS per_step_cents
      |FROM r WHERE dg = 56 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val d = Tables(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy(col("event_type"), expr("sec div 86400").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).cast("long").as("v"))
    val ser = d.withColumn("t", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("day"))))
      .filter(col("t") <= 28)
    val arrs = ser.groupBy(col("event_type"))
      .agg(expr("transform(array_sort(collect_list(struct(t, v))), p -> p.v)")
        .as("arr"))
      .filter(size(col("arr")) === 28)
    graft.functions.GraftFunctions.register(s)
    arrs.as("a")
      .join(arrs.as("b"), col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
        expr("dtw_i64(a.arr, b.arr)").as("dtw_cents"))
      .withColumn("per_step_cents", expr("dtw_cents div 55"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** q367: capture–recapture (Lincoln–Petersen) audience estimation —
    * treat each event type's user set as one "capture" and estimate the
    * TOTAL population from every pair: N̂ = n_a·n_b / overlap. The
    * estimator every overlap-based reach model is built on — and
    * because the true distinct-user count is computable here, the
    * output ships estimate AND truth side by side, so the estimator's
    * bias under non-independent captures (the real-world failure mode)
    * is measured, not assumed. Complements q167 (audience overlap) and
    * q185 (reach curve).
    *
    * Determinism: integer counts, one floored rational per pair.
    *
    * Scale shape: rows collapse map-side to (user, type) presence; the
    * pair table is the |types|²-bounded self-join of user-set rollups;
    * truth is one distinct count. */
  val q367CaptureRecapture: Q = Q(
    "q367_capture_recapture",
    """WITH p AS (SELECT DISTINCT user_id, event_type FROM events),
      |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1),
      |ov AS (SELECT a.event_type AS ta, b.event_type AS tb,
      |              CAST(count(*) AS BIGINT) AS m
      |       FROM p a JOIN p b ON b.user_id = a.user_id
      |         AND a.event_type < b.event_type
      |       GROUP BY 1, 2),
      |t AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS truth FROM events)
      |SELECT ov.ta, ov.tb, na.n AS n_a, nb.n AS n_b, ov.m AS overlap,
      |       na.n * nb.n // ov.m AS lp_estimate, t.truth,
      |       (na.n * nb.n // ov.m - t.truth) * 1000000 // t.truth
      |         AS bias_ppm
      |FROM ov JOIN n na ON na.event_type = ov.ta
      |        JOIN n nb ON nb.event_type = ov.tb, t
      |WHERE ov.m > 0
      |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val p = Tables(s, dir, "events")
      .select(col("user_id"), col("event_type")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = p.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val ov = p.as("a").join(p.as("b"),
        col("b.user_id") === col("a.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
      .agg(count(lit(1)).as("m"))
    val t = Tables(s, dir, "events")
      .agg(countDistinct(col("user_id")).as("truth"))
    ov.join(broadcast(n.withColumnRenamed("event_type", "ta")
        .withColumnRenamed("n", "n_a")), "ta")
      .join(broadcast(n.withColumnRenamed("event_type", "tb")
        .withColumnRenamed("n", "n_b")), "tb")
      .crossJoin(broadcast(t))
      .filter(col("m") > 0)
      .select(col("ta"), col("tb"), col("n_a"), col("n_b"),
        col("m").as("overlap"),
        expr("n_a * n_b div m").as("lp_estimate"), col("truth"),
        expr("(n_a * n_b div m - truth) * 1000000 div truth").as("bias_ppm"))
      .orderBy(col("ta"), col("tb"))
  }

  /** q368: retention half-life — the exponential-decay FIT on top of the
    * retention curve (q71 ships the curve; this ships the model): OLS of
    * ln(retention at age a) on a over ages 1–14, with the at-risk
    * denominator correctly censored (a user is observable at age a only
    * if their first day is ≥ a days before the corpus end). Slope →
    * half-life = ln2/(−slope), the single number a growth review quotes.
    *
    * Determinism: each age's ln argument is ONE division of exact
    * integer-cast doubles (actives/at-risk); ln rounds to 9 decimals
    * before the DECIMAL(28,9) moment sums (q335's discipline); the OLS
    * slope surfaces via the ×10⁹-is-integral nano trick (q343's), and
    * the half-life is an integer rational of the slope against the
    * rounded ln2 literal 693147181 nano.
    *
    * Scale shape: rows collapse to (user, age) presence map-side; age
    * cells are ≤14 rows; the fit is cell arithmetic. */
  val q368RetentionHalflife: Q = Q(
    "q368_retention_halflife",
    """WITH e AS (SELECT user_id,
      |                  CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
      |           FROM events),
      |f AS (SELECT user_id, min(day) AS f0 FROM e GROUP BY 1),
      |mx AS (SELECT max(day) AS mxd FROM e),
      |act AS (SELECT DISTINCT e.user_id, e.day - f.f0 AS age
      |        FROM e JOIN f USING (user_id)),
      |ages AS (SELECT unnest(generate_series(1, 14)) AS age),
      |cell AS (SELECT a.age,
      |                CAST((SELECT count(*) FROM act
      |                      WHERE act.age = a.age) AS BIGINT) AS actives,
      |                CAST((SELECT count(*) FROM f, mx
      |                      WHERE f.f0 + a.age <= mx.mxd) AS BIGINT) AS at_risk
      |         FROM ages a),
      |pts AS (SELECT age, actives, at_risk,
      |               actives * 1000000 // at_risk AS r_ppm,
      |               CAST(round(ln(CAST(actives AS DOUBLE)
      |                             / CAST(at_risk AS DOUBLE)), 9)
      |                 AS DECIMAL(28,9)) AS y
      |        FROM cell WHERE actives > 0 AND at_risk > 0),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |             CAST(sum(age) AS BIGINT) AS sx,
      |             CAST(sum(CAST(age AS BIGINT) * age) AS BIGINT) AS sxx,
      |             sum(y) AS sy, sum(age * y) AS sxy
      |      FROM pts),
      |sl AS (SELECT n,
      |              CAST((n * sxy - sx * sy) * 1000000000 AS HUGEINT)
      |                // nullif(n * sxx - sx * sx, 0) AS slope_nano
      |       FROM m)
      |SELECT sl.n AS n_ages, CAST(sl.slope_nano AS BIGINT) AS slope_nano,
      |       CAST(CASE WHEN sl.slope_nano < 0
      |                 THEN CAST(693147181 AS BIGINT) * 1000
      |                      // (0 - sl.slope_nano) END
      |         AS BIGINT) AS half_life_milli,
      |       (SELECT r_ppm FROM pts WHERE age = 1) AS r1_ppm,
      |       (SELECT r_ppm FROM pts WHERE age = 14) AS r14_ppm
      |FROM sl""".stripMargin) { (s, dir) =>
    val dec38 = "decimal(38,0)"
    val e = Tables(s, dir, "events")
      .select(col("user_id"), expr("unix_timestamp(ts) div 86400").as("day"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val f = e.groupBy(col("user_id")).agg(min(col("day")).as("f0"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mx = e.agg(max(col("day")).as("mxd"))
    val act = e.join(f, "user_id")
      .select(col("user_id"), (col("day") - col("f0")).as("age")).distinct()
    val ages = s.range(1, 15).select(col("id").as("age"))
    val actives = act.filter(col("age").between(1, 14))
      .groupBy(col("age")).agg(count(lit(1)).as("actives"))
    val atRisk = f.crossJoin(broadcast(mx)).crossJoin(broadcast(ages))
      .filter(col("f0") + col("age") <= col("mxd"))
      .groupBy(col("age")).agg(count(lit(1)).as("at_risk"))
    val pts = ages.join(actives, Seq("age")).join(atRisk, Seq("age"))
      .filter(col("actives") > 0 && col("at_risk") > 0)
      .select(col("age"),
        expr("actives * 1000000 div at_risk").as("r_ppm"),
        round(log(col("actives").cast("double") / col("at_risk").cast("double")),
          9).cast("decimal(28,9)").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // EVERY integral factor must enter a DECIMAL product NARROW: LongType
    // is decimal(20,0) to the multiply, and (20,0)×(p,9) products exceed
    // precision 38, so Spark silently REDUCES THE SCALE of the product
    // (a ~1e-6 HALF_UP rounding the oracle's exact decimal never has).
    // That applies to age×y here AND to n×sxy / sx×sy / diff×10⁹ in the
    // slope below — the moment sums are therefore re-narrowed to
    // decimal(24,9) (|sxy| ≤ 14·14·|ln ratio| ≪ 10¹⁵), n/sx to
    // decimal(4,0)/decimal(6,0) (≤14 / ≤105), and the numerator to
    // decimal(15,9) (|n·sxy − sx·sy| ≪ 10⁶) before the ×10⁹ shift, so
    // every product stays under precision 38 at scale 9 exactly.
    val m = pts.agg(count(lit(1)).as("n"), sum(col("age")).as("sx"),
      sum(col("age") * col("age")).as("sxx"),
      sum(col("y")).cast("decimal(24,9)").as("sy"),
      sum(col("age").cast("decimal(4,0)") * col("y")).cast("decimal(24,9)")
        .as("sxy"))
    val r1 = pts.filter(col("age") === 1).select(col("r_ppm").as("r1_ppm"))
    val r14 = pts.filter(col("age") === 14).select(col("r_ppm").as("r14_ppm"))
    // r1/r14 join LEFT on a true condition (not crossJoin): an absent age
    // cell (actives=0 at age 1 or 14) must surface as a NULL column on
    // the one slope row — the oracle's scalar subqueries do — not erase
    // the output row the way a crossJoin with an empty frame would.
    m.select(col("n").as("n_ages"),
        expr(s"""CAST(CAST(CAST(CAST(n AS DECIMAL(4,0)) * sxy
                |               - CAST(sx AS DECIMAL(6,0)) * sy
                |            AS DECIMAL(15,9)) * 1000000000 AS $dec38)
                |     div nullif(n * sxx - sx * sx, 0) AS LONG)""".stripMargin)
          .as("slope_nano"))
      .select(col("n_ages"), col("slope_nano"),
        expr("""CAST(CASE WHEN slope_nano < 0
               |          THEN 693147181L * 1000 div (0 - slope_nano) END
               |  AS LONG)""".stripMargin).as("half_life_milli"))
      .join(broadcast(r1), lit(true), "left")
      .join(broadcast(r14), lit(true), "left")
  }

  /** q350: sequential-pattern support ("a then eventually b") — the
    * PrefixSpan-style 2-sequence count that q155's Markov transitions
    * cannot express: Markov counts ADJACENT steps; a sequence pattern
    * holds if ANY a-event precedes ANY later b-event in the user's
    * history, which is what "signup → eventually purchase" funnels mean.
    * Support = users with min_ts(a) strictly before max_ts(b);
    * confidence = support / users-with-a. The a=b diagonal reads as
    * "user repeated the event at a later timestamp" (strictness means
    * two events in the same second do NOT count — documented).
    *
    * Determinism: pure integer counts and one ppm rational; epoch-second
    * grain in both engines.
    *
    * Scale shape: the row stream collapses map-side to the (user, type)
    * profile (≤|types| rows per user); the pair expansion is a per-user
    * self-join bounded by |types|² = 25, never row count; the rollup is
    * pattern-grain. */
  val q350SequentialPatterns: Q = Q(
    "q350_sequential_patterns",
    """WITH p AS (SELECT user_id, event_type,
      |                  CAST(min(floor(epoch(ts))) AS BIGINT) AS mn,
      |                  CAST(max(floor(epoch(ts))) AS BIGINT) AS mx
      |           FROM events GROUP BY 1, 2),
      |na AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_ante
      |       FROM p GROUP BY 1),
      |sup AS (SELECT a.event_type AS antecedent, b.event_type AS consequent,
      |               CAST(count(*) AS BIGINT) AS support
      |        FROM p a JOIN p b ON b.user_id = a.user_id AND a.mn < b.mx
      |        GROUP BY 1, 2)
      |SELECT s.antecedent, s.consequent, s.support, na.n_ante,
      |       s.support * 1000000 // na.n_ante AS confidence_ppm
      |FROM sup s JOIN na ON na.event_type = s.antecedent
      |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val p = Tables(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(unix_timestamp(col("ts"))).as("mn"),
        max(unix_timestamp(col("ts"))).as("mx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val na = p.groupBy(col("event_type")).agg(count(lit(1)).as("n_ante"))
    p.as("a").join(p.as("b"),
        col("b.user_id") === col("a.user_id") && col("a.mn") < col("b.mx"))
      .groupBy(col("a.event_type").as("antecedent"),
        col("b.event_type").as("consequent"))
      .agg(count(lit(1)).as("support"))
      .join(broadcast(na.withColumnRenamed("event_type", "antecedent")),
        "antecedent")
      .select(col("antecedent"), col("consequent"), col("support"),
        col("n_ante"),
        expr("support * 1000000 div n_ante").as("confidence_ppm"))
      .orderBy(col("antecedent"), col("consequent"))
  }

  /** q370: exact Shapley-value channel attribution — the principled
    * upgrade over the rule-based models (q151 last-touch, q325
    * U-shaped): credit each touchpoint channel by its average marginal
    * contribution across ALL orderings of the channel set. With the
    * coalition value v(S) = conversions among users whose touched-channel
    * set ⊆ S (the standard data-driven characteristic function), the
    * 3-channel game {click, view, signup} has 8 coalitions and exact
    * factorial weights: 3!·φ_c = Σ_{S∌c} w(|S|)·(v(S∪{c}) − v(S)) with
    * w(0)=2, w(1)=1, w(2)=2 — pure integers, so efficiency
    * (Σφ = v(full) − v(∅)) holds EXACTLY and ships as an audit column.
    *
    * Determinism: user→mask collapse is a map-side bit-OR; v(S) is an
    * 8×8 subset-sum of integer counts; φ·6 is integer arithmetic; the
    * share divides only at the surface (ppm floor).
    *
    * Scale shape: rows collapse map-side to one (user, mask, conv) row,
    * then to ≤8 mask-count rows; the coalition lattice is a constant
    * 8-row broadcast self-join. Channel-set growth is the only cost
    * driver (2^n coalitions) — n is a modeling choice, never row count. */
  val q370ShapleyAttribution: Q = Q(
    "q370_shapley_attribution",
    """WITH u AS (
      |  SELECT user_id,
      |         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |           + 2 * max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |           + 4 * max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
      |           AS mask,
      |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY 1),
      |mc AS (SELECT mask, CAST(sum(conv) AS BIGINT) AS conversions
      |       FROM u GROUP BY 1),
      |coal AS (SELECT unnest(generate_series(0, 7)) AS s),
      |v AS (SELECT coal.s,
      |             coalesce(CAST(sum(mc.conversions) AS BIGINT), 0) AS v
      |      FROM coal LEFT JOIN mc ON (mc.mask & ~coal.s) = 0
      |      GROUP BY 1),
      |ch AS (SELECT * FROM (VALUES ('click', 1), ('view', 2), ('signup', 4))
      |       AS t(channel, bit)),
      |phi AS (SELECT ch.channel,
      |               CAST(sum((CASE bit_count(sv.s) WHEN 0 THEN 2
      |                         WHEN 1 THEN 1 ELSE 2 END)
      |                        * (vu.v - sv.v)) AS BIGINT) AS phi_x6
      |        FROM ch
      |        JOIN v sv ON (sv.s & ch.bit) = 0
      |        JOIN v vu ON vu.s = (sv.s | ch.bit)
      |        GROUP BY 1),
      |tot AS (SELECT (SELECT v FROM v WHERE s = 7)
      |                 - (SELECT v FROM v WHERE s = 0) AS span)
      |SELECT phi.channel, phi.phi_x6,
      |       CAST(phi.phi_x6 * 1000000 // nullif(6 * tot.span, 0) AS BIGINT)
      |         AS share_ppm,
      |       (SELECT sum(phi_x6) FROM phi) = 6 * tot.span AS efficiency_ok
      |FROM phi, tot
      |ORDER BY phi.channel""".stripMargin) { (s, dir) =>
    val u = Tables(s, dir, "events")
      .groupBy(col("user_id"))
      .agg((max(when(col("event_type") === "click", 1).otherwise(0))
        + max(when(col("event_type") === "view", 1).otherwise(0)) * 2
        + max(when(col("event_type") === "signup", 1).otherwise(0)) * 4)
        .as("mask"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
    val mc = u.groupBy(col("mask")).agg(sum(col("conv")).as("conversions"))
    val coal = s.range(0, 8).select(col("id").cast("int").as("s"))
    val v = coal.join(broadcast(mc), expr("(mask & ~s) = 0"), "left")
      .groupBy(col("s"))
      .agg(coalesce(sum(col("conversions")), lit(0L)).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ch = s.createDataFrame(Seq(("click", 1), ("view", 2), ("signup", 4)))
      .toDF("channel", "bit")
    val phi = broadcast(ch)
      .join(v.select(col("s"), col("v").as("vs")), expr("(s & bit) = 0"))
      .join(broadcast(v.select(col("s").as("su"), col("v").as("vu"))),
        expr("su = (s | bit)"))
      .groupBy(col("channel"))
      .agg(sum(expr("""(CASE bit_count(s) WHEN 0 THEN 2
                      |WHEN 1 THEN 1 ELSE 2 END) * (vu - vs)""".stripMargin))
        .as("phi_x6"))
    val tot = v.filter(col("s") === 7).select(col("v").as("vfull"))
      .crossJoin(broadcast(v.filter(col("s") === 0).select(col("v").as("vempty"))))
      .select((col("vfull") - col("vempty")).as("span"))
    val phiSum = phi.agg(sum(col("phi_x6")).as("phi_total"))
    phi.crossJoin(broadcast(tot)).crossJoin(broadcast(phiSum))
      .select(col("channel"), col("phi_x6"),
        expr("CAST(phi_x6 * 1000000 div nullif(6 * span, 0) AS LONG)")
          .as("share_ppm"),
        (col("phi_total") === col("span") * 6).as("efficiency_ok"))
      .orderBy(col("channel"))
  }

  /** q380: journey entropy rate — how PREDICTABLE is the next event
    * given the current one: the conditional entropy H(next | current)
    * per from-state over q155's session-aware transition table (30-min
    * gaps re-anchor at '<start>', q155's device), plus the overall rate
    * Σ_ij (n_ij/N)·ln(n_i/n_ij) as a '<overall>' row. Low state entropy
    * means a deterministic flow (good for next-action prefetch, bad for
    * exploration); the overall rate is the sequence-compressibility
    * number a journey model's log-loss cannot beat.
    *
    * Determinism: every ln takes an exact integer-rational double; each
    * term rounds to 9 decimals before the DECIMAL(28,9) sums (q348's
    * discipline); entropies surface as nano integers.
    *
    * Scale shape: the transition table is |types+1|² cells built by one
    * per-user ordered window (user-partitioned, q155's shape); both
    * entropy rollups are cell arithmetic. */
  val q380EntropyRate: Q = Q(
    "q380_entropy_rate",
    """WITH m AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         lag(event_type) OVER w AS prev_type,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS is_start
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |tr AS (SELECT CASE WHEN is_start = 1 THEN '<start>' ELSE prev_type END
      |                AS from_type,
      |              event_type AS to_type, CAST(count(*) AS BIGINT) AS n
      |       FROM m GROUP BY 1, 2),
      |f AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS nf FROM tr GROUP BY 1),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM tr),
      |hs AS (SELECT tr.from_type, f.nf,
      |              CAST(sum(CAST(round(
      |                  (CAST(tr.n AS DOUBLE) / CAST(f.nf AS DOUBLE))
      |                    * ln(CAST(f.nf AS DOUBLE) / CAST(tr.n AS DOUBLE)),
      |                  9) AS DECIMAL(28,9))) * 1000000000 AS BIGINT)
      |                AS h_nano
      |       FROM tr JOIN f USING (from_type) GROUP BY 1, 2),
      |ov AS (SELECT CAST(sum(CAST(round(
      |                 (CAST(tr.n AS DOUBLE) / CAST(t.nt AS DOUBLE))
      |                   * ln(CAST(f.nf AS DOUBLE) / CAST(tr.n AS DOUBLE)),
      |                 9) AS DECIMAL(28,9))) * 1000000000 AS BIGINT) AS h_nano,
      |              (SELECT nt FROM t) AS nf
      |       FROM tr JOIN f USING (from_type), t)
      |SELECT from_type, nf AS n_trans, h_nano FROM hs
      |UNION ALL SELECT '<overall>', nf, h_nano FROM ov
      |ORDER BY from_type""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val tr = Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        lag(col("ts"), 1).over(w).as("prev_ts"))
      .select(
        when(col("prev_ts").isNull ||
          col("ts") >= col("prev_ts") + expr("INTERVAL 30 MINUTES"),
          lit("<start>")).otherwise(col("prev_type")).as("from_type"),
        col("event_type").as("to_type"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .persist(MEMORY_AND_DISK)
    val f = tr.groupBy(col("from_type")).agg(sum(col("n")).as("nf"))
    val t = tr.agg(sum(col("n")).as("nt"))
    val joined = tr.join(broadcast(f), "from_type").persist(MEMORY_AND_DISK)
    def term(den: String): org.apache.spark.sql.Column =
      (sum(round((col("n").cast("double") / col(den).cast("double"))
        * log(col("nf").cast("double") / col("n").cast("double")), 9)
        .cast("decimal(28,9)")) * 1000000000L).cast("long").as("h_nano")
    val hs = joined.groupBy(col("from_type"), col("nf")).agg(term("nf"))
      .select(col("from_type"), col("nf").as("n_trans"), col("h_nano"))
    val ov = joined.crossJoin(broadcast(t)).agg(term("nt"))
      .crossJoin(broadcast(t))
      .select(lit("<overall>").as("from_type"), col("nt").as("n_trans"),
        col("h_nano"))
    hs.unionAll(ov).orderBy(col("from_type"))
  }

  val all: Seq[Q] =
    Seq(q20Json, q21Tumbling, q22Sessionize, q23Funnel, q24AsofJoin, q315KaplanMeier,
      q370ShapleyAttribution, q380EntropyRate,
      q339LjungBox, q340EwmaControl, q349SeasonalStrength, q350SequentialPatterns,
      q352Pacf, q357BinarySeg, q358ForecastBacktest, q362DispersionIndex,
      q364DtwDistance, q367CaptureRecapture, q368RetentionHalflife,
      q46Sliding, q60AsofCustom, q71RetentionCohorts, q90RollingActive,
      q107Scd2History, q111ForwardFill, q113Scd2Incremental, q129RateLimit,
      q131CusumChangepoint, q137TimeWeighted, q145MissingDays, q146LiftAudit,
      q151Attribution, q155MarkovTransitions, q157CohortLtv, q165SeasonalNaive,
      q271HoltForecast, q276AcfDaily, q285DecayedEngagement, q289TheilSen,
      q298DisorderProfile, q302RestatementAudit, q306SeasonalDecompose,
      q307SeasonalAnomaly, q325PositionAttribution, q326HoltWinters,
      q327ConformalInterval, q328SequenceMatch,
      q169BotDetection, q170DoubleCharge, q171TimeToConvert, q177Conformance,
      q180JourneyPaths, q181ChurnDetection, q182PurchaseCadence, q185ReachCurve,
      q191PointInTime, q192IdGapDetection, q193WowChange, q194MaxDrawdown,
      q196WeeklyTrending, q197ActivityHeatmap, q198RfmSegmentation,
      q199RatioToReport, q201BounceRate, q202PathLength, q208SessionValue,
      q209SeasonalityIndex, q210PeakDays, q214Regularity, q216GrowthAccounting,
      q218BehaviorDiversity, q231TopMovers)
}
