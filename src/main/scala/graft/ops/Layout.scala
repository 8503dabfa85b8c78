package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout operators: the Z-order (Morton) clustering key that makes
  * multi-dimensional min/max file skipping work at 100 TB.
  *
  * Why this is an *operator* and not a config knob: a parquet lake prunes
  * files by per-file column min/max. Sorting by one column gives perfect
  * pruning on that column and none on any other; interleaving the bits of
  * two (or more) columns into one sort key gives every file a tight
  * bounding BOX in both dimensions, so a predicate on EITHER column (or a
  * box on both) skips most files. The write path is then just
  * `repartitionByRange(zval)` + `sortWithinPartitions(zval)` — range
  * partitioning on the Morton key IS the clustering step, and Spark's
  * range partitioner (sampled bounds) handles skew in z-space.
  *
  * The bit-interleave is plain 64-bit integer arithmetic (shift / mask /
  * multiply-add), identical in Spark and DuckDB — engine-portable by
  * construction, codegen'd, no UDF.
  */
object Layout {

  private val Bits = 8

  /** zval = interleave(low 8 bits of p, low 8 bits of s): bit i of p at
    * position 2i, bit i of s at position 2i+1. */
  private def zInterleave(p: Column, s: Column): Column =
    (0 until Bits).map { i =>
      shiftright(p, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(s, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  private[ops] def zval(p: Column, s: Column): Column =
    zInterleave(p.bitwiseAND(lit(255L)), s.bitwiseAND(lit(255L)))

  private val duckZTerms: String =
    (0 until Bits).map { i =>
      s"((p >> $i) & 1) * ${1L << (2 * i)} + ((s >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  /** q81: the locality witness for the Z-order key. Bucket lineitem rows by
    * the top 8 bits of zval(l_partkey, l_suppkey) — i.e. contiguous
    * z-ranges, exactly what `repartitionByRange` would put in one file —
    * and report each bucket's bounding box in BOTH dimensions. Every
    * bucket's box spans ≤ 1/16 of each dimension's range (the top 8 z-bits
    * are the top 4 bits of each key), which is the file-skipping guarantee:
    * a point predicate on either key can touch at most 16 of the 256
    * buckets. A single-column sort gives span 255 on the other dimension.
    *
    * Scale shape: one map-side-combining aggregate on a derived 1-byte
    * key — linear, one shuffle of 256×6 longs per partition. */
  val q81ZOrder: Q = Q(
    "q81_zorder_layout",
    s"""WITH ps AS (SELECT l_partkey & 255 AS p, l_suppkey & 255 AS s FROM lineitem),
       |z AS (SELECT p, s, $duckZTerms AS zval FROM ps)
       |SELECT zval >> 8 AS zbucket, count(*) AS n,
       |       min(p) AS p_min, max(p) AS p_max,
       |       min(s) AS s_min, max(s) AS s_max
       |FROM z GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val ps = Tables(s, dir, "lineitem").select(
      col("l_partkey").bitwiseAND(lit(255L)).as("p"),
      col("l_suppkey").bitwiseAND(lit(255L)).as("s"))
    ps.withColumn("zval", zInterleave(col("p"), col("s")))
      .groupBy(shiftright(col("zval"), 8).as("zbucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col("p")).as("p_min"), max(col("p")).as("p_max"),
        min(col("s")).as("s_min"), max(col("s")).as("s_max"))
      .orderBy(col("zbucket"))
  }

  /** q124: zone-map file-skipping audit — the measurable payoff of q81's
    * Z-order layout. Each z-bucket's (min,max) box in both dimensions is
    * the zone map a parquet footer would carry; three probe predicates
    * (a point on p, a point on s, a box on both) are then evaluated TWICE:
    * against the zone maps (buckets that COULD contain a match → rows the
    * engine must scan) and against the rows (true matches). The output —
    * buckets hit / rows scanned / rows matched per probe — is the skipping
    * ratio a lakehouse table-format reports, computed as a first-class
    * query. The q81 guarantee makes both point probes touch ≤ 16 of 256
    * buckets; a 1-D sort on p would give s-probes nothing to skip.
    *
    * Scale shape: the zone table is one map-side-combining aggregate (256
    * rows); probes are a 3-row broadcast on BOTH legs; the true-match leg
    * is a second linear scan with the probe predicate applied map-side.
    * Nothing is quadratic; the audit costs two scans regardless of probe
    * count. */
  val q124ZoneMapAudit: Q = {
    val duckProbes =
      """probes(probe, plo, phi, slo, shi) AS (VALUES
        |  ('p_point', CAST(17 AS BIGINT), CAST(17 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
        |  ('s_point', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(7 AS BIGINT), CAST(7 AS BIGINT)),
        |  ('box', CAST(32 AS BIGINT), CAST(47 AS BIGINT), CAST(96 AS BIGINT), CAST(111 AS BIGINT)))""".stripMargin
    Q("q124_zonemap_audit",
      s"""WITH ps AS (SELECT l_partkey & 255 AS p, l_suppkey & 255 AS s FROM lineitem),
         |z AS (SELECT ($duckZTerms) >> 8 AS zbucket,
         |             count(*) AS n, min(p) AS p_min, max(p) AS p_max,
         |             min(s) AS s_min, max(s) AS s_max
         |      FROM ps GROUP BY 1),
         |$duckProbes,
         |hit AS (
         |  SELECT probe, count(*) AS buckets_hit, CAST(sum(n) AS BIGINT) AS rows_scanned
         |  FROM z JOIN probes
         |    ON (plo IS NULL OR p_max >= plo) AND (phi IS NULL OR p_min <= phi)
         |   AND (slo IS NULL OR s_max >= slo) AND (shi IS NULL OR s_min <= shi)
         |  GROUP BY probe),
         |mt AS (
         |  SELECT probe, count(*) AS rows_matched
         |  FROM ps JOIN probes
         |    ON (plo IS NULL OR p >= plo) AND (phi IS NULL OR p <= phi)
         |   AND (slo IS NULL OR s >= slo) AND (shi IS NULL OR s <= shi)
         |  GROUP BY probe),
         |tot AS (SELECT count(*) AS buckets_total, CAST(sum(n) AS BIGINT) AS rows_total FROM z)
         |SELECT pr.probe, buckets_total, coalesce(buckets_hit, 0) AS buckets_hit,
         |       rows_total, coalesce(rows_scanned, 0) AS rows_scanned,
         |       coalesce(rows_matched, 0) AS rows_matched
         |FROM probes pr
         |LEFT JOIN hit ON pr.probe = hit.probe
         |LEFT JOIN mt ON pr.probe = mt.probe, tot
         |ORDER BY pr.probe""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ps = Tables(s, dir, "lineitem").select(
        col("l_partkey").bitwiseAND(lit(255L)).as("p"),
        col("l_suppkey").bitwiseAND(lit(255L)).as("s"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val z = ps.groupBy(shiftright(zInterleave(col("p"), col("s")), 8).as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("p")).as("p_min"), max(col("p")).as("p_max"),
          min(col("s")).as("s_min"), max(col("s")).as("s_max"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val probes = Seq(
        ("p_point", Some(17L), Some(17L), None: Option[Long], None: Option[Long]),
        ("s_point", None: Option[Long], None: Option[Long], Some(7L), Some(7L)),
        ("box", Some(32L), Some(47L), Some(96L), Some(111L)))
        .toDF("probe", "plo", "phi", "slo", "shi")
      def ge(bound: String, v: Column) = col(bound).isNull || v >= col(bound)
      def le(bound: String, v: Column) = col(bound).isNull || v <= col(bound)
      val hit = z.join(broadcast(probes),
          ge("plo", col("p_max")) && le("phi", col("p_min")) &&
            ge("slo", col("s_max")) && le("shi", col("s_min")))
        .groupBy(col("probe"))
        .agg(count(lit(1)).as("buckets_hit"), sum(col("n")).as("rows_scanned"))
      val mt = ps.join(broadcast(probes),
          ge("plo", col("p")) && le("phi", col("p")) &&
            ge("slo", col("s")) && le("shi", col("s")))
        .groupBy(col("probe")).agg(count(lit(1)).as("rows_matched"))
      val tot = z.agg(count(lit(1)).as("buckets_total"),
        sum(col("n")).as("rows_total"))
      probes.select(col("probe"))
        .join(hit, Seq("probe"), "left")
        .join(mt, Seq("probe"), "left")
        .crossJoin(broadcast(tot))
        .select(col("probe"), col("buckets_total"),
          coalesce(col("buckets_hit"), lit(0L)).as("buckets_hit"),
          col("rows_total"),
          coalesce(col("rows_scanned"), lit(0L)).as("rows_scanned"),
          coalesce(col("rows_matched"), lit(0L)).as("rows_matched"))
        .orderBy(col("probe"))
    }
  }

  /** q141: ANALYZE-style column statistics — the optimizer-stats
    * collection pass (row count, null count, EXACT ndv, min/max) for four
    * orders columns in ONE scan. Multiple `count(distinct col)` in a
    * single aggregate is planned by Spark as an Expand (one row per
    * distinct-column per input row) with partial aggregation — the same
    * single-pass shape `ANALYZE TABLE .. FOR COLUMNS` uses, except exact
    * instead of HLL. The 1-row result then explodes into one row per
    * column. min/max are taken on the native type and cast to string
    * AFTER aggregation (bigint→string formatting is identical across
    * engines; double→string is not, so only keys/strings are profiled).
    *
    * Scale: one scan + Expand ×4; the shuffle carries (column, value)
    * partials already combined map-side. The alternative — one agg per
    * column — is four full scans of a 100 TB table. */
  val q141ColumnStats: Q = Q(
    "q141_column_stats",
    """WITH s AS (
      |  SELECT count(*) AS n,
      |         count(o_orderkey) AS nn1, count(DISTINCT o_orderkey) AS ndv1,
      |         CAST(min(o_orderkey) AS VARCHAR) AS mn1, CAST(max(o_orderkey) AS VARCHAR) AS mx1,
      |         count(o_custkey) AS nn2, count(DISTINCT o_custkey) AS ndv2,
      |         CAST(min(o_custkey) AS VARCHAR) AS mn2, CAST(max(o_custkey) AS VARCHAR) AS mx2,
      |         count(o_orderstatus) AS nn3, count(DISTINCT o_orderstatus) AS ndv3,
      |         CAST(min(o_orderstatus) AS VARCHAR) AS mn3, CAST(max(o_orderstatus) AS VARCHAR) AS mx3,
      |         count(o_orderpriority) AS nn4, count(DISTINCT o_orderpriority) AS ndv4,
      |         CAST(min(o_orderpriority) AS VARCHAR) AS mn4, CAST(max(o_orderpriority) AS VARCHAR) AS mx4
      |  FROM orders)
      |SELECT 'o_orderkey' AS column_name, n AS n_rows, n - nn1 AS n_null,
      |       ndv1 AS ndv, mn1 AS min_s, mx1 AS max_s FROM s
      |UNION ALL
      |SELECT 'o_custkey', n, n - nn2, ndv2, mn2, mx2 FROM s
      |UNION ALL
      |SELECT 'o_orderstatus', n, n - nn3, ndv3, mn3, mx3 FROM s
      |UNION ALL
      |SELECT 'o_orderpriority', n, n - nn4, ndv4, mn4, mx4 FROM s
      |ORDER BY column_name""".stripMargin) { (s, dir) =>
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val aggs = count(lit(1)).as("n") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"ndv_$c"),
      min(col(c)).cast("string").as(s"mn_$c"),
      max(col(c)).cast("string").as(s"mx_$c")))
    Tables(s, dir, "orders")
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column_name"), col("n").as("n_rows"),
        (col("n") - col(s"nn_$c")).as("n_null"), col(s"ndv_$c").as("ndv"),
        col(s"mn_$c").as("min_s"), col(s"mx_$c").as("max_s"))): _*)).as("st"))
      .select(col("st.*"))
      .orderBy(col("column_name"))
  }

  /** q142: equi-depth histogram build — the other half of optimizer
    * statistics (q141 profiles columns; this bins a measure into 8
    * equal-row buckets, the histogram the optimizer's selectivity
    * estimates read). Exact and scale-safe despite the near-unique
    * key space: rows reduce to (value, count) levels, the global ordered
    * cumulative is the q135 two-phase form (coarse value buckets → tiny
    * ordered window over ~bucket sums for offsets, within-bucket
    * cumulative PARTITIONED by bucket — no global single-partition
    * window ever forms), and a level's bucket is `(cum_end−1)·8 div n`
    * (integer division in both engines — float division could land an
    * exactly-divisible boundary in the wrong bucket). */
  val q142EquidepthHist: Q = Q(
    "q142_equidepth_hist",
    """WITH lv AS (
      |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v, count(*) AS c
      |  FROM orders GROUP BY 1),
      |bk AS (SELECT CAST(floor(v / 500000.0) AS BIGINT) AS b, v, c FROM lv),
      |bs AS (SELECT b, sum(c) AS s FROM bk GROUP BY 1),
      |off AS (SELECT b, sum(s) OVER (ORDER BY b) - s AS o FROM bs),
      |cum AS (
      |  SELECT v, c, o + sum(c) OVER (PARTITION BY bk.b ORDER BY v) AS ce
      |  FROM bk JOIN off USING (b)),
      |t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM lv)
      |SELECT CAST((ce - 1) * 8 // t.n AS BIGINT) AS bucket,
      |       min(v) AS lo_cents, max(v) AS hi_cents,
      |       CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_values
      |FROM cum CROSS JOIN t
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val lv = Tables(s, dir, "orders")
      .groupBy(round(col("o_totalprice") * 100).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
      .withColumn("b", floor(col("v") / 500000.0))
    val bs = lv.groupBy(col("b")).agg(sum(col("c")).as("s"))
    val off = bs.select(col("b"),
      (sum(col("s")).over(Window.orderBy(col("b"))) - col("s")).as("o"))
    val cum = lv.join(off, "b")
      .select(col("v"), col("c"),
        (col("o") + sum(col("c"))
          .over(Window.partitionBy(col("b")).orderBy(col("v")))).as("ce"))
    val t = lv.agg(sum(col("c")).cast("long").as("n"))
    cum.crossJoin(broadcast(t))
      .groupBy(expr("(ce - 1) * 8 div n").cast("long").as("bucket"))
      .agg(min(col("v")).as("lo_cents"), max(col("v")).as("hi_cents"),
        sum(col("c")).cast("long").as("n_rows"), count(lit(1)).as("n_values"))
      .orderBy(col("bucket"))
  }

  val all: Seq[Q] = Seq(q81ZOrder, q124ZoneMapAudit, q141ColumnStats,
    q142EquidepthHist)
}
