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

  val all: Seq[Q] = Seq(q81ZOrder, q124ZoneMapAudit)
}
