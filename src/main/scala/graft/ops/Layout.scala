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

  val all: Seq[Q] = Seq(q81ZOrder)
}
