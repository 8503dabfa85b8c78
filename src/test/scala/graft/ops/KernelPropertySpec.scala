package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Randomized cross-checks: the scale-shaped kernels (two-phase dense
  * ranks, bucket-decomposed nearest join, rank-sum Gini, running-max
  * island merge) against straight-line Scala brute force on the same
  * generated fixture. Five seeds each — the point is shape coverage
  * (duplicate values, cross-bucket boundaries, singleton groups), not
  * volume; the DuckDB oracle gate covers the real tables.
  */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("q150 dense ids equal the sorted index for arbitrary id sets") {
    (1 to 5).foreach { seed =>
      val rnd = new Random(seed)
      // Sparse, duplicate-free, crosses many div-64 buckets incl. empties.
      val ids = rnd.shuffle((0 until 5000).map(_.toLong))
        .take(300 + rnd.nextInt(200)).distinct
      val dir = tmp(s"dense$seed")
      ids.toDF("doc_id").write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val got = Training.q150DenseIds.fn(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val want = ids.sorted.zipWithIndex.map { case (id, i) => (id, i.toLong) }
      assert(got.toSeq == want)
    }
  }

  test("q152 nearest join matches brute force across bucket boundaries") {
    (1 to 5).foreach { seed =>
      val rnd = new Random(seed)
      val dir = tmp(s"near$seed")
      // Prices straddle the 100000-cent bucket width; far-apart probes
      // exercise the cross-bucket carries.
      val parts = (1 to 30).map(i =>
        (i.toLong, (rnd.nextInt(4000000) + 1) / 100.0))
      val orders = (1 to 80).map(i =>
        (i.toLong, (rnd.nextInt(5000000) + 1) / 100.0))
      parts.toDF("p_partkey", "p_retailprice").write.mode("overwrite")
        .parquet(s"$dir/part.parquet")
      orders.toDF("o_orderkey", "o_totalprice").write.mode("overwrite")
        .parquet(s"$dir/orders.parquet")
      val got = Intervals.q152NearestJoin.fn(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // Brute force over ref LEVELS (min key per price), probe levels.
      val refs = parts.groupBy(p => Math.round(p._2 * 100))
        .map { case (pv, ps) => pv -> ps.map(_._1).min }.toSeq.sortBy(_._1)
      val want = orders.map(o => Math.round(o._2 * 100)).distinct.sorted.map { ov =>
        val best = refs.map { case (pv, k) =>
          (Math.abs(pv - ov), pv, k)
        }.min // min dist, then LOWER price, then lower key
        (ov, best._2, best._3, best._1)
      }
      assert(got.toSeq == want)
    }
  }

  test("q164 gini matches the O(n log n) rank-sum definition") {
    (1 to 5).foreach { seed =>
      val rnd = new Random(seed)
      val dir = tmp(s"gini$seed")
      // Heavy duplication so tied totals exercise the shared rank series.
      val orders = (1 to 120).map(i =>
        (i.toLong, (1 + rnd.nextInt(25)).toLong, (rnd.nextInt(40) + 1) * 25.0))
      orders.toDF("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val row = Extended.q164GiniConcentration.fn(spark, dir).collect()(0)
      val totals = orders.groupBy(_._2)
        .map { case (_, os) => os.map(o => Math.round(o._3 * 100)).sum }
        .toSeq.sorted
      val n = totals.size.toLong
      val s0 = totals.map(BigInt(_)).sum
      // Ties averaged via the shared arithmetic series == sorted-index sum.
      val s1 = totals.zipWithIndex.map { case (v, i) => BigInt(v) * (i + 1) }.sum
      val gini = (BigInt(2) * s1 - BigInt(n + 1) * s0) * 1000000 / (BigInt(n) * s0)
      assert(row.getLong(0) == n && row.getLong(1) == s0.toLong &&
        row.getLong(2) == gini.toLong)
    }
  }

  test("q139 islands match brute-force interval merging") {
    (1 to 5).foreach { seed =>
      val rnd = new Random(seed)
      val dir = tmp(s"isl$seed")
      val evs = (1 to 100).map(_ =>
        ((1 + rnd.nextInt(4)).toLong, rnd.nextInt(5000).toLong))
      evs.toDF("user_id", "sec")
        .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = Intervals.q139IntervalCoalesce.fn(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val want = evs.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (u, es) =>
        val iv = es.map(_._2).sorted.map(s => (s, s + 600))
        val merged = iv.foldLeft(Vector.empty[(Long, Long, Long)]) {
          case (acc, (lo, hi)) => acc.lastOption match {
            case Some((s, e, n)) if lo <= e =>
              acc.init :+ ((s, math.max(e, hi), n + 1))
            case _ => acc :+ ((lo, hi, 1L))
          }
        }
        merged.map { case (s, e, n) => (u, s, e, n) }
      }
      assert(got.toSeq == want)
    }
  }
}
