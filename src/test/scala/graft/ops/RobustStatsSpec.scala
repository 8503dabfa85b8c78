package graft.ops

import java.nio.file.Paths

import graft.SparkSpec
import org.scalatest.BeforeAndAfterAll

/** Brute-force cross-checks for the round-5 statistics operators: the
  * registered query functions run against planted parquet fixtures and are
  * compared with straightforward in-memory computations. */
class RobustStatsSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val dir = Paths.get("target", "tmp", "statsfix").toAbsolutePath.toString
  private val rnd = new scala.util.Random(20260813)

  // lineitem fixture: 2 groups, integer-ish prices with planted outliers.
  private val rows: Seq[(String, Double, Double)] =
    (1 to 400).map { i =>
      val grp = if (i % 2 == 0) "A" else "B"
      val qty = (rnd.nextInt(50) + 1).toDouble
      val price = if (i % 97 == 0) 90000.00 else (rnd.nextInt(10000) + 100) / 100.0 * 100
      (grp, qty, price)
    }

  override def beforeAll(): Unit = {
    super.beforeAll()
    rows.toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // events fixture for q90: ts in nanos (Tables converts), 3 users over 3 weeks.
    def ns(day: Int): Long = (1704067200L + day * 86400L) * 1000000000L
    val evs = for {
      day <- 0 until 21
      user <- 1 to 3
      if (user + day) % user == 0 || day % (user + 1) == 0
    } yield ((day * 10 + user).toLong, ns(day), user.toLong, "click", 1.0, "{}")
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("q88 moments match direct two-pass computation") {
    val got = Extended.q88MomentStats.fn(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    rows.groupBy(_._1).foreach { case (grp, g) =>
      val xs = g.map(_._2)
      val n = xs.size.toDouble
      val mean = xs.sum / n
      val variance = xs.map(x => (x - mean) * (x - mean)).sum / n
      val skew = (xs.map(x => math.pow(x - mean, 3)).sum / n) / math.pow(variance, 1.5)
      val (gn, gm, gv, gs) = got(grp)
      assert(gn === xs.size.toLong)
      assert(math.abs(gm - mean) < 5e-4, s"$grp mean")
      assert(math.abs(gv - variance) < 5e-2, s"$grp variance got $gv want $variance")
      assert(math.abs(gs - skew) < 5e-3, s"$grp skew got $gs want $skew")
    }
  }

  test("q89 winsorized stats match a sort-and-clip reference") {
    val got = Extended.q89Winsorized.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    rows.groupBy(_._1).foreach { case (grp, g) =>
      val xs = g.map(_._3).sorted
      val n = xs.size
      def pct(q: Double): Double = xs(math.ceil(q * n).toInt - 1)
      val (p05, p95) = (pct(0.05), pct(0.95))
      val clipped = xs.map(x => math.max(p05, math.min(p95, x)))
      val r = got(grp)
      assert(r.getDouble(2) === p05, s"$grp p05")
      assert(r.getDouble(3) === p95, s"$grp p95")
      assert(r.getLong(4) === xs.count(_ < p05).toLong, s"$grp n_low")
      assert(r.getLong(5) === xs.count(_ > p95).toLong, s"$grp n_high")
      assert(math.abs(r.getDouble(6) - clipped.sum / n) < 1e-3, s"$grp wins_mean")
    }
  }

  test("q90 rolling 7-day actives match brute-force window counting") {
    val got = Events.q90RollingActive.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Brute force over the fixture's (user, epoch-day) pairs.
    val base = 1704067200L / 86400
    val pairs = (for {
      day <- 0 until 21
      user <- 1 to 3
      if (user + day) % user == 0 || day % (user + 1) == 0
    } yield (user, base + day)).distinct
    val dmin = pairs.map(_._2).min
    val dmax = pairs.map(_._2).max
    val want = (dmin + 6 to dmax).map { wend =>
      wend -> pairs.filter(p => p._2 > wend - 7 && p._2 <= wend).map(_._1).distinct.size.toLong
    }.toMap
    assert(got === want)
  }
}
