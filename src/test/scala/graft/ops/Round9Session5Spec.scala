package graft.ops

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

/** Random-data references for the round-9 session-5 kernels: the oracle
  * gate proves Spark ≡ DuckDB on the driver fixtures; these prove the
  * SEMANTICS against independent Scala implementations on seeded random
  * inputs chosen to stress what the fixtures don't — heavy ties
  * (Spearman's whole reason to exist), gap-heavy calendars (the HW
  * seasonal queue), and dense multi-click paths (the U-shape's m≥3
  * branch and its credit-conservation invariant).
  */
class Round9Session5Spec extends SparkSpec {

  test("q313 Spearman: engine == BigInt reference on tie-heavy random data") {
    import spark.implicits._
    for (seed <- Seq(5, 31)) {
      val rnd = new scala.util.Random(seed)
      // One lineitem row per order; tiny value domains force heavy ties.
      val rows = (1L to 200L).map(o =>
        (o, (1 + rnd.nextInt(8)).toDouble, (10 + rnd.nextInt(40)).toDouble))
      val dir = Files.createTempDirectory("graft-sp-").toString
      rows.toDF("l_orderkey", "l_quantity", "l_extendedprice")
        .write.parquet(s"$dir/lineitem.parquet")
      val got = Extended.q313Spearman.fn(spark, dir).collect()(0)
      // Reference: doubled tied ranks (2·less + ties + 1), centered by
      // n+1; Pearson on those integer ranks in BigInt.
      val xs = rows.map(r => r._2.toLong)
      val ys = rows.map(r => Math.round(r._3 * 100))
      val n = rows.length
      def centered(vs: Seq[Long]): Seq[BigInt] = {
        val less = vs.groupBy(identity).view
          .mapValues(_ => 0).keys.toSeq.sorted
          .foldLeft((Map.empty[Long, (Long, Long)], 0L)) { case ((m, acc), v) =>
            val ties = vs.count(_ == v).toLong
            (m + (v -> (acc, ties)), acc + ties)
          }._1
        vs.map { v =>
          val (l, t) = less(v)
          BigInt(2 * l + t + 1 - (n + 1))
        }
      }
      val (cx, cy) = (centered(xs), centered(ys))
      val num = cx.zip(cy).map { case (a, b) => a * b }.sum
      val dx = cx.map(a => a * a).sum
      val dy = cy.map(a => a * a).sum
      assert(got.getLong(0) == n.toLong)
      assert(got.getLong(1) == num.toLong, s"num seed $seed")
      assert(got.getLong(2) == dx.toLong && got.getLong(3) == dy.toLong)
      assert(got.getLong(4) == num.signum.toLong)
      assert(got.getLong(5) == (num * num * 1000000 / (dx * dy)).toLong)
      assert(got.getBoolean(6) ==
        (num * num * 1000000 / (dx * dy) * (n - 1) > 3841459))
    }
  }

  test("q326 Holt-Winters: engine fold == imperative reference (gap-heavy calendar)") {
    import spark.implicits._
    for (seed <- Seq(13, 29)) {
      val rnd = new scala.util.Random(seed)
      val rows = for { t <- Seq("a", "b"); _ <- 1 to 150 } yield {
        val day = 19000L + rnd.nextInt(45) // gaps guaranteed
        val sec = day * 86400L + rnd.nextInt(86400)
        (new Timestamp(sec * 1000L), t, rnd.nextInt(100000) / 100.0)
      }
      val dir = Files.createTempDirectory("graft-hw-").toString
      rows.toDF("ts", "event_type", "value").write.parquet(s"$dir/events.parquet")
      val got = Events.q326HoltWinters.fn(spark, dir).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))).toMap
      def r6(x: Double): Double =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val want = rows.groupBy(_._2).map { case (t, rs) =>
        val daily = rs.groupBy(r => r._1.getTime / 1000L / 86400L)
          .map { case (d, xs) => d -> xs.map(x => Math.round(x._3 * 100)).sum }
          .toSeq.sortBy(_._1).map(_._2.toDouble)
        var l = daily.head; var b = 0.0
        var s = Vector.fill(7)(0.0)
        daily.tail.foreach { v =>
          val lnew = 0.5 * (v - s(0)) + 0.5 * (l + b)
          val bnew = 0.5 * (lnew - l) + 0.5 * b
          s = s.drop(1) :+ (0.5 * (v - lnew) + 0.5 * s(0))
          l = lnew; b = bnew
        }
        t -> ((daily.length.toLong, r6(l), r6(b),
          r6(l + b + s(0)), r6(l + 7 * b + s(6))))
      }
      assert(got == want, s"seed $seed")
    }
  }

  test("q315 KM: exp(engine log-survival) == the classic product estimator") {
    import spark.implicits._
    for (seed <- Seq(3, 47)) {
      val rnd = new scala.util.Random(seed)
      val base = 19000L * 86400L
      // Customers with 1-6 orders spread over ~60 weeks; the late tail is
      // censored by the 90-day rule.
      val rows = (1L to 120L).flatMap { cid =>
        val n = 1 + rnd.nextInt(6)
        (1 to n).map(_ => (cid,
          new Timestamp((base + rnd.nextInt(420) * 86400L) * 1000L)))
      }
      val dir = Files.createTempDirectory("graft-km-").toString
      rows.toDF("o_custkey", "o_orderdate").write.parquet(s"$dir/orders.parquet")
      val got = Events.q315KaplanMeier.fn(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(5)))
      // Reference: risk sets and the product-form estimator in doubles.
      val days = rows.map(r => (r._1, r._2.getTime / 1000L / 86400L))
      val maxDay = days.map(_._2).max
      // .toSeq BEFORE the map: mapping a Map to (t, churned) tuples would
      // silently deduplicate equal subjects.
      val subj = days.groupBy(_._1).toSeq.map { case (_, ds) =>
        val (f, l) = (ds.map(_._2).min, ds.map(_._2).max)
        ((l - f) / 7, l <= maxDay - 90)
      }
      val byT = subj.groupBy(_._1)
      val deathWeeks = byT.filter(_._2.exists(_._2)).keys.toSeq.sorted
      var surv = 1.0
      val ref = deathWeeks.flatMap { t =>
        val n = subj.count(_._1 >= t).toLong
        val d = byT(t).count(_._2).toLong
        val c = byT(t).count(!_._2).toLong
        if (d > 0 && n > d) {
          surv *= (n - d).toDouble / n
          Some((t, n, d, c, surv))
        } else None
      }
      assert(got.map(g => (g._1, g._2, g._3, g._4)).toSeq ==
        ref.map(r => (r._1, r._2, r._3, r._4)), s"step table seed $seed")
      got.zip(ref).foreach { case (g, r) =>
        val engineSurv = math.exp(g._5 / 1e9)
        assert(math.abs(engineSurv - r._5) < 1e-5,
          s"survival at t=${g._1}: engine $engineSurv ref ${r._5} seed $seed")
      }
    }
  }

  test("q332 MK + q333 KW: micro-floored statistics match double references") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    val rows = for { t <- Seq("a", "b", "c"); _ <- 1 to 100 } yield {
      val day = 19000L + rnd.nextInt(35)
      (new Timestamp((day * 86400L + rnd.nextInt(86400)) * 1000L), t,
        (rnd.nextInt(400) + (day - 19000) * 3) / 100.0) // mild upward trend
    }
    val dir = Files.createTempDirectory("graft-mkkw-").toString
    rows.toDF("ts", "event_type", "value").write.parquet(s"$dir/events.parquet")
    // Mann-Kendall reference in doubles.
    val daily = rows.groupBy(r => r._1.getTime / 1000L / 86400L)
      .map { case (d, xs) => d -> xs.map(x => Math.round(x._3 * 100)).sum }
      .toSeq.sortBy(_._1)
    val s = (for {
      i <- daily.indices; j <- i + 1 until daily.length
    } yield (daily(j)._2 compare daily(i)._2).sign.toLong).sum
    val n = daily.length.toLong
    val ties = daily.groupBy(_._2).values.map(_.length.toLong).filter(_ > 1)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    val var18 = n * (n - 1) * (2 * n + 5) - ties
    val z2Ref = if (math.abs(s) > 1)
      (math.abs(s) - 1.0) * (math.abs(s) - 1) * 18.0 / var18 else 0.0
    val mk = Extended.q332MannKendall.fn(spark, dir).collect()(0)
    assert(mk.getLong(0) == n && mk.getLong(1) == s && mk.getLong(2) == var18)
    assert(math.abs(mk.getLong(4) / 1e6 - z2Ref) < 1e-4, "MK z^2")
    // Kruskal-Wallis reference: classic average-rank H in doubles.
    val vals = rows.map(r => (r._2, Math.round(r._3 * 100)))
    val sorted = vals.map(_._2).sorted
    val avgRank = vals.map(_._2).distinct.map { v =>
      val less = sorted.count(_ < v); val eq = sorted.count(_ == v)
      v -> (less + (eq + 1) / 2.0)
    }.toMap
    val nn = vals.length.toDouble
    val hRaw = 12.0 / (nn * (nn + 1)) * vals.groupBy(_._1).values.map { g =>
      val rs = g.map(x => avgRank(x._2)).sum
      rs * rs / g.length
    }.sum - 3 * (nn + 1)
    val tKw = vals.map(_._2).groupBy(identity).values.map(_.length.toDouble)
      .filter(_ > 1).map(t => t * t * t - t).sum
    val hRef = hRaw / (1 - tKw / (nn * nn * nn - nn))
    val kw = Extended.q333KruskalWallis.fn(spark, dir).collect()(0)
    // per-group floors lose <= k micro-units before the tie ratio.
    assert(math.abs(kw.getLong(4) / 1e6 - hRef) < 1e-4, "KW H")
  }

  test("q325 U-shape: engine == reference credits AND credits conserve purchase value") {
    import spark.implicits._
    for (seed <- Seq(17, 41)) {
      val rnd = new scala.util.Random(seed)
      val base = 19000L * 86400L
      // Dense per-user activity inside one week => paths with m up to ~8.
      val rows = (1 to 400).map { i =>
        val u = 1L + rnd.nextInt(12)
        val sec = base + rnd.nextInt(7 * 86400)
        val typ = if (rnd.nextInt(3) == 0) "purchase" else "click"
        (i.toLong, new Timestamp(sec * 1000L), u, typ, rnd.nextInt(50000) / 100.0)
      }
      val dir = Files.createTempDirectory("graft-ush-").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.parquet(s"$dir/events.parquet")
      val got = Events.q325PositionAttribution.fn(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      val clicks = rows.filter(_._4 == "click")
      val buys = rows.filter(_._4 == "purchase")
      val perBuy = buys.flatMap { case (bid, bts, u, _, bv) =>
        val v = Math.round(bv * 100)
        val path = clicks
          .filter(c => c._3 == u && c._2.getTime <= bts.getTime &&
            bts.getTime <= c._2.getTime + 7L * 86400 * 1000)
          .sortBy(c => (c._2.getTime, c._1))
        val m = path.length
        if (m == 0) Nil
        else {
          val w = path.zipWithIndex.map { case (_, i) =>
            if (m == 1) 1000000L
            else if (m == 2) 500000L
            else if (i == 0 || i == m - 1) 400000L
            else 200000L / (m - 2)
          }
          val c0 = w.map(v * _ / 1000000L)
          val resid = v - c0.sum
          path.zip(c0.zipWithIndex.map { case (c, i) =>
            if (i == 0) c + resid else c
          }).map { case (cl, credit) => ((u, cl._1), credit) }
        }
      }
      val want = perBuy.groupBy(_._1).map { case (k, cs) =>
        k -> ((cs.map(_._2).sum, cs.length.toLong))
      }
      assert(got == want, s"seed $seed")
      // Conservation: every matched purchase's cents are fully credited.
      val matchedCents = buys.filter { case (_, bts, u, _, _) =>
        clicks.exists(c => c._3 == u && c._2.getTime <= bts.getTime &&
          bts.getTime <= c._2.getTime + 7L * 86400 * 1000)
      }.map(b => Math.round(b._5 * 100)).sum
      assert(got.values.map(_._1).sum == matchedCents, s"conservation seed $seed")
    }
  }
}
