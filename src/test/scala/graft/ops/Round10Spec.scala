package graft.ops

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

/** Independent references for the round-10 kernels: the oracle gate proves
  * Spark ≡ DuckDB on the driver fixtures; these prove the SEMANTICS against
  * straight-line Scala implementations on seeded random inputs chosen to
  * stress what the fixtures may not — rate curves with many isotonic
  * violations (PAV's whole job), a genuine level shift (the EWMA monitor
  * must actually fire), and cents matrices with uneven per-user support
  * (the ALS solves must weight, not average).
  */
class Round10Spec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("q345/q346: split gain argmax and PAV fit == BigInt references") {
    import spark.implicits._
    for (seed <- Seq(7, 23)) {
      val rnd = new scala.util.Random(seed)
      // Price clusters + a status rate that wanders up and down with
      // price: many adjacent-bin inversions for PAV to pool.
      val rows = (1 to 4000).map { _ =>
        val cents = 1000L + rnd.nextInt(900000)
        val pUp = 0.2 + 0.6 * math.abs(math.sin(cents / 90000.0))
        val st = if (rnd.nextDouble() < pUp) "F" else "O"
        (cents / 100.0, st)
      }
      val dir = tmp("graft-r10-split-")
      rows.toDF("o_totalprice", "o_orderstatus")
        .write.parquet(s"$dir/orders.parquet")

      // Shared reference histogram (the queries' exact integer binning).
      val cents = rows.map(r => Math.round(r._1 * 100))
      val (mn, mx) = (cents.min, cents.max)
      val hist = cents.zip(rows.map(_._2)).groupBy { case (c, _) =>
        (c - mn) * 32 / (mx - mn + 1)
      }.map { case (b, xs) =>
        b -> (BigInt(xs.size), BigInt(xs.count(_._2 == "F")))
      }

      // q345 reference: gain over the 0..30 spine with cumulative sums.
      val (nn, xx) = (BigInt(cents.size), BigInt(rows.count(_._2 == "F")))
      var (nl, xl) = (BigInt(0), BigInt(0))
      val gains = (0L to 30L).flatMap { b =>
        val (n, x) = hist.getOrElse(b, (BigInt(0), BigInt(0)))
        nl += n; xl += x
        if (nl > 0 && nn - nl > 0)
          Some(b -> (xl * xl * 1000000 / nl +
            (xx - xl) * (xx - xl) * 1000000 / (nn - nl)))
        else None
      }
      val bestRef = gains.maxBy { case (b, g) => (g, -b) }._1
      val split = Learn.q345SplitGain.fn(spark, dir).collect()
      val bestGot = split.filter(_.getBoolean(8)).map(_.getLong(0))
      assert(bestGot.toSeq == Seq(bestRef), s"seed $seed best split")
      val gotGains = split.map(r => r.getLong(0) -> r.getLong(6)).toMap
      gains.foreach { case (b, g) =>
        assert(BigInt(gotGains(b)) == g, s"seed $seed gain at bin $b")
      }

      // q346 reference: classical sequential weighted PAV on the exact
      // rational bin rates, floored to ppm at the end (floor commutes
      // with min/max, so this equals the engine's floored minimax).
      case class Block(n: BigInt, x: BigInt, bins: List[Long])
      val ordered = hist.toSeq.sortBy(_._1)
      val pooled = ordered.foldLeft(List.empty[Block]) { case (acc, (b, (n, x))) =>
        var st = Block(n, x, List(b)) :: acc
        while (st.size >= 2 &&
          st.tail.head.x * st.head.n >= st.head.x * st.tail.head.n) {
          val a :: p :: rest = st: @unchecked
          st = Block(a.n + p.n, a.x + p.x, p.bins ++ a.bins) :: rest
        }
        st
      }
      val isoRef = pooled.flatMap(bl =>
        bl.bins.map(_ -> (bl.x * 1000000 / bl.n))).toMap
      val gotIso = Learn.q346IsotonicCalibration.fn(spark, dir).collect()
        .map(r => r.getLong(0) -> BigInt(r.getLong(4))).toMap
      assert(gotIso == isoRef, s"seed $seed PAV fit")
    }
  }

  test("q340 EWMA: engine recursion == imperative reference; shift is flagged") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // 60 days of stable cents, then a sustained +25% level shift — the
    // small-shift regime EWMA exists for.
    val rows = (0 until 90).flatMap { d =>
      val base = if (d < 60) 500000L else 625000L
      val day = 19100L + d
      (0 until 4).map { k =>
        val sec = day * 86400L + 1000L * k
        (new Timestamp(sec * 1000L), "m",
          (base / 4 + rnd.nextInt(2000) - 1000) / 100.0)
      }
    }
    val dir = tmp("graft-r10-ewma-")
    rows.toDF("ts", "event_type", "value").write.parquet(s"$dir/events.parquet")
    val got = Events.q340EwmaControl.fn(spark, dir).collect()(0)

    val daily = rows.groupBy(_._1.getTime / 1000L / 86400L)
      .map { case (d, xs) => d -> xs.map(x => Math.round(x._3 * 100)).sum }
      .toSeq.sortBy(_._1).map(_._2)
    val n = daily.size
    val sv = daily.map(BigInt(_)).sum
    val svv = daily.map(v => BigInt(v) * v).sum
    val rhs = (BigInt(n) * svv - sv * sv).toDouble
    val (nd, svd) = (n.toDouble, sv.toDouble)
    var z = svd / nd; var w = 1.0
    var nf = 0L; var ff = 0L; var t = 0L
    daily.foreach { v =>
      z = 0.2 * v.toDouble + 0.8 * z; w = w * 0.64; t += 1
      val flag = (nd * z - svd) * (nd * z - svd) > rhs * (1.0 - w)
      if (flag) { nf += 1; if (ff == 0) ff = t }
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getLong(1) == n.toLong, "n_days")
    assert(got.getLong(2) == nf && nf > 0, "flag count (shift must fire)")
    assert(got.getLong(3) == ff, "first flag day")
    assert(got.getDouble(4) == r4(z), "z_final")
  }

  test("q338: DCG discount literals and IDCG pin to 1/log2(r+1)") {
    val w = (1 to 5).map(r =>
      Math.round(BigDecimal(1.0 / (math.log(r + 1) / math.log(2)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6))
    assert(w == Seq(1000000L, 630930L, 500000L, 430677L, 386853L))
    assert((1 to 5).map(r => (6 - r) * w(r - 1)).sum == 10271927L)
  }

  test("q337 ALS: item factors and SSE == BigInt reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // Uneven support: some users rate one item heavily, others spread.
    val rows = (1 to 2000).map { i =>
      val u = 1L + rnd.nextInt(40)
      val it = s"item${rnd.nextInt(4)}"
      val day = 19100L + rnd.nextInt(30)
      (new Timestamp((day * 86400L + i) * 1000L), it, u,
        rnd.nextInt(50000) / 100.0)
    }
    val dir = tmp("graft-r10-als-")
    rows.toDF("ts", "event_type", "user_id", "value")
      .write.parquet(s"$dir/events.parquet")
    val got = Learn.q337AlsStep.fn(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap

    val rMat = rows.groupBy(r => (r._3, r._2))
      .map { case ((u, it), xs) =>
        (u, it) -> BigInt(xs.map(x => Math.round(x._4 * 100)).sum)
      }
    val uF = rMat.groupBy(_._1._1).map { case (u, m) =>
      u -> m.values.sum / m.size
    }
    val items = rMat.keys.map(_._2).toSeq.distinct
    items.foreach { it =>
      val cells = rMat.collect { case ((u, i), r) if i == it => u -> r }.toSeq
      val vNum = cells.map { case (u, r) => r * uF(u) }.sum
      val vDen = cells.map { case (u, _) => uF(u) * uF(u) }.sum
      val vPpm = vNum * 1000000 / vDen
      val sse0 = cells.map { case (u, r) => (r - uF(u)) * (r - uF(u)) }.sum
      val sse1 = cells.map { case (u, r) =>
        val p = uF(u) * vPpm / 1000000
        (r - p) * (r - p)
      }.sum
      val (gn, gv, g0, g1) = got(it)
      assert(gn == cells.size.toLong, s"$it n_users")
      assert(BigInt(gv) == vPpm, s"$it v_ppm")
      assert(BigInt(g0) == sse0 && BigInt(g1) == sse1, s"$it sse")
    }
  }

  test("q352 PACF: unrolled Durbin-Levinson == imperative reference") {
    import spark.implicits._
    for (seed <- Seq(3, 47)) {
      val rnd = new scala.util.Random(seed)
      // An AR(1)-ish series (value correlated with yesterday's) so the
      // PACF has real structure to cut off.
      var lvl = 3000.0
      val rows = (0 until 40).map { d =>
        lvl = 0.6 * lvl + rnd.nextInt(2000)
        (new Timestamp((19200L + d) * 86400L * 1000L), "s",
          math.max(1, lvl.toLong) / 100.0 * 100)
      }
      val dir = tmp("graft-r10-pacf-")
      rows.toDF("ts", "event_type", "value").write.parquet(s"$dir/events.parquet")
      val got = Events.q352Pacf.fn(spark, dir).collect()
        .map(r => r.getLong(1) -> r.getDouble(2)).toMap

      val daily = rows.map(r => Math.round(r._3 * 100))
      val n = daily.size
      val sv = daily.map(BigInt(_)).sum
      val cen = daily.map(v => BigInt(n) * v - sv)
      val den = cen.map(c => c * c).sum
      val rho = (1 to 7).map { k =>
        cen.drop(k).zip(cen.dropRight(k)).map { case (a, b) => a * b }
          .sum.toDouble / den.toDouble
      }
      // Imperative DL with the SAME left-associated op order as the
      // generated SQL (0.0 + first term is exact).
      var phi = Array(rho(0))
      val pacf = scala.collection.mutable.Buffer(rho(0))
      for (k <- 2 to 7) {
        var s1 = 0.0; var s2 = 0.0
        for (j <- 1 until k) {
          s1 += phi(j - 1) * rho(k - j - 1)
          s2 += phi(j - 1) * rho(j - 1)
        }
        val pkk = (rho(k - 1) - s1) / (1.0 - s2)
        phi = (1 until k).map(j => phi(j - 1) - pkk * phi(k - j - 1)).toArray :+ pkk
        pacf += pkk
      }
      def r9(x: Double): Double =
        BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      (1 to 7).foreach(k =>
        assert(got(k.toLong) == r9(pacf(k - 1)), s"seed $seed lag $k"))
    }
  }

  test("q361 assortativity: engine == BigInt reference on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // Orders with 2-4 parts each; co-occurrence >= 2 gives a real edge set.
    val rows = (1L to 600L).flatMap { o =>
      val parts = Seq.fill(2 + rnd.nextInt(3))(1L + rnd.nextInt(40))
      parts.distinct.map(p => (o, p))
    }
    val dir = tmp("graft-r10-ast-")
    rows.toDF("l_orderkey", "l_partkey").write.parquet(s"$dir/lineitem.parquet")
    val got = Graph.q361Assortativity.fn(spark, dir).collect()(0)

    val byOrder = rows.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted)
    val pairCounts = byOrder.values.flatMap(ps =>
      for (a <- ps; b <- ps if a < b) yield (a, b))
      .groupBy(identity).view.mapValues(_.size)
    val edges = pairCounts.collect { case (e, c) if c >= 2 => e }.toSeq
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
    val deg = adj.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val xy = adj.map { case (u, v) => (BigInt(deg(u)), BigInt(deg(v))) }
    val m = BigInt(xy.size)
    val sx = xy.map(_._1).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val den = m * sxx - sx * sx
    assert(got.getLong(0) == xy.size.toLong, "edge count")
    if (den != 0)
      assert(BigInt(got.getLong(1)) == (m * sxy - sx * sx) * 1000000 / den, "r_ppm")
  }

  test("q363: decomposition identity equals the directly-computed binned Brier") {
    // BS(with bin-mean confidences vs individual outcomes) =
    // REL - RES + UNC exactly at bin grain; engine floors each component
    // once, so the identity holds within a few micro units.
    val got = TextAnalysis.q363BrierDecomposition
      .fn(spark, "/root/testdata/sf0.001").collect()(0)
    val (n, ybar, rel, res, unc, bs) = (got.getLong(0), got.getLong(1),
      got.getLong(2), got.getLong(3), got.getLong(4), got.getLong(5))
    assert(bs == unc + rel - res, "recombination is exact by construction")
    assert(rel >= 0 && res >= 0 && unc >= 0 && unc <= 250000, "component ranges")
    assert(ybar >= 0 && ybar <= 1000000 && n > 0)
  }

  test("q350: sequence support == brute-force reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    val rows = (1 to 1500).map { i =>
      val u = 1L + rnd.nextInt(60)
      val t = s"e${rnd.nextInt(3)}"
      val sec = 1700000000L + rnd.nextInt(500000)
      (new Timestamp(sec * 1000L), t, u)
    }
    val dir = tmp("graft-r10-seq-")
    rows.toDF("ts", "event_type", "user_id")
      .write.parquet(s"$dir/events.parquet")
    val got = Events.q350SequentialPatterns.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    val prof = rows.groupBy(r => (r._3, r._2)).map { case ((u, t), xs) =>
      (u, t) -> (xs.map(_._1.getTime / 1000).min, xs.map(_._1.getTime / 1000).max)
    }
    val types = rows.map(_._2).distinct.sorted
    val nA = types.map(t => t -> prof.count(_._1._2 == t)).toMap
    for (a <- types; b <- types) {
      val sup = prof.count { case ((u, t), (mn, _)) =>
        t == a && prof.get((u, b)).exists(p => mn < p._2)
      }
      if (sup > 0) {
        val (gs, gn, gc) = got((a, b))
        assert(gs == sup.toLong && gn == nA(a).toLong, s"$a->$b support")
        assert(gc == sup.toLong * 1000000 / nA(a), s"$a->$b confidence")
      } else assert(!got.contains((a, b)), s"$a->$b absent")
    }
  }
}
