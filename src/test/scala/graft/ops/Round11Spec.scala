package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Round-11 kernels vs independent Scala references on RANDOM data —
  * the per-round discipline (Round9KernelsSpec/Round10Spec): each new
  * algorithm is recomputed from its textbook definition in plain Scala,
  * free of the SQL/DataFrame machinery the queries use, and the query
  * output must match exactly. Random inputs are written as parquet table
  * dirs so the REAL registry entries run unchanged.
  */
class Round11Spec extends SparkSpec {

  private val root = Paths.get("target", "tmp",
    s"r11fix-${java.util.UUID.randomUUID().toString.take(8)}").toAbsolutePath

  private def dirFor(name: String): String = {
    val d = root.resolve(name)
    Files.createDirectories(d)
    d.toString
  }

  test("q370 Shapley: permutation-definition equivalence + efficiency on random masks") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // Random users: touched-channel mask (3 bits) + converted flag.
    val users = (1L to 300L).map(u => (u, rnd.nextInt(8), rnd.nextInt(2)))
    val rows = users.flatMap { case (u, mask, conv) =>
      val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      Seq("click", "view", "signup").zipWithIndex.collect {
        case (ch, i) if (mask & (1 << i)) != 0 => (u, ch, ts)
      } ++ (if (conv == 1) Seq((u, "purchase", ts)) else Nil) :+
        ((u, "error", ts)) // noise type the game must ignore
    }
    val dir = dirFor("shapley")
    rows.toDF("user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    // Reference: v(S) = conversions with mask ⊆ S; φ_c averaged over all
    // 3! channel orderings (the DEFINITION, not the weight formula).
    def v(sMask: Int): Long =
      users.count { case (_, m, c) => c == 1 && (m & ~sMask) == 0 }.toLong
    val channels = Seq(0, 1, 2)
    val perms = channels.permutations.toSeq
    val phiX6 = channels.map { c =>
      c -> perms.map { p =>
        val before = p.takeWhile(_ != c).map(1 << _).sum
        v(before | (1 << c)) - v(before)
      }.sum // sum over 6 perms == 6·φ
    }.toMap
    val got = SparkEntry.queries("q370_shapley_attribution")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("click") == phiX6(0))
    assert(got("view") == phiX6(1))
    assert(got("signup") == phiX6(2))
    assert(phiX6.values.sum == 6L * (v(7) - v(0)), "efficiency (reference)")
  }

  test("q371 jackknife: direct recomputation from random day cells") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val orders = (1 to 400).map { _ =>
      val day = rnd.nextInt(60)
      val price = 1000.0 + rnd.nextInt(900000) / 100.0
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(day * 86400L)),
        price)
    }
    val dir = dirFor("jack")
    orders.toDF("o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    // .values before .map: mapping a Map to (size, sum) tuples would
    // re-key by size and silently collapse equal-sized days.
    val cells = orders.groupBy { case (ts, _) => ts.toInstant.getEpochSecond / 86400 }
      .values.map { rs =>
        (rs.size.toLong, rs.map(r => math.round(r._2 * 100)).sum)
      }.toSeq
    val d = cells.size.toLong
    val nt = cells.map(_._1).sum
    val ct = cells.map(_._2).sum
    val thetas = cells.map { case (n, c) => (ct - c) * 1000000L / (nt - n) }
    val thetaBar = thetas.sum / d
    val ssq = thetas.map(t => BigInt(t - thetaBar) * BigInt(t - thetaBar)).sum
    val expVar = (ssq / BigInt(1000000000000L)).toLong * (d - 1) / d
    val r = SparkEntry.queries("q371_jackknife_ratio")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_days") == d)
    assert(r.getAs[Long]("theta_micro") == ct * 1000000L / nt)
    assert(r.getAs[Long]("theta_jack_micro") ==
      d * (ct * 1000000L / nt) - (d - 1) * thetaBar)
    assert(r.getAs[Long]("jack_var_cents2") == expVar)
  }

  test("q372 Wasserstein: exact CDF-area reference on random values") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val orders = (1 to 500).map { _ =>
      val day = rnd.nextInt(40) // days 0..39, midpoint splits at 20
      val price = (100 + rnd.nextInt(5000)) / 100.0
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(day * 86400L)),
        price)
    }
    val dir = dirFor("wass")
    orders.toDF("o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val withDay = orders.map { case (ts, p) =>
      (ts.toInstant.getEpochSecond / 86400, math.round(p * 100)) }
    val mid = (withDay.map(_._1).min + withDay.map(_._1).max + 1) / 2
    val p1 = withDay.filter(_._1 < mid).map(_._2)
    val p2 = withDay.filter(_._1 >= mid).map(_._2)
    val levels = (p1 ++ p2).distinct.sorted
    val n1 = p1.size.toLong; val n2 = p2.size.toLong
    var c1 = 0L; var c2 = 0L
    var area = BigInt(0)
    levels.zipWithIndex.foreach { case (lv, i) =>
      c1 += p1.count(_ == lv); c2 += p2.count(_ == lv)
      val gap = if (i + 1 < levels.size) levels(i + 1) - lv else 0L
      area += BigInt((c1 * n2 - c2 * n1).abs) * gap
    }
    val expW1 = (area * 1000 / (BigInt(n1) * BigInt(n2))).toLong
    val r = SparkEntry.queries("q372_wasserstein_drift")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_first") == n1)
    assert(r.getAs[Long]("n_second") == n2)
    assert(r.getAs[Long]("w1_milli_cents") == expW1)
  }

  test("q375/q376: DBSCAN + single-link match union-find references on random embeddings") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // Clustered random vectors: 6 seed directions + per-point noise, so
    // the 0.30/0.32/0.35 thresholds all have non-trivial structure.
    val seeds = Array.fill(6, 64)(rnd.nextGaussian())
    val vecs = (0L until 120L).map { id =>
      val s = seeds(rnd.nextInt(6))
      val v = s.map(x => (x + rnd.nextGaussian() * 0.9).toFloat)
      (id, v.toSeq, rnd.nextInt(3))
    }
    val dir = dirFor("dbscan")
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    def cos6(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = a.map(x => x.toDouble * x.toDouble).sum
      val nb = b.map(x => x.toDouble * x.toDouble).sum
      BigDecimal(dot / math.sqrt(na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byId = vecs.map(v => v._1 -> v).toMap
    val pairs = for {
      a <- vecs; b <- vecs
      if a._1 < b._1 && a._3 == b._3 && cos6(a._2, b._2) >= 0.30
    } yield (a._1, b._1, cos6(a._2, b._2))

    final class UF {
      val p = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val r = p.getOrElse(x, x)
        if (r == x) x else { val t = find(r); p(x) = t; t }
      }
      def union(a: Long, b: Long): Unit = {
        p.getOrElseUpdate(a, a); p.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) p(math.max(ra, rb)) = math.min(ra, rb)
      }
      def label(nodes: Iterable[Long]): Map[Long, Long] = {
        val comp = nodes.groupBy(find)
        comp.flatMap { case (_, ms) => val m = ms.min; ms.map(_ -> m) }.toMap
      }
    }

    // Reference DBSCAN at eps 0.30, core = degree >= 2.
    val deg = pairs.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val core = deg.filter(_._2 >= 2).keySet
    val uf = new UF
    pairs.filter(p => core(p._1) && core(p._2)).foreach(p => uf.union(p._1, p._2))
    val coreLab = uf.label(core)
    val borderLab = pairs.flatMap(p => Seq(p._1 -> p._2, p._2 -> p._1))
      .filter { case (u, v) => !core(u) && core(v) }
      .groupBy(_._1)
      .map { case (u, vs) => u -> vs.map(x => coreLab(x._2)).min }
    val expect = (coreLab.map { case (k, c) => (k, "core", c) } ++
      borderLab.map { case (k, c) => (k, "border", c) }).toSet
    val got = SparkEntry.queries("q375_dbscan")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expect, s"dbscan mismatch: got ${got.size} expect ${expect.size}")

    // Reference single-link cuts + monotone coarsening.
    val gotCuts = SparkEntry.queries("q376_single_link")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    Seq(0.30 -> 300000L, 0.32 -> 320000L, 0.35 -> 350000L).foreach {
      case (t, ppm) =>
        val es = pairs.filter(_._3 >= t)
        val u2 = new UF
        es.foreach(p => u2.union(p._1, p._2))
        val nodes = es.flatMap(p => Seq(p._1, p._2)).distinct
        val lab = u2.label(nodes)
        val sizes = lab.groupBy(_._2).map(_._2.size)
        val row = gotCuts.find(_._1 == ppm).get
        assert(row._2 == es.size.toLong, s"edges at $t")
        assert(row._3 == nodes.size.toLong, s"nodes at $t")
        assert(row._4 == sizes.size.toLong, s"clusters at $t")
        assert(row._5 == (if (sizes.isEmpty) 0L else sizes.max.toLong),
          s"largest at $t")
    }
    val byLevel = gotCuts.sortBy(_._1).map(_._4)
    assert(byLevel.zip(byLevel.tail).forall { case (lo, hi) => lo <= hi },
      "coarsening must be monotone (clusters only merge as threshold drops)")
  }

  test("q369 readability: hand-computed Flesch on fixture docs") {
    import spark.implicits._
    val dir = dirFor("flesch")
    Seq(
      (1L, "The cat sat. The dog ran!", "en", "a"),
      (2L, "unpunctuated fragment of text", "en", "b"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q369_readability")(spark, dir)
      .collect().map(r => (r.getString(1), r.getLong(3))).toMap
    // doc 1: words=6, sentences=2, vowel groups: e,a,a,e,o,a = 6
    //   206835 - 1015*6/2 - 84600*6/6 = 206835 - 3045 - 84600 = 119190
    assert(got("a") == 119190L)
    // doc 2: words=4, sentences=max(0,1)=1, vowel groups:
    //   u,u,ua,e (unpunctuated=u-pu-ua-e → u,u,ua,e = 4) + fragment: a,e
    //   = 2 + of: o = 1 + text: e = 1 → total 8
    //   206835 - 1015*4 - 84600*8/4 = 206835 - 4060 - 169200 = 33575
    assert(got("b") == 33575L)
  }
}
