package graft.ops

import java.nio.file.Paths

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 kernels vs independent Scala references (the per-round
  * discipline of Round10Spec/Round11Spec/Round12Spec). Centerpieces:
  * [[Round13.triSupportFold]] (q395/q397's kernel — incremental triangle
  * support must equal from-scratch counting, checked against a plain
  * common-neighbor brute force on planted topologies, random graphs, and
  * CHAINED through a parquet-persisted index), and the k-truss tier race
  * ([[Round13.trussDriver]] vs [[Round13.trussDistributed]] vs an
  * independent peel — the [[Fuzzy.resolveClusters]] boundary discipline
  * applied to q396).
  */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  private val root = Paths.get("target", "tmp",
    s"r13fix-${java.util.UUID.randomUUID().toString.take(8)}").toAbsolutePath

  // -------------------------------------------------------------------
  // triangle support: independent reference
  // -------------------------------------------------------------------

  /** Brute-force per-edge triangle support: |N(u) ∩ N(v)| over adjacency
    * sets — no wedge orientation, no joins; the textbook definition. */
  private def refSupport(edges: Seq[(Long, Long)]): Map[(Long, Long), Long] = {
    val adj = scala.collection.mutable
      .Map.empty[Long, scala.collection.mutable.Set[Long]]
    edges.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, scala.collection.mutable.Set.empty) += v
      adj.getOrElseUpdate(v, scala.collection.mutable.Set.empty) += u
    }
    edges.map { case (u, v) =>
      (u, v) -> adj(u).toSet.intersect(adj(v).toSet).size.toLong
    }.toMap
  }

  private def toSupportMap(df: DataFrame): Map[(Long, Long), Long] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  /** Seeded random (u < v) edge set over node ids 1..n. */
  private def randomEdges(seed: Long, n: Int, m: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val picked = scala.collection.mutable.LinkedHashSet.empty[(Long, Long)]
    while (picked.size < m) {
      val a = rnd.nextInt(n).toLong + 1
      val b = rnd.nextInt(n).toLong + 1
      if (a != b) picked += ((math.min(a, b), math.max(a, b)))
    }
    picked.toSeq
  }

  test("triSupportFold: planted topologies equal brute force") {
    // Archive: a triangle (1,2,3), a path 4-5-6, an isolated edge (7,8).
    val day1 = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (5L, 6L),
      (7L, 8L))
    // Delta plants every fold shape:
    //  - closes an archive wedge into a triangle:       (4, 6)
    //  - stacks a second triangle on an archive edge:   (2, 9) + (3, 9)
    //    (both delta edges in ONE triangle — the sorted-triple distinct
    //    must collapse the double discovery)
    //  - an all-delta triangle on new nodes:            (10,11),(10,12),(11,12)
    //  - a no-triangle delta edge:                      (7, 13)
    val delta = Seq((4L, 6L), (2L, 9L), (3L, 9L), (10L, 11L), (10L, 12L),
      (11L, 12L), (7L, 13L))
    val prev = Round12.triSupportOf(day1.toDF("u", "v"))
    val got = toSupportMap(Round13.triSupportFold(prev, delta.toDF("u", "v")))
    assert(got === refSupport(day1 ++ delta))
  }

  test("triSupportFold: random graphs equal from-scratch, any split") {
    for (seed <- 1 to 4) {
      val edges = randomEdges(seed, 18, 60)
      val ref = refSupport(edges)
      // Three different archive/delta splits of the same graph must all
      // fold to the same from-scratch answer.
      for (mod <- Seq(2, 3, 5)) {
        val day1 = edges.filter { case (u, v) => (u + v) % mod != 0 }
        val delta = edges.filter { case (u, v) => (u + v) % mod == 0 }
        val got = toSupportMap(Round13.triSupportFold(
          Round12.triSupportOf(day1.toDF("u", "v")), delta.toDF("u", "v")))
        assert(got === ref, s"seed=$seed mod=$mod")
      }
    }
  }

  test("triSupportFold: chains through a parquet-persisted index and " +
    "ignores redelivered edges") {
    val edges = randomEdges(99, 15, 45)
    val store = root.resolve("supp").toString
    val batches = Seq(0, 1, 2).map(r =>
      edges.filter { case (u, v) => (u + v) % 3 == r })
    var gen = 0
    spark.range(0).select(col("id").as("u"), col("id").as("v"),
      col("id").as("tri")).write.parquet(s"$store/gen=0")
    for (b <- batches) {
      val prev = spark.read.parquet(s"$store/gen=$gen")
      gen += 1
      Round13.triSupportFold(prev, b.toDF("u", "v"))
        .write.parquet(s"$store/gen=$gen")
    }
    assert(toSupportMap(spark.read.parquet(s"$store/gen=$gen"))
      === refSupport(edges))
    // Replay: folding batch 2 AGAIN onto the final index is a no-op
    // (the anti-join drops already-indexed edges).
    val replayed = Round13.triSupportFold(
      spark.read.parquet(s"$store/gen=$gen"), batches(2).toDF("u", "v"))
    assert(toSupportMap(replayed) === refSupport(edges))
  }

  // -------------------------------------------------------------------
  // k-truss: independent reference + tier race
  // -------------------------------------------------------------------

  /** Independent truss peel: per k, recompute |N(u) ∩ N(v)| on the
    * survivor set and drop < k−2 until stable — immutable-set style, no
    * shared code with either tier. Stops at the schedule's max k (the
    * metric's shared definition). */
  private def refTruss(edges: Seq[(Long, Long)]): Map[(Long, Long), Long] = {
    val kMax = Round13.trussSchedule.map(_._1).max
    val out = scala.collection.mutable.Map[(Long, Long), Long](
      edges.map(_ -> 2L): _*)
    var cur = edges.toSet
    var k = 3
    while (cur.nonEmpty && k <= kMax) {
      var stable = false
      while (!stable) {
        val adj = cur.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
          .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
        val keep = cur.filter { case (u, v) =>
          adj(u).intersect(adj(v)).size >= k - 2
        }
        stable = keep == cur
        cur = keep
      }
      cur.foreach(e => out(e) = k.toLong)
      k += 1
    }
    out.toMap
  }

  private def toTrussMap(df: DataFrame): Map[(Long, Long), Long] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  /** A planted K6 (truss 6, exercises deep peel levels) bridged to a
    * random sparse graph (peel cascades through the bridge). */
  private def plantedGraph(seed: Long): Seq[(Long, Long)] = {
    val clique = for {
      a <- 101L to 106L; b <- (a + 1) to 106L
    } yield (a, b)
    val bridge = Seq((1L, 101L), (2L, 102L))
    (randomEdges(seed, 20, 50) ++ clique ++ bridge).distinct
  }

  test("k-truss: driver tier equals the independent reference") {
    for (seed <- Seq(7L, 8L)) {
      val edges = plantedGraph(seed)
      val got = Round13.trussDriver(edges.toArray)
        .map { case (u, v, t) => (u, v) -> t }.toMap
      assert(got === refTruss(edges), s"seed=$seed")
      assert(got.values.max === 6L, "the planted K6 must surface")
    }
  }

  test("k-truss: distributed tier equals the driver tier on the same " +
    "graph (forced past the boundary)") {
    val edges = plantedGraph(11L)
    val df = edges.toDF("u", "v")
    val driver = toTrussMap(
      Round13.trussTiered(spark, df, driverMaxEdges = Long.MaxValue))
    val dist = toTrussMap(
      Round13.trussTiered(spark, df, driverMaxEdges = 0L))
    assert(driver === dist)
    assert(driver === refTruss(edges))
  }

  // -------------------------------------------------------------------
  // CMS registers: independent JVM-md5 reference
  // -------------------------------------------------------------------

  /** Independent CMS: java.security MessageDigest md5 (not Spark's md5
    * expression), same '<j>#<token>' row key, 4-nibble fold mod the prime 4093
    * then mod 32 (all four nibbles mix — the round-13 ADVICE fix). */
  private def refCms(docs: Seq[String]): Map[(Long, Long), Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val cells = for {
      text <- docs
      t <- text.split(" ").filter(_.nonEmpty)
      j <- 0L to 3L
    } yield {
      val d = md.digest(s"$j#$t".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      def nib(i: Int) = "0123456789abcdef".indexOf(d.charAt(i)).toLong
      (j, (4096 * nib(0) + 256 * nib(1) + 16 * nib(2) + nib(3)) % 4093 % 32)
    }
    cells.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
  }

  test("CMS: merged registers equal an independent JVM-md5 sketch and " +
    "dominate true counts") {
    val docs = Seq("the cat sat on the mat", "the dog sat", "cat cat dog",
      "on on on the mat", "unique tokens here too")
    val dir = root.resolve("cmsdocs").toString
    docs.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "fix", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Round13.cmsMerged(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === refCms(docs))
    // Read path: min-over-rows estimate >= true count for every token.
    val md = java.security.MessageDigest.getInstance("MD5")
    val trueCnt = docs.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    trueCnt.foreach { case (t, cnt) =>
      val est = (0L to 3L).map { j =>
        val d = md.digest(s"$j#$t".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        def nib(i: Int) = "0123456789abcdef".indexOf(d.charAt(i)).toLong
        got((j, (4096 * nib(0) + 256 * nib(1) + 16 * nib(2) + nib(3)) % 4093 % 32))
      }.min
      assert(est >= cnt, s"token $t: est $est < true $cnt")
    }
  }

  // -------------------------------------------------------------------
  // betweenness / weighted PageRank: fixture lineitem + references
  // -------------------------------------------------------------------

  /** A lineitem fixture whose support-2 co-purchase graph is EXACTLY the
    * given weighted edge set: edge (u, v, w) ⇒ w orders each holding
    * parts u and v (w ≥ 2 clears the support floor and becomes the
    * edge weight). */
  private def lineitemFor(edges: Seq[(Long, Long, Long)], dir: String): Unit = {
    var nextOrder = 0L
    edges.flatMap { case (u, v, w) =>
      (1L to w).flatMap { _ =>
        nextOrder += 1
        Seq((nextOrder, u), (nextOrder, v))
      }
    }.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  /** Textbook Brandes from the top-5-degree pivots, 12-hop-capped,
    * BigInt σ, per-edge floored nano δ — no shared code with q401. */
  private def refBetweenness(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2) }
    val seeds = adj.toSeq.sortBy { case (n, ns) => (-ns.size, n) }
      .take(5).map(_._1)
    val acc = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for (s0 <- seeds) {
      val level = scala.collection.mutable.Map(s0 -> 0)
      val sigma = scala.collection.mutable.Map(s0 -> BigInt(1))
      var frontier = Seq(s0)
      var h = 0
      while (frontier.nonEmpty && h < 12) {
        h += 1
        val cand = frontier.flatMap(adj(_)).distinct
          .filterNot(level.contains)
        cand.foreach { v =>
          sigma(v) = adj(v).filter(p => level.get(p).contains(h - 1))
            .map(sigma).sum
          level(v) = h
        }
        frontier = cand
      }
      val delta = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for (h2 <- 11 to 0 by -1; v <- level.keys if level(v) == h2) {
        var d = 0L
        for (w <- adj(v) if level.get(w).contains(h2 + 1))
          d += ((sigma(v) * (BigInt(1000000000) + delta(w))) / sigma(w))
            .toLong
        delta(v) = d
        if (v != s0) acc(v) = acc(v) + d
      }
    }
    acc.toMap
  }

  /** Independent weighted PageRank: 3 iterations of the exact integer
    * fixpoint with per-edge floored mass splits. */
  private def refWeightedPr(edges: Seq[(Long, Long, Long)]): Map[Long, Long] = {
    val sym = edges.flatMap { case (u, v, w) => Seq((u, v, w), (v, u, w)) }
    val sw = sym.groupBy(_._1).map { case (n, xs) => n -> xs.map(_._3).sum }
    val n = sw.size
    val base = 1000000000000L / n
    val jump = (15L * base) / 100L
    var r: Map[Long, Long] = sw.keys.map(_ -> base).toMap
    for (_ <- 1 to 3) {
      val in = sym.groupBy(_._2).map { case (v, xs) =>
        v -> xs.map { case (u, _, w) => (r(u) * w) / sw(u) }.sum
      }
      r = in.map { case (v, c) => v -> (jump + (85L * c) / 100L) }
    }
    r
  }

  /** The fixture graph both kernels run on: a hub star, a long path
    * hanging off it (brokers with high betweenness), a triangle, and a
    * heavy-weight edge pair. */
  private val fixtureEdges: Seq[(Long, Long, Long)] = Seq(
    // hub 1 star
    (1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 3L), (1L, 5L, 2L),
    // path 5-6-7-8-9 (6,7,8 are brokers)
    (5L, 6L, 2L), (6L, 7L, 4L), (7L, 8L, 2L), (8L, 9L, 2L),
    // triangle 2-3-10
    (2L, 10L, 2L), (3L, 10L, 3L),
    // second component pair
    (20L, 21L, 5L))

  test("q401 betweenness equals a textbook Brandes reference on a " +
    "fixture co-purchase graph") {
    val dir = root.resolve("bwfix").toString
    lineitemFor(fixtureEdges, dir)
    val got = Round13.q401Betweenness.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ref = refBetweenness(fixtureEdges.map(e => (e._1, e._2)))
    val expected = ref.toSeq.sortBy { case (n, b) => (-b, n) }.take(20)
      .zipWithIndex.map { case ((n, b), i) => (i + 1L, n, b) }
    assert(got.toSeq === expected)
    // Sanity: the path brokers must outrank the leaf nodes.
    val rank = got.map(t => t._2 -> t._1).toMap
    assert(rank(6L) < rank(9L) && rank(7L) < rank(9L))
  }

  test("q403 weighted PageRank equals an independent integer fixpoint " +
    "and weights actually matter") {
    val dir = root.resolve("wprfix").toString
    lineitemFor(fixtureEdges, dir)
    val got = Round13.q403WeightedPagerank.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ref = refWeightedPr(fixtureEdges)
    val expected = ref.toSeq.sortBy { case (n, r0) => (-r0, n) }.take(20)
      .zipWithIndex.map { case ((n, r0), i) => (i + 1L, n, r0) }
    assert(got.toSeq === expected)
    // Weights matter: the unweighted fixpoint on the same graph ranks
    // differently (otherwise q403 is q109 with extra columns).
    val unw = refWeightedPr(fixtureEdges.map(e => (e._1, e._2, 1L)))
    assert(ref.toSeq.sortBy(t => (-t._2, t._1)).map(_._1)
      !== unw.toSeq.sortBy(t => (-t._2, t._1)).map(_._1))
  }

  /** Textbook edge betweenness on the same capped-Brandes definition:
    * per-source, each shortest-path DAG edge (v, w) carries
    * σ_v·(10⁹+δ_w)//σ_w; summed over sources at undirected edge grain. */
  private def refEdgeBetweenness(edges: Seq[(Long, Long)])
      : Map[(Long, Long), Long] = {
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2) }
    val seeds = adj.toSeq.sortBy { case (n, ns) => (-ns.size, n) }
      .take(5).map(_._1)
    val acc = scala.collection.mutable.Map.empty[(Long, Long), Long]
      .withDefaultValue(0L)
    for (s0 <- seeds) {
      val level = scala.collection.mutable.Map(s0 -> 0)
      val sigma = scala.collection.mutable.Map(s0 -> BigInt(1))
      var frontier = Seq(s0)
      var h = 0
      while (frontier.nonEmpty && h < 12) {
        h += 1
        val cand = frontier.flatMap(adj(_)).distinct
          .filterNot(level.contains)
        cand.foreach { v =>
          sigma(v) = adj(v).filter(p => level.get(p).contains(h - 1))
            .map(sigma).sum
          level(v) = h
        }
        frontier = cand
      }
      val delta = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for (h2 <- 11 to 0 by -1; v <- level.keys if level(v) == h2) {
        var d = 0L
        for (w <- adj(v) if level.get(w).contains(h2 + 1)) {
          val t = ((sigma(v) * (BigInt(1000000000) + delta(w))) / sigma(w))
            .toLong
          d += t
          val e = (math.min(v, w), math.max(v, w))
          acc(e) = acc(e) + t
        }
        delta(v) = d
      }
    }
    acc.toMap
  }

  test("q404 edge betweenness equals the textbook per-DAG-edge flow " +
    "fold on the fixture graph") {
    val dir = root.resolve("ebfix").toString
    lineitemFor(fixtureEdges, dir)
    val got = Round13.q404EdgeBetweenness.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ref = refEdgeBetweenness(fixtureEdges.map(e => (e._1, e._2)))
    val expected = ref.toSeq
      .sortBy { case ((a, b), f) => (-f, a, b) }.take(20)
      .zipWithIndex.map { case (((a, b), f), i) => (i + 1L, a, b, f) }
    assert(got.toSeq === expected)
    // The path's middle edge is the unique bridge between the star side
    // and the tail — it must outrank every star edge.
    val flows = got.map(t => (t._2, t._3) -> t._1).toMap
    assert(flows((6L, 7L)) < flows.getOrElse((1L, 2L), 99L))
  }

  test("q405 Luby MIS: independence, maximality, and the exact decision " +
    "table vs an independent reference") {
    val dir = root.resolve("misfix").toString
    lineitemFor(fixtureEdges, dir)
    val got = Round13.q405LubyMis.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val edges = fixtureEdges.map(e => (e._1, e._2))
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    // Independence: no edge inside the MIS; maximality: every non-MIS
    // node has a MIS neighbor.
    edges.foreach { case (u, v) =>
      assert(!(got(u) && got(v)), s"edge ($u,$v) inside the MIS") }
    got.foreach { case (n, in) =>
      if (!in) assert(adj(n).exists(got), s"$n has no MIS neighbor") }
    // Exact decision table vs an independent Luby with the same
    // MessageDigest priorities.
    val md = java.security.MessageDigest.getInstance("MD5")
    def prio(n: Long): Long = {
      val d = md.digest(n.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      def nib(i: Int) = "0123456789abcdef".indexOf(d.charAt(i)).toLong
      (0 to 6).map(i => nib(i) << (4 * (6 - i))).sum
    }
    var undec = adj.keySet
    val mis = scala.collection.mutable.Set.empty[Long]
    while (undec.nonEmpty) {
      val ord = Ordering.Tuple2[Long, Long]
      val win = undec.filter(n => adj(n).filter(undec.contains)
        .forall(m => ord.gt((prio(n), n), (prio(m), m))))
      mis ++= win
      undec = undec -- win -- win.flatMap(adj)
    }
    assert(got === adj.keySet.map(n => n -> mis.contains(n)).toMap)
  }

  test("q406 Kneser-Ney equals an independent integer KN scorer on a " +
    "fixture corpus") {
    // Train (even ids) makes "the cat" frequent but "cat" appear in ONE
    // context only, while "dog" completes many contexts — the KN
    // continuation signal. Held-out (odd ids) hits seen bigrams, unseen
    // bigrams with seen heads, and an unseen head word.
    val docs = Seq(
      (0L, "the cat sat on the mat"), (2L, "the cat ate the dog"),
      (4L, "a dog b dog c dog"), (6L, "the cat sat"),
      (1L, "the cat sat"), (3L, "the dog mat zz"), (5L, "qq the cat"),
      (7L, "dog dog"))
    val dir = root.resolve("knfix").toString
    docs.map { case (i, t) => (i, t, "en", "fix", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // Independent KN: plain Scala maps, same integer formula.
    val train = docs.filter(_._1 % 2 == 0)
    val bgs = (d: Seq[(Long, String)]) => d.flatMap { case (id, t) =>
      val w = t.split(" "); w.zip(w.tail).map(p => (id, p._1, p._2))
    }
    val c2 = bgs(train).groupBy(b => (b._2, b._3))
      .map { case (k, xs) => k -> xs.size.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (w1, m) =>
      w1 -> (m.values.sum, m.size.toLong)
    }
    val nb = c2.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val n1all = c2.size.toLong
    val vocab = train.flatMap(_._2.split(" ")).distinct.size.toLong
    def pNano(w1: String, w2: String): Long = {
      val pc = (nb.getOrElse(w2, 0L) + 1L) * 1000000000L / (n1all + vocab)
      c1.get(w1) match {
        case Some((cc1, n1f)) =>
          val t1 = math.max(4L * c2.getOrElse((w1, w2), 0L) - 3L, 0L) *
            1000000000L / (4L * cc1)
          val lam = 3L * n1f * 1000000000L / (4L * cc1)
          math.max(t1 + lam * pc / 1000000000L, 1L)
        case None => math.max(pc, 1L)
      }
    }
    def lnNano(x: Long): Long =
      (BigDecimal(math.log(x.toDouble))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP) * 1000000000L).toLong
    val ref = bgs(docs.filter(_._1 % 2 == 1))
      .groupBy(_._1).map { case (id, xs) =>
        val nll = xs.map { case (_, w1, w2) =>
          lnNano(1000000000L) - lnNano(pNano(w1, w2)) }
        (id, xs.size.toLong, nll.sum / nll.size)
      }.toSeq
    val expected = ref.sortBy { case (id, _, a) => (-a, id) }.take(15)
      .zipWithIndex.map { case ((id, n, a), i) => (i + 1L, id, n, a) }
    val got = Round13.q406KneserNey.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expected)
  }

  test("CMS linearity: per-split counts folded by addition equal the " +
    "one-pass counts") {
    val docs = Seq((0L, "a b a"), (1L, "b c"), (2L, "a c c d"),
      (3L, "d d d"), (4L, "e"))
      .toDF("doc_id", "text")
    val whole = Round13.cmsCounts(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val folded = (0 to 2).map(i =>
        Round13.cmsCounts(docs.filter(col("doc_id") % 3 === i)))
      .reduce(_ unionByName _)
      .groupBy(col("j"), col("c")).agg(sum(col("r")).as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(folded === whole)
  }

  // -------------------------------------------------------------------
  // script-fallback tokenizer: fixture gate
  // -------------------------------------------------------------------

  test("script fallback: unsegmented docs route to character bigrams, " +
    "segmented docs keep the whitespace path") {
    // doc_id 0 and 7 are planted unsegmented (id % 7 == 0).
    val docs = Seq(
      (0L, "ab abc ab"), (7L, "xy xyz"), (1L, "ab abc ab"), (2L, "xy xyz"))
    val dir = root.resolve("tokdocs").toString
    docs.map { case (i, t) => (i, t, "en", "fix", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Round13.q398ScriptFallbackTokens.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // Bigram side: "ababcab" -> ab,ba,ab,bc,ca,ab ; "xyxyz" -> xy,yx,xy,yz
    val bigram = got.filter(_._1 == "bigram").map(t => (t._3, t._4)).toMap
    assert(bigram === Map("ab" -> 3L, "xy" -> 2L, "ba" -> 1L, "bc" -> 1L,
      "ca" -> 1L, "yx" -> 1L, "yz" -> 1L))
    // Space side: docs 1 and 2 tokenize on spaces.
    val space = got.filter(_._1 == "space").map(t => (t._3, t._4)).toMap
    assert(space === Map("ab" -> 2L, "abc" -> 1L, "xy" -> 1L, "xyz" -> 1L))
    // Rank order within each mode: count desc, token asc.
    val bigramOrder = got.filter(_._1 == "bigram").sortBy(_._2).map(_._3)
    assert(bigramOrder === Seq("ab", "xy", "ba", "bc", "ca", "yx", "yz"))
  }
}
