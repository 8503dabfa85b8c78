package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-12 kernels vs independent Scala references — the per-round
  * discipline (Round9KernelsSpec/Round10Spec/Round11Spec). The centerpiece
  * is [[Graph.ccFold]] (q383's kernel): incremental CC-label maintenance
  * must equal from-scratch CC — checked against a plain Scala union-find —
  * on planted merge topologies, on random graphs, and CHAINED day over day
  * through an actual parquet-persisted label table (the "persisted index"
  * discipline of the band/IVF maintenance tiers).
  */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  private val root = Paths.get("target", "tmp",
    s"r12fix-${java.util.UUID.randomUUID().toString.take(8)}").toAbsolutePath

  /** Independent reference: union-find with min-id labels. */
  private def refLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  private def toMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def labelsOf(edges: Seq[(Long, Long)]): DataFrame =
    Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
      .select(col("doc_id").as("n"), col("cluster_id").as("lab"))

  test("ccFold: planted merge topologies equal from-scratch union-find") {
    // Archive: components {1,2,3} (label 1), {10,11} (10), {20,21} (20),
    // {30,31} (30), {40,41} (40) — five islands.
    val day1 = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (30L, 31L),
      (40L, 41L))
    val day1Lbl = labelsOf(day1)
    // Delta plants every fold shape at once:
    //  - simple two-component merge:         (3, 10)
    //  - TRANSITIVE chain through the delta: (11, 20), (21, 30)
    //    (components 1,10,20,30 all collapse — the meta-CC must close
    //    the chain, a single mapping join could not)
    //  - intra-component no-op edge:         (40, 41)
    //  - brand-new node attaching:           (41, 100)
    //  - brand-new island (both ends new):   (200, 201)
    val delta = Seq((3L, 10L), (11L, 20L), (21L, 30L), (40L, 41L),
      (41L, 100L), (200L, 201L))
    val got = toMap(Graph.ccFold(day1Lbl, delta.toDF("u", "v")))
    val want = refLabels(day1 ++ delta)
    assert(got == want)
    // The chain actually merged down to min id 1, and the new island is
    // its own component — the topologies were exercised, not vacuous.
    assert(got(30L) == 1L && got(100L) == 40L && got(201L) == 200L)
  }

  test("ccFold: random graphs, random deltas — fold == from-scratch") {
    val rnd = new scala.util.Random(12)
    for (trial <- 1 to 5) {
      val nodes = 60 + rnd.nextInt(40)
      val all = Seq.fill(120)(
        (rnd.nextInt(nodes).toLong, rnd.nextInt(nodes).toLong))
        .filter(e => e._1 != e._2)
      val (day1, delta) = all.splitAt(all.length * 2 / 3)
      val got = toMap(Graph.ccFold(labelsOf(day1), delta.toDF("u", "v")))
      assert(got == refLabels(day1 ++ delta), s"trial $trial")
    }
  }

  test("ccFold chains day over day through a PARQUET-persisted label table") {
    Files.createDirectories(root)
    val store = root.resolve("cc_labels").toString
    val rnd = new scala.util.Random(123)
    val days = (1 to 4).map(_ => Seq.fill(40)(
      (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(e => e._1 != e._2))
    // Day 1 bootstraps the index; each later day folds its delta into the
    // PERSISTED table (read back from disk — nothing carried in memory),
    // exactly the maintenance loop a daily pipeline runs.
    labelsOf(days.head).write.mode("overwrite").parquet(store)
    days.tail.foreach { delta =>
      val updated = Graph.ccFold(spark.read.parquet(store),
        delta.toDF("u", "v"))
      // Labels are re-derived, so the overwrite of the small label table
      // is safe to stage through a temp dir (a real deployment would
      // publish via the manifest store).
      val tmp = s"$store.next"
      updated.write.mode("overwrite").parquet(tmp)
      spark.read.parquet(tmp).write.mode("overwrite").parquet(store)
    }
    val got = toMap(spark.read.parquet(store))
    assert(got == refLabels(days.flatten))
    // The invariant that makes folds chain: every label is the component's
    // min node id (so day-k labels are valid contraction targets for
    // day k+1).
    got.groupBy(_._2).foreach { case (lab, members) =>
      assert(members.keys.min == lab)
    }
  }

  // -------------------------------------------------------------------
  // Independent references for the round-12 registry kernels, on RANDOM
  // data written as parquet table dirs so the REAL entries run unchanged.
  // -------------------------------------------------------------------

  private def dirFor(name: String): String = {
    val d = root.resolve(name)
    Files.createDirectories(d)
    d.toString
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q385 HLL registers: md5-register reference + estimate identity") {
    val rnd = new scala.util.Random(385)
    // Random customer keys with repeats (distinct-count input).
    val keys = Seq.fill(3000)(rnd.nextInt(900).toLong + 1)
    val dir = dirFor("hll")
    keys.zipWithIndex.map { case (k, i) =>
      (i.toLong, k, "O", 1.0, new java.sql.Timestamp(1700000000000L), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    // Reference registers straight from the definition.
    val hex = "0123456789abcdef"
    val regs = Array.fill(64)(0L)
    val distinct = keys.distinct
    distinct.foreach { k =>
      val d = md5hex(k.toString)
      val bucket = (16 * hex.indexOf(d(0)) + hex.indexOf(d(1))) % 64
      val n16 = 4096 * hex.indexOf(d(2)) + 256 * hex.indexOf(d(3)) +
        16 * hex.indexOf(d(4)) + hex.indexOf(d(5))
      val rnk =
        if (n16 == 0) 17L
        else 16L - java.lang.Long.numberOfTrailingZeros(
          java.lang.Long.highestOneBit(n16.toLong))
      if (rnk > regs(bucket)) regs(bucket) = rnk
    }
    val ssum = regs.map(r => 1L << (17 - r).toInt).sum
    val estimate = BigInt(709) * 4096 * 131072 / (BigInt(1000) * ssum)

    val rows = graft.SparkEntry.queries("q385_hll_registers")(spark, dir)
      .collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_rank") == regs(r.getAs[Long]("bucket").toInt))
      assert(r.getAs[Long]("n_exact") == distinct.size.toLong)
      assert(r.getAs[Long]("estimate") == estimate.toLong)
    }
    // Raw-HLL sanity: the estimate lands in the right ballpark (m=64
    // raw HLL has ~13% stderr; allow 4σ).
    assert(math.abs(estimate.toDouble - distinct.size) < 0.55 * distinct.size)
  }

  test("q386/q387: BFS-definition references for harmonic centrality and the double sweep") {
    // Random sparse graph rendered as a lineitem co-purchase table: each
    // edge (u,v) becomes TWO orders containing parts u and v (clears the
    // support-2 floor).
    val rnd = new scala.util.Random(386)
    val nodes = 40
    val edges = Seq.fill(70)(
      (rnd.nextInt(nodes).toLong + 1, rnd.nextInt(nodes).toLong + 1))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val dir = dirFor("bfsgraph")
    val ts = new java.sql.Timestamp(1700000000000L)
    edges.zipWithIndex.flatMap { case ((u, v), i) =>
      Seq(2L * i, 2L * i + 1).flatMap(ok => Seq(
        (ok, u, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts),
        (ok, v, 1L, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", ts)))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    def bfs(seed: Long, cap: Int): Map[Long, Int] = {
      var dist = Map(seed -> 0)
      var frontier = Set(seed)
      var h = 0
      while (frontier.nonEmpty && h < cap) {
        h += 1
        val nxt = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
          .diff(dist.keySet)
        nxt.foreach(n => dist += n -> h)
        frontier = nxt
      }
      dist
    }

    // Harmonic: top-5 degree hubs (tie: min id), 12-hop cap.
    val deg = adj.view.mapValues(_.size * 2).toMap // sym edge count = 2·|nbrs| is wrong; degree = |nbrs| per direction
    val seeds = adj.keys.toSeq.sortBy(n => (-adj(n).size, n)).take(5)
    val wantH = seeds.map { s0 =>
      val d = bfs(s0, 12).filter(_._2 > 0)
      s0 -> ((d.size.toLong, d.values.map(dd => 1000000000L / dd).sum))
    }.toMap
    val gotH = graft.SparkEntry.queries("q386_harmonic_centrality")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(gotH == wantH)

    // Double sweep: seed = min node, farthest (max d, tie min node).
    val seed1 = adj.keys.min
    val m1 = bfs(seed1, 30)
    val (far1, ecc1) = m1.toSeq.sortBy { case (n, d) => (-d, n) }.head
    val m2 = bfs(far1, 30)
    val (far2, ecc2) = m2.toSeq.sortBy { case (n, d) => (-d, n) }.head
    val row = graft.SparkEntry.queries("q387_graph_diameter")(spark, dir)
      .collect()(0)
    assert(row.getAs[Long]("seed") == seed1)
    assert(row.getAs[Long]("ecc_seed") == ecc1.toLong)
    assert(row.getAs[Long]("far_node") == far1)
    assert(row.getAs[Long]("diameter_bound") == ecc2.toLong)
    assert(row.getAs[Long]("antipode") == far2)
    assert(row.getAs[Long]("component_size") == m2.size.toLong)

    // q388 per-edge triangle support: brute-force common neighbors.
    val wantT = edges.map { case (u, v) =>
      (u, v) -> adj(u).intersect(adj(v)).size.toLong
    }.toMap
    val gotT = graft.SparkEntry.queries("q388_tri_support")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(gotT == wantT)
    assert(wantT.values.exists(_ > 0), "degenerate fixture: no triangles")

    // q392 truncated Katz: 3 steps of x' = S + (A·x) // 8 from x = S.
    var xs = adj.keys.map(_ -> BigInt(1000000000L)).toMap
    for (_ <- 1 to 3) {
      xs = adj.keys.map { n =>
        n -> (BigInt(1000000000L) +
          adj(n).toSeq.map(xs).sum / 8)
      }.toMap
    }
    val wantK = xs.toSeq.sortBy { case (n, x) => (-x, n) }.take(20)
      .zipWithIndex.map { case ((n, x), i) => (i + 1L, n, x.toLong) }
    val gotK = graft.SparkEntry.queries("q392_katz_centrality")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gotK == wantK)
  }

  test("q389 weighted sample + q391 bigram LM: definition references") {
    val rnd = new scala.util.Random(389)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docs = (1L to 120L).map { id =>
      val n = 3 + rnd.nextInt(20)
      val words = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
      (id, words.mkString(" "))
    }
    val dir = dirFor("textlm")
    docs.map { case (id, t) => (id, t, "en", "ref", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def lnNano(x: Long): Long =
      (BigDecimal(math.log(x.toDouble)).setScale(9,
        BigDecimal.RoundingMode.HALF_UP) * BigDecimal(1000000000L)).toLongExact

    // q389: A-ES priorities from the definition.
    val hex = "0123456789abcdef"
    val prios = docs.map { case (id, t) =>
      val d = md5hex(id.toString)
      val hv = (0 until 7).map(i => hex.indexOf(d(i)).toLong)
        .reduceLeft((a, b) => 16 * a + b)
      val prio = (lnNano(hv + 1) - 28 * lnNano(2)) / t.length // toward-zero: both negative-dividend semantics agree because / truncates in Scala too
      (id, t.length.toLong, prio)
    }
    val want32 = prios.sortBy { case (id, _, p) => (-p, id) }.take(32)
      .zipWithIndex.map { case ((id, w, p), i) => (i + 1L, id, w, p) }
    val got32 = graft.SparkEntry.queries("q389_weighted_sample")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got32 == want32)

    // q391: add-one bigram LM from the definition.
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val train = toks.filter(_._1 % 2 == 0)
    val c2 = train.values.flatMap(ws => ws.zip(ws.tail))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = c2.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val v = train.values.flatten.toSet.size.toLong
    val scored = toks.filter(_._1 % 2 == 1).collect {
      case (id, ws) if ws.length >= 2 =>
        val nll = ws.zip(ws.tail).map { bg =>
          lnNano(c1.getOrElse(bg._1, 0L) + v) - lnNano(c2.getOrElse(bg, 0L) + 1)
        }
        (id, nll.size.toLong, nll.sum / nll.size)
    }.toSeq
    val want15 = scored.sortBy { case (id, _, s) => (-s, id) }.take(15)
      .zipWithIndex.map { case ((id, nb, s), i) => (i + 1L, id, nb, s) }
    val got15 = graft.SparkEntry.queries("q391_bigram_lm")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got15 == want15)
  }

  test("q390 TextRank: integer-PageRank reference on the word graph") {
    val rnd = new scala.util.Random(390)
    val vocab = Vector("red", "blue", "green", "cyan", "lime", "teal", "rust")
    val docs = (1L to 60L).map { id =>
      val n = 4 + rnd.nextInt(12)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dir = dirFor("textrank")
    docs.map { case (id, t) => (id, t, "en", "ref", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // Reference: support-3 canonical adjacent pairs → symmetric graph →
    // 3 exact integer PR iterations.
    val pairs = docs.flatMap { case (_, t) =>
      val ws = t.split(" ")
      ws.zip(ws.tail).filter(p => p._1 != p._2)
        .map(p => (Seq(p._1, p._2).min, Seq(p._1, p._2).max))
    }
    val e0 = pairs.groupBy(identity).filter(_._2.size >= 3).keys.toSeq
    val adj = (e0 ++ e0.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap // multi-edges impossible post-distinct
    val od = adj.view.mapValues(_.size.toLong).toMap
    val nn = adj.size
    val base = 1000000000000L / nn
    val jump = 15L * base / 100L
    var r = adj.keys.map(_ -> base).toMap
    for (_ <- 1 to 3) {
      val contrib = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      adj.foreach { case (u, vs) =>
        vs.foreach(v => contrib(v) += r(u) / od(u))
      }
      r = adj.keys.map(w => w -> (jump + 85L * contrib(w) / 100L)).toMap
    }
    val want = r.toSeq.sortBy { case (w, x) => (-x, w) }.take(20)
      .zipWithIndex.map { case ((w, x), i) => (i + 1L, w, x) }
    val got = graft.SparkEntry.queries("q390_textrank")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toSeq
    assert(got == want)
    assert(e0.nonEmpty, "degenerate fixture: empty word graph")
  }
}
