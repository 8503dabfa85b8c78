package graft.ops

import java.nio.file.Paths

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** Hand-computed fixtures for the fuzzy-match and graph operators. */
class FuzzyGraphSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val dir =
    Paths.get("target", "tmp", s"fuzzygraph-${System.nanoTime}").toAbsolutePath.toString

  override def beforeAll(): Unit = {
    super.beforeAll()
    // part: three 2-word names one word apart in a chain, one 3-word name
    // (width-blocked from all of them), support counts 2/1/1/1.
    Seq(
      (1L, "red bolt"), (2L, "red bolt"),
      (3L, "red gear"),
      (4L, "blue bolt"),
      (5L, "green widget dog"))
      .toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    // lineitem: edges need co-occurrence in ≥2 DISTINCT orders. Orders
    // 100+300 = {1,2,3} twice (triangle, support 2), 200+400 = {3,4}
    // twice (pendant edge), 500 = {1,4} once (noise — must be filtered).
    // Kept degrees: 1→2, 2→2, 3→3, 4→1.
    Seq(
      (100L, 1L), (100L, 2L), (100L, 3L),
      (300L, 1L), (300L, 2L), (300L, 3L),
      (200L, 3L), (200L, 4L),
      (400L, 3L), (400L, 4L),
      (500L, 1L), (500L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  test("q105: pigeonhole blocking finds exactly the word-distance-≤1 same-width pairs") {
    val rows = Fuzzy.q105FuzzyNameMatch.fn(spark, dir).collect()
      .map(r => (r.getAs[String]("name_a"), r.getAs[String]("name_b"),
        r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("w_dist"), r.getAs[Long]("lev")))
    // "blue bolt"–"red bolt" (shared noun), "red bolt"–"red gear" (shared
    // adjective). NOT "blue bolt"–"red gear" (distance 2) and nothing
    // against the 3-word name. Support counts from the vocabulary dedup.
    assert(rows.toSet == Set(
      ("blue bolt", "red bolt", 1L, 2L, 1L, 4L),
      ("red bolt", "red gear", 2L, 1L, 1L, 4L)),
      s"got ${rows.mkString(", ")}")
  }

  test("resolveClusters: forced distributed tier labels equal the driver tier") {
    // Chain, triangle, pendant pair, and a second chain — mixed shapes.
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L),
      (30L, 31L), (31L, 32L)).toDF("doc_a", "doc_b")
    val driver = Fuzzy.resolveClusters(spark, edges, driverMaxEdges = Long.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driverMaxEdges = 0 < |E| forces the distributed min-label CC path.
    val dist = Fuzzy.resolveClusters(spark, edges, driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L,
      30L -> 30L, 31L -> 30L, 32L -> 30L)
    assert(driver == want, s"driver tier: $driver")
    assert(dist == want, s"distributed tier: $dist")
    spark.catalog.clearCache()
  }

  test("resolveClusters: tier equivalence on randomized graphs") {
    val rnd = new scala.util.Random(0xF99L)
    for (trial <- 1 to 5) {
      val n = 40
      val raw = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }
      val edges = raw.toDF("doc_a", "doc_b")
      val driver = Fuzzy.resolveClusters(spark, edges, driverMaxEdges = Long.MaxValue)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = Fuzzy.resolveClusters(spark, edges, driverMaxEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(driver == dist, s"trial $trial: driver=$driver dist=$dist")
    }
    spark.catalog.clearCache()
  }

  test("q106: support-1 noise filtered; one triangle, exact wedge count") {
    val r = Graph.q106TriangleCount.fn(spark, dir).collect().head
    assert(r.getAs[Long]("n_edges") == 4L) // 12 13 23 34; 14 is support-1
    assert(r.getAs[Long]("n_wedges") == 5L) // C(2,2)·2 + C(3,2) + 0 = 1+1+3
    assert(r.getAs[Long]("n_triangles") == 1L)
    assert(r.getAs[Double]("clustering") == 0.6) // 3·1/5
  }

  test("q128 bfsFrom: hop levels on a path graph; depth cap respected") {
    // Path 0-1-2-3-4 plus a shortcut 0-2: hops = 0,1,1(!),2,3 — node 2 is
    // reached at hop 1 via the shortcut, never re-labeled at hop 2.
    val e0 = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 2L))
      .toDF("u", "v")
    val got = Graph.bfsFrom(e0, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // Depth 1 stops the walk: nodes 3 and 4 stay unreached.
    val shallow = Graph.bfsFrom(e0, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shallow == Map(0L -> 0L, 1L -> 1L, 2L -> 1L))
    spark.catalog.clearCache()
  }

  test("q127 skylineOf: dominated and duplicate points drop, frontier stays") {
    val d = (n: Int) => java.sql.Timestamp.valueOf(s"2024-01-0$n 00:00:00")
    // Staircase frontier (price↑ trades against date↓): 3@d3, 2@d2, 1@d1.
    val pts = Seq(
      (3.0, d(3)), // frontier: best price
      (3.0, d(4)), // same price, later date → level-dominated
      (2.0, d(2)), // frontier: cheaper but earlier than everything pricier
      (2.5, d(4)), // dominated by (3.0, d3): lower price AND later date
      (1.0, d(1)), // frontier: earliest date of all
      (1.0, d(3))) // dominated by (2.0, d2) — equal-date ties lose too
      .toDF("price", "d")
    val got = Extended.skylineOf(pts).collect()
      .map(r => (r.getDouble(0), r.getTimestamp(1))).toSet
    assert(got == Set((3.0, d(3)), (2.0, d(2)), (1.0, d(1))))
  }

  test("q129 rate-limit window: the 599-second boundary is inclusive-exact") {
    import org.apache.spark.sql.expressions.Window
    // User 1 events at seconds 0, 599, 600, 1199: 599 counts 0 (inside),
    // 600 drops 0 (600-599=1 > 0) and counts 599; 1199 still counts 600.
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
      .rangeBetween(-599L, Window.currentRow)
    val got = Seq((1L, 1L, 0L), (2L, 1L, 599L), (3L, 1L, 600L), (4L, 1L, 1199L))
      .toDF("event_id", "user_id", "sec")
      .withColumn("n", count(lit(1)).over(w))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
  }

  test("q109: fixed-point PageRank respects graph structure exactly") {
    val ranks = Graph.q109PageRank.fn(spark, dir).collect()
      .map(r => r.getAs[Long]("n") -> r.getAs[Long]("r")).toMap
    // Swapping nodes 1 and 2 is a graph automorphism (both link to each
    // other and to 3) — integer PR must give them IDENTICAL ranks, not
    // merely close ones. Node 3 (degree 3, hub) outranks everything;
    // node 4 (pendant onto the hub) ranks last.
    assert(ranks(1L) == ranks(2L), s"symmetric nodes diverged: $ranks")
    assert(ranks(3L) > ranks(1L), s"hub must lead: $ranks")
    assert(ranks(4L) < ranks(1L), s"pendant must trail: $ranks")
    // Mass: floor division only ever LOSES micro-units — total stays
    // within N×(iterations+1) units of the initial 10^12, never above.
    val total = ranks.values.sum
    assert(total <= 1000000000000L && total > 999999990000L, s"mass drifted: $total")
  }
}
