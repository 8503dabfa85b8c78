package graft.ops

import java.nio.file.Paths

import graft.SparkSpec
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

  test("q106: support-1 noise filtered; one triangle, exact wedge count") {
    val r = Graph.q106TriangleCount.fn(spark, dir).collect().head
    assert(r.getAs[Long]("n_edges") == 4L) // 12 13 23 34; 14 is support-1
    assert(r.getAs[Long]("n_wedges") == 5L) // C(2,2)·2 + C(3,2) + 0 = 1+1+3
    assert(r.getAs[Long]("n_triangles") == 1L)
    assert(r.getAs[Double]("clustering") == 0.6) // 3·1/5
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
