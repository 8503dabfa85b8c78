package graft.ops

import graft.SparkSpec

/** Equivalence of the two connected-components implementations.
  *
  * The min-label loop converges in diameter(G) rounds (capped at 20) —
  * fine for shallow near-dup graphs; the large-star/small-star variant
  * converges in O(log²n) rounds on any shape. The deep-chain case below is
  * exactly the one the min-label cap cannot handle: a 1000-node path has
  * diameter 999, so only the star variant labels it correctly.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def ccMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap

  test("star CC labels a 1000-node path in O(log n) rounds (min-label's worst case)") {
    val path = (0L until 999L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = ccMap(Dedup.connectedComponentsStar(path))
    assert(labels.size == 1000)
    assert(labels.values.forall(_ == 0L),
      s"path graph must collapse to one component rooted at 0; got " +
        s"${labels.values.toSet.size} distinct labels")
  }

  test("min-label CC falls back to the star transform when the cap is hit") {
    // Diameter 999 ≫ the 20-round cap: without the fallback this returned
    // silently wrong (non-fixpoint) labels.
    val path = (0L until 999L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = ccMap(Dedup.connectedComponents(path))
    assert(labels.size == 1000 && labels.values.forall(_ == 0L))
  }

  test("star CC and min-label CC agree on random shallow graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      // ~60 nodes, ~45 random edges → many small components whose
      // diameters sit well inside the min-label loop's 20-round cap.
      val edges = Seq.fill(45) {
        val a = rnd.nextInt(60).toLong
        val b = rnd.nextInt(60).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val df = edges.toDF("doc_a", "doc_b")
      val minLabel = ccMap(Dedup.connectedComponents(df))
      val star = ccMap(Dedup.connectedComponentsStar(df))
      assert(star === minLabel, s"trial $trial diverged")
    }
  }

  test("star CC on two components plus an isolated edge keeps them separate") {
    val df = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val labels = ccMap(Dedup.connectedComponentsStar(df))
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }
}
