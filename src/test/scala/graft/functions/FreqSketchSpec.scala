package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Misra–Gries guarantee under Spark's partial/merge execution: for ANY
  * stream and ANY partitioning (repartition count randomized), every item
  * with true count > N/(k+1) appears in the sketch output — the superset
  * property that makes the sketch→recount composition EXACT. The recount
  * test closes the loop: candidates → exact threshold equals a full
  * group-by heavy-hitter query. */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  private def passes(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("superset guarantee: count > N/(k+1) items always retained (property)") {
    GraftFunctions.register(spark)
    // Zipf-ish streams: a few planted heavy items over a wide tail, so
    // the k=8 sketch is under real eviction pressure (distinct ≫ k).
    val gen = for {
      items <- Gen.listOfN(400, Gen.frequency(
        5 -> Gen.oneOf("hh1", "hh2", "hh3"),
        4 -> Gen.choose(0, 120).map("tail" + _)))
      parts <- Gen.choose(1, 7)
    } yield (items, parts)
    passes(Prop.forAll(gen) { case (items, parts) =>
      val k = 8
      val n = items.size
      val trueCounts = items.groupBy(identity).view.mapValues(_.size.toLong)
      val mustKeep = trueCounts.filter(_._2 * (k + 1) > n).keySet
      val got = items.toDF("w").repartition(parts)
        .agg(expr(s"freq_sketch(w, $k)").as("cand"))
        .select(explode($"cand").as("e"))
        .select($"e.item").as[String].collect().toSet
      got.size <= k && mustKeep.subsetOf(got)
    }, 30)
  }

  test("rolling fold (streaming merge rule) keeps the superset guarantee (property)") {
    GraftFunctions.register(spark)
    // Split a stream into random micro-batches; per-batch MG summaries
    // folded sequentially through StreamGate.foldSketch must still retain
    // every item with global count > N/(k+1) — the q238 composition.
    val gen = for {
      items <- Gen.listOfN(360, Gen.frequency(
        5 -> Gen.oneOf("hh1", "hh2"),
        4 -> Gen.choose(0, 90).map("tail" + _)))
      nBatches <- Gen.choose(2, 5)
    } yield (items, nBatches)
    passes(Prop.forAll(gen) { case (items, nBatches) =>
      val k = 8
      val n = items.size
      val trueCounts = items.groupBy(identity).view.mapValues(_.size.toLong)
      val mustKeep = trueCounts.filter(_._2 * (k + 1) > n).keySet
      val batches = items.grouped(math.max(1, items.size / nBatches)).toSeq
      val folded = batches.zipWithIndex.foldLeft(
        Seq.empty[(String, Long)].toDF("gram", "cnt")) { case (prev, (b, _)) =>
        val own = b.toDF("gram").repartition(3)
          .agg(expr(s"freq_sketch(gram, $k)").as("c"))
          .select(explode($"c").as("e"))
          .select($"e.item".as("gram"), $"e.lb".as("cnt"))
        graft.streaming.StreamGate.foldSketch(prev, own, k)
      }
      val got = folded.select($"gram").as[String].collect().toSet
      got.size <= k && mustKeep.subsetOf(got)
    }, 15)
  }

  test("items beyond the 64 KiB writeUTF limit survive buffer serialization") {
    GraftFunctions.register(spark)
    // One giant space-free token (crawl reality: base64 blobs, minified
    // markup). repartition forces partial buffers through serialize/
    // deserialize at the shuffle — writeUTF would throw here.
    val big = "x" * 70000
    val items = Seq.fill(5)(big) ++ (1 to 20).map("t" + _)
    val got = items.toDF("w").repartition(3)
      .agg(expr("freq_sketch(w, 4)").as("c"))
      .select(explode($"c").as("e")).select($"e.item").as[String].collect()
    assert(got.contains(big)) // 5/25 > 1/(k+1) ⇒ guaranteed retained
  }

  test("grouped aggregation keeps per-group buffers independent") {
    GraftFunctions.register(spark)
    // Distinct per-group heavy items: a shared buffer (or cross-group
    // merge bug) would leak one group's items into the other's output.
    val items = Seq.fill(50)(("g1", "alpha")) ++ Seq.fill(50)(("g2", "beta")) ++
      (1 to 100).map(i => ("g1", "t" + (i % 37))) ++
      (1 to 100).map(i => ("g2", "u" + (i % 37)))
    val got = items.toDF("g", "w").repartition(4)
      .groupBy($"g").agg(expr("freq_sketch(w, 4)").as("c"))
      .select($"g", explode($"c").as("e"))
      .select($"g", $"e.item".as("w"))
      .as[(String, String)].collect().toSet
    // alpha is 1/3 of g1's stream (> 150/5) and beta 1/3 of g2's — each
    // MUST be retained in ITS group; neither vocabulary overlaps, so any
    // cross-group item proves buffer leakage.
    assert(got.contains(("g1", "alpha")) && got.contains(("g2", "beta")))
    assert(got.collect { case ("g1", w) => w }.forall(w => w == "alpha" || w.startsWith("t")))
    assert(got.collect { case ("g2", w) => w }.forall(w => w == "beta" || w.startsWith("u")))
  }

  test("sketch→recount composition equals the exact group-by heavy hitters") {
    GraftFunctions.register(spark)
    val items = (1 to 300).map(i => "t" + (i % 97)) ++
      Seq.fill(60)("alpha") ++ Seq.fill(45)("beta") ++ Seq.fill(20)("gamma")
    val tok = items.toDF("w").repartition(5)
    val n = items.size.toLong
    // threshold share > 5% with a k=32 sketch (1/33 < 5% ⇒ guarantee holds)
    val cands = tok.agg(expr("freq_sketch(w, 32)").as("c"))
      .select(explode($"c").as("e")).select($"e.item".as("w"))
    val got = tok.join(broadcast(cands), "w")
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" * 20 > n)
      .as[(String, Long)].collect().toMap
    val exp = items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 * 20 > n).toMap
    assert(got == exp)
  }
}
