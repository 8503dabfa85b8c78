package graft.ops

import java.nio.file.Paths

import graft.SparkSpec
import org.scalatest.BeforeAndAfterAll

/** Planted-duplicate tests for the dedup + similarity operators: writes a
  * tiny documents/embeddings fixture in the driver-testdata layout and runs
  * the real query functions against it. */
class DedupSimSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val dir = Paths.get("target", "tmp", "dedupfix").toAbsolutePath.toString

  private val baseText =
    (1 to 50).map(i => s"word$i").mkString(" ") // 50 distinct tokens
  private val nearDup = baseText.replace("word50", "changed") // 1 token differs

  override def beforeAll(): Unit = {
    super.beforeAll()
    Seq(
      (1L, baseText, "en", "src0", baseText.length.toLong),
      (2L, baseText, "en", "src0", baseText.length.toLong), // exact dup of 1
      (3L, nearDup, "en", "src0", nearDup.length.toLong), // near dup of 1
      (4L, (1 to 50).map(i => s"other$i").mkString(" "), "fr", "src1", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val e1 = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)
    // perturbation in dim 60 — outside the 8 sign-bucket dims, so e1/e2
    // share an LSH bucket while remaining distinct vectors
    val e2 = Array.tabulate(64)(i => if (i == 0) 0.999f else if (i == 60) 0.04f else 0.0f)
    val e3 = Array.tabulate(64)(i => if (i == 1) 1.0f else 0.0f)
    val e4 = Array.tabulate(64)(i => if (i == 2) -1.0f else 0.0f)
    // f1/f2: a true near-dup pair (cos ≈ 0.9992) split across sign buckets
    // by ONE bit (dim 1 is +0.02 vs −0.02) — invisible to the same-bucket
    // join, recovered by hamming-1 probing (q93's discriminating case).
    val f1 = Array.tabulate(64)(i =>
      if (i == 5) 1.0f else if (i == 1) 0.02f else 0.0f)
    val f2 = Array.tabulate(64)(i =>
      if (i == 5) 1.0f else if (i == 1) -0.02f else 0.0f)
    Seq((1L, e1, 0), (2L, e2, 0), (3L, e3, 0), (4L, e4, 1),
      (5L, f1, 2), (6L, f2, 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("q34 exact dedup groups identical texts") {
    val rows = Dedup.q34ExactDedup.fn(spark, dir).collect()
    val dup = rows.filter(_.getAs[Long]("n_docs") == 2L)
    assert(dup.length == 1 && dup(0).getAs[Long]("keeper") == 1L)
  }

  test("q35 MinHash-LSH surfaces exact and near duplicates") {
    val pairs = Dedup.q35MinHashLsh.fn(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 2L))) // identical docs always collide
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // unrelated doc
  }

  test("q47 clustering: planted dup chain collapses to one component") {
    val rows = Dedup.q47DedupClusters.fn(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    // docs 1,2 identical; 3 near-dup of 1 → all label to min id 1; 4 has no edges
    assert(rows.get(1L).contains(1L) && rows.get(2L).contains(1L))
    assert(rows.get(3L).forall(_ == 1L)) // present iff LSH paired it
    assert(!rows.contains(4L))
  }

  test("q36 SimHash: identical docs share fingerprints; near dup is close") {
    val fp = Dedup.q36SimHash.fn(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("simhash")).toMap
    assert(fp(1L) == fp(2L))
    val hamming = fp(1L).zip(fp(3L)).count { case (a, b) => a != b }
    assert(hamming <= 8, s"near-dup hamming distance $hamming")
  }

  test("q37 n-gram Jaccard: exact pair at 1.0, near pair high, cross-source absent") {
    val rows = Dedup.q37NgramJaccard.fn(spark, dir).collect()
    val m = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
      r.getAs[Double]("jaccard")).toMap
    assert(m((1L, 2L)) == 1.0)
    assert(m((1L, 3L)) > 0.85) // 3 of 48 shingles changed
    assert(!m.contains((1L, 4L)))
  }

  test("q38 cosine near-dup finds the planted close pair only") {
    val rows = Similarity.q38EmbedNearDup.fn(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("vec_a") == 1L && rows(0).getAs[Long]("vec_b") == 2L)
    assert(rows(0).getAs[Double]("cos_sim") > 0.99)
  }

  test("q39 brute-force top-k ranks the close vector first") {
    val rows = Similarity.q39AnnTopK.fn(spark, dir).collect()
    val q1 = rows.filter(_.getAs[Long]("query_id") == 1L)
    assert(q1.head.getAs[Long]("neighbor_id") == 2L) // rank 1 = near-identical
  }

  test("q40 LSH bucketing only scores same-bucket candidates") {
    val rows = Similarity.q40AnnLsh.fn(spark, dir).collect()
    // vecs 1 and 2 share sign bucket (dim0 > 0); 3 and 4 don't match them
    val q1 = rows.filter(_.getAs[Long]("query_id") == 1L)
    assert(q1.length == 1 && q1.head.getAs[Long]("neighbor_id") == 2L)
  }

  test("q30 token stats per language") {
    val rows = TextAnalysis.q30TokenStats.fn(spark, dir).collect()
    val en = rows.filter(_.getAs[String]("lang") == "en").head
    assert(en.getAs[Long]("n_docs") == 3L)
    assert(en.getAs[Long]("sum_tokens") == 150L)
    assert(en.getAs[Long]("n_vocab") == 51L) // word1..word50 + changed
  }

  test("q93: probe expansion recovers the sign-bit-split pair the bucket join misses") {
    val row = Similarity.q93NearDupMultiprobe.fn(spark, dir).collect()(0)
    // Truth: (1,2) same-bucket near-dup and (5,6) one-bit-split near-dup.
    assert(row.getAs[Long]("n_exact") == 2L)
    assert(row.getAs[Long]("n_pairs_1probe") == 1L) // q38's generator misses (5,6)
    assert(row.getAs[Long]("n_pairs_9probe") == 2L) // probing recovers it
    assert(row.getAs[Double]("recall_1probe") == 0.5)
    assert(row.getAs[Double]("recall_9probe") == 1.0)
  }

  test("q74 SemDeDup: per-cluster candidate pairs stay cap-bounded under skew") {
    import org.apache.spark.sql.functions.{col, lit}
    // 4 seed centroids (vec_id 0-3) along distinct axes; 300 extra copies
    // of centroid 0's direction form a pathological skew cluster (301
    // members), 30 extras join centroid 1 (31 members — under the cap).
    val dim = 8
    def unit(axis: Int): Array[Float] =
      Array.tabulate(dim)(i => if (i == axis) 1.0f else 0.0f)
    val rows =
      (0L to 3L).map(i => (i, unit(i.toInt))) ++
        (4L to 303L).map(i => (i, unit(0))) ++
        (304L to 333L).map(i => (i, unit(1)))
    val e = rows.toDF("vec_id", "embedding").withColumn("n2", lit(1.0))
    val assign = Similarity.centroidAssign(e, 4L)
    val cap = 50L
    val counts = Similarity.semDeDupCandidates(e, assign, cap)
      .groupBy(col("centroid_id")).count().collect()
      .map(r => r.getAs[Long]("centroid_id") -> r.getAs[Long]("count")).toMap
    // The over-cap cluster contributes ZERO pairs (anti-joined out) …
    assert(!counts.contains(0L), s"over-cap cluster produced pairs: $counts")
    // … the small cluster is scanned in full …
    assert(counts(1L) == 31L * 30L / 2L)
    // … and no cluster can exceed the cap-implied pair bound.
    assert(counts.values.forall(_ <= cap * (cap - 1) / 2))
  }

  test("q48 IVF: k is size-derived; per-query candidate volume is nprobe·N/k") {
    import org.apache.spark.sql.functions.{col, lit}
    val big = Paths.get("target", "tmp", "ivffix").toAbsolutePath.toString
    val n = 1280
    val k = Similarity.semK(n.toLong)
    assert(k == 20L, "this fixture must exercise the DYNAMIC k path (k > 16)")
    def unit(axis: Int): Array[Float] =
      Array.tabulate(64)(i => if (i == axis) 1.0f else 0.0f)
    // n vectors spread evenly over k axes; vec_id < k are the seed centroids.
    (0 until n).map(i => (i.toLong, unit(i % 20), i % 20))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$big/embeddings.parquet")
    // Inverted lists: exactly N/k members each, so an nprobe=2 query scans
    // 2·N/k − 1 candidates — constant in N by construction of semK.
    val e = graft.Tables(spark, big, "embeddings").withColumn("n2", lit(1.0))
    val sizes = Similarity.centroidAssign(e, k)
      .groupBy(col("centroid_id")).count()
      .collect().map(_.getAs[Long]("count"))
    assert(sizes.length == k.toInt, s"expected $k inverted lists, got ${sizes.length}")
    assert(sizes.forall(_ == n / k), s"unbalanced lists: ${sizes.toSeq}")
    // End-to-end through the real query: 10 queries × top-3; rank-1..3 for
    // query 0 are its same-axis copies at cosine 1.0.
    val rows = Similarity.q48AnnIvf.fn(spark, big).collect()
    assert(rows.length == 30)
    val q0 = rows.filter(_.getAs[Long]("query_id") == 0L).sortBy(_.getAs[Long]("rank"))
    assert(q0.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(20L, 40L, 60L))
    assert(q0.forall(_.getAs[Double]("cos_sim") == 1.0))
  }

  test("semK derives cluster count from corpus size, clamped") {
    assert(Similarity.semK(500L) == 16L) // small corpora: floor at 16
    assert(Similarity.semK(2000L) == 31L) // 2000/64
    assert(Similarity.semK(100L * 1000L * 1000L) == 4096L) // ceiling
  }

  test("incremental IVF: day-2 batch assigned to FROZEN day-1 centroids, dynamic k") {
    import org.apache.spark.sql.functions.{col, lit}
    val big = Paths.get("target", "tmp", "ivfinc").toAbsolutePath.toString
    val n = 2560
    def unit(axis: Int): Array[Float] =
      Array.tabulate(64)(j => if (j == axis) 1.0f else 0.0f)
    // Axis (i/2)%20: both parities cover all 20 axes, so the day-1 (even)
    // seed set {0,2,..,38} is one centroid per axis.
    (0 until n).map(i => (i.toLong, unit((i / 2) % 20), ((i / 2) % 20).toLong))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$big/embeddings.parquet")
    val e = graft.Tables(spark, big, "embeddings").withColumn("n2", lit(1.0))
    val idx = Paths.get("target", "tmp",
      s"ivfidx-${java.util.UUID.randomUUID()}").toAbsolutePath.toString
    Similarity.ivfAppend(spark, idx, e.filter(col("vec_id") % 2 === 0), 0L)
    assert(spark.read.parquet(s"$idx/centroids").count() == 20,
      "k must be size-derived from the day-1 batch (1280/64 = 20)")
    Similarity.ivfAppend(spark, idx, e.filter(col("vec_id") % 2 === 1), 1L)
    assert(spark.read.parquet(s"$idx/centroids").count() == 20,
      "day 2 must not retrain: centroids are frozen")
    // Replay of day 2 (at-least-once delivery): the idempotent per-batch
    // publish must not duplicate assignments.
    Similarity.ivfAppend(spark, idx, e.filter(col("vec_id") % 2 === 1), 1L)
    val assign = spark.read.parquet(s"$idx/assign")
    assert(assign.count() == n,
      "index must cover both days exactly once (replay-idempotent)")
    val sizes = assign.groupBy("centroid_id").count()
      .collect().map(_.getAs[Long]("count"))
    assert(sizes.length == 20 && sizes.forall(_ == n / 20),
      s"inverted lists unbalanced: ${sizes.toSeq}")
    // Query axis-0: top-3 from the stored lists are its same-axis copies.
    val rows = Similarity.ivfQuery(spark, idx, e, e.filter(col("vec_id") === 0))
      .orderBy(col("rank")).collect()
    assert(rows.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 40L, 41L))
    assert(rows.forall(_.getAs[Double]("cos_sim") == 1.0))
  }

  test("compactBandIndex: identical pairs after consolidation; replay window preserved") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables(spark, dir, "documents")
    def newIdx() = Paths.get("target", "tmp",
      s"bandcmp-${java.util.UUID.randomUUID()}").toAbsolutePath.toString
    val idxA = newIdx(); val idxB = newIdx() // A compacts, B is the twin
    def day(idx: String, d: Int): Set[(Long, Long, Boolean)] = {
      val out = Dedup.incrementalDayRun(spark, idx,
        docs.filter(col("doc_id") % 4 === d), d.toLong)
      val rows = out.collect().map(r => (r.getAs[Long]("doc_a"),
        r.getAs[Long]("doc_b"), r.getAs[Boolean]("both_new"))).toSet
      out.unpersist()
      rows
    }
    assert(day(idxA, 0) == day(idxB, 0))
    val a1 = day(idxA, 1); assert(a1 == day(idxB, 1))
    Dedup.compactBandIndex(spark, idxA, keepRecent = 1, targetFiles = 1)
    // Promoted layout: pointer + consolidated batch=-1 + the replayable
    // recent batch; the superseded root generation is GC'd.
    assert(new java.io.File(s"$idxA/_bandgen-1").exists())
    assert(new java.io.File(s"$idxA/gen=1/batch=-1").exists())
    assert(new java.io.File(s"$idxA/gen=1/batch=1").exists())
    assert(!new java.io.File(s"$idxA/batch=0").exists())
    // The at-least-once window: replaying the most recent day must still
    // exclude its own bands and reproduce its original pairs exactly.
    assert(day(idxA, 1) == a1, "recent-batch replay diverged after compaction")
    // Later days see identical candidates on compacted vs twin index.
    assert(day(idxA, 2) == day(idxB, 2))
    // Second compaction folds the old recent batch into the archive...
    Dedup.compactBandIndex(spark, idxA, keepRecent = 1, targetFiles = 1)
    assert(new java.io.File(s"$idxA/_bandgen-2").exists())
    assert(!new java.io.File(s"$idxA/gen=1").exists(), "old generation must be GC'd")
    assert(day(idxA, 3) == day(idxB, 3))
    // ...and a compaction with nothing outside the replay window is a no-op.
    Dedup.compactBandIndex(spark, idxA, keepRecent = 2, targetFiles = 1)
    assert(!new java.io.File(s"$idxA/_bandgen-3").exists(),
      "no-op compaction must not publish a new generation")
    spark.catalog.clearCache()
  }

  test("three-day incremental dedup against a persisted band index") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables(spark, dir, "documents")
    val idx = Paths.get("target", "tmp",
      s"bandidx-${java.util.UUID.randomUUID()}").toAbsolutePath.toString
    val seen = scala.collection.mutable.Set[Long]()
    val allPairs = scala.collection.mutable.Set[(Long, Long)]()
    (0 until 3).foreach { day =>
      val batch = docs.filter(col("doc_id") % 3 === day)
      val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
      val out = Dedup.incrementalDayRun(spark, idx, batch, day.toLong)
      val rows = out.collect().map(r => (r.getAs[Long]("doc_a"),
        r.getAs[Long]("doc_b"), r.getAs[Boolean]("both_new")))
      out.unpersist()
      // Replay the same day (at-least-once): same pairs, no band duplication.
      val replay = Dedup.incrementalDayRun(spark, idx, batch, day.toLong)
      assert(replay.collect().map(r => (r.getAs[Long]("doc_a"),
        r.getAs[Long]("doc_b"), r.getAs[Boolean]("both_new"))).toSet
        == rows.toSet, s"day $day replay diverged")
      replay.unpersist()
      rows.foreach { case (a, b, bn) =>
        assert(batchIds.contains(a) || batchIds.contains(b),
          s"day $day emitted pair ($a,$b) not touching its batch")
        assert(bn == (batchIds.contains(a) && batchIds.contains(b)),
          s"day $day mis-routed both_new for ($a,$b)")
        assert(!(seen.contains(a) && seen.contains(b)),
          s"archive-internal pair ($a,$b) re-emitted on day $day")
      }
      allPairs ++= rows.map(t => (t._1, t._2))
      seen ++= batchIds
      // The persisted index now covers every doc seen so far.
      assert(spark.read.parquet(idx).select("doc_id").distinct().count()
        == seen.size)
    }
    // Three incremental days surface exactly the candidate set one full
    // run finds (no bucket crosses the hot cap mid-stream here).
    val full = Dedup.q35MinHashLsh.fn(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(allPairs.toSet == full)
  }

  test("incrementalPairs: archive never self-paired; both_new routes the keeper") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables(spark, dir, "documents")
    // Archive = {1, 3} (near-dup pair WITHIN the archive — must NOT emit);
    // new batch = {2, 4}. Doc 2 is an exact dup of archived doc 1 → one
    // new-vs-archive pair; doc 4 is unrelated → nothing.
    val out = Dedup.incrementalPairs(
      archiveBands = Dedup.bandsOf(docs.filter(col("doc_id").isin(1L, 3L))),
      newDocs = docs.filter(col("doc_id").isin(2L, 4L)))
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Boolean]("both_new"))).toSet
    assert(!out.contains((1L, 3L, false)), "archive-internal pair must not re-emit")
    assert(out.contains((1L, 2L, false)), "new-vs-archive pair, archive doc wins")
    // doc 2 ≡ doc 1 ≈ doc 3, so 2-vs-3 may also surface — but only as
    // new-vs-archive; no pair may claim both_new (batch has no dup pair).
    assert(out.forall(!_._3), s"no both_new pairs expected, got $out")
  }

  test("q104 bloom decontamination: prefilter in plan, result exact vs q67-style join") {
    // Own fixture: doc 0/10 are "bench" (doc_id % 10 == 0); doc 1 copies
    // bench text (fully contaminated), doc 11 shares a half, docs 2/12
    // are clean. A bloom false positive cannot flip any of these —
    // the exact join decides membership.
    val bdir = Paths.get("target", "tmp", s"bloomfix-${System.nanoTime}")
      .toAbsolutePath.toString
    val benchText = (1 to 40).map(i => s"bench$i").mkString(" ")
    val halfShared = ((1 to 20).map(i => s"bench$i") ++
      (1 to 20).map(i => s"own$i")).mkString(" ")
    Seq(
      (0L, benchText, "en", "s0", 1L),
      (10L, (1 to 40).map(i => s"eval$i").mkString(" "), "en", "s0", 1L),
      (1L, benchText, "en", "s1", 1L),
      (11L, halfShared, "en", "s1", 1L),
      (2L, (1 to 40).map(i => s"clean$i").mkString(" "), "en", "s1", 1L),
      (12L, (1 to 40).map(i => s"pure$i").mkString(" "), "en", "s1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$bdir/documents.parquet")
    val res = Dedup.q104BloomDecontaminate.fn(spark, bdir)
    assert(res.queryExecution.executedPlan.toString.contains("might_contain"),
      "bloom prefilter missing from the physical plan")
    val rows = res.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hit") > 0)).toMap
    assert(rows(1L), "full copy of bench text must flag")
    assert(rows(11L), "half-shared doc must flag")
    assert(!rows(2L) && !rows(12L), "clean docs must not flag")
    assert(!rows.contains(0L) && !rows.contains(10L), "bench docs are not candidates")
  }
}
