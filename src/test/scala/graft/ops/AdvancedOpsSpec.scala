package graft.ops

import java.nio.file.Paths
import java.sql.Timestamp

import graft.SparkSpec
import org.scalatest.BeforeAndAfterAll

/** Planted-answer tests for the round-3 operators: binned range join (q61),
  * dedup representative selection (q62), TF-IDF (q63), int8 embedding
  * quantization (q64), and SimHash hamming pairing (q65). Reuses the
  * DedupSimSpec fixture shapes; everything runs the real query functions
  * against a tiny driver-layout parquet directory. */
class AdvancedOpsSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val dir = Paths.get("target", "tmp", "advfix").toAbsolutePath.toString

  private val baseText = (1 to 50).map(i => s"word$i").mkString(" ")
  private val nearDup = baseText.replace("word50", "changed") // 1 token differs

  private def ts(s: String) = Timestamp.valueOf(s)

  override def beforeAll(): Unit = {
    super.beforeAll()
    Seq(
      (1L, baseText, "en", "src0", baseText.length.toLong),
      (2L, baseText, "en", "src0", baseText.length.toLong), // exact dup of 1
      (3L, nearDup, "en", "src0", nearDup.length.toLong), // near dup, 1 char longer
      (4L, (1 to 50).map(i => s"other$i").mkString(" "), "fr", "src1", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val e1 = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)
    val e2 = Array.tabulate(64)(i => if (i == 0) 0.999f else if (i == 60) 0.04f else 0.0f)
    val e4 = Array.tabulate(64)(i => if (i == 2) -1.0f else 0.0f)
    Seq((1L, e1, 0), (2L, e2, 0), (4L, e4, 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // One interval anchor (997 % 997 = 0) at 2020-01-01 → window
    // [2020-01-01, 2020-01-15); a non-anchor order that must be ignored.
    Seq(
      (997L, ts("2020-01-01 00:00:00")),
      (998L, ts("2020-06-01 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(
      (ts("2020-01-01 00:00:00"), 5.0), // in (closed lower bound)
      (ts("2020-01-14 23:59:59"), 7.0), // in (last instant of the window)
      (ts("2020-01-15 00:00:00"), 11.0), // out (open upper bound)
      (ts("2019-12-31 23:59:59"), 13.0)) // out (before lo)
      .toDF("l_shipdate", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  test("q61 range join: closed-open containment, anchors only") {
    val rows = Intervals.q61RangeJoin.fn(spark, dir).collect()
    assert(rows.length == 1) // order 998 is not an anchor; no other window
    assert(rows(0).getAs[Long]("o_orderkey") == 997L)
    assert(rows(0).getAs[Long]("n_items") == 2L)
    assert(rows(0).getAs[Double]("sum_qty") == 12.0)
  }

  test("q62 keeper: cluster keeps the longest doc, reports true size") {
    val rows = Dedup.q62DedupKeepBest.fn(spark, dir).collect()
    val c1 = rows.filter(_.getAs[Long]("cluster_id") == 1L)
    assert(c1.length == 1)
    // docs 1,2 identical, 3 near-dup (paired by LSH per DedupSimSpec) —
    // one cluster of 3; doc 3 is one char longer, so it is the keeper.
    assert(c1(0).getAs[Long]("n_docs") == 3L)
    assert(c1(0).getAs[Long]("keeper_doc") == 3L)
    assert(c1(0).getAs[Long]("keeper_chars") == baseText.length.toLong + 1)
    assert(!rows.exists(_.getAs[Long]("cluster_id") == 4L)) // no self-cluster
  }

  test("q63 TF-IDF: rare token outranks common ones; ties break on token") {
    val rows = TextAnalysis.q63TfIdf.fn(spark, dir).collect()
    val d1 = rows.filter(_.getAs[Long]("doc_id") == 1L).sortBy(_.getAs[Long]("rk"))
    // word50 appears in 2 of 4 docs (tf·N/df = 1·4/2 = 2.0); word1..49 in 3
    // (≈1.333) — word50 must rank first, then lexicographic among the tied.
    assert(d1(0).getAs[String]("tok") == "word50")
    assert(d1(0).getAs[Double]("tf_idf") == 2.0)
    assert(d1(1).getAs[String]("tok") == "word1")
    assert(d1(2).getAs[String]("tok") == "word10")
    val d4 = rows.filter(_.getAs[Long]("doc_id") == 4L).sortBy(_.getAs[Long]("rk"))
    // every token of doc 4 is unique to it: score 4.0, pure lexicographic
    assert(d4.map(_.getAs[String]("tok")).toSeq == Seq("other1", "other10", "other11"))
    assert(d4.forall(_.getAs[Double]("tf_idf") == 4.0))
  }

  test("q64 quantization: exact vectors round-trip with zero error") {
    val rows = Similarity.q64EmbedQuantize.fn(spark, dir).collect()
    val byLabel = rows.map(r => r.getAs[Int]("label") -> r).toMap
    // label 1 = single ±1 component: amax=1, qv=±127, reconstruction exact
    assert(byLabel(1).getAs[Long]("n_vecs") == 1L)
    assert(byLabel(1).getAs[Double]("mse") == 0.0)
    assert(byLabel(1).getAs[Double]("max_abs_err") == 0.0)
    // label 0 contains the perturbed vector — tiny but nonzero error
    assert(byLabel(0).getAs[Long]("n_vecs") == 2L)
    assert(byLabel(0).getAs[Double]("max_abs_err") < 0.005)
  }

  test("q65 SimHash hamming: identical docs pair at distance 0") {
    val rows = Dedup.q65SimhashHamming.fn(spark, dir).collect()
    val m = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
      r.getAs[Long]("hamming")).toMap
    assert(m.get((1L, 2L)).contains(0L)) // identical text ⇒ identical simhash
    assert(!m.keys.exists(p => p._1 == 4L || p._2 == 4L)) // disjoint vocab
  }

  test("q66 Lloyd iteration: singleton clusters reproduce their member") {
    // vec_ids 1,2,4 are all < 16 → every vector is its own nearest centroid
    // (cos(self) = 1): three singleton clusters whose updated centroid is
    // the member itself, so new_norm2 == |v|².
    val rows = Similarity.q66KmeansIter.fn(spark, dir).collect()
      .map(r => r.getAs[Long]("centroid_id") -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 4L))
    assert(rows.values.forall(_.getAs[Long]("n_members") == 1L))
    assert(rows(1L).getAs[Double]("new_norm2") == 1.0) // unit vector
    assert(rows(4L).getAs[Double]("new_norm2") == 1.0)
    // e2 = (0.999, …, 0.04): norm² ≈ 0.9996
    assert(math.abs(rows(2L).getAs[Double]("new_norm2") - 0.99960116) < 1e-6)
  }

  test("q61 property: bin-bucketed rewrite ≡ naive θ-join on random data") {
    import org.apache.spark.sql.functions._
    val pdir = Paths.get("target", "tmp", "advfix_rj").toAbsolutePath.toString
    val rnd = new scala.util.Random(42)
    def t(day: Int, sec: Int) =
      new Timestamp(Timestamp.valueOf("2021-01-01 00:00:00").getTime +
        day * 86400000L + sec * 1000L)
    // 10 anchor orders (keys multiples of 997) at random days incl. same-day
    // collisions; 300 lineitems at random instants incl. window edges.
    val orders = (1 to 10).map(i => (i * 997L, t(rnd.nextInt(40), rnd.nextInt(86400))))
    orders.toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$pdir/orders.parquet")
    val items = (1 to 300).map(_ => (t(rnd.nextInt(60), rnd.nextInt(86400)), rnd.nextInt(50).toDouble)) ++
      orders.flatMap { case (_, lo) => // exact boundary probes per interval
        Seq((lo, 1.0), (new Timestamp(lo.getTime + 14L * 86400000L), 1.0),
          (new Timestamp(lo.getTime + 14L * 86400000L - 1000L), 1.0))
      }
    items.toDF("l_shipdate", "l_quantity")
      .write.mode("overwrite").parquet(s"$pdir/lineitem.parquet")

    val binned = Intervals.q61RangeJoin.fn(spark, pdir).collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("n_items"),
        r.getAs[Double]("sum_qty"))).toSet
    val iv = spark.read.parquet(s"$pdir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderdate").as("lo"),
        (col("o_orderdate") + expr("INTERVAL 14 DAYS")).as("hi"))
    val naive = spark.read.parquet(s"$pdir/lineitem.parquet")
      .crossJoin(iv)
      .filter(col("l_shipdate") >= col("lo") && col("l_shipdate") < col("hi"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_items"), graft.Q.dsum2(col("l_quantity")).as("sum_qty"))
      .collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("n_items"),
        r.getAs[Double]("sum_qty"))).toSet
    assert(binned == naive)
  }

  test("q64 property: every reconstruction error is within amax/254 + ulp") {
    import org.apache.spark.sql.functions._
    // |v - round(v·127/amax)·amax/127| ≤ 0.5·amax/127 = amax/254 exactly
    // (round is within half a quantization step); allow 1e-9 for the two
    // correctly-rounded float ops.
    val el = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), explode(col("embedding")).as("vf"))
      .select(col("vec_id"), col("vf").cast("double").as("v"))
    val am = el.groupBy(col("vec_id")).agg(max(abs(col("v"))).as("amax"))
    val bad = el.join(am, "vec_id")
      .withColumn("qv", round(col("v") * 127.0 / col("amax")))
      .withColumn("err", abs(col("v") - col("qv") * col("amax") / 127.0))
      .filter(col("err") > col("amax") / 254.0 + 1e-9)
      .count()
    assert(bad == 0L)
  }

  test("q67 decontamination flags docs overlapping the benchmark set") {
    val cdir = Paths.get("target", "tmp", "advfix_decon").toAbsolutePath.toString
    val benchText = "alpha beta gamma delta epsilon zeta" // docs < 5 = benchmark
    Seq(
      (1L, benchText, "en", "src0", 10L),
      (6L, benchText, "en", "src0", 10L), // full overlap → contaminated
      (7L, "alpha beta gamma other words here still going", "en", "src0", 10L),
      (8L, "completely different content nothing shared at all", "en", "src0", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$cdir/documents.parquet")
    val rows = Dedup.q67Decontaminate.fn(spark, cdir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("overlap"), r.getAs[Boolean]("contaminated"))).toMap
    assert(rows(6L) == ((1.0, true)))
    // doc 7: shingles "alpha beta gamma" hits; "beta gamma other"… don't
    assert(rows(7L)._1 > 0.0 && rows(7L)._1 < 0.5 && !rows(7L)._2)
    assert(!rows.contains(8L)) // zero overlap → not reported
  }

  test("q68 repetition: repeated shingles raise dup_frac above threshold") {
    val rdir = Paths.get("target", "tmp", "advfix_rep").toAbsolutePath.toString
    Seq(
      (1L, "x x x x x", "en", "src0", 9L), // "x x x" ×3 → dup_frac 2/3
      (2L, "a b c d e f g h", "en", "src0", 15L)) // all 6 shingles distinct
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$rdir/documents.parquet")
    val rows = Dedup.q68Repetition.fn(spark, rdir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Long]("n_sh") == 3L)
    assert(rows(1L).getAs[Long]("d_sh") == 1L)
    assert(rows(1L).getAs[Double]("dup_frac") == 0.6667)
    assert(rows(1L).getAs[Long]("max_cnt") == 3L)
    assert(rows(1L).getAs[Boolean]("repetitive"))
    assert(rows(2L).getAs[Double]("dup_frac") == 0.0)
    assert(!rows(2L).getAs[Boolean]("repetitive"))
  }

  test("q120 compactLog: delete-then-reinsert survives, plain delete dies") {
    val log = Seq(
      (1L, 1, "I", "a"), // insert only → survives as-is
      (2L, 1, "I", "b"), (2L, 2, "U", "b2"), // update wins
      (3L, 1, "I", "c"), (3L, 2, "D", null), // deleted → gone
      (4L, 1, "I", "d"), (4L, 2, "D", null), (4L, 3, "I", "d2")) // reborn
      .toDF("k", "seq", "op", "payload")
    val out = Snapshot.compactLog(log).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(out == Map(1L -> ((1, "a")), 2L -> ((2, "b2")), 4L -> ((3, "d2"))))
  }

  test("q121 spanProfile: cross-doc and self-repeated spans, short docs out") {
    val docs = Seq(
      (1L, "a b c d"), // spans: "a b c", "b c d"
      (2L, "x a b c"), // spans: "x a b", "a b c" — shares "a b c" with doc 1
      (3L, "p q p q p q"), // every width-3 window repeats within the doc
      (4L, "u v")) // shorter than the span width → excluded
      .toDF("doc_id", "text")
    val out = Dedup.spanProfile(docs, 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(out == Map(
      1L -> ((2L, 1L, 0.5)), 2L -> ((2L, 1L, 0.5)), 3L -> ((4L, 4L, 1.0))))
    spark.catalog.clearCache()
  }

  test("q122 bm25: exact single-doc value; tf beats dl-penalized tf") {
    // Minimal closed-form check: one doc = one token = the query term.
    // num = 22·1·1·(2(1−1)+1) = 22; den = (10+3+9)·(2·1+1) = 66 → 1/3.
    val one = TextAnalysis.bm25Scores(
      Seq((1L, "join")).toDF("doc_id", "text"), Seq("join")).collect()
    assert(one.map(r => (r.getLong(0), r.getDouble(1))).toSeq
      == Seq((1L, 0.333333)))
    // Ranking property: same tf, longer doc scores lower; higher tf at the
    // same length scores higher; docs without a query term are absent.
    val docs = Seq(
      (1L, "join join pad pad"),
      (2L, "join join pad pad pad pad pad pad"),
      (3L, "join pad pad pad"),
      (4L, "pad pad pad pad"))
      .toDF("doc_id", "text")
    val sc = TextAnalysis.bm25Scores(docs, Seq("join")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sc.keySet == Set(1L, 2L, 3L))
    // N=4, S=20, df=3 → idf 3/7; tf-part = 440·tf / (200·tf + 60 + 36·dl):
    // doc1 (tf2,dl4) 880/604 > doc2 (tf2,dl8) 880/748 > doc3 (tf1,dl4)
    // 440/404 — higher tf wins, longer doc penalized.
    assert(sc(1L) > sc(2L) && sc(2L) > sc(3L))
  }

  test("q125 regressionOf: exact line recovers slope/intercept/r2 exactly") {
    // y = 2x + 1 for x = 1..5: cov = 100, varx = 50 → slope 2, intercept 1,
    // r² = 100²/(50·200) = 1 — all exact in the decimal sufficient stats.
    val in = (1 to 5).map(x => ("a", x.toDouble, 2.0 * x + 1))
      .toDF("grp", "x", "y")
    val r = Extended.regressionOf(in).collect()
    assert(r.length == 1)
    assert((r(0).getString(0), r(0).getLong(1), r(0).getDouble(2),
      r(0).getDouble(3), r(0).getDouble(4)) == (("a", 5L, 2.0, 1.0, 1.0)))
  }

  test("q123 posting lists: df ranking, tie-break, and the 20-doc cap") {
    val rows = TextAnalysis.q123PostingLists.fn(spark, dir).collect()
    val byTerm = rows.map(r => r.getAs[String]("term") ->
      ((r.getAs[Long]("df"), r.getAs[Long]("n_posted"),
        r.getAs[String]("postings")))).toMap
    assert(rows.length == 10)
    // word1..word49 all have df=3 (docs 1,2,3); lexicographic tie-break
    // puts word1, word10..word18 in the top 10.
    assert(byTerm.keySet == Set("word1", "word10", "word11", "word12",
      "word13", "word14", "word15", "word16", "word17", "word18"))
    assert(byTerm("word1") == ((3L, 3L, "1,2,3")))
  }

  test("q65 pigeonhole recall: every pair within hamming 3 is found") {
    // The planted near-dup (doc 3) differs from 1/2 by one token out of 50;
    // if its fingerprint is within hamming 3 of doc 1's, the block join MUST
    // surface the pair (pigeonhole is exact, not probabilistic).
    val fp = Dedup.q36SimHash.fn(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("simhash")).toMap
    val trueH = fp(1L).zip(fp(3L)).count { case (a, b) => a != b }
    val pairs = Dedup.q65SimhashHamming.fn(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    if (trueH <= 3) assert(pairs.contains((1L, 3L)))
    else assert(!pairs.contains((1L, 3L)))
  }
}
