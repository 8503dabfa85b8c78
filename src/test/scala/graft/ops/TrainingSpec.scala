package graft.ops

import java.nio.file.Paths

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** Property tests for the training-data preparation family: invariants that
  * must hold for ANY input, checked on a randomized documents fixture. */
class TrainingSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val dir = Paths.get("target", "tmp", "trainfix").toAbsolutePath.toString
  private val rnd = new scala.util.Random(7)
  private val langs = Array("en", "fr", "de")
  private val docs: Seq[(Long, String, String, String, Long)] =
    (0 until 3000).map { i =>
      val n = 1 + rnd.nextInt(200) // 1..200 tokens, some docs tiny
      val text = Seq.fill(n)("w" + rnd.nextInt(500)).mkString(" ")
      (i.toLong, text, langs(rnd.nextInt(3)), "src", text.length.toLong)
    }

  override def beforeAll(): Unit = {
    super.beforeAll()
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("split: partitions the corpus, is deterministic, and lands near 80/10/10") {
    val out = Training.q49SplitAssign.fn(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.values.sum shouldBe 3000L
    out.keySet shouldBe Set("train", "val", "test")
    // Hash gate is Bernoulli(p) per doc: allow generous tolerance at n=3000.
    assert(out("train") > 2200 && out("train") < 2600, s"train=${out("train")}")
    assert(out("val") > 150 && out("val") < 450)
    // Determinism: a second evaluation is bit-identical.
    val again = Training.q49SplitAssign.fn(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    again shouldBe out
  }

  test("stratified sample: rate is per-stratum and within Bernoulli bounds") {
    Training.q56StratifiedSample.fn(spark, dir).collect().foreach { r =>
      val (n, k) = (r.getLong(1), r.getLong(2))
      assert(n > 0)
      // ~20% with 4-sigma slack: sd = sqrt(0.2*0.8/n)
      val slack = 4 * math.sqrt(0.2 * 0.8 / n)
      assert(math.abs(k.toDouble / n - 0.2) < slack, s"rate=${k.toDouble / n} n=$n")
    }
  }

  test("reservoir sample: exactly min(10, |stratum|) rows per stratum, ranks 1..k") {
    val rows = Training.q57ReservoirSample.fn(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val perLang = rows.groupBy(_._1)
    perLang.keySet shouldBe langs.toSet
    perLang.foreach { case (_, rs) =>
      rs.map(_._2).sorted.toSeq shouldBe (1L to 10L) // every stratum has >10 docs
      rs.map(_._3).distinct.length shouldBe rs.length
    }
  }

  test("packing: conserves tokens, bins are contiguous, all-but-last doc fit the span") {
    val bins = Training.q59PackSequences.fn(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val tokTotal = docs.groupBy(_._3).view.mapValues(
      _.map(_._2.split(" ").length.toLong).sum).toMap
    bins.groupBy(_._1).foreach { case (lang, bs) =>
      // conservation: packed token mass equals the stratum's token mass
      bs.map(_._4).sum shouldBe tokTotal(lang)
      // bins are contiguous from 0
      bs.map(_._2).sorted.toSeq shouldBe (0L until bs.length.toLong)
    }
    // Span invariant: docs are assigned to the bin their START offset falls
    // in, so a bin's content minus its LAST doc always fits inside 2048.
    val perDoc = docs.filter(_._3 == "en").sortBy(_._1)
      .map(d => d._2.split(" ").length.toLong)
    var cum = 0L
    val byBin = scala.collection.mutable.Map.empty[Long, List[Long]]
    perDoc.foreach { t => byBin(cum / 2048) = t :: byBin.getOrElse(cum / 2048, Nil); cum += t }
    byBin.values.foreach { ts => assert(ts.tail.sum < 2048) } // ts.head is the last-added doc
    // and the q59 output agrees with this reference computation for "en"
    val enBins = bins.filter(_._1 == "en").map(b => b._2 -> (b._3, b._4)).toMap
    byBin.foreach { case (b, ts) =>
      enBins(b) shouldBe ((ts.length.toLong, ts.sum))
    }
  }

  test("oov rate: counts conserve, rate in [0,1], and full-vocab corpus has 0 OOV") {
    val rows = Training.q75OovRate.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    rows.map(_._1).toSet shouldBe langs.toSet
    // token conservation across strata
    val totalToks = docs.map(_._2.split(" ").length.toLong).sum
    rows.map(_._2).sum shouldBe totalToks
    rows.foreach { case (_, n, cov, oov) =>
      assert(cov <= n)
      assert(oov >= 0.0 && oov <= 1.0)
      // the fixture has 500 distinct tokens and vocab keeps 100 → OOV > 0
      assert(oov > 0.0)
    }
    // determinism: second evaluation identical (vocab tie-break is total)
    Training.q75OovRate.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq shouldBe rows.toSeq
  }

  test("q119 two-phase deciles ≡ Spark ntile, including N mod 10 ≠ 0") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // 47 rows with heavy ties (tokens = i % 7): every boundary falls
    // INSIDE a tie level, and 47 % 10 = 7 exercises the uneven-bucket
    // branch (first 7 buckets get 5 rows, the last 3 get 4) that the
    // ×10-sized gate tables never hit.
    for (n <- Seq(47, 50, 9, 1)) {
      val f = (0 until n).map(i => (i.toLong, (i % 7).toLong))
        .toDF("doc_id", "tokens")
      val got = Training.decilesOf(f)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      val exp = f.withColumn("decile",
          ntile(10).over(Window.orderBy(col("tokens"), col("doc_id"))))
        .collect().map(r => (r.getLong(0), r.getInt(2).toLong)).toMap
      assert(got == exp, s"N=$n: two-phase deciles diverged from ntile")
      spark.catalog.clearCache()
    }
  }

  test("q133 chunking: window/stride arithmetic at the boundaries") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("chunkfix").toString
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    // 23 tokens → chunks (1,20) and (16,8); 20 → full chunk plus the
    // stride-rule tail (16,5) (a start opens every 15 tokens while ≤ T —
    // the tail is redundant but the rule is uniform and engine-shared);
    // 7 (< stride) → one short chunk.
    Seq((1L, words(23)), (2L, words(20)), (3L, words(7)))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Training.q133ChunkSplit.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 0L, 1L, 20L), (1L, 1L, 16L, 8L),
      (2L, 0L, 1L, 20L), (2L, 1L, 16L, 5L),
      (3L, 0L, 1L, 7L)))
  }

  test("q240 quota invariants: allocations sum to B and stay within ⌊q⌋..⌈q⌉") {
    // Largest-remainder (Hamilton) guarantees: Σalloc = B exactly, and
    // every group's allocation is its exact quota floored or ceiled —
    // checked on the randomized fixture AND on the selection output
    // (n_sel must equal alloc when the stratum is large enough).
    val got = Training.q240BudgetAllocation.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nTotal = got.map(_._2).sum
    assert(got.map(_._3).sum == 1000L, "allocations must sum to the budget")
    got.foreach { case (lang, n, alloc, nSel) =>
      val floorQ = 1000L * n / nTotal
      assert(alloc == floorQ || alloc == floorQ + 1,
        s"$lang: alloc $alloc outside ⌊q⌋=$floorQ .. ⌊q⌋+1")
      assert(nSel == math.min(alloc, n), s"$lang: selected $nSel of alloc $alloc")
    }
  }

  private implicit class ShouldOps[A](a: A) {
    def shouldBe(b: A): Unit = assert(a == b, s"expected $b, got $a")
  }
}
