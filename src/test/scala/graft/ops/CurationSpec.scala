package graft.ops

import java.nio.file.Paths

import graft.SparkSpec
import org.scalatest.BeforeAndAfterAll

/** Planted-fixture tests for the curation operators (PII redaction,
  * lexical diversity, chunk dedup, PMI collocations, retention cohorts,
  * semantic near-dup): writes tiny documents/events/embeddings fixtures in
  * the driver-testdata layout and runs the real query functions. */
class CurationSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val dir = Paths.get("target", "tmp", "curationfix").toAbsolutePath.toString

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // 20 shared words (the planted duplicated chunk) + per-doc distinct tails.
  private val sharedChunk = (1 to 20).map(i => s"c$i").mkString(" ")
  private val tail3 = (1 to 20).map(i => s"d$i").mkString(" ")
  private val tail4 = (1 to 20).map(i => s"e$i").mkString(" ")

  override def beforeAll(): Unit = {
    super.beforeAll()
    Seq(
      (0L, "alpha beta gamma", "en", "src0", 16L), // gets all 3 PII enrichments
      (1L, "a a b", "en", "src0", 5L), // diversity arithmetic target
      (2L, Seq.fill(6)("x y").mkString(" "), "en", "src0", 23L), // PMI target
      (3L, s"$sharedChunk $tail3", "en", "src0", 120L), // shares chunk 1 with 4
      (4L, s"$sharedChunk $tail4", "en", "src0", 120L),
      (7L, "please write bob@mail.example.org today", "en", "src1", 40L),
      // quality-gate targets: pass / repetitive / low-diversity
      (8L, (1 to 25).map(i => s"w$i").mkString(" "), "en", "src0", 100L),
      (9L, Seq.fill(10)("p q r").mkString(" "), "en", "src0", 60L),
      (10L, (1 to 14).foldLeft("z") { (acc, i) =>
        if (i <= 6) s"$acc b$i z" else s"$acc b$i"
      }, "en", "src0", 80L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // 2024-01-01T00:00:00Z, in nanoseconds (events.ts is TIMESTAMP(NANOS)).
    def ts(day: Int, hour: Int): Long =
      (1704067200L + (day - 1) * 86400L + hour * 3600L) * 1000000000L
    Seq(
      (1L, ts(1, 1), 1L, "click", 1.0, """{"k": 1}"""),
      (2L, ts(2, 2), 1L, "view", 2.0, """{"k": 2}"""),
      (3L, ts(9, 1), 1L, "click", 3.0, """{"k": 3}"""), // offset 8 → excluded
      (4L, ts(2, 5), 2L, "view", 4.0, """{"k": 4}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    // 16 seed centroids (unit basis vectors) + two planted near-dups of
    // centroid 0 at vec_id ≥ 16, so they cluster WITH it rather than
    // becoming centroids themselves.
    val centroids = (0 until 16).map { c =>
      (c.toLong, Array.tabulate(64)(i => if (i == c) 1.0f else 0.0f), 0)
    }
    val near = Array.tabulate(64)(i =>
      if (i == 0) 0.99f else if (i == 9) 0.01f else 0.0f)
    val planted = Seq((16L, near, 0), (17L, near.clone(), 0))
    (centroids ++ planted)
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("q69: enriched and handwritten PII is counted and redacted byte-exactly") {
    val rows = Curation.q69PiiRedact.fn(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val d0 = rows(0L)
    assert(d0.getAs[Long]("n_emails") == 1L)
    assert(d0.getAs[Long]("n_ips") == 1L)
    assert(d0.getAs[Long]("n_cards") == 1L)
    assert(d0.getAs[Boolean]("has_pii"))
    // doc 0 enrichment is fully deterministic — check the redaction output
    // byte-for-byte through its md5.
    val expected = "alpha beta gamma contact <EMAIL> from <IP> card <CARD>"
    assert(d0.getAs[String]("redacted_md5") == md5hex(expected))
    // doc 1 (no enrichment, no handwritten PII) is untouched.
    val d1 = rows(1L)
    assert(!d1.getAs[Boolean]("has_pii"))
    assert(d1.getAs[String]("redacted_md5") == md5hex("a a b"))
    // doc 7: handwritten email only (7 % 3/4/5 all nonzero).
    val d7 = rows(7L)
    assert(d7.getAs[Long]("n_emails") == 1L && d7.getAs[Long]("n_ips") == 0L)
    assert(d7.getAs[String]("redacted_md5") ==
      md5hex("please write <EMAIL> today"))
  }

  test("q70: diversity ratios are the exact rational values") {
    val d1 = Curation.q70TokenDiversity.fn(spark, dir).collect()
      .find(_.getAs[Long]("doc_id") == 1L).get
    assert(d1.getAs[Long]("n_tokens") == 3L)
    assert(d1.getAs[Long]("n_distinct") == 2L)
    assert(d1.getAs[Double]("ttr") == 0.6667)
    assert(d1.getAs[Double]("simpson") == 0.555556) // (2² + 1²) / 3²
    assert(d1.getAs[Double]("hapax_frac") == 0.5)
    assert(d1.getAs[Double]("top_frac") == 0.6667)
  }

  test("q72: the planted shared chunk is flagged in both docs, nowhere else") {
    val rows = Curation.q72ChunkDedup.fn(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_shared"))).toMap
    assert(rows(3L) == (2L, 1L))
    assert(rows(4L) == (2L, 1L))
    assert(rows(0L)._2 == 0L && rows(1L)._2 == 0L && rows(7L)._2 == 0L)
  }

  test("q73: the planted collocation dominates (cxy ≥ 5 support)") {
    val rows = Curation.q73PmiBigrams.fn(spark, dir).collect()
    val xy = rows.find(_.getAs[String]("bigram") == "x y")
    assert(xy.isDefined, "bigram 'x y' above min support")
    assert(xy.get.getAs[Long]("cxy") == 6L)
    assert(xy.get.getAs[Double]("lift") > 1.0) // co-occurs far above chance
    // Nothing below min support leaks in.
    assert(rows.forall(_.getAs[Long]("cxy") >= 5L))
  }

  test("q71: cohorts count users at day offsets, bounded at 7") {
    val rows = Events.q71RetentionCohorts.fn(spark, dir).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_day").toString,
        r.getAs[Long]("day_offset"), r.getAs[Long]("n_users")))
    assert(rows.toSet == Set(
      ("2024-01-01", 0L, 1L), // user 1's first day
      ("2024-01-01", 1L, 1L), // user 1 active next day
      ("2024-01-02", 0L, 1L))) // user 2's first day; day-9 event excluded
  }

  test("q76: cleaning recovers every dirtied doc byte-exactly") {
    val rows = Curation.q76TextClean.fn(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("recovered"),
        s"doc ${r.getAs[Long]("doc_id")} not recovered")
    }
    // the witness md5 is of the ORIGINAL text when recovery holds
    val d1 = rows.find(_.getAs[Long]("doc_id") == 1L).get
    assert(d1.getAs[String]("cleaned_md5") == md5hex("a a b"))
    assert(d1.getAs[Long]("n_chars_clean") == 5L)
  }

  test("q74: planted near-dups cluster with their centroid and are counted") {
    val rows = Similarity.q74SemanticNearDup.fn(spark, dir).collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        (r.getAs[Long]("n_members"), r.getAs[Long]("n_pairs"),
          r.getAs[Long]("n_neardup"))).toMap
    // cluster 0 = centroid 0 + the two planted copies: all 3 pairs ≥ 0.9.
    assert(rows(0L) == (3L, 3L, 3L))
    // every other cluster is its singleton centroid.
    (1L to 15L).foreach(c => assert(rows(c) == (1L, 0L, 0L)))
  }

  test("q77: each gate rule fires on its planted doc, in rule order") {
    val rows = Curation.q77QualityGate.fn(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("reason"), r.getAs[Boolean]("keep"))).toMap
    assert(rows(1L) == ("too_short", false)) // 3 tokens
    assert(rows(8L) == ("pass", true)) // 25 distinct tokens
    // doc 9 is BOTH repetitive and concentrated — repetition wins (rule order)
    assert(rows(9L) == ("repetitive", false))
    assert(rows(10L) == ("low_diversity", false)) // z is 7/21 of the doc
  }

  test("diversity and chunk-dedup invariants hold on a randomized corpus") {
    // identities that must hold for ANY input: ttr·n ≈ d, 1/d ≤ simpson ≤ 1,
    // hapax ≤ 1, top_frac ≥ 1/d, shared chunks ≤ total chunks.
    val rdir = Paths.get("target", "tmp", "curation_rand").toAbsolutePath.toString
    val rnd = new scala.util.Random(13)
    (0 until 300).map { i =>
      val n = 1 + rnd.nextInt(80)
      val text = Seq.fill(n)("t" + rnd.nextInt(40)).mkString(" ")
      (i.toLong, text, "en", "src", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$rdir/documents.parquet")
    val rows = Curation.q70TokenDiversity.fn(spark, rdir).collect()
    assert(rows.length == 300)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens").toDouble
      val d = r.getAs[Long]("n_distinct").toDouble
      val (ttr, simpson, hapax, top) = (r.getAs[Double]("ttr"),
        r.getAs[Double]("simpson"), r.getAs[Double]("hapax_frac"),
        r.getAs[Double]("top_frac"))
      assert(d <= n)
      assert(math.abs(ttr - d / n) < 1e-4)
      assert(simpson >= 1.0 / d - 1e-6 && simpson <= 1.0 + 1e-9)
      assert(hapax >= 0.0 && hapax <= 1.0)
      assert(top >= 1.0 / d - 1e-4 && top <= 1.0)
    }
    Curation.q72ChunkDedup.fn(spark, rdir).collect().foreach { r =>
      val (nc, ns) = (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_shared"))
      assert(ns <= nc && nc >= 1)
      assert(math.abs(r.getAs[Double]("shared_frac") - ns.toDouble / nc) < 1e-4)
    }
  }
}
