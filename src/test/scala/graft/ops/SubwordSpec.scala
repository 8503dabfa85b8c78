package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Third-implementation cross-check of the subword tokenizer: the gate
  * already proves Spark ≡ DuckDB on the same relational rendering; this
  * spec proves both equal a PLAIN SEQUENTIAL reimplementation (driver
  * Scala, no SQL, no joins) of the spec — "top-40 char 2–4-grams by
  * (count DESC, gram), then greedy longest-match with single-char
  * fallback" — on the real sf0.001 corpus. A shared misrendering of the
  * semantics in both engines' relational forms (the failure mode the
  * oracle can't see) fails here. */
class SubwordSpec extends SparkSpec {

  test("docSubTokens equals an independent sequential greedy segmentation on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    assert(docs.length > 100)

    // Reference vocabulary: all 2–4 char grams over the whitespace token
    // stream (empties included, exactly as split yields them).
    val grams = scala.collection.mutable.Map.empty[String, Long]
    for ((_, text) <- docs; w <- text.split(" ", -1); n <- 2 to 4;
         i <- 0 to w.length - n)
      grams.updateWith(w.substring(i, i + n)) { c => Some(c.getOrElse(0L) + 1) }
    val vocab = grams.toSeq.sortBy { case (g, c) => (-c, g) }.take(40)
      .map(_._1).toSet

    def segCount(w: String): Long = {
      var pos = 0; var n = 0L
      while (pos < w.length) {
        val step = (4 to 2 by -1).find(l =>
          pos + l <= w.length && vocab(w.substring(pos, pos + l))).getOrElse(1)
        pos += step; n += 1
      }
      n
    }
    val expected = docs.map { case (id, text) =>
      id -> text.split(" ", -1).map(segCount).sum
    }.toMap

    val got = Subword.docSubTokens(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("stok")).toMap
    assert(got.keySet == expected.keySet)
    val diffs = expected.collect {
      case (id, e) if got(id) != e => s"doc $id: expected $e got ${got(id)}"
    }
    assert(diffs.isEmpty, diffs.take(5).mkString("; "))

    // Non-degenerate: the tokenizer must actually SPLIT (expansion > 1)
    // and never exceed character count.
    val ws = docs.map(_._2.split(" ", -1).length.toLong).sum
    val sub = expected.values.sum
    val chars = docs.map(_._2.split(" ", -1).map(_.length.toLong).sum).sum
    assert(sub > ws, s"degenerate segmentation: sub=$sub ws=$ws")
    assert(sub <= chars)
  }

  test("generative unicode property: random corpora incl. CJK/accents/astral chars match a code-point reference") {
    import spark.implicits._
    // char_length/substring in BOTH engines count CODE POINTS, so the
    // reference must too — a UTF-16 code-unit reference would diverge on
    // astral-plane chars (the emoji below is a surrogate pair).
    val alphabet: Array[Int] =
      ("abcxyz01" + "éñü" + "日本語中文" + "😀").codePoints()
        .toArray // last entry: U+1F600, one code point, two code units
    val rnd = new scala.util.Random(7)
    def word(): String = {
      val n = rnd.nextInt(9) // 0..8 code points (empty words included)
      new String((0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .toArray, 0, n)
    }
    val docs = (0L until 40L).map { id =>
      (id, "xx", (0 until 1 + rnd.nextInt(30)).map(_ => word()).mkString(" "))
    }
    val work = java.nio.file.Files.createTempDirectory("graft-subword-gen-")
    org.apache.commons.io.FileUtils.forceDeleteOnExit(work.toFile)
    docs.toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")

    def cps(s: String): Array[Int] = s.codePoints().toArray
    def cpSub(a: Array[Int], from: Int, len: Int): String =
      new String(a, from, len)
    val grams = scala.collection.mutable.Map.empty[String, Long]
    for ((_, _, text) <- docs; w <- text.split(" ", -1); a = cps(w);
         n <- 2 to 4; i <- 0 to a.length - n)
      grams.updateWith(cpSub(a, i, n)) { c => Some(c.getOrElse(0L) + 1) }
    // Tie-break in UTF-8 BYTE order (what Spark's string orderBy and
    // DuckDB's collation both use) — Scala's default String ordering is
    // UTF-16 code-unit order, which disagrees for astral chars.
    val utf8Order: Ordering[String] = (p, q) => {
      val x = p.getBytes("UTF-8"); val y = q.getBytes("UTF-8")
      var i = 0; var r = 0
      while (r == 0 && i < x.length && i < y.length) {
        r = (x(i) & 0xff) - (y(i) & 0xff); i += 1
      }
      if (r != 0) r else x.length - y.length
    }
    val vocab = grams.toSeq
      .sortBy { case (g, c) => (-c, g) }(
        Ordering.Tuple2(Ordering.Long, utf8Order))
      .take(40).map(_._1).toSet
    def segCount(w: String): Long = {
      val a = cps(w)
      var pos = 0; var n = 0L
      while (pos < a.length) {
        val step = (4 to 2 by -1).find(l =>
          pos + l <= a.length && vocab(cpSub(a, pos, l))).getOrElse(1)
        pos += step; n += 1
      }
      n
    }
    val expected = docs.map { case (id, _, text) =>
      id -> text.split(" ", -1).map(segCount).sum
    }.toMap
    val got = Subword.docSubTokens(spark, work.toString).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("stok")).toMap
    assert(got.keySet == expected.keySet)
    val diffs = expected.collect {
      case (id, e) if got(id) != e => s"doc $id: expected $e got ${got(id)}"
    }
    assert(diffs.isEmpty, diffs.take(5).mkString("; "))
  }
}
