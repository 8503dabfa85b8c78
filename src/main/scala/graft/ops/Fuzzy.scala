package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Fuzzy entity matching — the record-linkage stage of a data pipeline
  * (vendor/product/author name reconciliation before joining feeds).
  *
  * The reference has no fuzzy matching; this is extension surface in the
  * same spirit as the dedup family: CANDIDATES BY BLOCKING, TRUTH BY EXACT
  * VERIFY. A naive fuzzy join is a cartesian product (N² string distances);
  * the scale shape is (1) dedup the name VOCABULARY first — support counts
  * ride along, so downstream work is per distinct name, not per row —
  * then (2) generate candidates through a pigeonhole block join and
  * (3) run the exact distance only on candidates.
  *
  * Pigeonhole completeness: a name of W words is exploded into W
  * (position, word) segment keys; two same-width names at word-hamming
  * distance ≤ 1 agree on ≥ W−1 positions, so ANY shared (position, word)
  * key surfaces the pair — the block join has perfect recall for the ≤ 1
  * predicate, by construction (same argument as the SimHash pigeonhole
  * block join, Dedup.scala). No cartesian anywhere: candidate volume is
  * Σ_segment |bucket|², driven by segment collisions, not by N².
  */
object Fuzzy {

  /** q105: near-duplicate part names — same word count, at most one word
    * differs. Output one row per matched pair: support counts from the
    * vocabulary dedup, the word-hamming distance (0/1 per position,
    * generic in word count via zip_with) and the character-level
    * Levenshtein distance (identical DP in Spark and DuckDB — exact
    * BIGINT both sides) as the downstream merge-priority signals.
    *
    * The oracle renders the SEMANTICS (all same-width pairs at word
    * distance ≤ 1) with no blocking — the pigeonhole proof above is what
    * makes the blocked plan hash-match it. */
  val q105FuzzyNameMatch: Q = Q(
    "q105_fuzzy_name_match",
    """WITH names AS (
      |  SELECT p_name AS name, count(*) AS n_parts FROM part GROUP BY 1),
      |pairs AS (
      |  SELECT a.name AS name_a, b.name AS name_b,
      |         a.n_parts AS n_a, b.n_parts AS n_b,
      |         (CASE WHEN split_part(a.name, ' ', 1) = split_part(b.name, ' ', 1)
      |               THEN 0 ELSE 1 END
      |        + CASE WHEN split_part(a.name, ' ', 2) = split_part(b.name, ' ', 2)
      |               THEN 0 ELSE 1 END) AS w_dist,
      |         levenshtein(a.name, b.name) AS lev
      |  FROM names a JOIN names b
      |    ON a.name < b.name
      |   AND len(string_split(a.name, ' ')) = len(string_split(b.name, ' ')))
      |SELECT name_a, name_b, n_a, n_b, CAST(w_dist AS BIGINT) AS w_dist, lev
      |FROM pairs WHERE w_dist <= 1
      |ORDER BY name_a, name_b""".stripMargin) { (s, dir) =>
    val names = Tables(s, dir, "part")
      .groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n_parts"))
      .withColumn("ws", split(col("name"), " "))
      .withColumn("wc", size(col("ws")))
    // Blocking: one (position, word) key per word; same-key names are
    // candidates. Word count joins too — pigeonhole needs same width.
    val segs = names.select(col("name"), col("n_parts"), col("ws"), col("wc"),
      posexplode(col("ws")).as(Seq("wi", "w")))
    val cands = segs.as("a").join(segs.as("b"),
        col("a.wi") === col("b.wi") && col("a.w") === col("b.w") &&
          col("a.wc") === col("b.wc") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        col("a.n_parts").as("n_a"), col("b.n_parts").as("n_b"),
        col("a.ws").as("ws_a"), col("b.ws").as("ws_b"))
      .distinct() // a pair may share several segments — emit once
    cands
      .withColumn("w_dist", expr(
        "aggregate(zip_with(ws_a, ws_b, (x, y) -> IF(x <=> y, 0L, 1L)), 0L, (acc, v) -> acc + v)"))
      .filter(col("w_dist") <= 1)
      .select(col("name_a"), col("name_b"), col("n_a"), col("n_b"),
        col("w_dist"), levenshtein(col("name_a"), col("name_b")).cast("long").as("lev"))
      .orderBy(col("name_a"), col("name_b"))
  }

  val all: Seq[Q] = Seq(q105FuzzyNameMatch)
}
