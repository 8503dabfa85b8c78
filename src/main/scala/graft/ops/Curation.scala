package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Data-curation operators over `documents` — the filtering/scrubbing
  * stages a large-scale training-data pipeline runs alongside dedup and
  * quality scoring (SURVEY §2 extension surface): PII detection/redaction,
  * lexical-diversity scoring, paragraph(chunk)-level exact dedup, and PMI
  * collocation mining.
  *
  * Determinism rules follow COVERAGE.md: every surfaced ratio divides two
  * exactly-computed integers (one correctly-rounded IEEE division, identical
  * in Spark and DuckDB), never a float accumulation; regex patterns are
  * restricted to syntax Java regex and RE2 interpret identically (no
  * backreferences, no lookaround).
  */
object Curation {

  // ---------------------------------------------------------------------
  // q69: PII detection + redaction.
  // ---------------------------------------------------------------------

  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val CardRe = "\\b\\d{4}-\\d{4}-\\d{4}-\\d{4}\\b"

  /** The synthetic corpus contains no PII, so the query enriches each doc
    * with deterministic PII-shaped fragments derived from doc_id (emails on
    * doc_id%3=0, IPv4s on %4=0, card numbers on %5=0) — the SAME expression
    * in both engines, so the op under test (detect + redact) runs against
    * known-position hits AND the clean original text. Redaction chains
    * email → ip → card replacement; the md5 of the redacted text is the
    * cross-engine witness that every byte of the rewrite agrees.
    *
    * Scale shape: pure per-row projection (regexp count + replace) — no
    * shuffle at all until the final sort; at 100 TB this is a map-only
    * stage that pipelines with the scan. */
  val q69PiiRedact: Q = Q(
    "q69_pii_redact",
    s"""WITH raw AS (
       |  SELECT doc_id, text ||
       |    CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example' || CAST(doc_id % 7 AS VARCHAR) || '.com' ELSE '' END ||
       |    CASE WHEN doc_id % 4 = 0 THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.' || CAST(doc_id % 250 AS VARCHAR) ELSE '' END ||
       |    CASE WHEN doc_id % 5 = 0 THEN ' card 4111-1111-1111-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS raw
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, raw,
       |         CAST(len(regexp_extract_all(raw, '$EmailRe')) AS BIGINT) AS n_emails,
       |         CAST(len(regexp_extract_all(raw, '$IpRe')) AS BIGINT) AS n_ips,
       |         CAST(len(regexp_extract_all(raw, '$CardRe')) AS BIGINT) AS n_cards
       |  FROM raw)
       |SELECT doc_id, n_emails, n_ips, n_cards,
       |       n_emails + n_ips + n_cards > 0 AS has_pii,
       |       md5(regexp_replace(regexp_replace(regexp_replace(raw,
       |         '$EmailRe', '<EMAIL>', 'g'), '$IpRe', '<IP>', 'g'),
       |         '$CardRe', '<CARD>', 'g')) AS redacted_md5
       |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val raw = concat(
      col("text"),
      when(col("doc_id") % 3 === 0, concat(
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example"), (col("doc_id") % 7).cast("string"),
        lit(".com"))).otherwise(lit("")),
      when(col("doc_id") % 4 === 0, concat(
        lit(" from 10."), (col("doc_id") % 200).cast("string"),
        lit(".0."), (col("doc_id") % 250).cast("string"))).otherwise(lit("")),
      when(col("doc_id") % 5 === 0, concat(
        lit(" card 4111-1111-1111-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(lit("")))
    Tables(s, dir, "documents")
      .withColumn("raw", raw)
      .withColumn("n_emails", size(regexp_extract_all(col("raw"), lit(EmailRe), lit(0))).cast("long"))
      .withColumn("n_ips", size(regexp_extract_all(col("raw"), lit(IpRe), lit(0))).cast("long"))
      .withColumn("n_cards", size(regexp_extract_all(col("raw"), lit(CardRe), lit(0))).cast("long"))
      .select(
        col("doc_id"), col("n_emails"), col("n_ips"), col("n_cards"),
        (col("n_emails") + col("n_ips") + col("n_cards") > 0).as("has_pii"),
        md5(regexp_replace(regexp_replace(regexp_replace(col("raw"),
          lit(EmailRe), lit("<EMAIL>")), lit(IpRe), lit("<IP>")),
          lit(CardRe), lit("<CARD>"))).as("redacted_md5"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------------
  // q70: lexical diversity (the log-free quality-signal family).
  // ---------------------------------------------------------------------

  /** Per-doc lexical diversity: type-token ratio, Simpson index
    * (Σ(c/n)² — the collision probability of two random tokens; the
    * log-free stand-in for entropy that stays engine-exact), hapax
    * fraction, and top-token fraction. Low diversity / high Simpson flags
    * the same degenerate docs Shannon entropy would, without a
    * transcendental whose last-ulp differs across engines.
    *
    * Scale shape: one explode → (doc, token) count → per-doc rollup, both
    * aggregates combine map-side; nothing leaves the doc's own keyspace. */
  val q70TokenDiversity: Q = Q(
    "q70_token_diversity",
    """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |cnt AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2)
      |SELECT doc_id,
      |       CAST(sum(c) AS BIGINT) AS n_tokens,
      |       count(*) AS n_distinct,
      |       round(CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 4) AS ttr,
      |       round(CAST(sum(c * c) AS DOUBLE) / CAST(sum(c) * sum(c) AS DOUBLE), 6) AS simpson,
      |       round(CAST(count(*) FILTER (WHERE c = 1) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS hapax_frac,
      |       round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 4) AS top_frac
      |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        round(count(lit(1)).cast("double") / sum(col("c")).cast("double"), 4).as("ttr"),
        round(sum(col("c") * col("c")).cast("double")
          / (sum(col("c")) * sum(col("c"))).cast("double"), 6).as("simpson"),
        round(count_if(col("c") === 1).cast("double")
          / count(lit(1)).cast("double"), 4).as("hapax_frac"),
        round(max(col("c")).cast("double") / sum(col("c")).cast("double"), 4).as("top_frac"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------------
  // q72: chunk-level (paragraph) exact dedup.
  // ---------------------------------------------------------------------

  /** Non-overlapping 20-word chunks, hashed — the "paragraph" unit for
    * sub-document exact dedup (the suffix-array-style stage between
    * whole-doc exact dedup q34 and fuzzy MinHash q35: finds boilerplate
    * blocks shared verbatim across otherwise-distinct docs). Spark/DuckDB
    * SQL renderings of the chunker are step-identical (1-based slices). */
  private val sparkChunks =
    "transform(sequence(1, greatest(cast(ceil(size(ws) / 20.0) as bigint), 1)), " +
      "i -> md5(concat_ws(' ', slice(ws, cast((i - 1) * 20 + 1 as int), 20))))"
  private val duckChunks =
    "list_transform(generate_series(1, greatest(CAST(ceil(len(ws) / 20.0) AS BIGINT), 1)), " +
      "i -> md5(array_to_string(list_slice(ws, (i - 1) * 20 + 1, i * 20), ' ')))"

  /** Per doc: distinct chunk hashes, how many of them also appear in
    * ANOTHER doc (cross-doc shared), and the shared fraction — the signal a
    * pipeline thresholds to strip boilerplate-heavy documents.
    *
    * Scale shape: explode → distinct (doc, hash) → hash-count aggregate,
    * with the distinct chunk table persisted (both the shared-hash
    * aggregate and the final rollup consume it). The shared-hash list is
    * the set of cross-doc duplicated chunks — proportional to actual
    * boilerplate, usually small — and the join is left UNhinted so the
    * planner broadcasts it when small and falls back to a shuffle hash
    * join on the 16-byte hash under pathological duplication (a forced
    * broadcast() would instead die building an oversized broadcast). */
  val q72ChunkDedup: Q = Q(
    "q72_chunk_dedup",
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |ch AS (SELECT doc_id, unnest($duckChunks) AS ch FROM w),
       |dch AS (SELECT DISTINCT doc_id, ch FROM ch),
       |nd AS (SELECT ch, count(*) AS nd FROM dch GROUP BY ch)
       |SELECT doc_id, count(*) AS n_chunks,
       |       count(*) FILTER (WHERE nd >= 2) AS n_shared,
       |       round(CAST(count(*) FILTER (WHERE nd >= 2) AS DOUBLE)
       |             / CAST(count(*) AS DOUBLE), 4) AS shared_frac
       |FROM dch JOIN nd USING (ch)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val dch = Tables(s, dir, "documents")
      // explode_OUTER + text guard: InferFiltersFromGenerate would
      // re-inline the md5 chunk transform into a pushed filter (the
      // Dedup.shingleRowsOf pathology); greatest(…, 1) + non-null text
      // prove the array non-null/non-empty, so rows are identical.
      .filter(col("text").isNotNull)
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), explode_outer(expr(sparkChunks)).as("ch"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shared = dch.groupBy(col("ch")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("ch"), lit(true).as("is_shared"))
    dch.join(shared, Seq("ch"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        count_if(col("is_shared").isNotNull).as("n_shared"),
        round(count_if(col("is_shared").isNotNull).cast("double")
          / count(lit(1)).cast("double"), 4).as("shared_frac"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------------
  // q73: PMI collocations.
  // ---------------------------------------------------------------------

  /** Top-20 bigram collocations by pointwise-mutual-information lift:
    * lift = p(xy) / (p(x)·p(y)) = c_xy·N_tok² / (N_bg·c_x·c_y), reported as
    * the raw ratio (monotone in PMI = log2(lift); avoiding the log keeps
    * the number engine-exact). Minimum support c_xy ≥ 5.
    *
    * Numerics: each factor is cast to DOUBLE BEFORE multiplying — a BIGINT
    * product n_bg·c_x·c_y overflows 2^63 already at ~10⁷ tokens for a
    * stopword pair. The double chain is still engine-exact: identical
    * left-associated operations on identical inputs, every step correctly
    * rounded, same in both engines.
    *
    * Scale shape: bigram + unigram counts are map-side-combining
    * aggregates, both persisted (vocabulary-sized) because the corpus
    * totals fold from THEM (sum of counts) — no second pass over the raw
    * token stream; the two count joins key on single tokens (Zipf-
    * bounded); the final top-k is TakeOrderedAndProject. */
  val q73PmiBigrams: Q = Q(
    "q73_pmi_bigrams",
    """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
      |t AS (SELECT unnest(ws) AS tok FROM w),
      |bg AS (SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
      |              i -> ws[i] || ' ' || ws[i + 1])) AS bigram
      |       FROM w WHERE len(ws) >= 2),
      |bgc AS (SELECT bigram,
      |               string_split(bigram, ' ')[1] AS w1,
      |               string_split(bigram, ' ')[2] AS w2,
      |               count(*) AS cxy
      |        FROM bg GROUP BY 1),
      |tc AS (SELECT tok, count(*) AS cx FROM t GROUP BY tok),
      |tot AS (SELECT (SELECT CAST(sum(cx) AS BIGINT) FROM tc) AS n_tok,
      |               (SELECT CAST(sum(cxy) AS BIGINT) FROM bgc) AS n_bg)
      |SELECT bigram, CAST(cxy AS BIGINT) AS cxy,
      |       round(CAST(cxy AS DOUBLE) * CAST(n_tok AS DOUBLE) * CAST(n_tok AS DOUBLE)
      |             / (CAST(n_bg AS DOUBLE) * CAST(a.cx AS DOUBLE) * CAST(b.cx AS DOUBLE)), 4) AS lift
      |FROM bgc CROSS JOIN tot
      |JOIN tc a ON a.tok = w1
      |JOIN tc b ON b.tok = w2
      |WHERE cxy >= 5
      |ORDER BY lift DESC, bigram LIMIT 20""".stripMargin) { (s, dir) =>
    val ws = Tables(s, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
    val toks = ws.select(explode(col("ws")).as("tok"))
    // explode_OUTER: the size ≥ 2 gate proves the bigram array non-null
    // and non-empty, and the outer generator keeps the transform out of
    // an inferred pushed filter (the Dedup.shingleRowsOf pathology).
    val bigrams = ws.filter(size(col("ws")) >= 2)
      .select(explode_outer(expr(
        "transform(sequence(1, size(ws) - 1), " +
          "i -> concat_ws(' ', element_at(ws, cast(i as int)), element_at(ws, cast(i + 1 as int))))"))
        .as("bigram"))
    // Persisted count tables (vocabulary-sized): the corpus totals fold
    // from these, so the raw token/bigram streams are scanned exactly once.
    val bgc = bigrams.groupBy(col("bigram")).agg(count(lit(1)).as("cxy"))
      .withColumn("w1", element_at(split(col("bigram"), " "), 1))
      .withColumn("w2", element_at(split(col("bigram"), " "), 2))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tc = toks.groupBy(col("tok")).agg(count(lit(1)).as("cx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = tc.agg(sum(col("cx")).as("n_tok"))
      .crossJoin(bgc.agg(sum(col("cxy")).as("n_bg")))
    bgc.filter(col("cxy") >= 5)
      .join(tc.select(col("tok").as("w1"), col("cx").as("cx_a")), "w1")
      .join(tc.select(col("tok").as("w2"), col("cx").as("cx_b")), "w2")
      .crossJoin(broadcast(tot))
      .select(
        col("bigram"), col("cxy"),
        round(col("cxy").cast("double") * col("n_tok").cast("double") * col("n_tok").cast("double")
          / (col("n_bg").cast("double") * col("cx_a").cast("double") * col("cx_b").cast("double")), 4)
          .as("lift"))
      .orderBy(col("lift").desc, col("bigram"))
      .limit(20)
  }

  // ---------------------------------------------------------------------
  // q76: text cleaning / normalization.
  // ---------------------------------------------------------------------

  /** The C4-style cleanup stage: case-fold, strip control characters,
    * collapse whitespace runs, trim. As with q69 the synthetic corpus is
    * already clean, so the query deterministically dirties each doc first
    * (case flips, tabs/newlines, space runs — same expression both
    * engines); cleaning must recover the original text exactly, so
    * `md5(cleaned) == md5(text)` is a per-row self-check surfaced as the
    * `recovered` column (and the md5 itself is the cross-engine witness).
    *
    * Scale shape: map-only projection like q69 — pipelines with the scan,
    * zero shuffle before the presentation sort. */
  val q76TextClean: Q = Q(
    "q76_text_clean",
    """WITH dirty AS (
      |  SELECT doc_id, text,
      |         '  ' || chr(9) || upper(text) || chr(10) || ' ' AS messy
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, text,
      |         trim(regexp_replace(regexp_replace(lower(messy),
      |           '[\x00-\x1f]', ' ', 'g'), ' +', ' ', 'g')) AS cleaned
      |  FROM dirty)
      |SELECT doc_id,
      |       CAST(length(cleaned) AS BIGINT) AS n_chars_clean,
      |       md5(cleaned) AS cleaned_md5,
      |       cleaned = text AS recovered
      |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val messy = concat(lit("  \t"), upper(col("text")), lit("\n "))
    Tables(s, dir, "documents")
      .withColumn("cleaned",
        trim(regexp_replace(regexp_replace(lower(messy),
          lit("[\\x00-\\x1f]"), lit(" ")), lit(" +"), lit(" "))))
      .select(
        col("doc_id"),
        length(col("cleaned")).cast("long").as("n_chars_clean"),
        md5(col("cleaned")).as("cleaned_md5"),
        (col("cleaned") === col("text")).as("recovered"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------------
  // q77: composite quality gate (the keep/drop decision).
  // ---------------------------------------------------------------------

  /** The Gopher-rule-style document filter that consumes the signal
    * families: length (token count), within-doc repetition (duplicate
    * 3-gram fraction, q68's signal), and lexical concentration (top-token
    * fraction, q70's signal) fold into one keep/drop verdict with the
    * first failing rule as the reason. This is the stage that actually
    * drops documents — everything upstream only scores them.
    *
    * Verdict thresholds compare the UNROUNDED exact-ratio doubles (one
    * IEEE division of exact BIGINTs each — identical in both engines);
    * rounding is display-only.
    *
    * Scale shape: two independent per-doc aggregate chains (token counts,
    * shingle counts), each map-side combining in the doc's own keyspace,
    * joined on doc_id — linear, no candidate generation at all. */
  /** DuckDB CTE chain ending in `j(doc_id, n_tokens, dup_frac, top_frac)`
    * — the per-doc quality signals (shared by q77 and q83). */
  private val duckQualityCtes: String =
    s"""${Dedup.duckShingleRows},
       |shc AS (SELECT doc_id, sh, count(*) AS c FROM shl GROUP BY 1, 2),
       |shs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_sh, count(*) AS d_sh
       |        FROM shc GROUP BY doc_id),
       |tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |tkc AS (SELECT doc_id, tok, count(*) AS c FROM tk GROUP BY 1, 2),
       |tks AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, max(c) AS max_tok
       |        FROM tkc GROUP BY doc_id),
       |j AS (SELECT doc_id, n_tokens,
       |             CAST(n_sh - d_sh AS DOUBLE) / n_sh AS dup_frac,
       |             CAST(max_tok AS DOUBLE) / n_tokens AS top_frac
       |      FROM tks JOIN shs USING (doc_id))""".stripMargin

  /** Spark side of `j`: per-doc (n_tokens, max_tok, n_sh, d_sh) joined on
    * doc_id (shared by q77 and q83; the frac exprs sit on top). */
  private def qualitySignals(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val shStats = Dedup.shingleRows(s, dir)
      .groupBy(col("doc_id"), col("sh")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_sh"), count(lit(1)).as("d_sh"))
    val tokStats = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), max(col("c")).as("max_tok"))
    tokStats.join(shStats, "doc_id")
  }

  val q77QualityGate: Q = Q(
    "q77_quality_gate",
    s"""WITH $duckQualityCtes
       |SELECT doc_id, n_tokens,
       |       round(dup_frac, 4) AS dup_frac,
       |       round(top_frac, 4) AS top_frac,
       |       CASE WHEN n_tokens < 20 THEN 'too_short'
       |            WHEN dup_frac > 0.2 THEN 'repetitive'
       |            WHEN top_frac > 0.2 THEN 'low_diversity'
       |            ELSE 'pass' END AS reason,
       |       n_tokens >= 20 AND dup_frac <= 0.2 AND top_frac <= 0.2 AS keep
       |FROM j ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val dupFrac = (col("n_sh") - col("d_sh")).cast("double") / col("n_sh")
    val topFrac = col("max_tok").cast("double") / col("n_tokens")
    qualitySignals(s, dir)
      .select(
        col("doc_id"), col("n_tokens"),
        round(dupFrac, 4).as("dup_frac"),
        round(topFrac, 4).as("top_frac"),
        when(col("n_tokens") < 20, "too_short")
          .when(dupFrac > 0.2, "repetitive")
          .when(topFrac > 0.2, "low_diversity")
          .otherwise("pass").as("reason"),
        (col("n_tokens") >= 20 && dupFrac <= 0.2 && topFrac <= 0.2).as("keep"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------------
  // q78: per-domain document cap.
  // ---------------------------------------------------------------------

  /** Per-domain (source) document cap — the CommonCrawl-pipeline stage
    * that stops one prolific domain from dominating the training mix:
    * keep at most N documents per source, chosen by a deterministic
    * hash priority (md5 of the doc_id — a fair lottery both engines
    * compute identically; any quality score column would slot into the
    * same ORDER BY).
    *
    * Scale shape: the naive plan is one global window per source — a
    * shuffle keyed on a LOW-cardinality column, i.e. the skew trap (one
    * reducer per domain; a 10⁹-page domain serializes through one task).
    * The plan here is the two-phase top-k: rank within each INPUT
    * partition first (key = (source, partition id), high cardinality, no
    * skew) and keep only each partition's local top-N; the global window
    * then runs over ≤ N × partitions rows per source — bounded, tiny,
    * and provably sufficient (a global top-N row is top-N within its own
    * partition). Same pattern as q39's per-partition shortlist. */
  val q78DomainCap: Q = {
    val cap = 15
    Q(
      "q78_domain_cap",
      s"""SELECT source, rn, doc_id FROM (
         |  SELECT source, doc_id,
         |         row_number() OVER (PARTITION BY source
         |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= $cap ORDER BY source, rn""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val base = Tables(s, dir, "documents")
        .select(col("source"), col("doc_id"))
        .withColumn("pri", md5(col("doc_id").cast("string")))
      val localW = Window
        .partitionBy(col("source"), spark_partition_id())
        .orderBy(col("pri"), col("doc_id"))
      val shortlist = base
        .withColumn("lrn", row_number().over(localW))
        .filter(col("lrn") <= cap)
        .drop("lrn")
      val globalW = Window.partitionBy(col("source"))
        .orderBy(col("pri"), col("doc_id"))
      shortlist
        .withColumn("rn", row_number().over(globalW).cast("long"))
        .filter(col("rn") <= cap)
        .select(col("source"), col("rn"), col("doc_id"))
        .orderBy(col("source"), col("rn"))
    }
  }

  // ---------------------------------------------------------------------
  // q83: end-to-end training-set manifest (the composed pipeline).
  // ---------------------------------------------------------------------

  /** The capstone composition a training-data user actually runs: quality
    * gate (q77 rules) → exact-dedup keeper (q34 shape) → per-domain cap
    * (q78 shape), folded into one per-source funnel report — how many
    * documents each stage dropped and how many survive into the training
    * set. Every doc gets exactly one status: the FIRST stage that dropped
    * it (fail_quality → dup → capped) or `kept`.
    *
    * Scale shape: the three stages compose without materialization — the
    * quality signals are the two linear aggregate chains, the keeper flag
    * is a window over the content digest (high-cardinality key), and the
    * cap ranks only surviving keepers. The funnel report is one conditional
    * aggregate over (doc_id, status) rows. Nothing here is new machinery;
    * the point is that the stages CHAIN as DataFrames with no glue. */
  val q83TrainingManifest: Q = {
    val cap = 10
    Q(
      "q83_training_manifest",
      s"""WITH $duckQualityCtes,
         |q AS (SELECT doc_id,
         |             (n_tokens >= 20 AND dup_frac <= 0.2 AND top_frac <= 0.2) AS ok
         |      FROM j),
         |d AS (SELECT doc_id, source, md5(lower(text)) AS h FROM documents),
         |pass AS (SELECT d.doc_id, d.source, d.h
         |         FROM d JOIN q USING (doc_id) WHERE q.ok),
         |kp AS (SELECT doc_id, source,
         |              doc_id = min(doc_id) OVER (PARTITION BY h) AS is_keeper
         |       FROM pass),
         |rk AS (SELECT doc_id, source,
         |              row_number() OVER (PARTITION BY source
         |                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
         |       FROM kp WHERE is_keeper),
         |st AS (SELECT d.doc_id, d.source,
         |         CASE WHEN NOT q.ok THEN 'fail_quality'
         |              WHEN NOT kp.is_keeper THEN 'dup'
         |              WHEN rk.rn > $cap THEN 'capped'
         |              ELSE 'kept' END AS status
         |       FROM d JOIN q USING (doc_id)
         |       LEFT JOIN kp ON kp.doc_id = d.doc_id
         |       LEFT JOIN rk ON rk.doc_id = d.doc_id)
         |SELECT source, count(*) AS n_docs,
         |       count(*) FILTER (WHERE status = 'fail_quality') AS n_fail_quality,
         |       count(*) FILTER (WHERE status = 'dup') AS n_dup,
         |       count(*) FILTER (WHERE status = 'capped') AS n_capped,
         |       count(*) FILTER (WHERE status = 'kept') AS n_kept
         |FROM st GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val dupFrac = (col("n_sh") - col("d_sh")).cast("double") / col("n_sh")
      val topFrac = col("max_tok").cast("double") / col("n_tokens")
      val q = qualitySignals(s, dir).select(
        col("doc_id"),
        (col("n_tokens") >= 20 && dupFrac <= 0.2 && topFrac <= 0.2).as("ok"))
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), md5(lower(col("text"))).as("h"))
      val pass = d.join(q.filter(col("ok")).select(col("doc_id")), "doc_id")
      val kp = pass.withColumn("is_keeper",
        col("doc_id") === min(col("doc_id")).over(Window.partitionBy(col("h"))))
      val rk = kp.filter(col("is_keeper"))
        .withColumn("rn", row_number().over(Window.partitionBy(col("source"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      val st = d.join(q, "doc_id")
        .join(kp.select(col("doc_id"), col("is_keeper")), Seq("doc_id"), "left")
        .join(rk.select(col("doc_id"), col("rn")), Seq("doc_id"), "left")
        .select(col("source"),
          when(not(col("ok")), "fail_quality")
            .when(not(col("is_keeper")), "dup")
            .when(col("rn") > cap, "capped")
            .otherwise("kept").as("status"))
      st.groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          count_if(col("status") === "fail_quality").as("n_fail_quality"),
          count_if(col("status") === "dup").as("n_dup"),
          count_if(col("status") === "capped").as("n_capped"),
          count_if(col("status") === "kept").as("n_kept"))
        .orderBy(col("source"))
    }
  }

  /** q98: distribution-drift monitor (PSI — population stability index)
    * between the archive (even doc_id) and an incoming batch (odd doc_id)
    * over document-length buckets — the standard pre-ingest guard: a new
    * crawl whose length (or quality-score) distribution shifted gets
    * flagged BEFORE it pollutes the training mix. PSI contribution per
    * bucket = (p_new − p_arch)·ln(p_new/p_arch) with add-one smoothing so
    * empty buckets stay finite; Σ > 0.2 is the conventional alarm line.
    *
    * Scale shape: one pass, map-side combining into ≤10 bucket counters,
    * a 1-row broadcast of the totals — O(N) with no wide shuffle at any
    * corpus size. Probabilities are single IEEE divisions of exact
    * integer counts (the COVERAGE.md determinism rule), so both engines
    * agree bit-for-bit. */
  val q98QualityDrift: Q = Q(
    "q98_quality_drift",
    """WITH b AS (SELECT least(9, n_chars // 200) AS bucket,
      |                  (doc_id % 2 = 0) AS is_arch
      |           FROM documents),
      |c AS (SELECT bucket,
      |             count(*) FILTER (WHERE is_arch) AS n_arch,
      |             count(*) FILTER (WHERE NOT is_arch) AS n_new
      |      FROM b GROUP BY bucket),
      |t AS (SELECT CAST(sum(n_arch) AS BIGINT) AS ta,
      |             CAST(sum(n_new) AS BIGINT) AS tn,
      |             count(*) AS nb FROM c)
      |SELECT bucket, n_arch, n_new,
      |       round((CAST(n_new + 1 AS DOUBLE) / (tn + nb)
      |              - CAST(n_arch + 1 AS DOUBLE) / (ta + nb))
      |             * ln((CAST(n_new + 1 AS DOUBLE) / (tn + nb))
      |                  / (CAST(n_arch + 1 AS DOUBLE) / (ta + nb))), 6)
      |         AS psi_contrib
      |FROM c CROSS JOIN t ORDER BY bucket""".stripMargin) { (s, dir) =>
    val b = Tables(s, dir, "documents")
      .select(lengthBucket.as("bucket"), (col("doc_id") % 2 === 0).as("is_arch"))
    val c = b.groupBy(col("bucket")).agg(
      count_if(col("is_arch")).as("n_arch"),
      count_if(!col("is_arch")).as("n_new"))
    psiOf(c)
  }

  /** The length-bucket key shared by the batch (q98) and streaming (q108)
    * drift monitors. */
  private[graft] def lengthBucket = least(lit(9L), expr("n_chars div 200"))

  /** PSI contributions from a per-bucket count table
    * `(bucket, n_arch, n_new)` — the shared tail of q98/q108: a 1-row
    * totals broadcast, add-one smoothing, one IEEE division per side. */
  private[graft] def psiOf(c: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val t = c.agg(sum(col("n_arch")).as("ta"), sum(col("n_new")).as("tn"),
      count(lit(1)).as("nb"))
    val pNew = (col("n_new") + 1).cast("double") / (col("tn") + col("nb"))
    val pArch = (col("n_arch") + 1).cast("double") / (col("ta") + col("nb"))
    c.crossJoin(broadcast(t))
      .select(col("bucket"), col("n_arch"), col("n_new"),
        round((pNew - pArch) * log(pNew / pArch), 6).as("psi_contrib"))
      .orderBy(col("bucket"))
  }

  /** q135: two-sample Kolmogorov–Smirnov drift test — q98's PSI needs a
    * bucketing choice; KS is the bucket-free complement (sup-distance
    * between empirical CDFs), the standard "did this feature's
    * distribution shift" test between a reference and a current window.
    * Kept EXACT by cross-multiplying the ECDFs: with per-level cumulative
    * counts F1, F2 and totals n1, n2, the statistic's numerator is
    * max|F1·n2 − F2·n1| (D = that / n1·n2), pure integers — no float
    * ratio ever compared. The α=0.05 decision c(α)=1.358 is likewise
    * cleared of its square root: drifted ⇔ 10⁶·d² > 1844164·(n1+n2)·n1·n2
    * (1.358² = 1.844164), evaluated in 128-bit exact arithmetic
    * (HUGEINT / DECIMAL(38,0)).
    *
    * Scale shape: rows collapse map-side to distinct VALUE LEVELS (the
    * q115/q119 level trick), and the cumulative count is two-phase so no
    * global window ever forms: coarse value buckets (~100) take a tiny
    * ordered window for bucket offsets; within-bucket cumulatives run
    * PARTITIONED by bucket. Work after the first agg is ∝ distinct
    * values, parallel at every step; totals are a 1-row broadcast. */
  val q135KsDrift: Q = Q(
    "q135_ks_drift",
    """WITH lv AS (
      |  SELECT o_totalprice AS v,
      |         count(*) FILTER (WHERE o_orderdate < TIMESTAMP '1998-01-01') AS c1,
      |         count(*) FILTER (WHERE o_orderdate >= TIMESTAMP '1998-01-01') AS c2
      |  FROM orders GROUP BY 1),
      |bk AS (SELECT CAST(floor(v / 5000.0) AS BIGINT) AS b, v, c1, c2 FROM lv),
      |bs AS (SELECT b, sum(c1) AS s1, sum(c2) AS s2 FROM bk GROUP BY 1),
      |off AS (SELECT b, sum(s1) OVER (ORDER BY b) - s1 AS o1,
      |               sum(s2) OVER (ORDER BY b) - s2 AS o2 FROM bs),
      |cum AS (
      |  SELECT CAST(o1 + sum(c1) OVER (PARTITION BY bk.b ORDER BY v) AS BIGINT) AS f1,
      |         CAST(o2 + sum(c2) OVER (PARTITION BY bk.b ORDER BY v) AS BIGINT) AS f2
      |  FROM bk JOIN off USING (b)),
      |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM lv),
      |mx AS (SELECT CAST(max(abs(f1 * t.n2 - f2 * t.n1)) AS BIGINT) AS d_num
      |       FROM cum CROSS JOIN t)
      |SELECT t.n1 AS n_ref, t.n2 AS n_cur, mx.d_num,
      |       CAST(mx.d_num AS DOUBLE)
      |         / (CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE)) AS d_stat,
      |       CAST(1000000 AS HUGEINT) * mx.d_num * mx.d_num
      |         > CAST(1844164 AS HUGEINT) * (t.n1 + t.n2) * t.n1 * t.n2 AS drifted
      |FROM t CROSS JOIN mx""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val cut = lit("1998-01-01").cast("timestamp")
    val lv = Tables(s, dir, "orders")
      .groupBy(col("o_totalprice").as("v"))
      .agg(count_if(col("o_orderdate") < cut).as("c1"),
        count_if(col("o_orderdate") >= cut).as("c2"))
      .withColumn("b", floor(col("v") / 5000.0))
    val bs = lv.groupBy(col("b"))
      .agg(sum(col("c1")).as("s1"), sum(col("c2")).as("s2"))
    val wb = Window.orderBy(col("b"))
    val off = bs.select(col("b"),
      (sum(col("s1")).over(wb) - col("s1")).as("o1"),
      (sum(col("s2")).over(wb) - col("s2")).as("o2"))
    val wv = Window.partitionBy(col("b")).orderBy(col("v"))
    val cum = lv.join(off, "b")
      .select((col("o1") + sum(col("c1")).over(wv)).cast("long").as("f1"),
        (col("o2") + sum(col("c2")).over(wv)).cast("long").as("f2"))
    val t = lv.agg(sum(col("c1")).cast("long").as("n1"),
      sum(col("c2")).cast("long").as("n2"))
    val mx = cum.crossJoin(broadcast(t))
      .agg(max(abs(col("f1") * col("n2") - col("f2") * col("n1")))
        .cast("long").as("d_num"))
    broadcast(t).crossJoin(mx)
      .select(col("n1").as("n_ref"), col("n2").as("n_cur"), col("d_num"),
        (col("d_num").cast("double")
          / (col("n1").cast("double") * col("n2").cast("double"))).as("d_stat"),
        (lit(1000000L).cast(dec) * col("d_num").cast(dec) * col("d_num").cast(dec)
          > lit(1844164L).cast(dec) * (col("n1") + col("n2")).cast(dec)
            * col("n1").cast(dec) * col("n2").cast(dec)).as("drifted"))
  }

  /** q250: l-DIVERSITY audit — the attribute-disclosure gate k-anonymity
    * (q190) does NOT cover: a quasi-identifier group can satisfy k ≥ 5
    * and still leak, because if every row in the group shares the SAME
    * sensitive value, re-identifying "which row is you" is unnecessary —
    * membership alone discloses the attribute (Machanavajjhala et al.'s
    * homogeneity attack). Quasi-identifier here = (user cohort, value
    * decile); sensitive attribute = event_type. Per value-decile stratum:
    * the k-anonymity suppression set (groups under k) AND the
    * l-diversity failure set (groups AT-or-over k whose distinct
    * sensitive count < l = 2 — the groups k-anonymity certifies and
    * still leak). The two risk classes are disjoint by construction; a
    * release gate needs both counts.
    *
    * Scale shape: ONE map-side-combining aggregate to (QI, sensitive)
    * grain, folded to QI grain in the same shuffle's second aggregate
    * (count + distinct-sensitive together), then a decile-cardinality
    * rollup. Integer thresholds decide every flag. */
  val q250LDiversity: Q = Q(
    "q250_l_diversity",
    """WITH qs AS (SELECT user_id % 100 AS cohort,
      |                   CAST(floor(value) AS BIGINT) % 10 AS vdec,
      |                   event_type, count(*) AS n
      |            FROM events GROUP BY 1, 2, 3),
      |g AS (SELECT cohort, vdec, CAST(sum(n) AS BIGINT) AS sz,
      |             count(*) AS ndv
      |      FROM qs GROUP BY 1, 2)
      |SELECT vdec, count(*) AS n_groups,
      |       CAST(count(*) FILTER (WHERE sz < 5) AS BIGINT)
      |         AS n_below_k,
      |       CAST(count(*) FILTER (WHERE sz >= 5 AND ndv < 2) AS BIGINT)
      |         AS n_homogeneous,
      |       CAST(coalesce(sum(sz) FILTER (WHERE sz >= 5 AND ndv < 2), 0)
      |            AS BIGINT) AS n_rows_disclosed
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val qs = Tables(s, dir, "events")
      .groupBy((col("user_id") % 100).as("cohort"),
        (floor(col("value")).cast("long") % 10).as("vdec"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val g = qs.groupBy(col("cohort"), col("vdec"))
      .agg(sum(col("n")).as("sz"), count(lit(1)).as("ndv"))
    g.groupBy(col("vdec"))
      .agg(count(lit(1)).as("n_groups"),
        count_if(col("sz") < 5).as("n_below_k"),
        count_if(col("sz") >= 5 && col("ndv") < 2).as("n_homogeneous"),
        coalesce(sum(when(col("sz") >= 5 && col("ndv") < 2, col("sz"))),
          lit(0L)).cast("long").as("n_rows_disclosed"))
      .orderBy(col("vdec"))
  }

  /** q266: DSIR-style importance selection (Xie et al. 2023) — the
    * modern data-selection operator: score every document by how much
    * more likely its tokens are under a TARGET-domain unigram model than
    * under the full-corpus model (mean log2 importance ratio, add-one
    * smoothed on both sides), and select the top-100. Target here = the
    * `en` slice (a stand-in for "looks like the eval domain"); the
    * importance weight w(x) = p_target(x)/p_source(x) is exactly the
    * resampling weight DSIR hashes into n-gram buckets at scale.
    * Distinct from q265 (one model, absolute surprisal → quality) —
    * this is a two-model RATIO → domain relevance.
    *
    * Determinism: the per-token ratio is ONE log2 of an exactly-
    * computed integer product ratio ((c_t+1)(n_s+V)) / ((c_s+1)(n_t+V)),
    * all counts < 2^53 so the double products are exact; the single
    * libm log2 is rounded to 6 BEFORE the decimal accumulation (q265's
    * discipline), the per-doc mean re-rounds, and ranking ties break on
    * doc_id.
    *
    * Scale shape: both models are vocabulary-bounded broadcasts; the
    * token stream is scored map-side and aggregates to doc grain
    * (map-side combine); the selection is TakeOrderedAndProject(100) —
    * only 100 rows ever leave the executors. */
  val q266DsirSelection: Q = Q(
    "q266_dsir_selection",
    """WITH t AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      |           FROM documents),
      |cs AS (SELECT w, count(*) AS c FROM t GROUP BY 1),
      |ct AS (SELECT w, count(*) AS c FROM t WHERE lang = 'en' GROUP BY 1),
      |tot AS (SELECT (SELECT count(*) FROM t) AS ns,
      |               (SELECT count(*) FROM t WHERE lang = 'en') AS nt,
      |               (SELECT count(*) FROM cs) AS v),
      |sc AS (SELECT t.doc_id, t.lang,
      |              round(log2(((coalesce(ct.c, 0) + 1.0) * (tot.ns + tot.v))
      |                         / ((cs.c + 1.0) * (tot.nt + tot.v))), 6) AS lw
      |       FROM t JOIN cs USING (w) LEFT JOIN ct USING (w), tot),
      |d AS (SELECT doc_id, lang, count(*) AS ntok,
      |             round(CAST(sum(CAST(lw AS DECIMAL(18,6))) AS DOUBLE)
      |                   / count(*), 6) AS score
      |      FROM sc GROUP BY 1, 2)
      |SELECT doc_id, lang, ntok, score,
      |       row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      |FROM d ORDER BY score DESC, doc_id LIMIT 100""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
    val cs = t.groupBy(col("w")).agg(count(lit(1)).as("cs"))
    val ct = t.filter(col("lang") === "en")
      .groupBy(col("w")).agg(count(lit(1)).as("ct"))
    val tot = cs.agg(sum(col("cs")).as("ns"), count(lit(1)).as("v"))
      .crossJoin(t.filter(col("lang") === "en").agg(count(lit(1)).as("nt")))
    val d = t
      .join(broadcast(cs), Seq("w"))
      .join(broadcast(ct), Seq("w"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("lw", round(log2(
        ((coalesce(col("ct"), lit(0L)) + lit(1.0)) * (col("ns") + col("v")))
          / ((col("cs") + lit(1.0)) * (col("nt") + col("v")))), 6))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("ntok"),
        round(sum(col("lw").cast("decimal(18,6)")).cast("double")
          / count(lit(1)), 6).as("score"))
    import org.apache.spark.sql.expressions.Window
    d.orderBy(col("score").desc, col("doc_id")).limit(100)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast("long"))
      .select(col("doc_id"), col("lang"), col("ntok"), col("score"), col("rank"))
      // The oracle's output order is load-bearing (driver compare is
      // row-ordered) — make it explicit rather than inherited from the
      // window's incidental sort.
      .orderBy(col("score").desc, col("doc_id"))
  }

  /** q275: t-CLOSENESS audit — the third rung of the privacy-release
    * ladder (q190 k-anonymity → q250 l-diversity → this). l-diversity
    * only counts DISTINCT sensitive values per quasi-identifier group;
    * a group can hold 5 distinct event types and still leak if 96% of
    * its rows share one (a skewness attack — Li, Li & Venkatasubramanian
    * 2007). t-closeness bounds the DISTANCE between each group's
    * sensitive-value distribution and the global one; for a categorical
    * attribute under uniform ground distance the EMD is exactly the
    * total-variation distance TV(g) = ½ Σ_s |c_{g,s}/n_g − C_s/N|.
    *
    * Exactness: TV is held as the integer numerator
    * tv_num = Σ_{s∈g} |c·N − C·n| + (N − Σ_{s∈g} C)·n over denominator
    * 2·n·N — the absent-sensitive-value mass folds into one closed-form
    * term, so no group×sensitive cross join is ever built. Every
    * centered product (c·N, C·n) promotes to DECIMAL(38,0)/HUGEINT
    * BEFORE multiplying — c·N alone is ≈ N² at the cell grain, past
    * BIGINT in the 10¹¹-row regime this audit targets — and the release
    * decision (t = ¼: 2·tv_num > n·N) and ×10⁶ surface stay in that
    * width end-to-end.
    *
    * Scale shape: everything derives from ONE map-side-combining
    * aggregate to (QI, sensitive) grain; the global distribution and
    * total are vocabulary-bounded broadcasts re-aggregated FROM that
    * grain (the raw table is scanned once); the rollup is a second
    * aggregate on the same QI keys. */
  val q275TCloseness: Q = Q(
    "q275_t_closeness",
    """WITH qs AS (SELECT user_id % 100 AS cohort,
      |                   CAST(floor(value) AS BIGINT) % 10 AS vdec,
      |                   event_type, CAST(count(*) AS BIGINT) AS c
      |            FROM events GROUP BY 1, 2, 3),
      |gs AS (SELECT cohort, vdec, CAST(sum(c) AS BIGINT) AS n
      |       FROM qs GROUP BY 1, 2),
      |gd AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS cg
      |         FROM qs GROUP BY 1),
      |tot AS (SELECT CAST(sum(cg) AS BIGINT) AS nn FROM gd),
      |pres AS (SELECT qs.cohort, qs.vdec, gs.n, tot.nn,
      |                sum(abs(CAST(qs.c AS HUGEINT) * tot.nn
      |                        - CAST(gd.cg AS HUGEINT) * gs.n)) AS present_num,
      |                CAST(sum(gd.cg) AS BIGINT) AS cg_present
      |         FROM qs JOIN gd USING (event_type)
      |              JOIN gs USING (cohort, vdec) CROSS JOIN tot
      |         GROUP BY 1, 2, 3, 4),
      |tv AS (SELECT cohort, vdec, n, nn,
      |              present_num + CAST(nn - cg_present AS HUGEINT) * n AS tv_num
      |       FROM pres)
      |SELECT vdec, CAST(count(*) AS BIGINT) AS n_groups,
      |       CAST(count(*) FILTER (WHERE n >= 5) AS BIGINT) AS n_anonymous,
      |       CAST(count(*) FILTER (WHERE n >= 5
      |                              AND 2 * tv_num > CAST(n AS HUGEINT) * nn)
      |            AS BIGINT) AS n_t_fail,
      |       CAST(coalesce(max(tv_num * 1000000
      |                         // (2 * CAST(n AS HUGEINT) * nn))
      |                       FILTER (WHERE n >= 5), 0) AS BIGINT)
      |         AS max_tv_ppm
      |FROM tv GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val qs = Tables(s, dir, "events")
      .groupBy((col("user_id") % 100).as("cohort"),
        (floor(col("value")).cast("long") % 10).as("vdec"),
        col("event_type"))
      .agg(count(lit(1)).as("c"))
    val gs = qs.groupBy(col("cohort"), col("vdec"))
      .agg(sum(col("c")).cast("long").as("n"))
    val glob = qs.groupBy(col("event_type"))
      .agg(sum(col("c")).cast("long").as("cg"))
    val tot = glob.agg(sum(col("cg")).cast("long").as("nn"))
    val tv = qs
      .join(broadcast(glob), Seq("event_type"))
      .join(gs, Seq("cohort", "vdec"))
      .crossJoin(broadcast(tot))
      .groupBy(col("cohort"), col("vdec"), col("n"), col("nn"))
      .agg(sum(abs(expr("CAST(c AS DECIMAL(38,0)) * nn")
            - expr("CAST(cg AS DECIMAL(38,0)) * n"))).as("present_num"),
        sum(col("cg")).cast("long").as("cg_present"))
      .withColumn("tv_num",
        col("present_num")
          + expr("CAST(nn - cg_present AS DECIMAL(38,0))") * col("n"))
    tv.groupBy(col("vdec"))
      .agg(count(lit(1)).as("n_groups"),
        count_if(col("n") >= 5).as("n_anonymous"),
        count_if(col("n") >= 5 &&
            lit(2) * col("tv_num") > expr("CAST(n AS DECIMAL(38,0)) * nn"))
          .as("n_t_fail"),
        coalesce(max(when(col("n") >= 5,
            expr("(tv_num * 1000000) div " +
              "(2 * CAST(n AS DECIMAL(38,0)) * nn)"))),
          lit(0L)).cast("long").as("max_tv_ppm"))
      .orderBy(col("vdec"))
  }

  /** q293: ε-differentially-private count release (Laplace mechanism) —
    * the top rung of the privacy ladder above q190 (k-anonymity), q250
    * (l-diversity), and q275 (t-closeness): those audit a release;
    * DP *constructs* one with a provable guarantee. Per-nation customer
    * counts (sensitivity 1) get Laplace(1/ε) noise at ε = 0.5, clamped
    * at zero (post-processing preserves the guarantee). The true counts
    * are never surfaced.
    *
    * Determinism vs privacy: the noise draw must hash-match the oracle,
    * so u comes from the portable-hash uniform seeded per release key +
    * salt — the inverse-CDF ln() is the one libm call, rounded to 9
    * decimals before use (q273's discipline), and the final micro-unit
    * rounding is floor(x + 0.5) in both engines (no round-half ambiguity
    * on negatives). A production release swaps the seeded uniform for a
    * CSPRNG draw — one column swap; every other expression is unchanged.
    *
    * Scale shape: one map-side-combined count per key, then noise as a
    * stateless per-GROUP projection — the mechanism costs nothing at any
    * scale (|keys| rows). */
  val q293DpRelease: Q = {
    // Identical text interpolated into both engines: Laplace inverse-CDF
    // noise in micro-units from materialized uniform column u, b = 1/ε = 2.
    val noise =
      "CAST(floor(-2000000.0 * sign(u - 0.5) * round(ln(1.0 - 2.0 * abs(u - 0.5)), 9) + 0.5) AS BIGINT)"
    Q(
      "q293_dp_release",
      s"""WITH g AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |                  CAST(count(*) AS BIGINT) AS n
        |           FROM customer GROUP BY 1),
        |gm AS (SELECT nationkey, n,
        |              md5(concat(CAST(nationkey AS VARCHAR), '-graft-dp')) AS m
        |       FROM g),
        |u AS (SELECT nationkey, n,
        |             ((${PortableHash.hexHeadToLong("m", "strpos")}) % 1000000
        |              + 1) / 1000001.0 AS u
        |      FROM gm)
        |SELECT nationkey,
        |       CAST(greatest(n * 1000000 + $noise, 0) AS DOUBLE) / 1000000
        |         AS noisy_count,
        |       CAST(0.5 AS DOUBLE) AS epsilon
        |FROM u ORDER BY 1""".stripMargin) { (s, dir) =>
      Tables(s, dir, "customer")
        .groupBy(col("c_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("n"))
        .withColumn("m",
          md5(concat(col("nationkey").cast("string"), lit("-graft-dp"))))
        .withColumn("u",
          ((expr(PortableHash.hexHeadToLong("m", "instr")) % 1000000L + lit(1L))
            / lit(1000001.0)))
        .select(col("nationkey"),
          (greatest(col("n") * lit(1000000L) + expr(noise), lit(0L))
            .cast("double") / 1000000).as("noisy_count"),
          lit(0.5).cast("double").as("epsilon"))
        .orderBy(col("nationkey"))
    }
  }

  /** q318: benchmark decontamination — the eval-integrity gate every
    * training-data pipeline runs before a model ships: any training
    * document sharing an n-gram with a HELD-OUT benchmark document is
    * purged, because a single memorized eval passage invalidates the
    * benchmark. The benchmark here is the deterministic 5% hash sample
    * (production substitutes the real eval sets); the collision grain is
    * the dedup family's word 3-gram shingle (production uses 13-grams on
    * longer documents — same plan, one constant). Note the ASYMMETRY vs
    * near-dup dedup (q35): ONE shared shingle purges — contamination is
    * a containment question, not a similarity one, so there is no
    * Jaccard threshold to tune and no LSH recall to lose; the exact
    * semi-join is the whole algorithm.
    *
    * Scale shape: the benchmark shingle set is ~5% of corpus shingles,
    * distinct-reduced (map-side combined) and broadcastable at any
    * corpus size where evals are eval-sized; the purge is then one
    * broadcast LEFT SEMI join against the training shingle stream —
    * no shuffle of the training corpus at all. Per-source rollup
    * surfaces WHERE contamination concentrates (the actionable view:
    * a crawl source that quotes benchmarks gets down-weighted at the
    * mixture stage, q86). */
  val q318Decontaminate: Q = Q(
    "q318_decontaminate",
    s"""WITH b0 AS (SELECT doc_id, text, source,
       |                   md5(CAST(doc_id AS VARCHAR) || '-graft-bench') AS m
       |            FROM documents),
       |b AS (SELECT doc_id, text, source,
       |             (${PortableHash.pctBucket("m", "strpos")}) < 5 AS is_bench
       |      FROM b0),
       |w AS (SELECT doc_id, is_bench, string_split(text, ' ') AS ws
       |      FROM b WHERE text IS NOT NULL),
       |shl AS (SELECT doc_id, is_bench, unnest(${Dedup.duckShingles}) AS sh
       |        FROM w),
       |bsh AS (SELECT DISTINCT sh FROM shl WHERE is_bench),
       |cont AS (SELECT DISTINCT doc_id FROM shl
       |         WHERE NOT is_bench AND sh IN (SELECT sh FROM bsh))
       |SELECT b.source, CAST(count(*) AS BIGINT) AS n_train,
       |       CAST(sum(CASE WHEN c.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
       |         AS n_contaminated,
       |       CAST(sum(CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_kept,
       |       CAST(sum(CASE WHEN c.doc_id IS NULL THEN 0 ELSE 1 END) * 1000000
       |              // count(*) AS BIGINT) AS contaminated_ppm
       |FROM b LEFT JOIN cont c ON c.doc_id = b.doc_id
       |WHERE NOT b.is_bench
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val flags = Tables(s, dir, "documents")
      .withColumn("m", md5(concat(col("doc_id").cast("string"), lit("-graft-bench"))))
      .select(col("doc_id"), col("source"),
        (expr(PortableHash.pctBucket("m", "instr")) < 5).as("is_bench"))
      .persist(MEMORY_AND_DISK)
    val sh = Dedup.shingleRows(s, dir).join(flags.select(col("doc_id"), col("is_bench")), "doc_id")
    val bsh = sh.filter(col("is_bench")).select(col("sh")).distinct()
    val cont = sh.filter(!col("is_bench"))
      .join(broadcast(bsh), Seq("sh"), "left_semi")
      .select(col("doc_id")).distinct()
      .withColumn("hit", lit(1L))
    flags.filter(!col("is_bench"))
      .join(cont, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_train"),
        sum(when(col("hit").isNull, 0L).otherwise(1L)).as("n_contaminated"),
        sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_kept"))
      .select(col("source"), col("n_train"), col("n_contaminated"), col("n_kept"),
        expr("CAST(n_contaminated * 1000000 div n_train AS LONG)")
          .as("contaminated_ppm"))
      .orderBy(col("source"))
  }

  val all: Seq[Q] = Seq(
    q318Decontaminate,
    q69PiiRedact, q70TokenDiversity, q72ChunkDedup, q73PmiBigrams,
    q76TextClean, q77QualityGate, q78DomainCap, q83TrainingManifest,
    q98QualityDrift, q135KsDrift, q250LDiversity, q266DsirSelection,
    q275TCloseness, q293DpRelease)
}
