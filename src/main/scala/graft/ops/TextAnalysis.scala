package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table (builder-prompt
  * extension surface): token counting, quality scoring, language-ID
  * (stopword n-gram heuristic), and document fingerprinting.
  *
  * Everything is built from codegen'd builtin + higher-order array
  * functions (split/transform/filter/aggregate) — no UDFs — so the hot
  * path stays inside whole-stage codegen and scales linearly with bytes
  * of text. Expensive per-row arrays (token lists, per-token hashes) are
  * materialized in their own Project; Catalyst's CollapseProject will not
  * duplicate non-cheap expressions, so they are computed once per row.
  */
object TextAnalysis {

  // Tiny per-language stopword lists, shared verbatim between the Spark
  // expression and the DuckDB oracle so the heuristic is identical.
  val stop: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in", "a", "is", "for", "on", "with"),
    "fr" -> Seq("le", "la", "les", "de", "et", "des", "un", "une", "du", "en"),
    "es" -> Seq("el", "los", "de", "y", "que", "en", "un", "una", "las", "por"),
    "de" -> Seq("der", "die", "das", "und", "zu", "von", "mit", "auf", "ist", "den"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  private[ops] def inList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Token counting: per-language doc counts, whitespace-token totals, a
    * BPE-ish regex tokenization (letter runs / digit runs / single
    * non-alphanumerics — the GPT-2 pre-tokenizer shape), and distinct
    * vocabulary size. */
  val q30TokenStats: Q = {
    // escape-free pattern: Spark SQL and DuckDB string literals disagree on
    // backslash handling, so the class spells the space instead of \s
    val bpe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
    Q(
      "q30_token_stats",
      s"""WITH base AS (
         |  SELECT lang, count(*) AS n_docs,
         |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
         |         CAST(sum(len(regexp_extract_all(text, '$bpe', 0))) AS BIGINT) AS sum_bpe_tokens
         |  FROM documents GROUP BY lang),
         |vocab AS (
         |  SELECT lang, count(DISTINCT w) AS n_vocab
         |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents) t
         |  GROUP BY lang)
         |SELECT base.lang AS lang, n_docs, sum_tokens, sum_bpe_tokens, n_vocab
         |FROM base JOIN vocab USING (lang) ORDER BY lang""".stripMargin) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val base = d.groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " "))).as("sum_tokens"),
          sum(size(expr(s"regexp_extract_all(text, '$bpe', 0)"))).as("sum_bpe_tokens"))
      val vocab = d.select(col("lang"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("lang")).agg(countDistinct(col("w")).as("n_vocab"))
      base.join(vocab, "lang").orderBy(col("lang"))
    }
  }

  /** Quality scoring: length, punctuation ratio, stopword ratio, average
    * word length; bucketed verdict. Ratios are exact-int divisions, so they
    * are bit-identical across engines. */
  val q31Quality: Q = {
    val en = inList(stop.head._2)
    Q(
      "q31_quality_score",
      s"""WITH f AS (
         |  SELECT doc_id,
         |         len(string_split(text, ' ')) AS n_tokens,
         |         length(text) AS n_chars,
         |         length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
         |         len(list_filter(string_split(text, ' '), w -> w IN $en)) AS n_stop
         |  FROM documents)
         |SELECT doc_id, n_tokens,
         |       round(CAST(n_punct AS DOUBLE) / n_chars, 4) AS punct_ratio,
         |       round(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stop_ratio,
         |       round(CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens, 4) AS avg_word_len,
         |       CASE WHEN n_tokens >= 50 AND CAST(n_stop AS DOUBLE) / n_tokens >= 0.02 THEN 'good'
         |            WHEN n_tokens >= 10 THEN 'ok' ELSE 'poor' END AS quality
         |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .withColumn("n_punct",
          (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", ""))).cast("long"))
        .withColumn("n_stop",
          expr(s"size(filter(split(text, ' '), w -> w IN $en))").cast("long"))
        .select(
          col("doc_id"), col("n_tokens"),
          round(col("n_punct").cast("double") / col("n_chars"), 4).as("punct_ratio"),
          round(col("n_stop").cast("double") / col("n_tokens"), 4).as("stop_ratio"),
          round((col("n_chars") - col("n_tokens") + 1).cast("double") / col("n_tokens"), 4)
            .as("avg_word_len"),
          when(col("n_tokens") >= 50 &&
            col("n_stop").cast("double") / col("n_tokens") >= 0.02, "good")
            .when(col("n_tokens") >= 10, "ok")
            .otherwise("poor").as("quality"))
        .orderBy(col("doc_id"))
    }
  }

  /** The ONE language-ID classifier definition — q32 emits its confusion
    * matrix, q272 scores it against ground truth; both consume these
    * renderings, so a heuristic tweak (score expression, tie order, the
    * 'und' rule) can never make the two gates silently evaluate
    * different classifiers. */
  private object LangId {
    val langs: Seq[String] = stop.map(_._1)
    private def sparkScore(ws: Seq[String]) =
      s"size(filter(split(text, ' '), w -> w IN ${inList(ws)}))"
    private def duckScore(ws: Seq[String]) =
      s"len(list_filter(string_split(text, ' '), w -> w IN ${inList(ws)}))"
    val sparkScores: Seq[String] =
      stop.map { case (l, ws) => s"${sparkScore(ws)} AS s_$l" }
    val duckScores: String =
      stop.map { case (l, ws) => s"${duckScore(ws)} AS s_$l" }.mkString(", ")
    val m: String = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    private val pick = langs.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
    val caseSql: String = s"CASE WHEN m = 0 THEN 'und' $pick END"
  }

  /** Language-ID: stopword-hit scoring per candidate language, deterministic
    * argmax (fixed language priority on ties, 'und' when no hits). Output is
    * the (true-lang, predicted-lang) confusion matrix. */
  val q32LangId: Q = Q(
    "q32_lang_id",
    s"""WITH sc AS (SELECT lang, ${LangId.duckScores} FROM documents),
       |p AS (SELECT *, ${LangId.m} AS m FROM sc)
       |SELECT lang, ${LangId.caseSql} AS pred_lang, count(*) AS n
       |FROM p GROUP BY 1, 2 ORDER BY lang, pred_lang""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .selectExpr(Seq("lang") ++ LangId.sparkScores: _*)
      .withColumn("m", expr(LangId.m))
      .groupBy(col("lang"), expr(LangId.caseSql).as("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  /** Document fingerprinting: k-min sketch (k=1) over word 4-grams — the
    * minimum md5 of any 4-gram is a shift-robust content fingerprint
    * (rolling-hash family); whole-text hash for very short docs. */
  val q33Fingerprint: Q = Q(
    "q33_fingerprint",
    """SELECT doc_id,
      |       CASE WHEN len(string_split(text, ' ')) < 4 THEN md5(text)
      |            ELSE list_aggregate(list_transform(
      |                   generate_series(1, len(string_split(text, ' ')) - 3),
      |                   i -> md5(array_to_string((string_split(text, ' '))[i:i+3], ' '))),
      |                 'min') END AS fp
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .withColumn("fp",
        expr("""CASE WHEN size(ws) < 4 THEN md5(text)
                |     ELSE array_min(transform(sequence(1, size(ws) - 3),
                |            i -> md5(concat_ws(' ', slice(ws, i, 4))))) END""".stripMargin))
      .select(col("doc_id"), col("fp"))
      .orderBy(col("doc_id"))
  }

  /** q63: TF-IDF top terms — the 3 most characteristic tokens per document
    * (for a deterministic probe subset doc_id < 20; document frequency is
    * computed over the WHOLE corpus, which is the part that matters at
    * scale). The score is surfaced as the rational `tf × N / df` rather
    * than `tf × ln(N/df)`: ln is strictly monotone in N/df, so the top-k
    * and its ordering are identical, while the rational form is a single
    * correctly-rounded IEEE division — bit-identical across engines,
    * where libm ln implementations need not agree in the last ulp.
    *
    * Plan shape: token explode → two hash aggregates (per-doc tf, corpus
    * df) — both combine map-side; the tf⋈df join keys on the token
    * (high-cardinality, no skew beyond natural term frequency — a stopword
    * appearing in every doc still contributes only one df row); the final
    * per-doc top-3 is a window over ≤ |vocab ∩ doc| rows. N is a 1-row
    * aggregate broadcast into the projection, never a driver round-trip. */
  val q63TfIdf: Q = Q(
    "q63_tfidf",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
      |dfreq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      |sc AS (SELECT doc_id, tok, tf, df,
      |              CAST(tf AS DOUBLE) * n / df AS score
      |       FROM tf JOIN dfreq USING (tok), n
      |       WHERE doc_id < 20),
      |r AS (SELECT doc_id, tok, tf, df, score,
      |             row_number() OVER (PARTITION BY doc_id
      |               ORDER BY score DESC, tok) AS rk
      |      FROM sc)
      |SELECT doc_id, CAST(rk AS BIGINT) AS rk, tok,
      |       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
      |       round(score, 4) AS tf_idf
      |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val d = Tables(s, dir, "documents")
    val tok = d.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val tf = tok.filter(col("doc_id") < 20)
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tok.groupBy(col("tok")).agg(countDistinct(col("doc_id")).as("df"))
    val nDf = d.agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("tok"))
    tf.join(dfreq, "tok")
      .crossJoin(broadcast(nDf))
      .withColumn("score", col("tf").cast("double") * col("n") / col("df"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("tok"), col("tf"), col("df"),
        round(col("score"), 4).as("tf_idf"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** q87: bigram fluency score — a log-free corpus-LM proxy: a document's
    * score is the mean corpus frequency of its word bigrams (documents made
    * of common-in-corpus transitions score high; rare/garbled transitions
    * score low). This is the cheap stand-in for the KenLM-perplexity filter
    * real pipelines run, with the same data flow: build the n-gram table
    * once, score every document against it. Exact arithmetic throughout:
    * BIGINT frequency sum / BIGINT bigram count, ONE IEEE division per doc
    * (COVERAGE.md determinism rules — no log(), no float accumulation).
    *
    * Scale shape: bigram extraction is the shingle explode (width 2);
    * the corpus table is a map-side-combining count; scoring joins each
    * doc-bigram row to exactly ONE count row (1:1 fan-out — hot bigrams
    * do NOT go quadratic, unlike a doc×doc join), then one per-doc
    * aggregate. All linear in total tokens. */
  val q87BigramFluency: Q = Q(
    "q87_bigram_fluency",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |bgr AS (SELECT doc_id,
      |          unnest(list_transform(generate_series(1, greatest(len(ws) - 1, 1)),
      |                 i -> array_to_string(ws[i:i+1], ' '))) AS bg
      |        FROM w),
      |cnt AS (SELECT bg, count(*) AS c FROM bgr GROUP BY bg)
      |SELECT doc_id, count(*) AS n_bg,
      |       round(CAST(sum(c) AS DOUBLE) / count(*), 4) AS fluency
      |FROM bgr JOIN cnt USING (bg)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val bgr = Tables(s, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, greatest(size(ws) - 1, 1)), i -> concat_ws(' ', slice(ws, i, 2)))"))
        .as("bg"))
    val cnt = bgr.groupBy(col("bg")).agg(count(lit(1)).as("c"))
    bgr.join(cnt, "bg")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bg"),
        round(sum(col("c")).cast("double") / count(lit(1)), 4).as("fluency"))
      .orderBy(col("doc_id"))
  }

  /** q122: BM25 ranking — the standard retrieval score, in the exact
    * log-free rational form the COVERAGE.md determinism rules require.
    * With k1 = 6/5 and b = 3/4 every factor of
    * `idf × tf(k1+1) / (tf + k1(1 − b + b·dl/avgdl))` clears to integers
    * when multiplied through by 10·S (S = Σdl, so dl/avgdl = dl·N/S), and
    * the idf surrogate `(N − df + ½)/(df + ½)` becomes
    * `(2(N−df)+1)/(2df+1)` — so each (doc, term) score is ONE
    * correctly-rounded IEEE division of two exactly-computed BIGINTs:
    *   num = 22·tf·S·(2(N−df)+1)
    *   den = (10·tf·S + 3·S + 9·dl·N)·(2df+1)
    * (monotone-equivalent to the ln idf for ranking, bit-identical across
    * engines where libm ln need not be). Per-doc totals accumulate as
    * DECIMAL(18,6) — associative, order-insensitive — then surface DOUBLE.
    *
    * Scale shape: the corpus stats (N, S) are a 1-row broadcast; df is a
    * |query-terms|-row broadcast; tf explodes only rows matching the query
    * terms (the IN filter runs before the explode's shuffle); the final
    * top-20 is TakeOrdered (two-phase — partition-local heads, single
    * merge), never a global sort. BIGINT holds to ~10^18: beyond ~10^11
    * total tokens swap the products to DECIMAL(38,0), same plan. */
  val q122Bm25: Q = {
    Q("q122_bm25",
      s"""WITH ${duckBm25Ctes("('join', 'vector', 'stream')")}
         |SELECT doc_id, bm25 FROM bm
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
      bm25Scores(Tables(s, dir, "documents"), Seq("join", "vector", "stream"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(20)
    }
  }

  /** DuckDB CTE chain ending in `bm(doc_id, bm25)` — the oracle rendering
    * of [[bm25Scores]] for the given literal term list (q122's body,
    * extracted so the hybrid-fusion oracle q312 can never drift from the
    * pure-BM25 one). */
  private[ops] def duckBm25Ctes(terms: String): String =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |               CAST(sum(dl) AS BIGINT) AS s FROM dl),
       |tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
       |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM tok
       |       WHERE w IN $terms GROUP BY 1, 2),
       |dfreq AS (SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       |          FROM tok WHERE w IN $terms GROUP BY 1),
       |sc AS (SELECT f.doc_id,
       |         CAST(round(
       |           CAST(22 * f.tf * t.s * (2 * (t.n - d.df) + 1) AS DOUBLE)
       |           / CAST((10 * f.tf * t.s + 3 * t.s + 9 * l.dl * t.n)
       |                  * (2 * d.df + 1) AS DOUBLE), 6)
       |           AS DECIMAL(18,6)) AS term_score
       |       FROM tf f JOIN dfreq d USING (w)
       |       JOIN dl l ON f.doc_id = l.doc_id, tot t),
       |bm AS (SELECT doc_id, CAST(sum(term_score) AS DOUBLE) AS bm25
       |       FROM sc GROUP BY doc_id)""".stripMargin

  /** The q122 core over any (doc_id, text) frame: per-doc BM25 totals for
    * the given query terms (unsorted, uncapped). */
  private[ops] def bm25Scores(
      docs: org.apache.spark.sql.DataFrame,
      inTerms: Seq[String]): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
    val dl = toks.select(col("doc_id"), size(col("t")).cast("long").as("dl"))
    val tot = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("s"))
    val tok = toks.select(col("doc_id"), explode(col("t")).as("w"))
      .filter(col("w").isin(inTerms: _*))
    val tf = tok.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tok.groupBy(col("w"))
      .agg(countDistinct(col("doc_id")).as("df"))
    tf.join(broadcast(dfreq), "w")
      .join(dl, "doc_id")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        round(
          (lit(22L) * col("tf") * col("s")
            * (lit(2L) * (col("n") - col("df")) + 1L)).cast("double")
            / ((lit(10L) * col("tf") * col("s") + lit(3L) * col("s")
              + lit(9L) * col("dl") * col("n"))
              * (lit(2L) * col("df") + 1L)).cast("double"), 6)
          .cast("decimal(18,6)").as("term_score"))
      .groupBy(col("doc_id"))
      .agg(sum(col("term_score")).cast("double").as("bm25"))
  }

  /** q123: inverted-index construction — term → capped posting list, the
    * materialization step of a search index build (and the output shape a
    * sharded index loader ingests). Terms are the 10 highest-df tokens
    * (df desc, term tie-break); each posting list is the first 20 doc_ids
    * ascending plus the true df, so a consumer can tell "capped" from
    * "complete".
    *
    * Scale shape: (doc, term) pairs dedup in ONE map-side-combining
    * aggregate; the df ranking is TakeOrdered over the (small) vocabulary;
    * the 10 winners re-enter as a broadcast semi-join; the per-term cap is
    * a WindowGroupLimit (Spark 4 pushes rn ≤ 20 into the window sort, so
    * no term ever materializes an unbounded posting buffer) — the
    * collect_list only ever sees ≤ 20 rows per term. At 100 TB you shard
    * the same plan by term-hash range; nothing here is per-corpus
    * unbounded. */
  val q123PostingLists: Q = Q(
    "q123_posting_lists",
    """WITH raw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |e AS (SELECT DISTINCT doc_id, w FROM raw),
      |d AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM e GROUP BY w),
      |top AS (SELECT w, df FROM d ORDER BY df DESC, w LIMIT 10),
      |r AS (SELECT e.w, top.df, e.doc_id,
      |        row_number() OVER (PARTITION BY e.w ORDER BY e.doc_id) AS rn
      |      FROM e JOIN top ON e.w = top.w)
      |SELECT w AS term, df, CAST(count(*) AS BIGINT) AS n_posted,
      |       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
      |FROM r WHERE rn <= 20
      |GROUP BY w, df ORDER BY term""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .distinct()
    val top = e.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("w")).limit(10)
    e.join(broadcast(top), "w")
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("w")).orderBy(col("doc_id"))))
      .filter(col("rn") <= 20)
      .groupBy(col("w").as("term"), col("df"))
      .agg(
        count(lit(1)).as("n_posted"),
        array_join(
          transform(array_sort(collect_list(col("doc_id"))),
            x => x.cast("string")), ",").as("postings"))
      .orderBy(col("term"))
  }

  /** q227: corpus-composition lift — does source predict language in the
    * documents corpus (the q146 independence machinery on (lang ×
    * source) cells)? The curation question behind "will a per-source cap
    * skew language balance": flagged cells are exactly where capping one
    * dimension moves the other. Integer-exact lift ppm + flag. */
  val q227LangSourceLift: Q = Q(
    "q227_lang_source_lift",
    """WITH cells AS (
      |  SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
      |r AS (SELECT lang, sum(o) AS rt FROM cells GROUP BY 1),
      |c AS (SELECT source, sum(o) AS ct FROM cells GROUP BY 1),
      |t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells)
      |SELECT cells.lang, cells.source, CAST(cells.o AS BIGINT) AS n_docs,
      |       CAST(cells.o * t.n * 1000000 // (r.rt * c.ct) AS BIGINT)
      |         AS lift_ppm,
      |       10 * abs(cells.o * t.n - r.rt * c.ct) > r.rt * c.ct AS flagged
      |FROM cells JOIN r USING (lang) JOIN c USING (source) CROSS JOIN t
      |ORDER BY lang, source""".stripMargin) { (s, dir) =>
    val cells = Tables(s, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("o"))
    val r = cells.groupBy(col("lang")).agg(sum(col("o")).as("rt"))
    val c = cells.groupBy(col("source")).agg(sum(col("o")).as("ct"))
    val t = cells.agg(sum(col("o")).cast("long").as("n"))
    cells.join(broadcast(r), "lang").join(broadcast(c), "source")
      .crossJoin(broadcast(t))
      .select(col("lang"), col("source"), col("o").as("n_docs"),
        expr("o * n * 1000000 div (rt * ct)").cast("long").as("lift_ppm"),
        (lit(10) * abs(col("o") * col("n") - col("rt") * col("ct"))
          > col("rt") * col("ct")).as("flagged"))
      .orderBy(col("lang"), col("source"))
  }

  /** q228: per-source length profile — p50/p90 document length per
    * source via the level kernel (group-partitioned cumulative over
    * distinct char-count levels): the corpus-mix fingerprint a sampling
    * plan is tuned against. */
  val q228SourceLengthProfile: Q = Q(
    "q228_source_length_profile",
    """WITH lv AS (
      |  SELECT source, n_chars AS v, count(*) AS c
      |  FROM documents GROUP BY 1, 2),
      |cum AS (
      |  SELECT source, v,
      |         sum(c) OVER (PARTITION BY source ORDER BY v) AS cum,
      |         sum(c) OVER (PARTITION BY source) AS n
      |  FROM lv)
      |SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
      |       min(CASE WHEN 2 * cum >= n THEN v END) AS p50_chars,
      |       min(CASE WHEN 10 * cum >= 9 * n THEN v END) AS p90_chars
      |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val byS = Window.partitionBy(col("source"))
    Tables(s, dir, "documents")
      .groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"))
      .select(col("source"), col("v"),
        sum(col("c")).over(byS.orderBy(col("v"))).as("cum"),
        sum(col("c")).over(byS).as("n"))
      .groupBy(col("source"))
      .agg(max(col("n")).cast("long").as("n_docs"),
        min(when(lit(2) * col("cum") >= col("n"), col("v"))).as("p50_chars"),
        min(when(lit(10) * col("cum") >= lit(9) * col("n"), col("v")))
          .as("p90_chars"))
      .orderBy(col("source"))
  }

  /** q235: exact corpus-level heavy-hitter n-grams (boilerplate
    * discovery — the trigrams that dominate a crawl are templates,
    * headers, license banners; curation pipelines surface and strip
    * them). Two passes:
    *
    *  1. sketch: ONE scan aggregating a Misra–Gries summary
    *     ([[graft.functions.FreqSketch]], capacity 12000) plus the total
    *     trigram count. MG is deterministic (not probabilistic): every
    *     trigram with share > 1/12001 of the corpus is guaranteed in the
    *     candidate set regardless of partitioning/merge order, so the
    *     threshold share > 1/12000 can never lose a true heavy hitter.
    *  2. recount: a second scan joins the ≤12000 broadcast candidates and
    *     counts THEM exactly; the exact threshold `cnt · 12000 > N` makes
    *     the final answer independent of which extra candidates the
    *     sketch happened to retain.
    *
    * Scale shape: the trigram VOCABULARY grows with the corpus (16k at
    * sf0.01 — billions at 100 TB), so the oracle's `GROUP BY gram` is a
    * row-scale shuffle; the sketch pass carries exactly 12000 counters
    * per map task into a 1-row reduce, and the recount pass shuffles
    * only candidate-key rows (map-side partial count first). No shuffle
    * in the whole job exceeds O(candidates × partitions). The oracle
    * renders pure semantics — count every gram, threshold — and gate
    * equality proves the sketch's superset guarantee held. */
  /** Sketch capacity / exact threshold shared by q235 and the streaming
    * fold (q238): threshold share 1/12000 with capacity 12000 keeps the MG
    * guarantee margin (1/12000 > 1/12001) in BOTH deployments. */
  private[graft] val HhCapacity = 12000
  private[graft] val duckHeavyNgramsOracle: String =
    s"""WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
       |tok AS (SELECT unnest(list_transform(generate_series(1, len(ws) - 2),
       |                 i -> array_to_string(ws[i:i+2], ' '))) AS gram
       |        FROM w WHERE len(ws) >= 3),
       |tot AS (SELECT count(*) AS n FROM tok),
       |c AS (SELECT gram, count(*) AS cnt FROM tok GROUP BY gram)
       |SELECT gram, cnt, round(CAST(cnt AS DOUBLE) / n, 6) AS share
       |FROM c, tot WHERE cnt * $HhCapacity > n
       |ORDER BY cnt DESC, gram""".stripMargin

  /** One row per word trigram of `docs` (column `gram`). Spark's
    * sequence(1, n) DESCENDS for n < 1 (DuckDB's generate_series is
    * empty) — the length gate keeps the engines aligned and is a no-op
    * for real documents. */
  private[graft] def trigrams(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.select(split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      // explode_OUTER: sidesteps InferFiltersFromGenerate re-inlining
      // the trigram transform into a pushed filter (the q243/shingleRows
      // pathology); the size ≥ 3 gate proves the array non-null and
      // non-empty, so the outer variant is row-identical.
      .select(explode_outer(expr(
        "transform(sequence(1, size(ws) - 2), i -> array_join(slice(ws, i, 3), ' '))"))
        .as("gram"))

  /** Exact recount + threshold over a candidate table (gram): the second
    * pass both q235 (batch sketch) and q238 (streamed rolling sketch)
    * finish with — candidates broadcast, map-side partial count, and
    * the integer threshold `cnt · cap > N` applied against the exact
    * corpus total carried on the candidate rows. */
  private[graft] def hhRecount(tok: org.apache.spark.sql.DataFrame,
      cands: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    tok.join(broadcast(cands), "gram")
      .groupBy(col("gram"), col("n"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * HhCapacity > col("n"))
      .select(col("gram"), col("cnt"),
        round(col("cnt").cast("double") / col("n"), 6).as("share"))
      .orderBy(col("cnt").desc, col("gram"))

  val q235HeavyHitters: Q = Q(
    "q235_heavy_ngrams",
    duckHeavyNgramsOracle) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    val tok = trigrams(Tables(s, dir, "documents"))
    val sk = tok.agg(
      count(lit(1)).as("n"),
      expr(s"freq_sketch(gram, $HhCapacity)").as("cand"))
    val cands = sk.select(col("n"), explode(col("cand")).as("e"))
      .select(col("n"), col("e.item").as("gram"))
    hhRecount(tok, cands)
  }

  /** q243: winnowing fingerprints (Schleimer et al., SIGMOD'03 — the
    * MOSS selector): hash every token 4-gram, slide a w=4 window over
    * the hash sequence, keep each window's MINIMUM — any shared
    * substring of ≥ w+3 tokens between two documents is GUARANTEED to
    * contribute a shared fingerprint (the winnowing theorem), while the
    * selected density stays ~2/(w+1) of the grams. That guarantee is
    * what q33's single k-min sketch can't give: q33 detects whole-doc
    * similarity, winnowing localizes shared PASSAGES — the
    * plagiarism/license-boilerplate detector at corpus scale. Ties
    * select by hash VALUE and the output is the distinct fingerprint
    * set, so the leftmost/rightmost tie rule is immaterial.
    *
    * Output per doc: gram count, fingerprint count (the ~2/(w+1)
    * density is visible), and how many fingerprints are shared with
    * ANY other document. Scale shape: everything per-doc is array math
    * inside one Project (codegen'd, no shuffle); the only exchanges are
    * the fingerprint explode → shared-set reduction (distinct fp keys,
    * vocabulary-scale but REDUCED — only selected mins, ~29% of grams)
    * and the ex⋈shared join on those reduced keys — deliberately NOT a
    * broadcast hint: the shared set is duplication-proportional (tiny on
    * a clean corpus, O(corpus) on a templated one), so AQE picks
    * broadcast only when it actually fits. Short docs (< w windows)
    * degrade to one whole-sequence min in both engines. */
  val q243Winnowing: Q = Q(
    "q243_winnowing",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |g AS (SELECT doc_id,
      |             list_transform(generate_series(1, len(ws) - 3),
      |               i -> md5(array_to_string(ws[i:i+3], ' '))) AS hs
      |      FROM w WHERE len(ws) >= 4),
      |f AS (SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_grams,
      |             CASE WHEN len(hs) >= 4
      |                  THEN list_distinct(list_transform(
      |                         generate_series(1, len(hs) - 3),
      |                         i -> list_aggregate(hs[i:i+3], 'min')))
      |                  ELSE [list_aggregate(hs, 'min')] END AS fps
      |      FROM g),
      |ex AS (SELECT doc_id, unnest(fps) AS fp FROM f),
      |sh AS (SELECT fp FROM ex GROUP BY fp HAVING count(DISTINCT doc_id) > 1)
      |SELECT f.doc_id, f.n_grams, CAST(len(f.fps) AS BIGINT) AS n_fps,
      |       CAST(count(sh.fp) AS BIGINT) AS n_shared
      |FROM f LEFT JOIN ex ON ex.doc_id = f.doc_id
      |       LEFT JOIN sh ON sh.fp = ex.fp
      |GROUP BY 1, 2, 3 ORDER BY f.doc_id""".stripMargin) { (s, dir) =>
    val g = Tables(s, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 4)
      .select(col("doc_id"), expr(
        "transform(sequence(1, size(ws) - 3), i -> md5(array_join(slice(ws, i, 4), ' ')))")
        .as("hs"))
    // Four consumers (ex→sh, ex→shared, and the final doc rollup) —
    // persist the doc-grain fingerprint table or each re-runs the
    // md5+winnow chain (interpreted higher-order functions, the
    // expensive per-row step).
    val f = g.select(col("doc_id"), size(col("hs")).cast("long").as("n_grams"),
      expr("""CASE WHEN size(hs) >= 4
             |     THEN array_distinct(transform(sequence(1, size(hs) - 3),
             |            i -> array_min(slice(hs, i, 4))))
             |     ELSE array(array_min(hs)) END""".stripMargin).as("fps"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // explode_OUTER, deliberately: InferFiltersFromGenerate gives plain
    // explode a `size(fps) > 0` filter that pushdown inlines with the
    // WHOLE nested winnowing expression (the md5 transform inside the
    // window-min transform — O(n²) interpreted md5 per row, evaluated
    // thrice in the Filter: 8.6→2.1 s at sf0.01 measured). The rule
    // skips outer generators, and fps is never empty here (every doc in
    // `g` has ≥ 1 hash), so the outer variant is semantically identical.
    val ex = f.select(col("doc_id"), explode_outer(col("fps")).as("fp"))
    val sh = ex.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .select(col("fp"))
    val shared = ex.join(sh, "fp")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    f.select(col("doc_id"), col("n_grams"), size(col("fps")).cast("long").as("n_fps"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"), col("n_fps"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  /** q249: Gopher-style repetition battery, rolled up per language — the
    * corpus-health report a filtering run starts from (Rae et al.'s
    * repetition rules, at 2-gram/token grain): per doc, the fraction of
    * 2-gram occurrences claimed by the single most frequent 2-gram
    * (`top1 > 0.20` → boilerplate loop) and the fraction claimed by ANY
    * repeated 2-gram (`dup > 0.40` → templated text). Distinct from q68
    * (per-doc 3-shingle dup fraction on a 50-doc sample): this is the
    * FULL-corpus per-language failure-rate rollup — the table a curation
    * owner actually reads to decide where the repetition budget goes.
    *
    * Scale shape: one (doc, 2-gram) count aggregate (map-side combining;
    * the gram table is the only data-sized exchange), folded to doc
    * grain in the same shuffle's second aggregate, then a doc_id join
    * back to (lang) — the text column is pruned everywhere past the
    * explode — and a LANGUAGE-cardinality rollup. Thresholds are integer
    * cross-multiplications (5·top1 > n2, 5·dup > 2·n2): no float
    * decides a flag. */
  val q249GopherRepetition: Q = Q(
    "q249_gopher_repetition",
    """WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws
      |           FROM documents),
      |bg AS (SELECT doc_id,
      |              unnest(list_transform(generate_series(1, len(ws) - 1),
      |                i -> ws[i] || ' ' || ws[i + 1])) AS g
      |       FROM w WHERE len(ws) >= 2),
      |c AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
      |d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n2,
      |             CAST(max(c) AS BIGINT) AS top1,
      |             CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
      |               AS dup
      |      FROM c GROUP BY 1)
      |SELECT lang, count(*) AS n_docs,
      |       CAST(count(*) FILTER (WHERE 5 * top1 > n2) AS BIGINT)
      |         AS n_fail_top,
      |       CAST(count(*) FILTER (WHERE 5 * dup > 2 * n2) AS BIGINT)
      |         AS n_fail_dup,
      |       CAST(count(*) FILTER (WHERE 5 * top1 > n2 OR 5 * dup > 2 * n2)
      |            AS BIGINT) AS n_fail_any,
      |       round(CAST(count(*) FILTER (WHERE 5 * top1 > n2 OR
      |                                         5 * dup > 2 * n2) AS DOUBLE)
      |             / count(*), 4) AS fail_rate
      |FROM d JOIN w USING (doc_id)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val ws = docs.withColumn("ws", split(col("text"), " "))
    // explode_OUTER behind the size ≥ 2 gate (the q73 discipline): keeps
    // the bigram transform out of an inferred pushed filter.
    val bg = ws.filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode_outer(expr(
        "transform(sequence(1, size(ws) - 1), " +
          "i -> concat_ws(' ', element_at(ws, cast(i as int)), element_at(ws, cast(i + 1 as int))))"))
        .as("g"))
    val perDoc = bg.groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n2"), max(col("c")).as("top1"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup"))
    val failTop = lit(5) * col("top1") > col("n2")
    val failDup = lit(5) * col("dup") > lit(2) * col("n2")
    perDoc
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        count_if(failTop).as("n_fail_top"),
        count_if(failDup).as("n_fail_dup"),
        count_if(failTop || failDup).as("n_fail_any"),
        round(count_if(failTop || failDup).cast("double") / count(lit(1)), 4)
          .as("fail_rate"))
      .orderBy(col("lang"))
  }

  /** q253: corpus NOVELTY tracking via theta sketches — the question a
    * growing corpus asks daily ("how much of today's crawl is new
    * vocabulary?") answered two ways in one gate: exactly (one
    * distinct-grain aggregate with day membership flags — the
    * hash-compared truth) and by DataSketches THETA sketches, whose SET
    * OPERATIONS (difference/intersection — what HLL cannot do) make the
    * same answer a kilobyte-state computation: sketch(day2) −
    * sketch(day1) estimates the new-word count without ever
    * materializing either vocabulary. The sketch estimates are
    * engine-specific, so they gate as q43-style error-envelope booleans
    * (|est − exact| ≤ 5% of the union — set-op error scales with the
    * UNION size, not the result size, which is why the envelope is
    * anchored there). At 100 TB the exact arm is a daily
    * vocabulary-scale shuffle; the sketch arm is a constant-size fold —
    * this gate proves the cheap one tracks the true one. */
  val q253VocabNovelty: Q = Q(
    "q253_vocab_novelty",
    """WITH t AS (SELECT lang, doc_id % 2 AS day,
      |                  unnest(string_split(text, ' ')) AS w
      |           FROM documents),
      |m AS (SELECT lang, w,
      |             max(CASE WHEN day = 0 THEN 1 ELSE 0 END) AS h1,
      |             max(CASE WHEN day = 1 THEN 1 ELSE 0 END) AS h2
      |      FROM t GROUP BY 1, 2)
      |SELECT lang,
      |       CAST(count(*) FILTER (WHERE h2 = 1 AND h1 = 0) AS BIGINT)
      |         AS n_new,
      |       CAST(count(*) FILTER (WHERE h1 = 1 AND h2 = 1) AS BIGINT)
      |         AS n_shared,
      |       count(*) AS n_union,
      |       true AS theta_diff_ok, true AS theta_inter_ok
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir, "documents")
      .select(col("lang"), (col("doc_id") % 2).as("day"),
        explode_outer(split(col("text"), " ")).as("w"))
    val exact = t.groupBy(col("lang"), col("w"))
      .agg(max(when(col("day") === 0, 1).otherwise(0)).as("h1"),
        max(when(col("day") === 1, 1).otherwise(0)).as("h2"))
      .groupBy(col("lang"))
      .agg(count_if(col("h2") === 1 && col("h1") === 0).as("n_new"),
        count_if(col("h1") === 1 && col("h2") === 1).as("n_shared"),
        count(lit(1)).as("n_union"))
    val sk = t.groupBy(col("lang"))
      .agg(
        expr("theta_sketch_agg(CASE WHEN day = 0 THEN w END)").as("sk1"),
        expr("theta_sketch_agg(CASE WHEN day = 1 THEN w END)").as("sk2"))
      .select(col("lang"),
        expr("theta_sketch_estimate(theta_difference(sk2, sk1))")
          .cast("double").as("est_new"),
        expr("theta_sketch_estimate(theta_intersection(sk1, sk2))")
          .cast("double").as("est_shared"))
    exact.join(broadcast(sk), "lang")
      .select(col("lang"), col("n_new"), col("n_shared"), col("n_union"),
        (abs(col("est_new") - col("n_new")) <= col("n_union") * 0.05)
          .as("theta_diff_ok"),
        (abs(col("est_shared") - col("n_shared")) <= col("n_union") * 0.05)
          .as("theta_inter_ok"))
      .orderBy(col("lang"))
  }

  /** q255: count-min sketch CONTRACT audit — the third frequency-sketch
    * guarantee in the suite, complementing q235's Misra–Gries (≤k
    * counters, guaranteed heavy-hitter SUPERSET, undercounting lower
    * bounds) with the opposite trade: count-min never undercounts, and
    * overcounts by at most ε·N with probability 1−δ per query. The gate
    * checks BOTH sides of that contract on the 20 most frequent tokens:
    * `est ≥ exact` (deterministic — a violation means the sketch
    * plumbing is broken) and `est ≤ exact + ε·N` (the probabilistic
    * envelope; seed fixed, so the outcome at a given SF is
    * reproducible). Exact counts hash-gate; booleans carry the contract.
    *
    * Scale shape: the sketch is ONE pass with a mergeable fixed-size
    * aggregate (d=⌈ln 1/δ⌉ rows × 2/ε counters); the exact top-20 is a
    * vocabulary-grain count + TakeOrderedAndProject. The sketch binary
    * and the 20 candidates are the only driver-side data — both bounded
    * by construction (the q173 scalar-read discipline), never row-scale. */
  val q255CountMinAudit: Q = Q(
    "q255_countmin_audit",
    """WITH t AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |c AS (SELECT w, count(*) AS n FROM t GROUP BY 1
      |      ORDER BY n DESC, w LIMIT 20)
      |SELECT w, CAST(n AS BIGINT) AS n, true AS never_under, true AS within_eps
      |FROM c ORDER BY n DESC, w""".stripMargin) { (s, dir) =>
    val toks = Tables(s, dir, "documents")
      .select(explode_outer(split(col("text"), " ")).as("w"))
    val counts = toks.groupBy(col("w")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = counts.agg(sum(col("n")).as("t")).first().getLong(0)
    // eps=0.001, confidence=0.999, fixed seed: width 2000, depth 7 —
    // a ~112 KB mergeable state whatever the corpus size.
    val skBytes = toks
      .agg(expr("count_min_sketch(w, 0.001d, 0.999d, 42)").as("sk"))
      .first().getAs[Array[Byte]]("sk")
    val cm = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skBytes))
    val top = counts.orderBy(col("n").desc, col("w")).limit(20).collect()
      .map(r => (r.getString(0), r.getLong(1), cm.estimateCount(r.getString(0))))
    counts.unpersist()
    val slack = (0.001 * total).toLong
    import s.implicits._
    top.toSeq.toDF("w", "n", "est")
      .select(col("w"), col("n"),
        (col("est") >= col("n")).as("never_under"),
        (col("est") <= col("n") + slack).as("within_eps"))
      .orderBy(col("n").desc, col("w"))
  }

  /** q265: n-gram LM quality filter — the CCNet/fastText-era quality
    * gate: train a bigram language model on the corpus itself (add-one
    * smoothed conditional p(w2|w1) = (c(w1,w2)+1)/(c(w1)+V)) and score
    * every document by its mean −log2 p — bits per token, a perplexity
    * proxy. Documents whose text is statistically SURPRISING under the
    * corpus's own statistics (garbled text, boilerplate the corpus
    * doesn't share, wrong-language fragments) score high; the rollup
    * counts per-language flagged mass at a fixed 4.9-bit threshold.
    * Distinct from q87 (raw corpus-frequency mean): this is a smoothed
    * CONDITIONAL model — the actual LM-filter construction.
    *
    * Determinism: log2 is libm territory (the one transcendental the
    * q122 rational-BM25 trick cannot remove from a sum of logs), so
    * every per-bigram score is rounded to 6 decimals BEFORE the
    * DECIMAL(18,6) accumulation (associative, order-free — q245's
    * discipline), per-doc means re-round, and the flag threshold
    * compares the rounded number.
    *
    * Scale shape: the model IS vocabulary-bounded — c1 is |V| rows, c2
    * at most |V|² (both broadcast here; at a vocabulary where |V|²
    * outgrows broadcast, c2 joins by shuffle on w1 — same plan shape).
    * The token stream shuffles once into the doc-grain score aggregate;
    * everything else is map-side. */
  val q265LmQuality: Q = Q(
    "q265_lm_quality",
    """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents),
      |bg AS (SELECT doc_id, lang, ts[i] AS w1, ts[i+1] AS w2
      |       FROM t, unnest(generate_series(1, len(ts) - 1)) u(i)),
      |c1 AS (SELECT w1 AS w, count(*) AS c FROM bg GROUP BY 1),
      |c2 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
      |vv AS (SELECT count(DISTINCT w) AS v FROM c1),
      |sc AS (SELECT bg.doc_id, bg.lang,
      |              round(-log2((c2.c + 1.0) / (c1.c + vv.v)), 6) AS bits
      |       FROM bg JOIN c2 USING (w1, w2) JOIN c1 ON c1.w = bg.w1, vv),
      |d AS (SELECT doc_id, lang, count(*) AS nb,
      |             round(CAST(sum(CAST(bits AS DECIMAL(18,6))) AS DOUBLE)
      |                   / count(*), 6) AS score
      |      FROM sc GROUP BY 1, 2)
      |SELECT lang, count(*) AS n_docs,
      |       round(CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE)
      |             / count(*), 6) AS mean_bits,
      |       CAST(sum(CASE WHEN score > 4.9 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_flagged
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val bg = Tables(s, dir, "documents")
      .withColumn("ts", split(col("text"), " "))
      .filter(size(col("ts")) >= 2)
      .select(col("doc_id"), col("lang"), explode(expr(
        """transform(sequence(1, size(ts) - 1),
          |  i -> struct(element_at(ts, i) AS w1, element_at(ts, i + 1) AS w2))"""
          .stripMargin)).as("b"))
      .select(col("doc_id"), col("lang"), col("b.w1"), col("b.w2"))
    val c1 = bg.groupBy(col("w1").as("w")).agg(count(lit(1)).as("c1"))
    val c2 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val vv = c1.agg(countDistinct(col("w")).as("v"))
    val d = bg
      .join(broadcast(c2), Seq("w1", "w2"))
      .join(broadcast(c1.withColumnRenamed("w", "w1")), Seq("w1"))
      .crossJoin(broadcast(vv))
      .withColumn("bits",
        round(-log2((col("c2") + lit(1.0)) / (col("c1") + col("v"))), 6))
      .groupBy(col("doc_id"), col("lang"))
      .agg(round(sum(col("bits").cast("decimal(18,6)")).cast("double")
        / count(lit(1)), 6).as("score"))
    d.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("score").cast("decimal(18,6)")).cast("double")
          / count(lit(1)), 6).as("mean_bits"),
        sum(when(col("score") > 4.9, 1L).otherwise(0L)).as("n_flagged"))
      .orderBy(col("lang"))
  }

  /** q272: classifier EVALUATION rollup — q32's language-ID predictions
    * scored against the table's ground-truth labels: per language,
    * support, predicted count, true positives, precision, recall, F1.
    * This is the model-eval operator every quality/language classifier
    * in a curation pipeline needs before its threshold is trusted —
    * q32 emits the confusion matrix; this reduces it to the decision
    * metrics. The 'und' prediction counts against recall (a miss) and
    * never against precision (no 'und' ground truth row exists).
    *
    * Determinism: the matrix is exact integers; each metric is one
    * correctly-rounded division (NULL where undefined via NULLIF — the
    * same in both engines); F1 from the already-exact integer
    * 2·tp / (pred + support). Scale: the matrix is |langs|² rows from
    * one map-side-combined aggregate; everything after is
    * class-cardinality arithmetic. */
  val q272LangidEval: Q = {
    Q(
      "q272_langid_eval",
      s"""WITH sc AS (SELECT lang, ${LangId.duckScores} FROM documents),
         |p AS (SELECT *, ${LangId.m} AS m FROM sc),
         |cm AS (SELECT lang, ${LangId.caseSql} AS pred, count(*) AS n FROM p GROUP BY 1, 2),
         |act AS (SELECT lang, CAST(sum(n) AS BIGINT) AS support FROM cm GROUP BY 1),
         |prd AS (SELECT pred AS lang, CAST(sum(n) AS BIGINT) AS predicted
         |        FROM cm GROUP BY 1),
         |tp AS (SELECT lang, CAST(sum(n) AS BIGINT) AS tp FROM cm
         |       WHERE lang = pred GROUP BY 1)
         |SELECT a.lang, a.support,
         |       coalesce(p2.predicted, 0) AS predicted,
         |       coalesce(t.tp, 0) AS tp,
         |       round(CAST(coalesce(t.tp, 0) AS DOUBLE)
         |             / NULLIF(coalesce(p2.predicted, 0), 0), 4) AS precision,
         |       round(CAST(coalesce(t.tp, 0) AS DOUBLE) / a.support, 4) AS recall,
         |       round(CAST(2 * coalesce(t.tp, 0) AS DOUBLE)
         |             / (coalesce(p2.predicted, 0) + a.support), 4) AS f1
         |FROM act a LEFT JOIN prd p2 ON p2.lang = a.lang
         |           LEFT JOIN tp t ON t.lang = a.lang
         |ORDER BY a.lang""".stripMargin) { (s, dir) =>
      val cm = Tables(s, dir, "documents")
        .selectExpr(Seq("lang") ++ LangId.sparkScores: _*)
        .withColumn("m", expr(LangId.m))
        .groupBy(col("lang"), expr(LangId.caseSql).as("pred"))
        .agg(count(lit(1)).as("n"))
      val act = cm.groupBy(col("lang")).agg(sum(col("n")).cast("long").as("support"))
      val prd = cm.groupBy(col("pred").as("lang"))
        .agg(sum(col("n")).cast("long").as("predicted"))
      val tp = cm.filter(col("lang") === col("pred"))
        .groupBy(col("lang")).agg(sum(col("n")).cast("long").as("tp"))
      act.join(prd, Seq("lang"), "left").join(tp, Seq("lang"), "left")
        .select(col("lang"), col("support"),
          coalesce(col("predicted"), lit(0L)).as("predicted"),
          coalesce(col("tp"), lit(0L)).as("tp"),
          round(coalesce(col("tp"), lit(0L)).cast("double")
            / nullif(coalesce(col("predicted"), lit(0L)), lit(0L)), 4)
            .as("precision"),
          round(coalesce(col("tp"), lit(0L)).cast("double") / col("support"), 4)
            .as("recall"),
          round((lit(2) * coalesce(col("tp"), lit(0L))).cast("double")
            / (coalesce(col("predicted"), lit(0L)) + col("support")), 4)
            .as("f1"))
        .orderBy(col("lang"))
    }
  }

  /** q280: CALIBRATION audit (reliability diagram + ECE) of the language
    * classifier — the eval dimension q272's precision/recall cannot see:
    * a classifier can rank perfectly and still be mis-calibrated, and a
    * curation pipeline that THRESHOLDS on confidence (keep docs with
    * lang-confidence ≥ 0.9) ships the calibration error, not the
    * accuracy. Confidence here is the classifier's LAPLACE-SMOOTHED
    * posterior (m+1) / (Σ_l s_l + |langs|) — the uniform-Dirichlet
    * posterior mean; the raw ratio m/tot is DEGENERATE on this corpus
    * (the languages' stoplists barely collide, so it is 1.0 for every
    * doc), while smoothing grades confidence by evidence VOLUME: three
    * stopword hits are weaker evidence than thirty. Still a rational,
    * so the whole audit runs in exact integer arithmetic:
    * conf_ppm = 10⁶·(m+1) // (tot+L) per doc, reliability bins are
    * conf_ppm // 10⁵ (clamped to 9), per-bin accuracy and mean
    * confidence are integer divisions, and
    * ECE_ppm = Σ_bins n_b·|acc_b − conf_b| // N needs no float at any
    * step. Docs with zero stopword hits ('und', no posterior) are
    * excluded — calibration is defined over emitted confidences.
    *
    * Scale shape: one map-side projection to (bin, correct, conf_ppm),
    * one ≤10-group map-side-combined aggregate, one 1-row rollup
    * broadcast back onto the bins. */
  val q280Calibration: Q = {
    val tot = LangId.langs.map(l => s"s_$l").mkString(" + ")
    Q(
      "q280_calibration",
      s"""WITH sc AS (SELECT lang, ${LangId.duckScores} FROM documents),
         |p AS (SELECT *, ${LangId.m} AS m, $tot AS tot FROM sc),
         |d AS (SELECT (${LangId.caseSql}) = lang AS correct,
         |             1000000 * (m + 1) // (tot + ${LangId.langs.size})
         |               AS conf_ppm
         |      FROM p WHERE m > 0),
         |b AS (SELECT least(conf_ppm // 100000, 9) AS bin,
         |             CAST(count(*) AS BIGINT) AS n,
         |             CAST(count(*) FILTER (WHERE correct) AS BIGINT)
         |               AS n_correct,
         |             1000000 * CAST(count(*) FILTER (WHERE correct)
         |                            AS BIGINT) // count(*) AS acc_ppm,
         |             CAST(sum(conf_ppm) AS BIGINT) // count(*)
         |               AS mean_conf_ppm
         |      FROM d GROUP BY 1),
         |e AS (SELECT CAST(sum(n * abs(acc_ppm - mean_conf_ppm)) AS BIGINT)
         |               // CAST(sum(n) AS BIGINT) AS ece_ppm FROM b)
         |SELECT bin, n, n_correct, acc_ppm, mean_conf_ppm,
         |       abs(acc_ppm - mean_conf_ppm) AS gap_ppm, e.ece_ppm
         |FROM b, e ORDER BY bin""".stripMargin) { (s, dir) =>
      val d = Tables(s, dir, "documents")
        .selectExpr(Seq("lang") ++ LangId.sparkScores: _*)
        .withColumn("m", expr(LangId.m))
        .withColumn("tot", expr(tot))
        .filter(col("m") > 0)
        .select((expr(LangId.caseSql) === col("lang")).as("correct"),
          expr(s"(CAST(1000000 AS BIGINT) * (m + 1)) div (tot + ${LangId.langs.size})")
            .as("conf_ppm"))
      val b = d
        .groupBy(least(expr("conf_ppm div 100000"), lit(9L)).as("bin"))
        .agg(count(lit(1)).as("n"),
          count_if(col("correct")).as("n_correct"),
          expr("(1000000 * count_if(correct)) div count(1)").as("acc_ppm"),
          expr("sum(conf_ppm) div count(1)").as("mean_conf_ppm"))
      val e = b.agg(
        expr("sum(n * abs(acc_ppm - mean_conf_ppm)) div sum(n)").as("ece_ppm"))
      b.crossJoin(broadcast(e))
        .select(col("bin"), col("n"), col("n_correct"), col("acc_ppm"),
          col("mean_conf_ppm"),
          abs(col("acc_ppm") - col("mean_conf_ppm")).as("gap_ppm"),
          col("ece_ppm"))
        .orderBy(col("bin"))
    }
  }

  /** Token stream WITH positions, shared by the positional kernels
    * (q287 proximity, q291 TextRank, q294 LLR): one posexplode per
    * consumer, 1-based positions. The DuckDB rendering is the matching
    * CTE pair [[duckTokenCtes]] — change tokenization in BOTH or an
    * oracle silently drifts. */
  private def tokenPositions(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("w"))

  /** DuckDB side of [[tokenPositions]]: `p(doc_id, pos, w)`, 1-based
    * (generate_series + list indexing — no WITH ORDINALITY, the q195
    * lesson). */
  private val duckTokenCtes: String =
    """w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |p AS (SELECT doc_id, pos, ws[pos] AS w
      |      FROM (SELECT doc_id, ws,
      |                   unnest(generate_series(1, len(ws))) AS pos
      |            FROM w))""".stripMargin

  /** q287: positional PROXIMITY search — the phrase/near-query kernel
    * the retrieval tier (q122 BM25, q123 posting lists) was missing:
    * find documents where 'scan' is followed by 'column' within 3 token
    * positions, with per-doc match count and tightest gap. This is
    * exactly how a positional inverted index answers "term A NEAR/k
    * term B": two positional posting lists, an equi-join on doc, a gap
    * band filter — candidate volume is tf(A)·tf(B) per doc, never
    * positions². All integer.
    *
    * Scale shape: the token stream explodes once with positions
    * (codegen posexplode), each term's postings are a filter of it, and
    * the join is keyed by doc_id — co-partitioned by the same shuffle,
    * bounded by term frequencies. DuckDB renders positions by
    * generate_series + list indexing (no WITH ORDINALITY — the q195
    * lesson). */
  val q287ProximitySearch: Q = Q(
    "q287_proximity_search",
    s"""WITH $duckTokenCtes,
      |a AS (SELECT doc_id, pos FROM p WHERE w = 'scan'),
      |b AS (SELECT doc_id, pos FROM p WHERE w = 'column')
      |SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_matches,
      |       CAST(min(b.pos - a.pos) AS BIGINT) AS min_gap
      |FROM a JOIN b ON b.doc_id = a.doc_id
      |              AND b.pos - a.pos BETWEEN 1 AND 3
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val p = tokenPositions(s, dir)
    val a = p.filter(col("w") === "scan").select(col("doc_id"), col("pos").as("pa"))
    val b = p.filter(col("w") === "column").select(col("doc_id"), col("pos").as("pb"))
    a.join(b, Seq("doc_id"))
      .filter((col("pb") - col("pa")).between(1, 3))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"),
        min(col("pb") - col("pa")).cast("long").as("min_gap"))
      .orderBy(col("doc_id"))
  }

  /** q291: TextRank keyword extraction — q109's PageRank discipline
    * applied to the word CO-OCCURRENCE graph (two words linked when they
    * appear within 2 positions anywhere in the corpus; edge weight = the
    * co-occurrence count). The canonical unsupervised keyword ranker:
    * high-rank words are those central to the co-occurrence topology,
    * not merely frequent. WEIGHTED PageRank stays integer-exact the same
    * way q109 does: node mass splits proportionally as (r·w_uv) // W_u
    * (floor per edge), two unrolled iterations, jump/damping in the
    * identical integer map — so the ranks hash-match DuckDB bit-for-bit.
    *
    * Scale shape: the co-occurrence build is q287's posexplode + doc-
    * keyed equi-join (gap ≤ 2, tf-bounded per doc — never positions²);
    * everything after lives at VOCABULARY grain, the whole point of
    * ranking words instead of documents. Edge+strength table built once
    * and probed by both iterations (q109's persist lesson applies at
    * vocab scale; here the table is catalog-small so AQE broadcasts). */
  val q291TextrankKeywords: Q = {
    val S = 1000000000000L
    Q(
      "q291_textrank_keywords",
      s"""WITH $duckTokenCtes,
        |e0 AS (SELECT least(a.w, b.w) AS u, greatest(a.w, b.w) AS v,
        |              CAST(count(*) AS BIGINT) AS wt
        |       FROM p a JOIN p b ON b.doc_id = a.doc_id
        |                        AND b.pos - a.pos BETWEEN 1 AND 2
        |                        AND a.w <> b.w
        |       GROUP BY 1, 2),
        |sym AS (SELECT u, v, wt FROM e0 UNION ALL SELECT v, u, wt FROM e0),
        |outw AS (SELECT u, sum(wt) AS tw FROM sym GROUP BY 1),
        |consts AS (SELECT $S // count(*) AS base,
        |                  (15 * ($S // count(*))) // 100 AS jump
        |           FROM outw),
        |r0 AS (SELECT u AS n, (SELECT base FROM consts) AS r FROM outw),
        |r1 AS (SELECT sym.v AS n,
        |              (SELECT jump FROM consts)
        |                + (85 * sum((r0.r * sym.wt) // outw.tw)) // 100 AS r
        |       FROM sym JOIN r0 ON r0.n = sym.u JOIN outw ON outw.u = sym.u
        |       GROUP BY sym.v),
        |r2 AS (SELECT sym.v AS n,
        |              (SELECT jump FROM consts)
        |                + (85 * sum((r1.r * sym.wt) // outw.tw)) // 100 AS r
        |       FROM sym JOIN r1 ON r1.n = sym.u JOIN outw ON outw.u = sym.u
        |       GROUP BY sym.v)
        |SELECT CAST(row_number() OVER (ORDER BY r DESC, n) AS BIGINT) AS pos,
        |       n AS word, CAST(r AS BIGINT) AS r
        |FROM r2 QUALIFY pos <= 20 ORDER BY pos""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val p = tokenPositions(s, dir)
      val e0 = p.as("a").join(p.as("b"),
          col("b.doc_id") === col("a.doc_id") &&
            (col("b.pos") - col("a.pos")).between(1, 2) &&
            col("a.w") =!= col("b.w"))
        .groupBy(least(col("a.w"), col("b.w")).as("u"),
          greatest(col("a.w"), col("b.w")).as("v"))
        .agg(count(lit(1)).as("wt"))
      val sym = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v"), col("wt")))
      val outw = sym.groupBy(col("u")).agg(sum(col("wt")).as("tw"))
        .persist(MEMORY_AND_DISK)
      val nn = outw.count()
      val base = S / nn
      val jump = (15L * base) / 100L
      val edges = sym.join(outw, "u").persist(MEMORY_AND_DISK)
      var r = outw.select(col("u").as("n"), lit(base).as("r"))
      for (_ <- 1 to 2) {
        r = edges.join(r, col("n") === col("u"))
          .groupBy(col("v"))
          .agg(sum(expr("(r * wt) div tw")).as("c"))
          .select(col("v").as("n"),
            (lit(jump) + expr("(85 * c) div 100")).as("r"))
      }
      // No unpersist: the returned plan still references the cached
      // tables; the harness clears the cache after each query.
      Graph.rankTopK(r, "r", "n", 20, "word", "r")
    }
  }

  /** q294: collocation extraction by Dunning's log-likelihood ratio —
    * the statistically-honest upgrade over raw PMI (q177's family): G²
    * on the 2×2 contingency of (first word = w1) × (second word = w2)
    * over adjacent bigrams, which PREFERS evidence volume where PMI
    * rewards rare coincidences. Cross-engine determinism is the q273
    * libm discipline generalized: every ln() takes an exact-integer-
    * valued double (counts < 2^53), each log term is rounded to 9
    * decimals BEFORE arithmetic, the 4-term combination is written with
    * identical association in both renderings, and the surfaced score is
    * one final round to micro-units.
    *
    * Scale shape: the contingency margins are the bigram table's own
    * row/column aggregates (two map-side-combined passes over the
    * bigram-grain table, joined back at bigram grain) — the corpus is
    * read once, everything after is vocabulary²-bounded (and min-support
    * floored: k11 ≥ 5). */
  val q294LlrCollocations: Q = {
    // One rounded log term per contingency cell: k·round(ln k + ln N −
    // ln row − ln col, 9), zero when the cell is empty. Rendered ONCE
    // and interpolated into both engines so association cannot drift.
    def cell(k: String, row: String, colm: String): String =
      s"(CASE WHEN $k > 0 THEN $k * round(((ln(CAST($k AS DOUBLE)) + ln(CAST(nn AS DOUBLE))) - ln(CAST($row AS DOUBLE))) - ln(CAST($colm AS DOUBLE)), 9) ELSE 0.0 END)"
    val llr =
      s"((((${cell("k11", "r1", "c1")} + ${cell("k12", "r1", "c2")}) + ${cell("k21", "r2", "c1")}) + ${cell("k22", "r2", "c2")}))"
    Q(
      "q294_llr_collocations",
      s"""WITH $duckTokenCtes,
        |bg AS (SELECT a.w AS w1, b.w AS w2, CAST(count(*) AS BIGINT) AS k11
        |       FROM p a JOIN p b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |       GROUP BY 1, 2),
        |r AS (SELECT w1, sum(k11) AS r1 FROM bg GROUP BY 1),
        |c AS (SELECT w2, sum(k11) AS c1 FROM bg GROUP BY 1),
        |t AS (SELECT sum(k11) AS nn FROM bg),
        |k AS (SELECT bg.w1, bg.w2, bg.k11,
        |             r.r1 - bg.k11 AS k12, c.c1 - bg.k11 AS k21,
        |             t.nn - r.r1 - c.c1 + bg.k11 AS k22,
        |             r.r1, t.nn - r.r1 AS r2, c.c1, t.nn - c.c1 AS c2, t.nn
        |      FROM bg JOIN r USING (w1) JOIN c USING (w2) CROSS JOIN t
        |      WHERE bg.k11 >= 5)
        |SELECT w1, w2, k11,
        |       CAST(round(2000000 * $llr) AS BIGINT) AS llr_micro
        |FROM k
        |ORDER BY llr_micro DESC, w1, w2 LIMIT 20""".stripMargin) { (s, dir) =>
      import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val p = tokenPositions(s, dir)
      // Four consumers (margins, total, final projection) probe the
      // bigram table; persist so the position self-join runs once
      // (q73's discipline — the harness clears the cache per query).
      val bg = p.as("a").join(p.as("b"),
          col("b.doc_id") === col("a.doc_id") && col("b.pos") === col("a.pos") + 1)
        .groupBy(col("a.w").as("w1"), col("b.w").as("w2"))
        .agg(count(lit(1)).as("k11"))
        .persist(MEMORY_AND_DISK)
      val rM = bg.groupBy(col("w1")).agg(sum(col("k11")).as("r1"))
      val cM = bg.groupBy(col("w2")).agg(sum(col("k11")).as("c1"))
      val t = bg.agg(sum(col("k11")).as("nn"))
      bg.filter(col("k11") >= 5)
        .join(rM, "w1").join(cM, "w2").crossJoin(broadcast(t))
        .withColumn("k12", col("r1") - col("k11"))
        .withColumn("k21", col("c1") - col("k11"))
        .withColumn("k22", col("nn") - col("r1") - col("c1") + col("k11"))
        .withColumn("r2", col("nn") - col("r1"))
        .withColumn("c2", col("nn") - col("c1"))
        .select(col("w1"), col("w2"), col("k11"),
          expr(s"CAST(round(2000000 * $llr) AS BIGINT)").as("llr_micro"))
        .orderBy(col("llr_micro").desc, col("w1"), col("w2"))
        .limit(20)
    }
  }

  /** q329: vocabulary coverage estimation (Good–Turing / Chao1) — the
    * unseen-species question every corpus build asks: "how much
    * vocabulary have we NOT crawled yet". Good–Turing's missing mass —
    * the probability the next token is an unseen type — is exactly
    * f₁/N (hapax share), and Chao1's bias-corrected richness estimate
    * V + f₁(f₁−1)/(2(f₂+1)) lower-bounds the true vocabulary size; both
    * are pure integer rationals of the frequency-of-frequencies table,
    * micro/unit-floored (the f₂+1 form needs no zero guard).
    *
    * Scale shape: token rollup (map-side combined) → frequency histogram
    * (≪ tokens) → frequency-of-frequencies rollup (a handful of rows) →
    * one 1-row summary. The f-o-f reduction is what makes this O(types),
    * not O(tokens), at any corpus size. */
  val q329VocabCoverage: Q = Q(
    "q329_vocab_coverage",
    """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
      |           FROM documents WHERE text IS NOT NULL),
      |f AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1),
      |ff AS (SELECT c, CAST(count(*) AS BIGINT) AS fc FROM f GROUP BY 1),
      |s AS (SELECT CAST(sum(c * fc) AS BIGINT) AS n,
      |             CAST(sum(fc) AS BIGINT) AS v,
      |             CAST(COALESCE(sum(fc) FILTER (WHERE c = 1), 0) AS BIGINT) AS f1,
      |             CAST(COALESCE(sum(fc) FILTER (WHERE c = 2), 0) AS BIGINT) AS f2
      |      FROM ff)
      |SELECT n AS n_tokens, v AS v_observed, f1 AS hapax, f2 AS dis,
      |       CAST(f1 * 1000000 // n AS BIGINT) AS missing_mass_ppm,
      |       CAST(v + f1 * (f1 - 1) // (2 * (f2 + 1)) AS BIGINT) AS chao1_est
      |FROM s""".stripMargin) { (s, dir) =>
    val f = Tables(s, dir, "documents").filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val ff = f.groupBy(col("c")).agg(count(lit(1)).as("fc"))
    ff.agg(
        sum(col("c") * col("fc")).as("n"),
        sum(col("fc")).as("v"),
        coalesce(sum(when(col("c") === 1, col("fc"))), lit(0L)).as("f1"),
        coalesce(sum(when(col("c") === 2, col("fc"))), lit(0L)).as("f2"))
      .select(col("n").as("n_tokens"), col("v").as("v_observed"),
        col("f1").as("hapax"), col("f2").as("dis"),
        expr("CAST(f1 * 1000000 div n AS LONG)").as("missing_mass_ppm"),
        expr("CAST(v + f1 * (f1 - 1) div (2 * (f2 + 1)) AS LONG)").as("chao1_est"))
  }

  /** q331: inter-rater agreement (Cohen's κ) — the eval-methodology gate:
    * when two quality classifiers (here the length gate and the
    * word-count gate — two cheap heuristics a pipeline actually runs)
    * mostly agree, raw agreement overstates it because imbalanced
    * classifiers agree by CHANCE; κ = (p_o − p_e)/(1 − p_e) corrects for
    * that. Published as one exact rational of the 2×2 confusion counts:
    * κ_micro = (n(a+d) − [(a+b)(a+c)+(c+d)(b+d)])·10⁶ //
    * (n² − [...]), plus the Landis–Koch verdict by integer compare.
    *
    * Scale shape: one doc-grain scan into a 4-cell rollup; constant-size
    * after. */
  val q331CohensKappa: Q = Q(
    "q331_cohens_kappa",
    """WITH r AS (SELECT CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END AS ra,
      |                  CASE WHEN len(string_split(text, ' ')) >= 30
      |                       THEN 1 ELSE 0 END AS rb
      |           FROM documents WHERE text IS NOT NULL),
      |c AS (SELECT CAST(sum(CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS a,
      |             CAST(sum(CASE WHEN ra = 1 AND rb = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS b,
      |             CAST(sum(CASE WHEN ra = 0 AND rb = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS cc,
      |             CAST(sum(CASE WHEN ra = 0 AND rb = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS d,
      |             CAST(count(*) AS HUGEINT) AS n
      |      FROM r),
      |k AS (SELECT a, b, cc, d, n,
      |             (a + b) * (a + cc) + (cc + d) * (b + d) AS pe_num
      |      FROM c)
      |SELECT CAST(a AS BIGINT) AS both_good, CAST(b AS BIGINT) AS only_len,
      |       CAST(cc AS BIGINT) AS only_words, CAST(d AS BIGINT) AS both_bad,
      |       CAST((n * (a + d) - pe_num) * 1000000
      |              // nullif(n * n - pe_num, 0) AS BIGINT) AS kappa_micro,
      |       CASE WHEN (n * (a + d) - pe_num) * 1000000
      |                   // nullif(n * n - pe_num, 0) >= 800000 THEN 'almost_perfect'
      |            WHEN (n * (a + d) - pe_num) * 1000000
      |                   // nullif(n * n - pe_num, 0) >= 600000 THEN 'substantial'
      |            WHEN (n * (a + d) - pe_num) * 1000000
      |                   // nullif(n * n - pe_num, 0) >= 400000 THEN 'moderate'
      |            ELSE 'weak' END AS verdict
      |FROM k""".stripMargin) { (s, dir) =>
    val dec = "decimal(38,0)"
    val r = Tables(s, dir, "documents").filter(col("text").isNotNull)
      .select(when(col("n_chars") >= 150, 1L).otherwise(0L).as("ra"),
        when(size(split(col("text"), " ")) >= 30, 1L).otherwise(0L).as("rb"))
    r.agg(
        sum(when(col("ra") === 1 && col("rb") === 1, 1L).otherwise(0L)).cast(dec).as("a"),
        sum(when(col("ra") === 1 && col("rb") === 0, 1L).otherwise(0L)).cast(dec).as("b"),
        sum(when(col("ra") === 0 && col("rb") === 1, 1L).otherwise(0L)).cast(dec).as("cc"),
        sum(when(col("ra") === 0 && col("rb") === 0, 1L).otherwise(0L)).cast(dec).as("d"),
        count(lit(1)).cast(dec).as("n"))
      .withColumn("pe_num",
        expr("(a + b) * (a + cc) + (cc + d) * (b + d)"))
      .withColumn("kappa_micro",
        expr("CAST((n * (a + d) - pe_num) * 1000000"
          + " div nullif(n * n - pe_num, 0) AS LONG)"))
      .select(col("a").cast("long").as("both_good"),
        col("b").cast("long").as("only_len"),
        col("cc").cast("long").as("only_words"),
        col("d").cast("long").as("both_bad"),
        col("kappa_micro"),
        expr("""CASE WHEN kappa_micro >= 800000 THEN 'almost_perfect'
               |     WHEN kappa_micro >= 600000 THEN 'substantial'
               |     WHEN kappa_micro >= 400000 THEN 'moderate'
               |     ELSE 'weak' END""".stripMargin).as("verdict"))
  }

  /** q335: Heaps'-law vocabulary-growth fit — the companion to q329:
    * Good–Turing asks "how much vocabulary is left", Heaps' law
    * V ≈ K·N^β asks "how fast does it grow as the corpus scales" — the
    * number a crawl-planning team extrapolates with. β is fit by OLS on
    * the (ln N_s, ln V_s) points at DOCUMENT grain — each doc is
    * one (size, types) sample, and the driver corpus's doc lengths span
    * enough decades for a non-degenerate fit (the per-SOURCE grain is
    * saturated here: every source exhausts the same closed vocabulary,
    * which honestly fits beta = 0).
    *
    * Determinism: q294's rounded-term discipline — every ln is round(·,9)
    * and every OLS moment accumulates per-point ROUNDED products in
    * exact decimals (order-free), so both engines reach identical sums;
    * the final slope/intercept/r² are the same short IEEE sequence over
    * those identical doubles, rounded to 6.
    *
    * Scale shape: token rollup per source (map-side combined; the
    * count-distinct shuffles at (source, tok) grain), then a
    * sources-count-bounded point table and a 1-row OLS. */
  val q335HeapsLaw: Q = {
    val terms =
      """CAST(count(*) AS BIGINT) AS n,
        |CAST(sum(CAST(round(x, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sx,
        |CAST(sum(CAST(round(y, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sy,
        |CAST(sum(CAST(round(x * y, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sxy,
        |CAST(sum(CAST(round(x * x, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sxx,
        |CAST(sum(CAST(round(y * y, 9) AS DECIMAL(28,9))) AS DOUBLE) AS syy""".stripMargin
    val out =
      """n AS n_docs,
        |round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta,
        |round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
        |  AS ln_k,
        |round((n * sxy - sx * sy) * (n * sxy - sx * sy)
        |      / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2""".stripMargin
    Q(
      "q335_heaps_law",
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |           FROM documents WHERE text IS NOT NULL),
         |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ntok,
         |             CAST(count(DISTINCT tok) AS BIGINT) AS vtok
         |      FROM t GROUP BY 1),
         |p AS (SELECT round(ln(CAST(ntok AS DOUBLE)), 9) AS x,
         |             round(ln(CAST(vtok AS DOUBLE)), 9) AS y
         |      FROM s),
         |a AS (SELECT $terms FROM p)
         |SELECT $out FROM a""".stripMargin) { (s, dir) =>
      val p = Tables(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("ntok"), countDistinct(col("tok")).as("vtok"))
        .select(expr("round(ln(CAST(ntok AS DOUBLE)), 9)").as("x"),
          expr("round(ln(CAST(vtok AS DOUBLE)), 9)").as("y"))
      // The SAME term strings render both engines: split on top-level
      // commas (a continuation line never starts at column 0).
      val termCols = terms.split(",\n(?=\\S)").toIndexedSeq.map(e => expr(e))
      val outCols = out.split(",\n(?=\\S)").toIndexedSeq
      p.agg(termCols.head, termCols.tail: _*).selectExpr(outCols: _*)
    }
  }

  /** q343: Jensen–Shannon divergence of every source's unigram
    * distribution against the corpus — the principled (symmetric,
    * bounded, never-infinite) version of the distribution-drift checks
    * q98/q135 run on numeric features, at the VOCABULARY level: a source
    * whose word distribution diverges from the corpus is machine text,
    * wrong-language, or template spam, and JSD ranks exactly that. Per
    * source s: JSD(p_s‖p_corpus) = ½Σp·log₂(p/m) + ½Σq·log₂(q/m),
    * m = (p+q)/2.
    *
    * Determinism: every log₂ argument is ONE division of exact
    * integer-cast doubles (2·c_s·n_g / (c_s·n_g + c_g·n_s) — IEEE-
    * deterministic); each term rounds to 9 decimals before the
    * DECIMAL(28,9) accumulation (q265's discipline), and the two sums
    * surface as nano integers (×10⁹ of a scale-9 decimal is exactly
    * integral, so the BIGINT cast cannot hit the round-vs-truncate
    * divergence between engines). jsd_nano is their floored half.
    *
    * Scale shape: token stream → (source, word) counts map-side; the
    * term table is vocab×1 per source (the corpus side joins the
    * vocab-grain count table, never re-reading rows); per-source rollup.
    * The corpus distribution INCLUDES each source (reference = the whole
    * corpus, the standard monitor convention). */
  val q343JsDivergence: Q = Q(
    "q343_js_divergence",
    """WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS w
      |           FROM documents),
      |cs AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY 1, 2),
      |cg AS (SELECT w, CAST(sum(c) AS BIGINT) AS cg FROM cs GROUP BY 1),
      |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM cs GROUP BY 1),
      |ng AS (SELECT CAST(sum(cg) AS BIGINT) AS ng FROM cg),
      |tp AS (SELECT cs.source,
      |              CAST(round((CAST(cs.c AS DOUBLE) / CAST(ns.ns AS DOUBLE))
      |                * log2(CAST(2 * cs.c * ng.ng AS DOUBLE)
      |                       / CAST(cs.c * ng.ng + cg.cg * ns.ns AS DOUBLE)), 9)
      |                AS DECIMAL(28,9)) AS t
      |       FROM cs JOIN cg USING (w) JOIN ns USING (source), ng),
      |tq AS (SELECT ns.source,
      |              CAST(round((CAST(cg.cg AS DOUBLE) / CAST(ng.ng AS DOUBLE))
      |                * log2(CAST(2 * cg.cg * ns.ns AS DOUBLE)
      |                       / CAST(coalesce(cs.c, 0) * ng.ng + cg.cg * ns.ns
      |                              AS DOUBLE)), 9)
      |                AS DECIMAL(28,9)) AS t
      |       FROM ns CROSS JOIN cg
      |            LEFT JOIN cs ON cs.source = ns.source AND cs.w = cg.w, ng),
      |sp AS (SELECT source, CAST(sum(t) * 1000000000 AS BIGINT) AS p_nano
      |       FROM tp GROUP BY 1),
      |sq AS (SELECT source, CAST(sum(t) * 1000000000 AS BIGINT) AS q_nano
      |       FROM tq GROUP BY 1),
      |vs AS (SELECT source, CAST(count(*) AS BIGINT) AS vocab_s FROM cs GROUP BY 1)
      |SELECT sp.source, ns.ns AS n_tokens, vs.vocab_s,
      |       sp.p_nano, sq.q_nano,
      |       (sp.p_nano + sq.q_nano) // 2 AS jsd_nano
      |FROM sp JOIN sq USING (source) JOIN ns USING (source) JOIN vs USING (source)
      |ORDER BY source""".stripMargin) { (s, dir) =>
    val w = Tables(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
    val cs = w.groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cg = cs.groupBy(col("w")).agg(sum(col("c")).as("cg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ns = cs.groupBy(col("source")).agg(sum(col("c")).as("ns"))
    val ng = cg.agg(sum(col("cg")).as("ng"))
    val tp = cs.join(cg, "w").join(broadcast(ns), "source").crossJoin(broadcast(ng))
      .select(col("source"),
        round((col("c").cast("double") / col("ns").cast("double"))
          * log2((lit(2) * col("c") * col("ng")).cast("double")
            / (col("c") * col("ng") + col("cg") * col("ns")).cast("double")), 9)
          .cast("decimal(28,9)").as("t"))
    // Source-grain ns is the tiny side: broadcast it so the vocab×source
    // expansion plans as BroadcastNestedLoopJoin, never CartesianProduct.
    val tq = cg.crossJoin(broadcast(ns))
      .join(cs, Seq("source", "w"), "left")
      .crossJoin(broadcast(ng))
      .select(col("source"),
        round((col("cg").cast("double") / col("ng").cast("double"))
          * log2((lit(2) * col("cg") * col("ns")).cast("double")
            / (coalesce(col("c"), lit(0L)) * col("ng") + col("cg") * col("ns"))
              .cast("double")), 9)
          .cast("decimal(28,9)").as("t"))
    val sp = tp.groupBy(col("source"))
      .agg((sum(col("t")) * 1000000000L).cast("long").as("p_nano"))
    val sq = tq.groupBy(col("source"))
      .agg((sum(col("t")) * 1000000000L).cast("long").as("q_nano"))
    val vs = cs.groupBy(col("source")).agg(count(lit(1)).as("vocab_s"))
    sp.join(sq, "source").join(ns.withColumnRenamed("ns", "n_tokens"), "source")
      .join(vs, "source")
      .select(col("source"), col("n_tokens"), col("vocab_s"),
        col("p_nano"), col("q_nano"),
        expr("(p_nano + q_nano) div 2").as("jsd_nano"))
      .orderBy(col("source"))
  }

  /** q344: feature hashing (the "hashing trick", Weinberger et al.) —
    * token features of the whole corpus hashed into a FIXED 64-dim
    * signed vector space, the constant-memory featurizer that replaces
    * an unbounded vocabulary→index dictionary at training time. dim =
    * H(w) mod 64; sign = parity of the next hash bit (signed hashing
    * keeps collision noise zero-mean). Output is dimension-grain: total
    * hits, the signed sum, and how many distinct words share the
    * dimension — the collision audit that tells you whether 64 dims is
    * enough.
    *
    * Determinism: H is the portable md5 integer (PortableHash — the one
    * hash both engines compute identically); everything else is integer
    * counts.
    *
    * Scale shape: one token explode with map-side partial aggregation
    * into ≤64×vocab cells — but hashed at the WORD grain first (vocab
    * rows, not token rows, pay the md5), then weighted by count; the
    * final rollup is 64 rows at any corpus size. */
  val q344FeatureHash: Q = Q(
    "q344_feature_hash",
    s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY 1),
       |h AS (SELECT w, c, md5(concat(w, '-graft-fh')) AS m FROM wc),
       |d AS (SELECT w, c,
       |             (${PortableHash.hexHeadToLong("m", "strpos")}) % 64 AS dim,
       |             CASE WHEN ((${PortableHash.hexHeadToLong("m", "strpos")}) // 64) % 2 = 0
       |                  THEN 1 ELSE -1 END AS sign
       |      FROM h)
       |SELECT dim, CAST(sum(c) AS BIGINT) AS n_tokens,
       |       CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(sign * c) AS BIGINT) AS signed_sum
       |FROM d GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val wc = Tables(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    wc.withColumn("m", md5(concat(col("w"), lit("-graft-fh"))))
      .withColumn("hh", expr(PortableHash.hexHeadToLong("m", "instr")))
      .select(col("w"), col("c"), (col("hh") % 64).as("dim"),
        when(expr("(hh div 64) % 2") === 0, 1L).otherwise(-1L).as("sign"))
      .groupBy(col("dim"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_words"),
        sum(col("sign") * col("c")).as("signed_sum"))
      .orderBy(col("dim"))
  }

  /** q363: Brier-score (Murphy) decomposition of the q280 calibration
    * bins — the single proper-scoring-rule number split into WHY:
    * BS = uncertainty − resolution + reliability, where reliability is
    * the calibration gap q280's ECE eyeballs, resolution is how much
    * the confidence bins actually separate outcomes, and uncertainty is
    * the irreducible base-rate term. A model can improve ECE by
    * becoming useless (predict the base rate everywhere — reliability
    * 0, resolution 0); this decomposition is the audit that catches it.
    *
    * Determinism: computed over q280's already-floored integer bin
    * stats (the published bin contract); each component is one exact
    * integer sum with a single micro-unit floor; bs_micro is their
    * integer recombination (the decomposition identity holds exactly at
    * bin grain).
    *
    * Scale shape: q280's — map-side projection, ≤10-cell aggregate,
    * 1-row rollup. */
  val q363BrierDecomposition: Q = {
    val tot = LangId.langs.map(l => s"s_$l").mkString(" + ")
    Q(
      "q363_brier_decomposition",
      s"""WITH sc AS (SELECT lang, ${LangId.duckScores} FROM documents),
         |p AS (SELECT *, ${LangId.m} AS m, $tot AS tot FROM sc),
         |d AS (SELECT (${LangId.caseSql}) = lang AS correct,
         |             1000000 * (m + 1) // (tot + ${LangId.langs.size})
         |               AS conf_ppm
         |      FROM p WHERE m > 0),
         |b AS (SELECT least(conf_ppm // 100000, 9) AS bin,
         |             CAST(count(*) AS HUGEINT) AS n,
         |             1000000 * CAST(count(*) FILTER (WHERE correct)
         |                            AS BIGINT) // count(*) AS acc_ppm,
         |             CAST(sum(conf_ppm) AS BIGINT) // count(*)
         |               AS mean_conf_ppm,
         |             CAST(count(*) FILTER (WHERE correct) AS HUGEINT) AS x
         |      FROM d GROUP BY 1),
         |g AS (SELECT sum(n) AS nn, sum(x) AS xx,
         |             1000000 * sum(x) // sum(n) AS ybar_ppm FROM b),
         |c AS (SELECT
         |        CAST(sum(b.n * (b.mean_conf_ppm - b.acc_ppm)
         |                     * (b.mean_conf_ppm - b.acc_ppm))
         |             // (g.nn * 1000000) AS BIGINT) AS rel_micro,
         |        CAST(sum(b.n * (b.acc_ppm - g.ybar_ppm)
         |                     * (b.acc_ppm - g.ybar_ppm))
         |             // (g.nn * 1000000) AS BIGINT) AS res_micro
         |      FROM b, g GROUP BY g.nn)
         |SELECT CAST(g.nn AS BIGINT) AS n, CAST(g.ybar_ppm AS BIGINT)
         |         AS ybar_ppm,
         |       c.rel_micro, c.res_micro,
         |       CAST(g.ybar_ppm * (1000000 - g.ybar_ppm) // 1000000 AS BIGINT)
         |         AS unc_micro,
         |       CAST(g.ybar_ppm * (1000000 - g.ybar_ppm) // 1000000
         |            + c.rel_micro - c.res_micro AS BIGINT) AS bs_micro
         |FROM g, c""".stripMargin) { (s, dir) =>
      val dec38 = "decimal(38,0)"
      val d = Tables(s, dir, "documents")
        .selectExpr(Seq("lang") ++ LangId.sparkScores: _*)
        .withColumn("m", expr(LangId.m))
        .withColumn("tot", expr(tot))
        .filter(col("m") > 0)
        .select((expr(LangId.caseSql) === col("lang")).as("correct"),
          expr(s"(CAST(1000000 AS BIGINT) * (m + 1)) div (tot + ${LangId.langs.size})")
            .as("conf_ppm"))
      val b = d
        .groupBy(least(expr("conf_ppm div 100000"), lit(9L)).as("bin"))
        .agg(count(lit(1)).cast(dec38).as("n"),
          expr("(1000000 * count_if(correct)) div count(1)").as("acc_ppm"),
          expr("sum(conf_ppm) div count(1)").as("mean_conf_ppm"),
          count_if(col("correct")).cast(dec38).as("x"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val g = b.agg(sum(col("n")).as("nn"), sum(col("x")).as("xx"))
        .withColumn("ybar_ppm", expr("1000000 * xx div nn"))
      b.crossJoin(broadcast(g))
        .groupBy(col("nn"), col("ybar_ppm"))
        .agg(
          expr("""CAST(sum(n * (mean_conf_ppm - acc_ppm)
                 |         * (mean_conf_ppm - acc_ppm))
                 |  div (first(nn) * 1000000) AS LONG)""".stripMargin)
            .as("rel_micro"),
          expr("""CAST(sum(n * (acc_ppm - ybar_ppm)
                 |         * (acc_ppm - ybar_ppm))
                 |  div (first(nn) * 1000000) AS LONG)""".stripMargin)
            .as("res_micro"))
        .select(col("nn").cast("long").as("n"),
          col("ybar_ppm").cast("long").as("ybar_ppm"),
          col("rel_micro"), col("res_micro"),
          expr("CAST(ybar_ppm * (1000000 - ybar_ppm) div 1000000 AS LONG)")
            .as("unc_micro"),
          expr("""CAST(ybar_ppm * (1000000 - ybar_ppm) div 1000000
                 |     + rel_micro - res_micro AS LONG)""".stripMargin)
            .as("bs_micro"))
    }
  }

  /** q369: Flesch reading-ease readability profile — the classic
    * prose-difficulty score the quality tier (q31 ratios, q265 LM bits)
    * does not cover: 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words), with syllables approximated by vowel-group
    * count ('[aeiouy]+' runs — the standard cheap proxy) and sentences by
    * terminal-punctuation runs ('[.!?]+', floored at 1 so fragment docs
    * divide safely). A corpus-curation pipeline uses this as a
    * keep/route signal (children's-grade vs academic text).
    *
    * Determinism: every count is a regexp match count (same regex, same
    * non-overlapping-match semantics in both engines); the score is pure
    * integer floor arithmetic in milli-points — no doubles anywhere.
    *
    * Scale shape: per-doc counts are map-side expressions over the text
    * bytes; the rollup is (lang, source)-grain. */
  val q369Readability: Q = Q(
    "q369_readability",
    """WITH d AS (
      |  SELECT lang, source,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
      |         greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
      |                    AS BIGINT), 1) AS s,
      |         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
      |           AS BIGINT) AS y
      |  FROM documents),
      |f AS (SELECT lang, source,
      |             206835 - (1015 * w) // s - (84600 * y) // greatest(w, 1)
      |               AS flesch_milli
      |      FROM d)
      |SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(flesch_milli) // count(*) AS BIGINT) AS avg_flesch_milli,
      |       CAST(min(flesch_milli) AS BIGINT) AS min_flesch_milli,
      |       CAST(max(flesch_milli) AS BIGINT) AS max_flesch_milli
      |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val d = Tables(s, dir, "documents").select(col("lang"), col("source"),
      size(split(col("text"), " ")).cast("long").as("w"),
      greatest(regexp_count(col("text"), lit("[.!?]+")).cast("long"), lit(1L))
        .as("s"),
      regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long").as("y"))
    d.select(col("lang"), col("source"),
        (lit(206835L) - expr("(1015 * w) div s")
          - expr("(84600 * y) div greatest(w, 1)")).as("flesch_milli"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(flesch_milli) div count(*)").as("avg_flesch_milli"),
        min(col("flesch_milli")).as("min_flesch_milli"),
        max(col("flesch_milli")).as("max_flesch_milli"))
      .orderBy(col("lang"), col("source"))
  }

  val all: Seq[Q] = Seq(q30TokenStats, q31Quality, q32LangId, q33Fingerprint,
    q369Readability,
    q343JsDivergence, q344FeatureHash, q363BrierDecomposition,
    q329VocabCoverage, q331CohensKappa, q335HeapsLaw,
    q63TfIdf, q87BigramFluency, q122Bm25, q123PostingLists, q227LangSourceLift,
    q228SourceLengthProfile, q235HeavyHitters, q243Winnowing,
    q249GopherRepetition, q253VocabNovelty, q255CountMinAudit, q265LmQuality,
    q272LangidEval, q280Calibration, q287ProximitySearch,
    q291TextrankKeywords, q294LlrCollocations)
}
