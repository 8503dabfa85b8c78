package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Subword (BPE-style) tokenization — token accounting at the grain a
  * real training pipeline bills in. Whitespace token counts (q58/q115/
  * q245/q251) under-count what a subword tokenizer actually emits; this
  * tier re-derives the budget/mixture math at SUBWORD grain and surfaces
  * the whitespace-vs-subword expansion ratio as the honesty metric.
  *
  * The tokenizer is deterministic and fully corpus-derived, so BOTH
  * engines can build it independently and must agree bit-for-bit:
  *  1. merge vocabulary = the top-40 character n-grams (length 2–4) by
  *     corpus frequency over the whitespace token stream, ties broken by
  *     gram (the q58/q75 top-k-by-df discipline — exact integer counts,
  *     deterministic order in both engines);
  *  2. each word is segmented by GREEDY LONGEST-MATCH against that
  *     vocabulary with single-character fallback (WordPiece's inference
  *     rule): at each position take the longest vocab gram that matches,
  *     else consume one character as one token.
  *
  * Spark-native HOW — all relational + higher-order functions, zero UDFs,
  * zero driver collects:
  *  - segmentation runs per DISTINCT word, never per occurrence: the
  *    (word, position, length) candidate explosion is bounded by
  *    |distinct words| × maxlen × 3, each candidate resolved by ONE
  *    broadcast join against the 40-gram vocabulary, reduced to a sparse
  *    per-word {position → longest-match} map;
  *  - the sequential greedy walk (inherently order-dependent) is a
  *    single `aggregate` HOF over the word's positions with O(1) work
  *    per step — no recursion, no shuffle;
  *  - per-document subword counts come from the (doc_id, word) rollup
  *    joined to the per-word counts — the only shuffle of document-sized
  *    data, carrying (doc_id, word, count), never text.
  *  At 100 TB the distinct-word table is the natural bottleneck and is
  *  exactly what production tokenizer pipelines shard on; everything
  *  upstream of it combines map-side.
  *
  * DuckDB renders the same semantics with a recursive CTE (bounded by
  * max word length) over the same deterministically-derived vocabulary —
  * the oracle re-derives everything from the parquet tables; nothing is
  * precomputed on either side. */
object Subword {

  /** Shared oracle CTE block (the caller's WITH must be RECURSIVE):
    * documents → `dt` = per-doc subword counts, plus the token stream
    * `t` for whitespace-grain columns. Mirrors the Spark pipeline in
    * [[docSubTokens]] 1:1. */
  private[ops] val duckSubCtes: String =
    """t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |wp AS (SELECT w, unnest(generate_series(1, len(w))) AS i FROM t),
      |gr AS (SELECT substr(w, CAST(i AS INT), CAST(n AS INT)) AS g
      |       FROM wp, (SELECT unnest([2, 3, 4]) AS n) ln
      |       WHERE i + n - 1 <= len(w)),
      |v AS (SELECT g AS tok FROM (SELECT g, count(*) AS c FROM gr
      |      GROUP BY g ORDER BY c DESC, g LIMIT 40)),
      |dw AS (SELECT DISTINCT w FROM t),
      |seg AS (SELECT w, 1 AS pos, 0 AS n FROM dw
      |  UNION ALL
      |  SELECT w, pos + CASE
      |      WHEN pos + 3 <= len(w) AND substr(w, pos, 4) IN (SELECT tok FROM v) THEN 4
      |      WHEN pos + 2 <= len(w) AND substr(w, pos, 3) IN (SELECT tok FROM v) THEN 3
      |      WHEN pos + 1 <= len(w) AND substr(w, pos, 2) IN (SELECT tok FROM v) THEN 2
      |      ELSE 1 END,
      |    n + 1
      |  FROM seg WHERE pos <= len(w)),
      |sw AS (SELECT w, n AS ntok FROM seg WHERE pos > len(w)),
      |wc AS (SELECT doc_id, w, count(*) AS c FROM t GROUP BY 1, 2),
      |dt AS (SELECT wc.doc_id, CAST(sum(wc.c * sw.ntok) AS BIGINT) AS stok
      |       FROM wc JOIN sw USING (w) GROUP BY 1)""".stripMargin

  /** Whitespace token stream (doc_id, w) — empties from consecutive
    * delimiters included, exactly as `string_split` yields them. */
  private def toks(s: SparkSession, dir: String): DataFrame =
    // Tables.sharded: the merge-vocab stage below explodes every char
    // position of every token (~3x corpus chars) — single-threaded on a
    // one-row-group scan without the unsplittable-input repartition.
    Tables.sharded(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))

  /** Per-document subword token counts (doc_id, stok). */
  private[ops] def docSubTokens(s: SparkSession, dir: String): DataFrame = {
    val t = toks(s, dir).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Merge vocabulary: top-40 char n-grams (2–4) by occurrence count.
    // TakeOrderedAndProject → 40 rows → broadcast; never collected.
    val vocab = t
      .select(col("w"), explode(expr("sequence(1, char_length(w))")).as("i"))
      .select(col("w"), col("i"), explode(expr("array(2, 3, 4)")).as("n"))
      .filter(expr("i + n - 1 <= char_length(w)"))
      .select(expr("substring(w, i, n)").as("sub"))
      .groupBy(col("sub")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("sub"))
      .limit(40)
      .select(col("sub"))
    val dw = t.select(col("w")).distinct()
    // Longest vocab match at every position of every distinct word:
    // (w, p, L, substring) candidates → broadcast semi-match → max L.
    val steps = dw
      .select(col("w"), explode(expr("sequence(1, greatest(char_length(w), 1))")).as("p"))
      .select(col("w"), col("p"), explode(expr("array(2, 3, 4)")).as("L"))
      .filter(expr("p + L - 1 <= char_length(w)"))
      .withColumn("sub", expr("substring(w, p, L)"))
      .join(broadcast(vocab), Seq("sub"))
      .groupBy(col("w"), col("p")).agg(max(col("L")).as("step"))
      .groupBy(col("w"))
      .agg(expr("map_from_entries(collect_list(struct(p, step)))").as("steps"))
    // Greedy walk: one O(len) aggregate HOF per distinct word — position
    // i is consumed only when the walk is AT i; the jump is the longest
    // match there (sparse map, absent → single-char fallback).
    val seg = dw.join(steps, Seq("w"), "left")
      .withColumn("ntok", expr(
        """CASE WHEN char_length(w) = 0 THEN CAST(0 AS BIGINT) ELSE
          |  aggregate(sequence(1, char_length(w)),
          |    named_struct('pos', 1, 'n', CAST(0 AS BIGINT)),
          |    (st, i) -> IF(i != st.pos, st,
          |      named_struct(
          |        'pos', st.pos + greatest(coalesce(try_element_at(steps, i), 1), 1),
          |        'n', st.n + CAST(1 AS BIGINT))),
          |    st -> st.n)
          |END""".stripMargin))
      .select(col("w"), col("ntok"))
    t.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .join(seg, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * col("ntok")).as("stok"))
  }

  /** q258: the q115 token-budget fill RE-GATED AT SUBWORD GRAIN — budget
    * and running sums count what the tokenizer emits, not whitespace
    * splits; quality score stays q115's stopword ratio (whitespace
    * grain, unchanged — the score is a property of the text, the budget
    * a property of the tokenizer). `expansion` = subword/whitespace
    * count per admitted doc is the surfaced honesty metric: how much a
    * whitespace-grain budget would have under-billed.
    *
    * Same two-phase threshold shape as q115 (score levels ≤ 10001 rows →
    * bounded window; only the one boundary level ordered per-doc) — the
    * grain change swaps the summed column, not the plan. */
  val q258BpeTokenBudget: Q = {
    val en = TextAnalysis.inList(TextAnalysis.stop.head._2)
    Q(
      "q258_bpe_token_budget",
      s"""WITH RECURSIVE $duckSubCtes,
         |f AS (SELECT d.doc_id,
         |        CAST(len(string_split(d.text, ' ')) AS BIGINT) AS ws_tokens,
         |        CAST(len(list_filter(string_split(d.text, ' '), x -> x IN $en)) AS BIGINT) AS n_stop,
         |        dt.stok
         |      FROM documents d JOIN dt ON dt.doc_id = d.doc_id),
         |sc AS (SELECT doc_id, stok, ws_tokens,
         |              (n_stop * 10000) // ws_tokens AS score FROM f),
         |tot AS (SELECT SUM(stok) // 4 AS budget FROM sc),
         |r AS (SELECT *, SUM(stok) OVER (ORDER BY score DESC, doc_id) AS cum FROM sc)
         |SELECT doc_id, score, stok AS sub_tokens, ws_tokens,
         |       round(CAST(stok AS DOUBLE) / ws_tokens, 4) AS expansion
         |FROM r, tot WHERE cum <= budget ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val sc = Tables(s, dir, "documents")
        .withColumn("ws_tokens", size(split(col("text"), " ")).cast("long"))
        .withColumn("n_stop",
          expr(s"size(filter(split(text, ' '), x -> x IN $en))").cast("long"))
        .select(col("doc_id"), col("ws_tokens"),
          expr("(n_stop * 10000) div ws_tokens").as("score"))
        .join(docSubTokens(s, dir), Seq("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val budget = sc.agg(expr("sum(stok) div 4").as("budget")) // 1 row
      val lv = sc.groupBy(col("score")).agg(sum(col("stok")).as("lvl"))
        .withColumn("cum",
          sum(col("lvl")).over(Window.orderBy(col("score").desc)))
        .crossJoin(broadcast(budget))
      val bound = lv.agg(
        min(when(col("cum") > col("budget") && col("cum") - col("lvl") <= col("budget"),
          col("score"))).as("b_score"),
        min(when(col("cum") > col("budget") && col("cum") - col("lvl") <= col("budget"),
          col("budget") - (col("cum") - col("lvl")))).as("remaining")) // 1 row
      val docs = sc.crossJoin(broadcast(bound))
      val above = docs.filter(col("score") > coalesce(col("b_score"), lit(-1L)))
      val atBoundary = docs.filter(col("score") === col("b_score"))
        .withColumn("dcum", sum(col("stok"))
          .over(Window.partitionBy(col("score")).orderBy(col("doc_id"))))
        .filter(col("dcum") <= col("remaining"))
      above.select(col("doc_id"), col("score"), col("stok"), col("ws_tokens"))
        .union(atBoundary.select(col("doc_id"), col("score"), col("stok"),
          col("ws_tokens")))
        .select(col("doc_id"), col("score"), col("stok").as("sub_tokens"),
          col("ws_tokens"),
          round(col("stok").cast("double") / col("ws_tokens"), 4).as("expansion"))
        .orderBy(col("doc_id"))
    }
  }

  /** Per-language (sub_tok, ws_tok) masses — the inputs both mixture
    * queries smooth. One rollup each at (doc_id) then (lang) grain. */
  private def langMasses(s: SparkSession, dir: String): DataFrame = {
    val ws = Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("ws"))
    ws.join(docSubTokens(s, dir), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(sum(col("stok")).cast("long").as("tok"),
        sum(col("ws")).cast("long").as("ws_tok"))
  }

  private val duckLangMasses: String =
    """wt AS (SELECT doc_id, count(*) AS ws FROM t GROUP BY 1),
      |bl AS (SELECT d.lang, CAST(sum(dt.stok) AS BIGINT) AS tok,
      |              CAST(sum(wt.ws) AS BIGINT) AS ws_tok
      |       FROM documents d JOIN dt USING (doc_id) JOIN wt USING (doc_id)
      |       GROUP BY 1)""".stripMargin

  /** q260: q245's temperature-α mixture (α = 0.7) computed over SUBWORD
    * token masses — the grain the training loader actually samples at.
    * A language whose script segments into more pieces per word carries
    * more subword mass than its whitespace share suggests, so p_natural
    * shifts and every downstream smoothed weight with it; per-language
    * `expansion` surfaces exactly that shift. Same plan shape as q245:
    * one language-grain rollup + two 1-row broadcast totals. */
  val q260BpeTemperatureMix: Q = Q(
    "q260_bpe_temperature_mix",
    s"""WITH RECURSIVE $duckSubCtes,
       |$duckLangMasses,
       |t2 AS (SELECT CAST(sum(tok) AS BIGINT) AS tt FROM bl),
       |p AS (SELECT lang, tok, ws_tok, CAST(tok AS DOUBLE) / tt AS p, tt
       |      FROM bl, t2),
       |z AS (SELECT sum(pow(p, 0.7)) AS z FROM p)
       |SELECT lang, tok AS sub_tok, ws_tok,
       |       round(CAST(tok AS DOUBLE) / ws_tok, 4) AS expansion,
       |       round(p, 6) AS p_natural,
       |       round(pow(p, 0.7) / z, 6) AS p_smoothed,
       |       round(pow(p, 0.7) / z / p, 6) AS boost,
       |       round((tt / 2) * (pow(p, 0.7) / z) / tok, 6) AS epochs
       |FROM p, z ORDER BY lang""".stripMargin) { (s, dir) =>
    // byLang feeds three sinks (total, the z-normalizer, the surface) —
    // left lazy, each re-evaluates the whole docSubTokens pipeline
    // (vocab explode + greedy-segmentation HOF). It is lang-grain
    // (≤ #languages rows), so an eager localCheckpoint pins it — the
    // same fix q258/q261 already carry via their persisted doc tables.
    val byLang = langMasses(s, dir).localCheckpoint()
    val tot = byLang.agg(sum(col("tok")).cast("long").as("tt"))
    val withP = byLang.crossJoin(broadcast(tot))
      .withColumn("p", col("tok").cast("double") / col("tt"))
    val z = withP.agg(sum(pow(col("p"), 0.7)).as("z"))
    withP.crossJoin(broadcast(z))
      .select(col("lang"), col("tok").as("sub_tok"), col("ws_tok"),
        round(col("tok").cast("double") / col("ws_tok"), 4).as("expansion"),
        round(col("p"), 6).as("p_natural"),
        round(pow(col("p"), 0.7) / col("z"), 6).as("p_smoothed"),
        round(pow(col("p"), 0.7) / col("z") / col("p"), 6).as("boost"),
        round((col("tt") / lit(2)) * (pow(col("p"), 0.7) / col("z")) / col("tok"), 6)
          .as("epochs"))
      .orderBy(col("lang"))
  }

  /** q261: q251's epoch expansion at SUBWORD grain — per-doc repeat
    * counts under the subword-mass smoothed mix, rolled up to realized
    * epochs per language. Same determinism discipline as q251: epochs
    * rounded to 6 decimals BEFORE floor/frac (collapses pow() ulp
    * divergence), extra-pass gate compares integers via the portable md5
    * hash. Repeat COUNTS, never materialized copies. */
  val q261BpeEpochExpansion: Q = {
    val h = PortableHash.hexHeadToLong("m", "strpos")
    Q(
      "q261_bpe_epoch_expansion",
      s"""WITH RECURSIVE $duckSubCtes,
         |dl AS (SELECT d.doc_id, d.lang, dt.stok
         |       FROM documents d JOIN dt USING (doc_id)),
         |bl AS (SELECT lang, CAST(sum(stok) AS BIGINT) AS tok FROM dl GROUP BY 1),
         |t2 AS (SELECT CAST(sum(tok) AS BIGINT) AS tt FROM bl),
         |p AS (SELECT lang, tok, CAST(tok AS DOUBLE) / tt AS p, tt FROM bl, t2),
         |z AS (SELECT sum(pow(p, 0.7)) AS z FROM p),
         |e AS (SELECT lang, round((tt / 2) * (pow(p, 0.7) / z) / tok, 6) AS e
         |      FROM p, z),
         |dd AS (SELECT doc_id, lang, stok AS dtok,
         |              md5(CAST(doc_id AS VARCHAR)) AS m FROM dl),
         |r AS (SELECT dd.lang, dtok,
         |             CAST(floor(e) AS BIGINT)
         |               + CASE WHEN ($h) % 1000000 <
         |                     CAST(floor((e - floor(e)) * 1000000) AS BIGINT)
         |                 THEN 1 ELSE 0 END AS reps
         |      FROM dd JOIN e USING (lang))
         |SELECT lang, count(*) AS n_docs,
         |       CAST(sum(reps) AS BIGINT) AS n_passes,
         |       CAST(sum(reps * dtok) AS BIGINT) AS expanded_tokens,
         |       round(CAST(sum(reps * dtok) AS DOUBLE) / sum(dtok), 4)
         |         AS realized_epochs
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val dl = Tables(s, dir, "documents").select(col("doc_id"), col("lang"))
        .join(docSubTokens(s, dir), Seq("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val byLang = dl.groupBy(col("lang")).agg(sum(col("stok")).cast("long").as("tok"))
      val tot = byLang.agg(sum(col("tok")).cast("long").as("tt"))
      val withP = byLang.crossJoin(broadcast(tot))
        .withColumn("p", col("tok").cast("double") / col("tt"))
      val z = withP.agg(sum(pow(col("p"), 0.7)).as("z"))
      val e = withP.crossJoin(broadcast(z))
        .select(col("lang"),
          round((col("tt") / lit(2)) * (pow(col("p"), 0.7) / col("z"))
            / col("tok"), 6).as("e"))
      val r = dl.select(col("doc_id"), col("lang"), col("stok").as("dtok"),
          md5(col("doc_id").cast("string")).as("m"))
        .join(broadcast(e), Seq("lang"))
        .withColumn("reps",
          floor(col("e")).cast("long") +
            when(expr(PortableHash.hexHeadToLong("m", "instr")) % 1000000L <
              floor((col("e") - floor(col("e"))) * 1000000).cast("long"), 1L)
              .otherwise(0L))
      r.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("reps")).as("n_passes"),
          sum(col("reps") * col("dtok")).as("expanded_tokens"),
          round(sum(col("reps") * col("dtok")).cast("double")
            / sum(col("dtok")), 4).as("realized_epochs"))
        .orderBy(col("lang"))
    }
  }

  /** q264: q59's sequence packing at SUBWORD grain — greedy fill of
    * 2048-token bins per `lang` stratum in doc_id order, where "token"
    * is what the tokenizer emits. The bin boundaries move materially vs
    * whitespace grain (~3.2× expansion on this corpus), which is exactly
    * the point: a loader packing to a 2048 CONTEXT length packs subword
    * tokens, and whitespace-grain bins would overflow it 3× over. Same
    * plan as q59: per-stratum running sums, no global order. */
  val q264BpePackSequences: Q = Q(
    "q264_bpe_pack_sequences",
    s"""WITH RECURSIVE $duckSubCtes,
       |tk AS (SELECT d.lang, d.doc_id, dt.stok AS tok
       |       FROM documents d JOIN dt USING (doc_id)),
       |c AS (SELECT lang, doc_id, tok,
       |             CAST(sum(tok) OVER (PARTITION BY lang ORDER BY doc_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |      FROM tk)
       |SELECT lang, (cum - tok) // 2048 AS bin,
       |       count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS total_tokens
       |FROM c GROUP BY 1, 2 ORDER BY lang, bin""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "documents").select(col("doc_id"), col("lang"))
      .join(docSubTokens(s, dir), Seq("doc_id"))
      .select(col("lang"), col("doc_id"), col("stok").as("tok"))
      .withColumn("cum", sum(col("tok")).over(w))
      .withColumn("bin", expr("(cum - tok) div 2048"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("total_tokens"))
      .orderBy(col("lang"), col("bin"))
  }

  /** q267: tokenizer FERTILITY audit — subwords per word and chars per
    * subword, per language, against the corpus average. Fertility is
    * the standard tokenizer-fairness metric (a language whose words
    * fragment into many more pieces than average pays more compute per
    * content unit and effectively gets a shorter context window); this
    * is the subword analog of q75's whitespace-grain OOV audit, read
    * off the SAME per-language masses the mixture tier smooths. One
    * language-cardinality table + a 1-row broadcast global; flags at
    * 1.05× the corpus fertility. */
  val q267BpeFertility: Q = Q(
    "q267_bpe_fertility",
    s"""WITH RECURSIVE $duckSubCtes,
       |$duckLangMasses,
       |ch AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS chars
       |       FROM documents GROUP BY 1),
       |g AS (SELECT CAST(sum(tok) AS DOUBLE) / sum(ws_tok) AS gfert FROM bl)
       |SELECT bl.lang, bl.ws_tok, bl.tok AS sub_tok, ch.chars,
       |       round(CAST(bl.tok AS DOUBLE) / bl.ws_tok, 4) AS fertility,
       |       round(CAST(ch.chars AS DOUBLE) / bl.tok, 4) AS chars_per_tok,
       |       round(CAST(bl.tok AS DOUBLE) / bl.ws_tok / g.gfert, 4) AS rel_fertility,
       |       CAST(bl.tok AS DOUBLE) / bl.ws_tok / g.gfert > 1.05 AS over_fragmented
       |FROM bl JOIN ch USING (lang), g ORDER BY lang""".stripMargin) { (s, dir) =>
    val bl = langMasses(s, dir)
    val ch = Tables(s, dir, "documents")
      .groupBy(col("lang")).agg(sum(col("n_chars")).cast("long").as("chars"))
    val g = bl.agg((sum(col("tok")).cast("double") / sum(col("ws_tok"))).as("gfert"))
    bl.join(ch, Seq("lang")).crossJoin(broadcast(g))
      .select(col("lang"), col("ws_tok"), col("tok").as("sub_tok"), col("chars"),
        round(col("tok").cast("double") / col("ws_tok"), 4).as("fertility"),
        round(col("chars").cast("double") / col("tok"), 4).as("chars_per_tok"),
        round(col("tok").cast("double") / col("ws_tok") / col("gfert"), 4)
          .as("rel_fertility"),
        (col("tok").cast("double") / col("ws_tok") / col("gfert") > 1.05)
          .as("over_fragmented"))
      .orderBy(col("lang"))
  }

  /** q278: BPE merge TRAINING — four iterations of the actual byte-pair
    * encoding learner (Sennrich et al. 2016), in-engine: count adjacent
    * symbol pairs over the weighted word vocabulary, merge the most
    * frequent pair into a fresh symbol, repeat. This is the piece the
    * q258 tier's FIXED top-k-gram vocabulary deliberately avoided; here
    * the vocabulary is LEARNED, and each round's pair statistics depend
    * on the previous round's merge — the sequential dependence that makes
    * BPE training a genuinely iterative engine workload.
    *
    * Representation: a merged pair becomes ONE private-use-area character
    * (U+E000+i — provably absent from the ASCII corpus, 1 char in both
    * engines' length semantics), so "adjacent symbol pair" stays
    * `substring(w, j, 2)` at every round and applying a merge is ONE
    * `replace(w, pair, placeholder)` — string replace is left-to-right
    * non-overlapping in BOTH engines, which is exactly BPE's greedy merge
    * order ('aaa' + merge "aa" → [aa][a]). Pair counts follow the
    * reference implementation's get_stats: every adjacent occurrence
    * counts, overlaps included. Ties break (count DESC, pair ASC) —
    * binary string order, identical in both engines over ASCII+PUA.
    *
    * Output: merge_no 0 = the untouched corpus baseline, then one row per
    * learned merge with the merged token EXPANDED back to its full
    * surface string, its winning pair count, and the corpus symbol count
    * after applying it — the compression trajectory a tokenizer team
    * actually reviews.
    *
    * Scale shape: everything runs at DISTINCT-WORD grain (the vocabulary
    * table production BPE trainers shard on), weighted by occurrence
    * counts that ride along from one map-side-combined aggregate of the
    * token stream; each round is one vocab-grain explode→aggregate and
    * the chosen pair is an O(1) driver scalar — the merge table IS
    * driver/broadcast state in every real trainer. The word table is
    * persisted once; rounds stack narrow `replace` projections on it. */
  val q278BpeLearn: Q = {
    val K = 4
    // chr(57344 + i) = U+E000 + i, the round-i merge symbol.
    def ph(i: Int): Char = (0xE000 + i - 1).toChar
    val oracle = {
      val stages = (1 to K).map { i =>
        val prev = s"w${i - 1}"
        s"""p$i AS (SELECT substr(w, CAST(j AS INT), 2) AS pair,
           |        CAST(sum(n) AS BIGINT) AS cnt
           |        FROM (SELECT w, n, unnest(generate_series(1, len(w) - 1)) AS j
           |              FROM $prev WHERE len(w) >= 2)
           |        GROUP BY 1),
           |m$i AS (SELECT pair, cnt FROM p$i ORDER BY cnt DESC, pair LIMIT 1),
           |w$i AS (SELECT replace(w, (SELECT pair FROM m$i), chr(${57343 + i}))
           |          AS w, n FROM $prev)""".stripMargin
      }.mkString(",\n")
      // Expanded surface form of merge i: its 2-symbol pair with every
      // earlier placeholder substituted by that merge's own (already
      // placeholder-free) expansion.
      val exps = (1 to K).map { i =>
        val inner = (1 until i).foldLeft(s"(SELECT pair FROM m$i)") { (acc, j) =>
          s"replace($acc, chr(${57343 + j}), (SELECT e FROM e$j))"
        }
        s"e$i AS (SELECT $inner AS e)"
      }.mkString(",\n")
      val outRows =
        s"""SELECT CAST(0 AS BIGINT) AS merge_no, '' AS token,
           |       CAST(0 AS BIGINT) AS support,
           |       (SELECT CAST(sum(n * len(w)) AS BIGINT) FROM w0) AS symbols_after""".stripMargin +:
          (1 to K).map { i =>
            s"""SELECT CAST($i AS BIGINT), (SELECT e FROM e$i),
               |       (SELECT cnt FROM m$i),
               |       (SELECT CAST(sum(n * len(w)) AS BIGINT) FROM w$i)""".stripMargin
          }
      s"""WITH w0 AS (SELECT w, CAST(count(*) AS BIGINT) AS n
         |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |  GROUP BY 1),
         |$stages,
         |$exps
         |${outRows.mkString("\nUNION ALL\n")}
         |ORDER BY merge_no""".stripMargin
    }
    Q("q278_bpe_learn", oracle) { (s, dir) =>
      import s.implicits._
      val words0 = Tables.sharded(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def symbols(words: DataFrame): Long =
        words.agg(sum(col("n") * char_length(col("w"))).cast("long"))
          .head.getLong(0)
      var words = words0
      var expansions = Map.empty[Char, String]
      val rows = Seq.newBuilder[(Long, String, Long, Long)]
      rows += ((0L, "", 0L, symbols(words0)))
      for (i <- 1 to K) {
        // explode_outer per the InferFiltersFromGenerate discipline: the
        // length guard proves the sequence non-empty.
        val best = words.filter(char_length(col("w")) >= 2)
          .select(col("n"),
            explode_outer(expr("sequence(1, char_length(w) - 1)")).as("j"),
            col("w"))
          .select(expr("substring(w, j, 2)").as("pair"), col("n"))
          .groupBy(col("pair")).agg(sum(col("n")).cast("long").as("cnt"))
          .orderBy(col("cnt").desc, col("pair"))
          .limit(1).head
        val pair = best.getString(0)
        val expanded = pair.flatMap(c => expansions.getOrElse(c, c.toString))
        expansions += (ph(i) -> expanded)
        words = words.select(
          call_function("replace", col("w"), lit(pair), lit(ph(i).toString)).as("w"),
          col("n"))
        rows += ((i.toLong, expanded, best.getLong(1), symbols(words)))
      }
      rows.result().toDF("merge_no", "token", "support", "symbols_after")
        .orderBy(col("merge_no"))
    }
  }

  val all: Seq[Q] = Seq(q258BpeTokenBudget, q260BpeTemperatureMix,
    q261BpeEpochExpansion, q264BpePackSequences, q267BpeFertility,
    q278BpeLearn)
}
