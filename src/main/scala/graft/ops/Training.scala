package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators over `documents`: deterministic dataset
  * splitting, stratified and reservoir sampling, vocabulary building, and
  * sequence packing. These are the preparation stages a large-scale LLM
  * data pipeline runs after dedup/quality filtering (SURVEY §2 extension
  * surface; dedup/similarity live in Dedup.scala / Similarity.scala).
  *
  * Determinism rule shared by all of them: any "random" choice is a pure
  * function of the row's key — md5(key + salt) → integer (PortableHash) —
  * so Spark and the DuckDB oracle agree bit-for-bit, re-runs are stable
  * (critical for reproducible train/val/test membership), and the decision
  * is evaluable map-side with no shared RNG state across executors.
  *
  * Scale notes (100 TB):
  *  - split/sample gates are stateless per-row filters — they push down to
  *    the scan, shuffle nothing, and never need a global pass;
  *  - reservoir sampling = per-stratum top-k by hash order: the bounded
  *    heap aggregates map-side (here rendered as a window over small
  *    strata; swap in functions/TopKByScore.scala's bounded-heap
  *    TypedImperativeAggregate when strata are huge);
  *  - vocabulary building is a two-level aggregate (doc-distinct then
  *    token count) with map-side combine at both levels, then a global
  *    top-k (TakeOrderedAndProject — only k rows reach the driver side);
  *  - sequence packing is a per-stratum running sum: each stratum packs
  *    independently (the real-pipeline shape — packing never needs a
  *    global order, only a per-shard one).
  */
object Training {

  /** Materialized per-doc salted digest + [0,100) bucket, both engines. */
  private def duckBucketed(salt: String): String =
    s"""m AS (SELECT *, md5(concat(CAST(doc_id AS VARCHAR), '$salt')) AS m FROM documents),
       |b AS (SELECT *, ${PortableHash.pctBucket("m", "strpos")} AS bkt FROM m)""".stripMargin

  private def sparkBucketed(s: org.apache.spark.sql.SparkSession, dir: String, salt: String) =
    Tables(s, dir, "documents")
      .withColumn("m", md5(concat(col("doc_id").cast("string"), lit(salt))))
      .withColumn("bkt", expr(PortableHash.pctBucket("m", "instr")))

  /** Deterministic train/val/test split (80/10/10) by salted key hash —
    * membership is stable across runs and machines, rows never move between
    * splits when new data arrives (the property random() splits lack). */
  val q49SplitAssign: Q = Q(
    "q49_split_assign",
    s"""WITH ${duckBucketed("-graft-split")}
       |SELECT CASE WHEN bkt < 80 THEN 'train' WHEN bkt < 90 THEN 'val' ELSE 'test' END AS split,
       |       count(*) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |       min(doc_id) AS first_doc
       |FROM b GROUP BY 1 ORDER BY split""".stripMargin) { (s, dir) =>
    sparkBucketed(s, dir, "-graft-split")
      .withColumn("split",
        when(col("bkt") < 80, "train").when(col("bkt") < 90, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("split"))
  }

  /** Stratified Bernoulli sample: fixed 20% rate per `lang` stratum via the
    * hash gate; per-stratum achieved rate surfaced for auditing. */
  val q56StratifiedSample: Q = Q(
    "q56_stratified_sample",
    s"""WITH ${duckBucketed("-graft-strat")}
       |SELECT lang,
       |       count(*) AS n_docs,
       |       count(*) FILTER (WHERE bkt < 20) AS n_sampled,
       |       round(CAST(count(*) FILTER (WHERE bkt < 20) AS DOUBLE) / count(*), 4) AS rate
       |FROM b GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    sparkBucketed(s, dir, "-graft-strat")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        count_if(col("bkt") < 20).as("n_sampled"),
        round(count_if(col("bkt") < 20).cast("double") / count(lit(1)), 4).as("rate"))
      .orderBy(col("lang"))
  }

  /** Deterministic reservoir sample: exactly k=10 docs per `lang` stratum,
    * chosen by salted-hash order (= a uniform draw, but reproducible). */
  val q57ReservoirSample: Q = Q(
    "q57_reservoir_sample",
    s"""WITH m AS (SELECT lang, doc_id,
       |             md5(concat(CAST(doc_id AS VARCHAR), '-graft-res')) AS m
       |           FROM documents),
       |r AS (SELECT lang, doc_id,
       |             row_number() OVER (PARTITION BY lang ORDER BY m, doc_id) AS rk
       |      FROM m)
       |SELECT lang, rk, doc_id FROM r WHERE rk <= 10 ORDER BY lang, rk""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("lang")).orderBy(col("m"), col("doc_id"))
    Tables(s, dir, "documents")
      .select(col("lang"), col("doc_id"))
      .withColumn("m", md5(concat(col("doc_id").cast("string"), lit("-graft-res"))))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 10)
      .select(col("lang"), col("rk"), col("doc_id"))
      .orderBy(col("lang"), col("rk"))
  }

  /** Vocabulary top-k: the 20 tokens with the highest document frequency
    * (ties broken by token). Two-level aggregate — distinct (token, doc)
    * first, then counts — both levels combine map-side; the final top-k is
    * a TakeOrderedAndProject, so only k rows ever leave the executors. */
  val q58VocabTopK: Q = Q(
    "q58_vocab_topk",
    """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |SELECT tok, count(DISTINCT doc_id) AS df, count(*) AS tf
      |FROM t GROUP BY tok ORDER BY df DESC, tok LIMIT 20""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf"))
      .orderBy(col("df").desc, col("tok"))
      .limit(20)
  }

  /** Sequence packing: greedy fill of 2048-token bins per `lang` stratum in
    * doc_id order (docs may straddle a boundary — the standard "pack then
    * chunk" shape). bin = tokens-before-this-doc div 2048. Per-stratum
    * running sums keep the sort local to the stratum; no global order. */
  val q59PackSequences: Q = Q(
    "q59_pack_sequences",
    """WITH tk AS (SELECT lang, doc_id,
      |              CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
      |            FROM documents),
      |c AS (SELECT lang, doc_id, tok,
      |             CAST(sum(tok) OVER (PARTITION BY lang ORDER BY doc_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |      FROM tk)
      |SELECT lang, (cum - tok) // 2048 AS bin,
      |       count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS total_tokens
      |FROM c GROUP BY 1, 2 ORDER BY lang, bin""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "documents")
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tok"))
      .withColumn("cum", sum(col("tok")).over(w))
      .withColumn("bin", expr("(cum - tok) div 2048"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("total_tokens"))
      .orderBy(col("lang"), col("bin"))
  }

  /** q75: vocabulary coverage / OOV-rate audit — after building a
    * vocabulary (q58's shape, top-100 by document frequency here), measure
    * per-language what fraction of corpus tokens falls outside it. High
    * OOV for a language means the tokenizer/vocab under-serves it — the
    * standard pre-training audit before committing to a vocab.
    *
    * Scale shape: the vocab is k rows by construction → broadcast to the
    * token stream (map-side membership flag, no shuffle of the corpus);
    * per-language counts combine map-side. The vocab itself comes from the
    * same two-level map-side-combining aggregate as q58. */
  val q75OovRate: Q = Q(
    "q75_oov_rate",
    """WITH t AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents),
      |v AS (SELECT tok FROM (
      |        SELECT tok, count(DISTINCT doc_id) AS df
      |        FROM t GROUP BY tok ORDER BY df DESC, tok LIMIT 100)),
      |c AS (SELECT lang, count(*) AS n_tokens, count(v.tok) AS n_covered
      |      FROM t LEFT JOIN v ON v.tok = t.tok GROUP BY lang)
      |SELECT lang, n_tokens, n_covered,
      |       round(1 - CAST(n_covered AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4) AS oov_rate
      |FROM c ORDER BY lang""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
    val vocab = t.groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .orderBy(col("df").desc, col("tok"))
      .limit(100)
      .select(col("tok"), lit(true).as("in_vocab"))
    t.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_tokens"),
        count_if(col("in_vocab").isNotNull).as("n_covered"))
      .select(col("lang"), col("n_tokens"), col("n_covered"),
        round(lit(1) - col("n_covered").cast("double") / col("n_tokens").cast("double"), 4)
          .as("oov_rate"))
      .orderBy(col("lang"))
  }

  /** q86: dataset mix weighting — the sampling stage that turns a raw
    * corpus into a TARGET TRAINING MIX: each language keeps a configured
    * fraction (en 100%, fr/es 50%, zh/de 25%) via the same salted-hash
    * gate as q49, so membership is deterministic, stable under re-runs,
    * and decided map-side per row. The report shows requested-vs-achieved
    * rate per language (achieved converges to the target as n grows; the
    * gate is exact-threshold, not RNG).
    *
    * Scale shape: the gate is a stateless row filter fused into the scan
    * (no shuffle); the report is one small aggregate. Reweighting 100 TB
    * is a config change, not a new pipeline. */
  val q86MixWeights: Q = Q(
    "q86_mix_weights",
    s"""WITH ${duckBucketed("-graft-mix")},
       |w AS (SELECT *, CASE lang WHEN 'en' THEN 100 WHEN 'fr' THEN 50
       |                          WHEN 'es' THEN 50 ELSE 25 END AS thr
       |      FROM b)
       |SELECT lang, count(*) AS n_docs,
       |       count(*) FILTER (WHERE bkt < thr) AS n_kept,
       |       round(CAST(count(*) FILTER (WHERE bkt < thr) AS DOUBLE) / count(*), 4) AS achieved_rate
       |FROM w GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    val thr = when(col("lang") === "en", 100)
      .when(col("lang") === "fr", 50)
      .when(col("lang") === "es", 50)
      .otherwise(25)
    sparkBucketed(s, dir, "-graft-mix")
      .withColumn("thr", thr)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        count_if(col("bkt") < col("thr")).as("n_kept"),
        round(count_if(col("bkt") < col("thr")).cast("double") / count(lit(1)), 4)
          .as("achieved_rate"))
      .orderBy(col("lang"))
  }

  /** Token-budget fill: select the highest-quality documents until a token
    * budget is exhausted — the final assembly step of a training set
    * ("take the best B tokens"). Semantics: order docs by (score DESC,
    * doc_id ASC) and keep while the inclusive running token sum stays
    * within budget (here budget = total/4).
    *
    * The naive rendering is a GLOBAL ordered running sum — a single-
    * partition window, the canonical scale anti-pattern. This is instead
    * the two-phase threshold shape (the top-k generalization):
    *  1. aggregate tokens per score LEVEL — the score is an exact integer
    *     in [0, 10000] (floor(n_stop·10⁴ / n_tokens)), so the level table
    *     is ≤ 10001 rows at ANY corpus size; the running sum over levels is
    *     a bounded window, not a data-sized one;
    *  2. levels strictly above the boundary are admitted outright with a
    *     map-side threshold filter (no shuffle of the admitted mass);
    *  3. only the ONE boundary level is ordered per-doc — its running sum
    *     window is level-sized, degenerate only if all docs share a score.
    * The 1-row boundary summary re-enters the plan as a broadcast, never a
    * collect. At 100 TB: two scans of (doc_id, tokens, score) — the text
    * itself is read once, level agg and threshold filter are map-side. */
  val q115TokenBudget: Q = {
    val en = TextAnalysis.inList(TextAnalysis.stop.head._2)
    Q(
      "q115_token_budget",
      s"""WITH f AS (
         |  SELECT doc_id,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
         |         CAST(len(list_filter(string_split(text, ' '), w -> w IN $en)) AS BIGINT) AS n_stop
         |  FROM documents),
         |sc AS (SELECT doc_id, tokens, (n_stop * 10000) // tokens AS score FROM f),
         |tot AS (SELECT SUM(tokens) // 4 AS budget FROM sc),
         |r AS (SELECT *, SUM(tokens) OVER (ORDER BY score DESC, doc_id) AS cum FROM sc)
         |SELECT doc_id, score, tokens
         |FROM r, tot WHERE cum <= budget ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val sc = Tables(s, dir, "documents")
        .withColumn("tokens", size(split(col("text"), " ")).cast("long"))
        .withColumn("n_stop",
          expr(s"size(filter(split(text, ' '), w -> w IN $en))").cast("long"))
        .select(col("doc_id"), col("tokens"),
          expr("(n_stop * 10000) div tokens").as("score"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val budget = sc.agg(expr("sum(tokens) div 4").as("budget")) // 1 row
      // Phase 1: running token sum over score LEVELS (≤ 10001 rows).
      val lv = sc.groupBy(col("score")).agg(sum(col("tokens")).as("lvl"))
        .withColumn("cum",
          sum(col("lvl")).over(Window.orderBy(col("score").desc)))
        .crossJoin(broadcast(budget))
      // The unique level whose cumulative sum first exceeds the budget
      // (none when the budget covers everything) + the budget left for it.
      val bound = lv.agg(
        min(when(col("cum") > col("budget") && col("cum") - col("lvl") <= col("budget"),
          col("score"))).as("b_score"),
        min(when(col("cum") > col("budget") && col("cum") - col("lvl") <= col("budget"),
          col("budget") - (col("cum") - col("lvl")))).as("remaining")) // 1 row
      val docs = sc.crossJoin(broadcast(bound))
      // Phase 2: whole levels above the boundary pass a map-side filter...
      val above = docs.filter(col("score") > coalesce(col("b_score"), lit(-1L)))
      // ...and only the boundary level is ordered per-doc.
      val atBoundary = docs.filter(col("score") === col("b_score"))
        .withColumn("dcum", sum(col("tokens"))
          .over(Window.partitionBy(col("score")).orderBy(col("doc_id"))))
        .filter(col("dcum") <= col("remaining"))
      above.select(col("doc_id"), col("score"), col("tokens"))
        .union(atBoundary.select(col("doc_id"), col("score"), col("tokens")))
        .orderBy(col("doc_id"))
    }
  }

  /** Equi-depth decile assignment — curriculum binning: every document
    * gets its global NTILE(10) bucket by (tokens, doc_id) order, the
    * standard "quality decile" feature of a curation pipeline. Spark's own
    * `ntile` is an unpartitioned window — all rows through one partition.
    * This is the q115 two-phase shape generalized to per-row RANK
    * assignment:
    *  1. aggregate counts per token-count LEVEL (bounded by the max
    *     document length, not the corpus) and cumulative-sum them into
    *     [start_rank, end_rank] per level — the only unpartitioned window
    *     runs over levels;
    *  2. a level whose start and end fall in the same decile assigns that
    *     decile to all its docs MAP-SIDE (no per-row ordering) — at most 9
    *     levels straddle a boundary;
    *  3. only straddling levels order their docs (window partitioned BY
    *     level), r = start_rank − 1 + row_number, decile = bucket(r).
    * bucket(r) replicates NTILE's exact size split (first N mod 10
    * buckets get ⌈N/10⌉) in integer arithmetic, so the result hash-matches
    * the oracle's NTILE. */
  val q119TokenDeciles: Q = Q(
    "q119_token_deciles",
    """WITH f AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
      |  FROM documents)
      |SELECT doc_id, tokens,
      |       NTILE(10) OVER (ORDER BY tokens, doc_id) AS decile
      |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
    decilesOf(Tables(s, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("tokens")))
  }

  /** The q119 core over any (doc_id, tokens) frame — extracted so the spec
    * can cross-check it against Spark's own `ntile` at N mod 10 ≠ 0 (the
    * uneven-bucket branch the ×10-sized gate tables never hit). */
  private[ops] def decilesOf(in: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val f = in.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = f.agg(count(lit(1)).as("n")) // 1 row
    // NTILE(10)'s exact bucket of global rank r (1-based): the first
    // N mod 10 buckets hold ⌈N/10⌉ rows, the rest ⌊N/10⌋.
    def bucket(r: String): String =
      s"""CASE WHEN nq = 0 THEN $r
         |     WHEN $r <= nrem * (nq + 1) THEN ($r + nq) DIV (nq + 1)
         |     ELSE nrem + 1 + ($r - nrem * (nq + 1) - 1) DIV nq END""".stripMargin
    val lv = f.groupBy(col("tokens")).agg(count(lit(1)).as("c"))
      .withColumn("erank", sum(col("c")).over(Window.orderBy(col("tokens"))))
      .withColumn("srank", col("erank") - col("c") + 1)
      .crossJoin(broadcast(tot))
      .withColumn("nq", expr("n div 10"))
      .withColumn("nrem", expr("n % 10"))
      .withColumn("bs", expr(bucket("srank")))
      .withColumn("be", expr(bucket("erank")))
      .select(col("tokens"), col("srank"), col("bs"), col("be"),
        col("nq"), col("nrem"))
    val j = f.join(broadcast(lv), "tokens")
    val whole = j.filter(col("bs") === col("be"))
      .select(col("doc_id"), col("tokens"), col("bs").as("decile"))
    val strad = j.filter(col("bs") =!= col("be"))
      .withColumn("r", col("srank") - 1 + row_number()
        .over(Window.partitionBy(col("tokens")).orderBy(col("doc_id"))))
      .select(col("doc_id"), col("tokens"), expr(bucket("r")).as("decile"))
    whole.union(strad).orderBy(col("doc_id"))
  }

  /** q133: sliding-window document chunking — the training-chunk
    * materializer (q59 packs whole docs into bins; this SPLITS docs into
    * overlapping model-context windows, the "max_length 20, stride 15"
    * preprocessing step): chunk k of a T-token doc starts at 1 + k·15 and
    * carries min(20, T−start+1) tokens, so consecutive chunks overlap by
    * 5 tokens and every token is covered. Each chunk ships its exact
    * md5 so the gate proves the TEXT math (slice bounds, tail clamping),
    * not just the counts.
    *
    * Scale shape: pure per-row explode — no shuffle at all until the
    * final presentation sort; chunk count ∝ tokens/stride. This is the
    * op whose OUTPUT feeds q72 (chunk-grain dedup) and q59 (packing). */
  val q133ChunkSplit: Q = Q(
    "q133_chunk_split",
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |st AS (
      |  SELECT doc_id, t, unnest(range(1, len(t) + 1, 15)) AS start FROM toks)
      |SELECT doc_id, CAST((start - 1) // 15 AS BIGINT) AS chunk_id,
      |       CAST(start AS BIGINT) AS start,
      |       CAST(least(20, len(t) - start + 1) AS BIGINT) AS chunk_len,
      |       md5(array_to_string(t[start:start+19], ' ')) AS h
      |FROM st ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("t"),
        explode(expr("sequence(1, size(t), 15)")).as("start"))
      .select(col("doc_id"),
        expr("(start - 1) div 15").cast("long").as("chunk_id"),
        col("start").cast("long").as("start"),
        least(lit(20), size(col("t")) - col("start") + 1).cast("long")
          .as("chunk_len"),
        md5(expr("array_join(slice(t, start, 20), ' ')")).as("h"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** q134: split-leakage audit — the train/validation correctness check
    * (q49 assigns splits; this VALIDATES them): for two split strategies
    * over the events table — temporal (before/after a cutoff) and
    * entity-hash (user_id mod) — count the users present on BOTH sides.
    * A temporal split leaks every recurring user into validation
    * (fine for forecasting, fatal for per-user generalization claims);
    * an entity split leaks zero BY CONSTRUCTION, and the audit proves
    * both facts as data instead of folklore.
    *
    * Scale shape: each side reduces to a distinct-user set map-side;
    * leakage is one semi-join count over user ids — digest-sized rows,
    * two shuffles per strategy, independent of event volume. */
  val q134SplitLeakage: Q = Q(
    "q134_split_leakage",
    """WITH tt AS (SELECT DISTINCT user_id FROM events
      |           WHERE ts < TIMESTAMP '2024-01-22'),
      |tv AS (SELECT DISTINCT user_id FROM events
      |       WHERE ts >= TIMESTAMP '2024-01-22'),
      |ht AS (SELECT DISTINCT user_id FROM events WHERE user_id % 5 <> 0),
      |hv AS (SELECT DISTINCT user_id FROM events WHERE user_id % 5 = 0)
      |SELECT 'temporal' AS method,
      |       (SELECT count(*) FROM tt) AS train_users,
      |       (SELECT count(*) FROM tv) AS val_users,
      |       (SELECT count(*) FROM tt WHERE user_id IN (SELECT user_id FROM tv)) AS leaked_users
      |UNION ALL
      |SELECT 'user_hash',
      |       (SELECT count(*) FROM ht),
      |       (SELECT count(*) FROM hv),
      |       (SELECT count(*) FROM ht WHERE user_id IN (SELECT user_id FROM hv))
      |ORDER BY method""".stripMargin) { (s, dir) =>
    val ev = Tables(s, dir, "events")
    val cut = lit("2024-01-22").cast("timestamp")
    def audit(method: String, train: DataFrame, valSide: DataFrame): DataFrame = {
      val t = train.select(col("user_id")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val v = valSide.select(col("user_id")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t.agg(count(lit(1)).as("train_users"))
        .crossJoin(v.agg(count(lit(1)).as("val_users")))
        .crossJoin(t.join(v, Seq("user_id"), "left_semi")
          .agg(count(lit(1)).as("leaked_users")))
        .select(lit(method).as("method"), col("train_users"),
          col("val_users"), col("leaked_users"))
    }
    audit("temporal", ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut))
      .unionByName(audit("user_hash",
        ev.filter(col("user_id") % 5 =!= 0), ev.filter(col("user_id") % 5 === 0)))
      .orderBy(col("method"))
  }

  /** q150: dense global sequence ids WITHOUT a global sort — every
    * training-data export needs a stable 0..N−1 numbering (shard/example
    * ids), and `row_number() OVER (ORDER BY …)` funnels 100 TB through
    * one partition. Two-phase instead: coarse key buckets → per-bucket
    * counts → a tiny ordered window over ~#buckets rows for bucket
    * OFFSETS → rank within bucket (window PARTITIONED by bucket) + offset
    * = exact global rank. Deterministic regardless of partitioning (no
    * sampled range boundaries, no spark_partition_id), every step
    * parallel. The oracle IS the global row_number — gate equality proves
    * the two-phase rank identical. Only ids ship: the payload joins back
    * by key afterward if needed. */
  val q150DenseIds: Q = Q(
    "q150_dense_ids",
    """WITH ids AS (
      |  SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS seq_id
      |  FROM documents)
      |SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id
      |FROM ids ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docsRaw = Tables(s, dir, "documents").select(col("doc_id"))
    // Range-derived width keeps the offsets table ≤ 4097 rows at ANY id
    // range (a fixed width would make it row-scale at 10¹² ids).
    val bounds = docsRaw.agg(min(col("doc_id")), max(col("doc_id"))).first()
    val width =
      if (bounds.isNullAt(0)) 64L
      else math.max(64L, (bounds.getLong(1) - bounds.getLong(0)) / 4096L + 1L)
    val docs = docsRaw.select(col("doc_id"), expr(s"doc_id div $width").as("b"))
    val offs = docs.groupBy(col("b")).agg(count(lit(1)).as("c"))
      .withColumn("off",
        coalesce(sum(col("c")).over(Window.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("c")
    docs.join(broadcast(offs), "b")
      .withColumn("seq_id",
        col("off") + row_number().over(
          Window.partitionBy(col("b")).orderBy(col("doc_id"))) - 1)
      .select(col("doc_id"), col("seq_id"))
      .orderBy(col("doc_id"))
  }

  /** q186: EXACT-k stratified sample — q56's rate gate admits a
    * binomially-varying count per stratum; fixed-size eval sets need
    * exactly min(k, |stratum|) rows. Rank by (salted md5, doc_id) inside
    * each stratum — a deterministic total order both engines reproduce —
    * and keep rank ≤ 20. Spark 4 plans the rank filter as
    * WindowGroupLimit, bounding every partition's sort to the top-k
    * (the q78 machinery), so no stratum ever fully sorts. */
  val q186ExactKSample: Q = Q(
    "q186_exact_k_sample",
    s"""WITH ${duckBucketed("-graft-exactk")},
       |r AS (
       |  SELECT lang, doc_id, n_chars,
       |         row_number() OVER (PARTITION BY lang ORDER BY m, doc_id) AS rk
       |  FROM b)
       |SELECT lang, count(*) AS n_sampled,
       |       CAST(sum(n_chars) AS BIGINT) AS sample_chars,
       |       CAST(sum(doc_id) AS BIGINT) AS id_sum
       |FROM r WHERE rk <= 20
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    sparkBucketed(s, dir, "-graft-exactk")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("m"), col("doc_id"))))
      .filter(col("rk") <= 20)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("n_chars")).cast("long").as("sample_chars"),
        sum(col("doc_id")).cast("long").as("id_sum"))
      .orderBy(col("lang"))
  }

  /** q240: proportional budget allocation (largest-remainder / Hamilton
    * rounding) + the allocated selection — the "sample exactly 1000 docs
    * matching the corpus's language mix" op a training-set builder runs.
    * q186 selects a FIXED k per stratum; here the per-stratum quota is
    * DERIVED: base = ⌊B·n_i/N⌋, and the B − Σbase leftover seats go to
    * the largest remainders (ties to lang asc) — exact integer
    * arithmetic, Σalloc = B by construction, no float shares anywhere.
    * Selection inside each stratum is the q186 discipline: rank by
    * (salted md5, doc_id) — a total order both engines reproduce — with
    * a LITERAL rank cap at B first (WindowGroupLimit bounds every
    * stratum's sort to top-B; a column-bound filter alone would not
    * trigger it) and the exact per-stratum `rk ≤ alloc` applied on the
    * join. Output proves the quota math AND the selection: n_sel must
    * equal alloc, id_sum pins the exact membership.
    *
    * Scale: quota math runs on the ≤#languages aggregate (its global
    * window is a bounded reduction); the selection never fully sorts a
    * stratum. */
  val q240BudgetAllocation: Q = Q(
    "q240_budget_allocation",
    s"""WITH ${duckBucketed("-graft-quota")},
       |s AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM s),
       |q AS (SELECT lang, n, (1000 * n) // nt AS base, (1000 * n) % nt AS rem
       |      FROM s, t),
       |l AS (SELECT CAST(1000 - sum(base) AS BIGINT) AS leftover FROM q),
       |r AS (SELECT lang, n, base, rem,
       |             row_number() OVER (ORDER BY rem DESC, lang) AS rr FROM q),
       |a AS (SELECT lang, n,
       |             base + CASE WHEN rr <= (SELECT leftover FROM l)
       |                         THEN 1 ELSE 0 END AS alloc
       |      FROM r),
       |d AS (SELECT lang, doc_id,
       |             row_number() OVER (PARTITION BY lang ORDER BY m, doc_id) AS rk
       |      FROM b)
       |SELECT a.lang, CAST(a.n AS BIGINT) AS n_docs,
       |       CAST(a.alloc AS BIGINT) AS alloc,
       |       count(d.doc_id) AS n_sel, CAST(sum(d.doc_id) AS BIGINT) AS id_sum
       |FROM a LEFT JOIN d ON d.lang = a.lang AND d.rk <= a.alloc
       |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val docs = sparkBucketed(s, dir, "-graft-quota")
    val st = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val t = st.agg(sum(col("n")).cast("long").as("nt"))
    val q = st.crossJoin(broadcast(t))
      .select(col("lang"), col("n"),
        expr("1000 * n div nt").as("base"),
        (lit(1000) * col("n") % col("nt")).as("rem"))
    val lo = q.agg((lit(1000) - sum(col("base"))).cast("long").as("leftover"))
    // Global window over the ≤#languages quota rows — bounded reduction.
    val a = q.withColumn("rr",
        row_number().over(Window.orderBy(col("rem").desc, col("lang"))))
      .crossJoin(broadcast(lo))
      .select(col("lang"), col("n"),
        (col("base") +
          when(col("rr") <= col("leftover"), 1).otherwise(0)).as("alloc"))
    val d = docs
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("m"), col("doc_id"))))
      .filter(col("rk") <= 1000) // literal cap → WindowGroupLimit
      .select(col("lang"), col("doc_id"), col("rk"))
    a.as("a").join(d.as("d"),
        col("a.lang") === col("d.lang") && col("d.rk") <= col("a.alloc"), "left")
      .groupBy(col("a.lang").as("lang"),
        col("a.n").cast("long").as("n_docs"),
        col("a.alloc").cast("long").as("alloc"))
      .agg(count(col("d.doc_id")).as("n_sel"),
        sum(col("d.doc_id")).cast("long").as("id_sum"))
      .orderBy(col("lang"))
  }

  /** q187: GROUP k-fold assignment — cross-validation folds where ALL of
    * an entity's rows land in one fold (fold by hash of the GROUP key,
    * here the document's source), the leakage-free construction q134
    * audits for: row-level folds let one source straddle train and test.
    * Fold = portable hash of source mod 5; output proves both the
    * assignment (sizes per fold) and the invariant (each source touches
    * exactly one fold) as data. */
  val q187GroupKfold: Q = Q(
    "q187_group_kfold",
    s"""WITH g AS (
       |  SELECT source, md5(concat(source, '-graft-fold')) AS m FROM documents
       |  GROUP BY 1),
       |f AS (SELECT source, (${PortableHash.hexHeadToLong("m", "strpos")}) % 5
       |        AS fold FROM g),
       |j AS (SELECT d.doc_id, d.n_chars, d.source, f.fold
       |      FROM documents d JOIN f USING (source))
       |SELECT fold, count(*) AS n_docs,
       |       count(DISTINCT source) AS n_sources,
       |       CAST(sum(n_chars) AS BIGINT) AS total_chars
       |FROM j GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val f = Tables(s, dir, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("_n"))
      .withColumn("m", md5(concat(col("source"), lit("-graft-fold"))))
      .select(col("source"),
        (expr(PortableHash.hexHeadToLong("m", "instr")) % 5).as("fold"))
    Tables(s, dir, "documents")
      .join(broadcast(f), "source")
      .groupBy(col("fold"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_chars")).cast("long").as("total_chars"))
      .orderBy(col("fold"))
  }

  /** q245: TEMPERATURE-weighted mixture sampling — the multilingual/
    * multi-domain rebalancing law every large pretraining corpus uses
    * (α-smoothing, mBERT/XLM-R style): natural token share p_i is
    * flattened to q_i = p_i^α / Σ p_j^α (α = 0.7), boosting low-resource
    * languages without discarding the head. Distinct from q86 (fixed
    * per-language keep RATES) and q240 (integer seat allocation): this
    * derives the CONTINUOUS sampling distribution from measured corpus
    * statistics, plus the boost factor q/p and the expected epoch count
    * each language pays under a half-corpus token budget — epochs > 1 is
    * the overfitting-risk signal smoothing papers warn about.
    *
    * Scale shape: one map-side-combined groupBy(lang) over (lang,
    * token-count) — the text column never shuffles; everything after is
    * arithmetic on the LANGUAGE-cardinality table with two 1-row
    * broadcast totals (Σtok, Σp^α) re-entering as
    * BroadcastNestedLoopJoins. Double pow() in both engines; all
    * surfaced ratios rounded to 6 (the q31 discipline). */
  val q245TemperatureMix: Q = Q(
    "q245_temperature_mix",
    """WITH bl AS (SELECT lang,
      |            CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok
      |            FROM documents GROUP BY 1),
      |t AS (SELECT CAST(sum(tok) AS BIGINT) AS tt FROM bl),
      |p AS (SELECT lang, tok, CAST(tok AS DOUBLE) / tt AS p, tt
      |      FROM bl, t),
      |z AS (SELECT sum(pow(p, 0.7)) AS z FROM p)
      |SELECT lang, tok, round(p, 6) AS p_natural,
      |       round(pow(p, 0.7) / z, 6) AS p_smoothed,
      |       round(pow(p, 0.7) / z / p, 6) AS boost,
      |       round((tt / 2) * (pow(p, 0.7) / z) / tok, 6) AS epochs
      |FROM p, z ORDER BY lang""".stripMargin) { (s, dir) =>
    val byLang = Tables(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(sum(size(split(col("text"), " "))).cast("long").as("tok"))
    val tot = byLang.agg(sum(col("tok")).cast("long").as("tt"))
    val withP = byLang.crossJoin(broadcast(tot))
      .withColumn("p", col("tok").cast("double") / col("tt"))
    val z = withP.agg(sum(pow(col("p"), 0.7)).as("z"))
    withP.crossJoin(broadcast(z))
      .select(col("lang"), col("tok"),
        round(col("p"), 6).as("p_natural"),
        round(pow(col("p"), 0.7) / col("z"), 6).as("p_smoothed"),
        round(pow(col("p"), 0.7) / col("z") / col("p"), 6).as("boost"),
        round((col("tt") / lit(2)) * (pow(col("p"), 0.7) / col("z")) / col("tok"), 6)
          .as("epochs"))
      .orderBy(col("lang"))
  }

  /** q251: EPOCH EXPANSION — q245's sampling distribution made
    * executable: each document's repeat count under the α-smoothed mix is
    * materialized as floor(epochs) guaranteed passes plus one extra pass
    * for a deterministic hash-fraction of docs (the portable-md5 gate, so
    * both engines pick the SAME extras — q49's split discipline), and the
    * rollup verifies the realized token mass per language lands on the
    * smoothed target. This is the last step between "here are the
    * weights" and "here is the training manifest": repeat counts, not
    * copied rows — at 100 TB the expansion stays a per-doc integer column
    * the loader consumes, never a materialized duplicate corpus.
    *
    * Determinism: epochs is rounded to 6 decimals BEFORE floor/frac in
    * both engines (pow() may differ by 1 ulp between libm builds; the
    * round collapses that under every downstream integer decision), and
    * the extra-pass gate compares integers (hash‰ < ⌊frac·10⁶⌋). */
  val q251EpochExpansion: Q = {
    val h = PortableHash.hexHeadToLong("m", "strpos")
    Q(
      "q251_epoch_expansion",
      s"""WITH bl AS (SELECT lang,
         |            CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok
         |            FROM documents GROUP BY 1),
         |t AS (SELECT CAST(sum(tok) AS BIGINT) AS tt FROM bl),
         |p AS (SELECT lang, tok, CAST(tok AS DOUBLE) / tt AS p, tt
         |      FROM bl, t),
         |z AS (SELECT sum(pow(p, 0.7)) AS z FROM p),
         |e AS (SELECT lang,
         |             round((tt / 2) * (pow(p, 0.7) / z) / tok, 6) AS e
         |      FROM p, z),
         |d AS (SELECT doc_id, lang,
         |             CAST(len(string_split(text, ' ')) AS BIGINT) AS dtok,
         |             md5(CAST(doc_id AS VARCHAR)) AS m
         |      FROM documents),
         |r AS (SELECT d.lang, dtok,
         |             CAST(floor(e) AS BIGINT)
         |               + CASE WHEN ($h) % 1000000 <
         |                     CAST(floor((e - floor(e)) * 1000000) AS BIGINT)
         |                 THEN 1 ELSE 0 END AS reps
         |      FROM d JOIN e USING (lang))
         |SELECT lang, count(*) AS n_docs,
         |       CAST(sum(reps) AS BIGINT) AS n_passes,
         |       CAST(sum(reps * dtok) AS BIGINT) AS expanded_tokens,
         |       round(CAST(sum(reps * dtok) AS DOUBLE) / sum(dtok), 4)
         |         AS realized_epochs
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val byLang = docs.groupBy(col("lang"))
        .agg(sum(size(split(col("text"), " "))).cast("long").as("tok"))
      val tot = byLang.agg(sum(col("tok")).cast("long").as("tt"))
      val withP = byLang.crossJoin(broadcast(tot))
        .withColumn("p", col("tok").cast("double") / col("tt"))
      val z = withP.agg(sum(pow(col("p"), 0.7)).as("z"))
      val e = withP.crossJoin(broadcast(z))
        .select(col("lang"),
          round((col("tt") / lit(2)) * (pow(col("p"), 0.7) / col("z"))
            / col("tok"), 6).as("e"))
      val d = docs.select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("dtok"),
        md5(col("doc_id").cast("string")).as("m"))
      val r = d.join(broadcast(e), "lang")
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

  /** q273: WEIGHTED k-sampling without replacement (Efraimidis–
    * Spirakis A-ES) — the principled "sample documents proportional to
    * token count" selection a token-budgeted corpus build needs (plain
    * uniform sampling under-represents long documents' token mass):
    * each doc draws u from the portable-hash uniform and competes with
    * key ln(u)/w (monotone-equivalent to u^(1/w)); the top-50 keys win.
    * Deterministic: u is an exact integer construction both engines
    * share (q49's gate discipline), ln is the one libm call and is
    * rounded to 9 decimals BEFORE the ranking decision (q245's
    * discipline), ties break on doc_id.
    *
    * Scale: the key is a stateless map-side projection; selection is
    * TakeOrderedAndProject(50) — two-phase heads, never a global sort;
    * re-drawing a different sample is a salt change, not a new plan. */
  val q273WeightedSample: Q = {
    val h = PortableHash.hexHeadToLong("m", "strpos")
    Q(
      "q273_weighted_sample",
      s"""WITH d AS (SELECT doc_id, lang,
         |             CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
         |             md5(concat(CAST(doc_id AS VARCHAR), '-graft-wsamp')) AS m
         |           FROM documents),
         |k AS (SELECT doc_id, lang, w,
         |             round(ln((($h) % 1000000 + 1) / 1000001.0) / w, 9) AS samp_key
         |      FROM d)
         |SELECT doc_id, lang, w, samp_key
         |FROM k ORDER BY samp_key DESC, doc_id LIMIT 50""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("w"),
          md5(concat(col("doc_id").cast("string"), lit("-graft-wsamp"))).as("m"))
        .withColumn("samp_key",
          round(log((expr(PortableHash.hexHeadToLong("m", "instr")) % 1000000L
            + lit(1L)) / lit(1000001.0)) / col("w"), 9))
        .select(col("doc_id"), col("lang"), col("w"), col("samp_key"))
        .orderBy(col("samp_key").desc, col("doc_id"))
        .limit(50)
    }
  }

  /** q317: near-dup-cluster-safe fold assignment — closes the leakage
    * family's real gap: q134 audits user/temporal leakage and q187 folds
    * by source, but the leak that actually poisons LLM evals is
    * NEAR-DUPLICATE TEXT straddling train/test — a doc-hash split puts
    * ~(1−1/k) of every near-dup pair's mass across the boundary. The fix
    * is to key the fold on the document's dedup CLUSTER id (the LSH
    * candidate graph's component min, q47's labels; singletons key on
    * themselves), so every near-dup pair lands in one fold BY
    * CONSTRUCTION. The query both assigns and PROVES: leaked_pairs
    * (candidate pairs whose endpoints' folds differ) is 0 under
    * cluster keying and >0 under the naive doc hash on the same corpus,
    * with min/max fold sizes showing cluster keying costs no balance.
    *
    * Scale shape: the pair generator and labels are the dedup family's
    * shared machinery (LSH-blocked, never all-pairs; labels via the
    * guarded driver-union-find/distributed-CC tier). Fold assignment is
    * a stateless hash — adding tomorrow's corpus re-keys nothing (the
    * q49 property), EXCEPT docs whose cluster grows a new min member;
    * production pins cluster reps in a store (q244's labels) to freeze
    * that too. Leak counting is two hash-joins of the pair list against
    * the broadcastable fold table. */
  val q317ClusterSafeSplit: Q = {
    def foldOf(tbl: String, keyExpr: String, posFn: String): String =
      s"""(SELECT doc_id,
         |        (${PortableHash.hexHeadToLong("m", posFn)}) % 5 AS fold
         | FROM (SELECT doc_id,
         |              md5(CAST($keyExpr AS VARCHAR) || '-graft-csplit') AS m
         |       FROM $tbl))""".stripMargin
    Q(
      "q317_cluster_safe_split",
      s"""WITH RECURSIVE ${Dedup.duckLshPairCtes},
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach AS (SELECT u, v FROM edges
         |          UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         |lab AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_id
         |        FROM reach GROUP BY u),
         |d AS (SELECT doc.doc_id, COALESCE(lab.cluster_id, doc.doc_id) AS cl
         |      FROM documents doc LEFT JOIN lab ON lab.doc_id = doc.doc_id),
         |fc AS ${foldOf("d", "cl", "strpos")},
         |fd AS ${foldOf("d", "doc_id", "strpos")},
         |szc AS (SELECT fold, CAST(count(*) AS BIGINT) AS n FROM fc GROUP BY 1),
         |szd AS (SELECT fold, CAST(count(*) AS BIGINT) AS n FROM fd GROUP BY 1),
         |lc AS (SELECT CAST(count(*) AS BIGINT) AS leaked FROM pairs p
         |       JOIN fc a ON a.doc_id = p.doc_a
         |       JOIN fc b ON b.doc_id = p.doc_b WHERE a.fold <> b.fold),
         |ld AS (SELECT CAST(count(*) AS BIGINT) AS leaked FROM pairs p
         |       JOIN fd a ON a.doc_id = p.doc_a
         |       JOIN fd b ON b.doc_id = p.doc_b WHERE a.fold <> b.fold)
         |SELECT 'cluster_keyed' AS method,
         |       (SELECT min(n) FROM szc) AS fold_min_docs,
         |       (SELECT max(n) FROM szc) AS fold_max_docs,
         |       (SELECT leaked FROM lc) AS leaked_pairs
         |UNION ALL
         |SELECT 'doc_hash',
         |       (SELECT min(n) FROM szd), (SELECT max(n) FROM szd),
         |       (SELECT leaked FROM ld)
         |ORDER BY method""".stripMargin) { (s, dir) =>
      import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val pairs = Dedup.lshCandidatePairs(s, dir)
        .select(col("doc_a"), col("doc_b")).persist(MEMORY_AND_DISK)
      val labels = Fuzzy.resolveClusters(s, pairs)
      val d = Tables(s, dir, "documents").select(col("doc_id"))
        .join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cl"))
        .persist(MEMORY_AND_DISK)
      def foldDf(keyCol: String): DataFrame = d
        .withColumn("m",
          md5(concat(col(keyCol).cast("string"), lit("-graft-csplit"))))
        .select(col("doc_id"),
          (expr(PortableHash.hexHeadToLong("m", "instr")) % 5).as("fold"))
        .persist(MEMORY_AND_DISK)
      def methodRow(name: String, f: DataFrame): DataFrame = {
        val sz = f.groupBy(col("fold")).agg(count(lit(1)).as("n"))
          .agg(min(col("n")).as("fold_min_docs"), max(col("n")).as("fold_max_docs"))
        val leaked = pairs
          .join(f.select(col("doc_id").as("doc_a"), col("fold").as("fa")), "doc_a")
          .join(f.select(col("doc_id").as("doc_b"), col("fold").as("fb")), "doc_b")
          .filter(col("fa") =!= col("fb"))
          .agg(count(lit(1)).as("leaked_pairs"))
        sz.crossJoin(leaked).select(lit(name).as("method"),
          col("fold_min_docs"), col("fold_max_docs"), col("leaked_pairs"))
      }
      methodRow("cluster_keyed", foldDf("cl"))
        .unionAll(methodRow("doc_hash", foldDf("doc_id")))
        .orderBy(col("method"))
    }
  }

  val all: Seq[Q] = Seq(
    q273WeightedSample, q317ClusterSafeSplit,
    q240BudgetAllocation, q245TemperatureMix, q251EpochExpansion,
    q49SplitAssign, q56StratifiedSample, q57ReservoirSample, q58VocabTopK,
    q59PackSequences, q75OovRate, q86MixWeights, q115TokenBudget,
    q119TokenDeciles, q133ChunkSplit, q134SplitLeakage, q150DenseIds,
    q186ExactKSample, q187GroupKfold)
}
