package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table: exact hash, MinHash
  * + LSH banding, SimHash, and n-gram Jaccard verification.
  *
  * Scale design (the point of these at 100 TB):
  *  - exact dedup is a single hash-shuffle on a 32-byte digest, never on the
  *    full text;
  *  - MinHash signatures/bands are computed per-row with higher-order array
  *    functions (one pass over the text, no explode until the band key —
  *    shuffle volume is O(docs × n_bands × 32B), independent of doc length);
  *  - candidate pairs come only from band-bucket self-joins (classic LSH),
  *    never an all-pairs cross join;
  *  - Jaccard verification joins on the shingle value, so co-occurrence is
  *    computed by the shuffle, not by driver-side set intersection.
  *
  * All hash primitives are md5 hex strings (identical in Spark and DuckDB),
  * and min/ordering over them is lexicographic — engine-portable by
  * construction.
  */
object Dedup {

  /** Shared shingling (word 3-grams), Spark SQL / DuckDB SQL renderings. */
  private val sparkShingles =
    "transform(sequence(1, greatest(size(ws) - 2, 1)), i -> concat_ws(' ', slice(ws, i, 3)))"
  private val duckShingles =
    "list_transform(generate_series(1, greatest(len(ws) - 2, 1)), i -> array_to_string(ws[i:i+2], ' '))"

  /** Exact dedup: group by content digest; keeper = min doc_id (reference
    * U3 first-writer-wins shape, src/database.ts:141-211). */
  val q34ExactDedup: Q = Q(
    "q34_dedup_exact",
    """SELECT md5(lower(text)) AS h, count(*) AS n_docs, min(doc_id) AS keeper
      |FROM documents GROUP BY 1 ORDER BY h""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .groupBy(md5(lower(col("text"))).as("h"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
      .orderBy(col("h"))
  }

  /** Shared DuckDB CTE chain producing the LSH candidate pairs (used by the
    * q35 oracle and as the edge set of the q47 clustering oracle). */
  private val duckLshPairCtes: String =
    s"""w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |sh AS (SELECT doc_id, $duckShingles AS shs FROM w),
       |sig AS (SELECT doc_id,
       |          list_transform(generate_series(0, 15),
       |            j -> list_aggregate(list_transform(shs,
       |                   s2 -> md5(CAST(j AS VARCHAR) || '|' || s2)), 'min')) AS sig
       |        FROM sh),
       |bands AS (SELECT doc_id,
       |            unnest(list_transform(generate_series(0, 3),
       |              b -> md5(CAST(b AS VARCHAR) || ':' ||
       |                       array_to_string(sig[b*4+1:b*4+4], '|')))) AS h
       |          FROM sig),
       |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
       |          FROM bands a JOIN bands c ON a.h = c.h AND a.doc_id < c.doc_id)""".stripMargin

  /** MinHash(16) + LSH(4 bands × 4 rows): candidate near-duplicate pairs =
    * docs sharing any band hash. Signature j = min over shingles of
    * md5(j || '|' || shingle) (lexicographic min of hex = portable MinHash). */
  val q35MinHashLsh: Q = Q(
    "q35_dedup_minhash_lsh",
    s"""WITH $duckLshPairCtes
       |SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
    // Spark plan: explode shingles once, then ONE hash-aggregate computes all
    // 16 signature mins (map-side partial min ⇒ shuffle carries ≤16 digests
    // per doc per partition). Computing signatures as nested array lambdas
    // per row is a trap: CollapseProject inlines the token/shingle arrays
    // into every lambda, recomputing them per (band × permutation) — O(b×p)
    // blowup measured at >30s for 500 docs. The explode+agg shape is also
    // the 100 TB shape: linear in total shingles, one shuffle on doc_id,
    // one on the band key.
    val sh = Tables(s, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(sparkShingles)).as("sh"))
    val sigCols = (0 until 16).map(j =>
      min(md5(concat(lit(s"$j|"), col("sh")))).as(s"s$j"))
    val sig = sh.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    val bandCols = (0 until 4).map { b =>
      md5(concat(lit(s"$b:"),
        concat_ws("|", (0 until 4).map(r => col(s"s${b * 4 + r}")): _*)))
    }
    // Persist the (doc_id, band-hash) table before the self-join: it is tiny
    // (n_docs × 4 rows of 32-byte digests) while its lineage is the whole
    // shingle scan + 16-way min-aggregate — without this both join sides
    // recompute that lineage. At cluster scale this is the materialized
    // signature table every LSH pipeline keeps.
    val bands = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bands.as("a").join(bands.as("c"),
        col("a.h") === col("c.h") && col("a.doc_id") < col("c.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("c.doc_id").as("doc_b"))
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Connected components by iterative min-label propagation:
    * label(u) ← min(label(u), min over neighbors' labels), to fixpoint
    * (≤ graph diameter iterations, capped). This is the Spark-native HOW for
    * dedup clustering — at 100 TB the same loop with the large-star/
    * small-star transform keeps per-iteration shuffles linear; near-dup
    * graphs are bounded-degree so a handful of iterations converges. */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val fwd = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
    val edges = fwd.unionByName(fwd.select(col("v").as("u"), col("u").as("v")))
      .persist(MEMORY_AND_DISK)
    var labels = edges.select(col("u")).distinct()
      .withColumn("label", col("u")).persist(MEMORY_AND_DISK)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 20) {
      val nbr = edges
        .join(labels.select(col("u").as("v"), col("label").as("nlabel")), "v")
        .groupBy(col("u")).agg(min(col("nlabel")).as("nmin"))
      val updated = labels.join(nbr, Seq("u"), "left")
        .select(col("u"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .persist(MEMORY_AND_DISK)
      changed = updated.as("n").join(labels.as("o"), "u")
        .filter(col("n.label") =!= col("o.label")).count()
      labels = updated
      iter += 1
    }
    edges.unpersist()
    labels.select(col("u").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Dedup clustering: connected components over the LSH candidate pairs —
    * cluster id = min doc_id in the component (the dedup "keeper"). The
    * oracle computes the same fixpoint with a recursive CTE (transitive
    * closure + min over reachable ids) — Spark lacks recursive SQL, so the
    * iterative DataFrame loop is the idiomatic equivalent. */
  val q47DedupClusters: Q = Q(
    "q47_dedup_clusters",
    s"""WITH RECURSIVE $duckLshPairCtes,
       |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach AS (SELECT u, v FROM edges
       |          UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
       |SELECT u AS doc_id, least(u, min(v)) AS cluster_id
       |FROM reach GROUP BY u ORDER BY doc_id""".stripMargin) { (s, dir) =>
    connectedComponents(q35MinHashLsh.fn(s, dir)).orderBy(col("doc_id"))
  }

  /** SimHash(32): per-token md5, bit i = sign of Σ(±1) over tokens by the
    * parity of hex digit i. Equal fingerprints ⇒ near-duplicate cluster. */
  val q36SimHash: Q = {
    val hex = "0123456789abcdef"
    def duckBit(i: Int) =
      s"CASE WHEN 2 * len(list_filter(hs, h -> (strpos('$hex', substring(h, $i, 1)) - 1) % 2 = 1)) > len(hs) THEN '1' ELSE '0' END"
    val duckFp = (1 to 32).map(duckBit).mkString(" || ")
    Q(
      "q36_dedup_simhash",
      s"""WITH h AS (SELECT doc_id,
         |             list_transform(string_split(text, ' '), w -> md5(w)) AS hs
         |           FROM documents)
         |SELECT doc_id, $duckFp AS simhash
         |FROM h ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // Explode tokens, hash each ONCE, then one hash-aggregate computes the
      // 32 parity counters (count_if over substrings of the materialized
      // digest — cheap per-row work, partial aggregation before the
      // doc_id shuffle). Same blowup-avoidance rationale as q35.
      val words = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .withColumn("h", md5(col("w")))
      val aggs = count(lit(1)).as("n") +: (1 to 32).map(i =>
        count_if(expr(s"(instr('$hex', substring(h, $i, 1)) - 1) % 2 = 1"))
          .as(s"c$i"))
      val counts = words.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      val bits = (1 to 32).map(i =>
        when(col(s"c$i") * 2 > col("n"), lit("1")).otherwise(lit("0")))
      counts
        .select(col("doc_id"), concat(bits: _*).as("simhash"))
        .orderBy(col("doc_id"))
    }
  }

  /** n-gram Jaccard similarity: for doc pairs within the same `source`,
    * |A∩B| / |A∪B| over distinct word 3-gram sets; report pairs ≥ 0.5.
    * Intersection counts come from a shingle-value equi-join (shuffle does
    * the set intersection — no driver-side state). */
  val q37NgramJaccard: Q = Q(
    "q37_dedup_ngram_jaccard",
    s"""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
       |sh AS (SELECT DISTINCT doc_id, source, unnest($duckShingles) AS sh FROM w),
       |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
       |  FROM sh a JOIN sh b
       |    ON a.sh = b.sh AND a.source = b.source AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |       round(CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter), 4) AS jaccard
       |FROM inter
       |JOIN cnt ca ON ca.doc_id = doc_a
       |JOIN cnt cb ON cb.doc_id = doc_b
       |WHERE CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
    // Persist the distinct shingle set: it feeds both self-join sides AND
    // both per-doc count lookups — unpersisted, Catalyst re-derives the
    // scan+explode+distinct four times (seen in .explain). ~50 bytes/shingle,
    // so this is safely cacheable at any realistic partition size.
    val sh = Tables(s, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), col("source"), explode(expr(sparkShingles)).as("sh"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    val jac = col("n_inter").cast("double") /
      (col("ca.n_sh") + col("cb.n_sh") - col("n_inter"))
    inter
      .join(cnt.as("ca"), col("ca.doc_id") === col("doc_a"))
      .join(cnt.as("cb"), col("cb.doc_id") === col("doc_b"))
      .filter(jac >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(jac, 4).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val all: Seq[Q] =
    Seq(q34ExactDedup, q35MinHashLsh, q36SimHash, q37NgramJaccard, q47DedupClusters)
}
