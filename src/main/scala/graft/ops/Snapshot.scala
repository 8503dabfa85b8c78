package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot diff — the incremental-ETL primitive the reference's
  * cross-run UPSERT story implies (reference `src/database.ts:21-36`:
  * re-running the ETL overwrites by key): given the PREVIOUS run's
  * output and the CURRENT run's output, classify every key as
  * added / removed / changed / unchanged. On a 100 TB pipeline this is
  * how you turn a full recompute into an incremental publish: ship only
  * the added+changed partition, tombstone the removed keys.
  *
  * Scale design: the diff never compares payloads — each side reduces to
  * (key, 16-byte digest) at the scan, so the full-outer join shuffles
  * ~24 bytes/row regardless of document size, and the classification is
  * a codegen'd projection over the join output. Text columns are pruned
  * at the parquet reader on both sides.
  */
object Snapshot {

  /** The previous snapshot is simulated deterministically from the current
    * `documents` table (both engines derive the identical snapshot, so the
    * op under test — the diff — is what's checked):
    *   - docs with doc_id % 7 == 0 are ABSENT from the previous run
    *     (they show up as `added`);
    *   - docs with doc_id % 5 == 0 had different text last run
    *     (prefix rewrite ⇒ `changed`);
    *   - 1/11 of ids exist only in the previous run under doc_id+1000000
    *     (they show up as `removed`);
    *   - everything else is `unchanged`.
    */
  val q79SnapshotDiff: Q = Q(
    "q79_snapshot_diff",
    """WITH prev AS (
      |  SELECT doc_id,
      |         md5(CASE WHEN doc_id % 5 = 0 THEN 'v1 ' || text ELSE text END) AS h
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, md5('retired ' || CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents WHERE doc_id % 11 = 0),
      |curr AS (SELECT doc_id, md5(text) AS h FROM documents),
      |d AS (
      |  SELECT CASE WHEN p.doc_id IS NULL THEN 'added'
      |              WHEN c.doc_id IS NULL THEN 'removed'
      |              WHEN p.h <> c.h THEN 'changed'
      |              ELSE 'unchanged' END AS status,
      |         coalesce(p.doc_id, c.doc_id) AS doc_id
      |  FROM prev p FULL JOIN curr c ON p.doc_id = c.doc_id)
      |SELECT status, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM d GROUP BY status ORDER BY status""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val prev = docs.filter(col("doc_id") % 7 =!= 0)
      .select(
        col("doc_id"),
        md5(when(col("doc_id") % 5 === 0, concat(lit("v1 "), col("text")))
          .otherwise(col("text"))).as("h"))
      .unionByName(docs.filter(col("doc_id") % 11 === 0)
        .select(
          (col("doc_id") + 1000000L).as("doc_id"),
          md5(concat(lit("retired "), col("doc_id").cast("string"))).as("h")))
    val curr = docs.select(col("doc_id"), md5(col("text")).as("h"))
    prev.as("p").join(curr.as("c"), col("p.doc_id") === col("c.doc_id"), "full_outer")
      .select(
        when(col("p.doc_id").isNull, "added")
          .when(col("c.doc_id").isNull, "removed")
          .when(col("p.h") =!= col("c.h"), "changed")
          .otherwise("unchanged").as("status"),
        coalesce(col("p.doc_id"), col("c.doc_id")).as("doc_id"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy(col("status"))
  }

  /** q112: order-independent table checksums — the anti-entropy primitive
    * for replica/migration verification: two stores agree iff (row count,
    * XOR digest, SUM digest) agree per table, and the digests are
    * computable INDEPENDENTLY on each side with no row shipping. Row
    * identity = md5 over a '|'-joined rendering of engine-stable columns
    * (integers and strings — float rendering is not portable), expanded
    * to an integer via the shared PortableHash expansion; XOR and SUM are
    * both commutative+associative, so any partitioning/order yields the
    * identical digest (and the pair catches what either alone misses:
    * XOR is blind to duplicated pairs, SUM to coordinated offsets).
    *
    * Scale shape: map-side partial aggregation reduces each partition to
    * three numbers; the shuffle carries partials, not rows. h < 2^32
    * (the PortableHash modulus), so BIGINT sums hold to 2^31 rows —
    * swap the SUM leg to DECIMAL(38,0) accumulation beyond that. */
  val q112TableChecksum: Q = {
    def duckLeg(table: String, m: String): String =
      s"""SELECT '$table' AS table_name, count(*) AS n_rows,
         |       bit_xor(h) AS xor_digest, CAST(sum(h) AS BIGINT) AS sum_digest
         |FROM (SELECT ${PortableHash.hexHeadToLong("m", "strpos")} AS h
         |      FROM (SELECT md5($m) AS m FROM $table))""".stripMargin
    Q("q112_table_checksum",
      s"""${duckLeg("lineitem",
          "concat_ws('|', l_orderkey, l_partkey, l_suppkey, l_linenumber, l_returnflag, l_linestatus)")}
         |UNION ALL
         |${duckLeg("customer", "concat_ws('|', c_custkey, c_name, c_nationkey, c_mktsegment)")}
         |UNION ALL
         |${duckLeg("documents", "concat_ws('|', doc_id, lang, source, text)")}
         |ORDER BY table_name""".stripMargin) { (s, dir) =>
      def leg(table: String, cols: Seq[String]): DataFrame =
        Tables(s, dir, table)
          .select(md5(concat_ws("|", cols.map(col): _*)).as("m"))
          .select(expr(PortableHash.hexHeadToLong("m", "instr")).as("h"))
          .agg(count(lit(1)).as("n_rows"),
            expr("bit_xor(h)").as("xor_digest"),
            sum(col("h")).as("sum_digest"))
          .select(lit(table).as("table_name"), col("n_rows"),
            col("xor_digest"), col("sum_digest"))
      leg("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey",
          "l_linenumber", "l_returnflag", "l_linestatus"))
        .unionAll(leg("customer",
          Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment")))
        .unionAll(leg("documents", Seq("doc_id", "lang", "source", "text")))
        .orderBy(col("table_name"))
    }
  }

  /** q118: two-level anti-entropy REPAIR — q112 detects divergence with
    * three numbers per table; this op localizes and fixes it without a
    * full-table diff. Level 1 computes q112's (count, XOR, SUM) digests
    * per SHARD on each replica (map-side partials, shuffle carries
    * 3 numbers × shards); only shards whose triples disagree proceed.
    * Level 2 row-diffs INSIDE the mismatched shards only — the shard list
    * re-enters both scans as a broadcast semi-filter, so the row-level
    * full-outer join shuffles divergent shards' rows, not the table.
    * Output is the repair plan: copy (missing on replica), overwrite
    * (payload drift), delete (phantom row only on replica).
    *
    * The replica is simulated deterministically from `orders` with
    * divergence CONFINED to shards 3/7/11 (missing / corrupted / phantom
    * respectively), so the level-1 prune provably drops 61 of 64 shards
    * at any scale. Phantom keys add 100,000,000 ≡ 0 (mod 64): they stay
    * in shard 11 and cannot collide with real keys at any test sf. The
    * oracle renders the UNPRUNED row diff — pruning only removes shards
    * that contribute no repair rows, so the results are provably equal
    * (that equality is what the gate checks). */
  val q118ShardRepair: Q = {
    val ident = "concat_ws('|', o_orderkey, o_custkey, o_orderstatus, o_orderpriority)"
    val identCorrupt = """concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
      CASE WHEN o_orderkey % 64 = 7 AND o_orderkey % 13 = 0
           THEN 'CORRUPT' ELSE o_orderpriority END)""".stripMargin
    Q(
      "q118_shard_repair",
      s"""WITH p AS (
         |  SELECT o_orderkey % 64 AS shard, o_orderkey AS k, md5($ident) AS h
         |  FROM orders),
         |r AS (
         |  SELECT o_orderkey % 64 AS shard, o_orderkey AS k, md5($identCorrupt) AS h
         |  FROM orders
         |  WHERE NOT (o_orderkey % 64 = 3 AND o_orderkey % 17 = 0)
         |  UNION ALL
         |  SELECT 11 AS shard, o_orderkey + 100000000 AS k,
         |         md5(concat('phantom|', CAST(o_orderkey AS VARCHAR))) AS h
         |  FROM orders WHERE o_orderkey % 64 = 11 AND o_orderkey % 19 = 0),
         |d AS (
         |  SELECT coalesce(p.shard, r.shard) AS shard,
         |         coalesce(p.k, r.k) AS o_orderkey,
         |         CASE WHEN r.k IS NULL THEN 'copy'
         |              WHEN p.k IS NULL THEN 'delete'
         |              WHEN p.h <> r.h THEN 'overwrite' END AS action
         |  FROM p FULL JOIN r ON p.k = r.k)
         |SELECT shard, o_orderkey, action FROM d
         |WHERE action IS NOT NULL ORDER BY shard, o_orderkey""".stripMargin) { (s, dir) =>
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_orderpriority"))
      val primary = o
        .select((col("o_orderkey") % 64).as("shard"), col("o_orderkey").as("k"),
          md5(expr(ident)).as("h"))
        .persist(lvl)
      val replica = o
        .filter(!(col("o_orderkey") % 64 === 3 && col("o_orderkey") % 17 === 0))
        .select((col("o_orderkey") % 64).as("shard"), col("o_orderkey").as("k"),
          md5(expr(identCorrupt)).as("h"))
        .unionByName(o
          .filter(col("o_orderkey") % 64 === 11 && col("o_orderkey") % 19 === 0)
          .select(lit(11L).as("shard"),
            (col("o_orderkey") + 100000000L).as("k"),
            md5(concat(lit("phantom|"), col("o_orderkey").cast("string"))).as("h")))
        .persist(lvl)
      // Level 1: q112's digest triple, per shard per side.
      def sums(side: DataFrame) = side
        .select(col("shard"), expr(PortableHash.hexHeadToLong("h", "instr")).as("hi"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n"), expr("bit_xor(hi)").as("x"), sum(col("hi")).as("sm"))
      val bad = sums(primary).as("ps")
        .join(sums(replica).as("rs"), col("ps.shard") === col("rs.shard"), "full_outer")
        .filter(
          col("ps.shard").isNull || col("rs.shard").isNull ||
            col("ps.n") =!= col("rs.n") || col("ps.x") =!= col("rs.x") ||
            col("ps.sm") =!= col("rs.sm"))
        .select(coalesce(col("ps.shard"), col("rs.shard")).as("shard"))
      // Level 2: row diff only inside the mismatched shards.
      val p2 = primary.join(broadcast(bad), "shard")
        .select(col("shard"), col("k").as("pk"), col("h").as("ph"))
      val r2 = replica.join(broadcast(bad), "shard")
        .select(col("shard").as("rshard"), col("k").as("rk"), col("h").as("rh"))
      p2.join(r2, col("pk") === col("rk"), "full_outer")
        .select(
          coalesce(col("shard"), col("rshard")).as("shard"),
          coalesce(col("pk"), col("rk")).as("o_orderkey"),
          when(col("rk").isNull, "copy")
            .when(col("pk").isNull, "delete")
            .when(col("ph") =!= col("rh"), "overwrite").as("action"))
        .filter(col("action").isNotNull)
        .orderBy(col("shard"), col("o_orderkey"))
    }
  }

  /** q120: CDC apply / log compaction — the other half of the incremental
    * story: q79 diffs two snapshots into a changelog; this op applies a
    * changelog (insert / update / delete events with a per-key sequence)
    * back into the final table state. It is exactly Kafka-style log
    * compaction: keep each key's highest-sequence op, drop the key if that
    * op is a delete.
    *
    * Scale shape: ONE hash shuffle on the key with map-side-combining
    * `max_by` partials — the delete fold happens inside the same
    * aggregate (a winner that is a 'D' is filtered post-agg), so there is
    * no separate anti-join pass, no window, no second shuffle. At 100 TB
    * this aggregation IS compaction: run it per partition of a
    * date-partitioned changelog and union with the previous compacted
    * state (whose rows enter as sequence-0 inserts).
    *
    * The changelog is simulated deterministically from `orders` (both
    * engines derive the identical log, so the op under test — the
    * compaction — is what's checked): every key is inserted at seq 1;
    * keys %3==0 are updated at seq 2; keys %10==0 are deleted at seq 3;
    * keys %30==0 are re-inserted at seq 4 (delete-then-reinsert is the
    * case a naive "drop all deleted keys" anti-join gets wrong). */
  val q120CdcApply: Q = Q(
    "q120_cdc_apply",
    """WITH log AS (
      |  SELECT o_orderkey AS k, 1 AS seq, 'I' AS op, o_orderpriority AS payload
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, 2, 'U', 'upd:' || o_orderstatus
      |  FROM orders WHERE o_orderkey % 3 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 3, 'D', NULL
      |  FROM orders WHERE o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 4, 'I', 'resurrected'
      |  FROM orders WHERE o_orderkey % 30 = 0),
      |c AS (
      |  SELECT k, max(seq) AS last_seq,
      |         max_by(op, seq) AS op, max_by(payload, seq) AS payload
      |  FROM log GROUP BY k)
      |SELECT k, last_seq, payload FROM c
      |WHERE op <> 'D' ORDER BY k""".stripMargin) { (s, dir) =>
    val o = Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
    def ev(pred: Column, seq: Int, op: String, payload: Column) =
      o.filter(pred).select(
        col("o_orderkey").as("k"), lit(seq).as("seq"), lit(op).as("op"),
        payload.as("payload"))
    val log = ev(lit(true), 1, "I", col("o_orderpriority"))
      .unionByName(ev(col("o_orderkey") % 3 === 0, 2, "U",
        concat(lit("upd:"), col("o_orderstatus"))))
      .unionByName(ev(col("o_orderkey") % 10 === 0, 3, "D",
        lit(null).cast("string")))
      .unionByName(ev(col("o_orderkey") % 30 === 0, 4, "I", lit("resurrected")))
    compactLog(log).orderBy(col("k"))
  }

  /** The q120 core over any (k, seq, op, payload) changelog: one
    * max_by aggregation per key, delete winners dropped post-agg. */
  private[ops] def compactLog(log: DataFrame): DataFrame =
    log.groupBy(col("k"))
      .agg(max(col("seq")).as("last_seq"),
        expr("max_by(op, seq)").as("op"),
        expr("max_by(payload, seq)").as("payload"))
      .filter(col("op") =!= "D")
      .select(col("k"), col("last_seq"), col("payload"))

  /** q130: referential-integrity audit — the cross-TABLE data-quality
    * check (q55 validates rows, q112 checksums replicas; this one walks
    * the foreign-key graph): for each child→parent relationship, how many
    * child rows / distinct keys point at a parent row that does not exist.
    * The lineitem→orders leg is deterministically corrupted (keys
    * %97 == 0 are remapped far out of parent range, exactly q118's
    * planted-divergence pattern) so the audit provably DETECTS — the
    * clean legs prove it doesn't false-positive.
    *
    * Scale shape, per relationship: the child reduces to (key, rows)
    * partials map-side — the anti join then shuffles DISTINCT keys, never
    * child rows; the parent side ships only its key column. Orphan rows
    * come back as sum(rows) over the anti-join survivors. Linear, two
    * shuffles per edge, payloads never move. */
  val q130FkAudit: Q = {
    def duckLeg(rel: String, childKeys: String, parent: String,
        pk: String): String =
      s"""SELECT '$rel' AS rel, CAST(sum(c) AS BIGINT) AS n_rows,
         |       count(*) AS n_keys,
         |       CAST(coalesce(sum(c) FILTER (WHERE orphan), 0) AS BIGINT) AS orphan_rows,
         |       count(*) FILTER (WHERE orphan) AS orphan_keys,
         |       min(k) FILTER (WHERE orphan) AS min_orphan_key
         |FROM (SELECT k, c, NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pk = g.k) AS orphan
         |      FROM ($childKeys) g)""".stripMargin
    val corrupted =
      """SELECT CASE WHEN l_orderkey % 97 = 0 THEN l_orderkey + 1000000000
        |            ELSE l_orderkey END AS k, count(*) AS c
        |FROM lineitem GROUP BY 1""".stripMargin
    Q("q130_fk_audit",
      s"""${duckLeg("lineitem.l_orderkey->orders", corrupted, "orders", "o_orderkey")}
         |UNION ALL
         |${duckLeg("orders.o_custkey->customer",
          "SELECT o_custkey AS k, count(*) AS c FROM orders GROUP BY 1",
          "customer", "c_custkey")}
         |UNION ALL
         |${duckLeg("customer.c_nationkey->nation",
          "SELECT c_nationkey AS k, count(*) AS c FROM customer GROUP BY 1",
          "nation", "n_nationkey")}
         |ORDER BY rel""".stripMargin) { (s, dir) =>
      def leg(rel: String, childKeys: DataFrame, parent: DataFrame,
          pk: String): DataFrame = {
        val orphans = childKeys.join(parent.select(col(pk).as("k")).distinct(),
          Seq("k"), "left_anti")
        val oAgg = orphans.agg(
          coalesce(sum(col("c")), lit(0L)).as("orphan_rows"),
          count(lit(1)).as("orphan_keys"),
          min(col("k")).as("min_orphan_key"))
        val cAgg = childKeys.agg(sum(col("c")).as("n_rows"),
          count(lit(1)).as("n_keys"))
        cAgg.crossJoin(oAgg)
          .select(lit(rel).as("rel"), col("n_rows"), col("n_keys"),
            col("orphan_rows"), col("orphan_keys"), col("min_orphan_key"))
      }
      val li = Tables(s, dir, "lineitem")
        .select(when(col("l_orderkey") % 97 === 0,
          col("l_orderkey") + 1000000000L)
          .otherwise(col("l_orderkey")).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("c"))
      val ord = Tables(s, dir, "orders")
        .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("c"))
      val cust = Tables(s, dir, "customer")
        .groupBy(col("c_nationkey").as("k")).agg(count(lit(1)).as("c"))
      leg("lineitem.l_orderkey->orders", li,
          Tables(s, dir, "orders"), "o_orderkey")
        .unionByName(leg("orders.o_custkey->customer", ord,
          Tables(s, dir, "customer"), "c_custkey"))
        .unionByName(leg("customer.c_nationkey->nation", cust,
          Tables(s, dir, "nation"), "n_nationkey"))
        .orderBy(col("rel"))
    }
  }

  /** q143: Benford first-digit audit — the classic fabricated-numbers
    * screen: naturally-occurring amounts follow P(d) = log10(1+1/d); a
    * column that deviates hard was generated, capped, or corrupted. The
    * expected law is pinned as INTEGER ppm literals (301030, 176091, …)
    * in both engines — computing log10 at runtime would hang the gate on
    * two libm implementations agreeing to the last ulp. The observed side
    * stays exact: digit = first character of the bigint dollar amount
    * (string truncation, not a float log), obs_ppm = n·10⁶ div total, and
    * the per-digit flag cross-multiplies |n·10⁶ − exp_ppm·total| against
    * a 20000-ppm tolerance — pure 64-bit integers throughout.
    *
    * Scale: rows collapse to ≤9 digit counts map-side; the expected table
    * is a 9-row broadcast. Nothing after the first agg is bigger than 9
    * rows. */
  val q143BenfordAudit: Q = Q(
    "q143_benford_audit",
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
      |              AS BIGINT) AS digit
      |  FROM orders WHERE o_totalprice >= 1),
      |c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
      |e AS (SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
      |                            (4, 96910), (5, 79181), (6, 66947),
      |                            (7, 57992), (8, 51153), (9, 45757))
      |      AS v(digit, exp_ppm))
      |SELECT CAST(e.digit AS BIGINT) AS digit,
      |       CAST(coalesce(c.n, 0) AS BIGINT) AS n,
      |       CAST(coalesce(c.n, 0) * 1000000 // t.total AS BIGINT) AS obs_ppm,
      |       CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
      |       abs(coalesce(c.n, 0) * 1000000 - e.exp_ppm * t.total)
      |         > 20000 * t.total AS flagged
      |FROM e LEFT JOIN c ON e.digit = c.digit CROSS JOIN t
      |ORDER BY digit""".stripMargin) { (s, dir) =>
    val expected = Seq(1 -> 301030, 2 -> 176091, 3 -> 124939, 4 -> 96910,
      5 -> 79181, 6 -> 66947, 7 -> 57992, 8 -> 51153, 9 -> 45757)
    val e = s.createDataFrame(expected.map(t => (t._1.toLong, t._2.toLong)))
      .toDF("digit", "exp_ppm")
    val c = Tables(s, dir, "orders")
      .filter(col("o_totalprice") >= 1)
      .select(substring(floor(col("o_totalprice")).cast("long").cast("string"),
        1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val t = c.agg(sum(col("n")).cast("long").as("total"))
    broadcast(e).join(c, Seq("digit"), "left")
      .crossJoin(broadcast(t))
      .select(col("digit"),
        coalesce(col("n"), lit(0L)).as("n"),
        expr("coalesce(n, 0) * 1000000 div total").cast("long").as("obs_ppm"),
        col("exp_ppm"),
        (abs(coalesce(col("n"), lit(0L)) * 1000000 - col("exp_ppm") * col("total"))
          > lit(20000L) * col("total")).as("flagged"))
      .orderBy(col("digit"))
  }

  /** q144: incremental view maintenance (IVM) — a per-priority
    * (count, sum) view maintained ALGEBRAICALLY from a CDC delta stream
    * instead of recomputed: deletes contribute (−1, −old), updates (0,
    * +change), inserts (+1, +new); the stored view and the delta
    * aggregate merge by full-outer key union, and groups whose count
    * reaches zero drop out. The oracle recomputes the view from the
    * final state directly, so gate equality IS the IVM correctness
    * theorem (delta-apply ≡ recompute) checked as data. Deltas are
    * synthesized deterministically from orders: base = keys %10≠9,
    * deletes %7=0, updates %5=0 (disjoint from deletes), inserts %10=9.
    *
    * Scale: the production win — maintenance work ∝ |changes|, not
    * |base|. Here the base aggregate is computed (no store in the bench
    * loop), but the MERGE path is the real one: both sides reduce to
    * ≤|priorities| rows before the final broadcast-sized join; sums
    * accumulate in exact DECIMAL so delta-apply is order-insensitive. */
  val q144IvmDeltaAgg: Q = Q(
    "q144_ivm_delta_agg",
    s"""WITH fin AS (
       |  SELECT o_orderpriority,
       |         CASE WHEN o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0
       |                   AND o_orderkey % 10 <> 9
       |              THEN o_totalprice + 100 ELSE o_totalprice END AS p
       |  FROM orders
       |  WHERE o_orderkey % 10 = 9 OR o_orderkey % 7 <> 0)
       |SELECT o_orderpriority, count(*) AS n_rows,
       |       ${Q.oSum2("p")} AS sum_price
       |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(18, 2)
    val o = Tables(s, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("prio"),
        col("o_totalprice").cast(dec).as("p"))
    val base = o.filter(col("k") % 10 =!= 9)
    val baseAgg = base.groupBy(col("prio"))
      .agg(count(lit(1)).as("bn"), sum(col("p")).as("bs"))
    // CDC deltas, each row pre-shaped as (Δcount, Δsum):
    val delta = base.filter(col("k") % 7 === 0)
      .select(col("prio"), lit(-1L).as("dn"), (-col("p")).as("dp"))
      .unionByName(base.filter(col("k") % 7 =!= 0 && col("k") % 5 === 0)
        .select(col("prio"), lit(0L).as("dn"), lit(100).cast(dec).as("dp")))
      .unionByName(o.filter(col("k") % 10 === 9)
        .select(col("prio"), lit(1L).as("dn"), col("p").as("dp")))
      .groupBy(col("prio"))
      .agg(sum(col("dn")).as("dn"), sum(col("dp")).as("dp"))
    baseAgg.join(delta, Seq("prio"), "full_outer")
      .select(col("prio").as("o_orderpriority"),
        (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_rows"),
        (coalesce(col("bs"), lit(0).cast(dec))
          + coalesce(col("dp"), lit(0).cast(dec))).cast("double").as("sum_price"))
      .filter(col("n_rows") > 0)
      .orderBy(col("o_orderpriority"))
  }

  /** q295: incremental JOIN-view maintenance — the two-sided delta-join
    * algebra q144 (single-table delta agg) stops short of: a materialized
    * join view V = γ(L ⋈ O) absorbs simultaneous deltas on BOTH inputs
    * as Δ V = γ(ΔL ⋈ O_old) + γ(L_old ⋈ ΔO) + γ(ΔL ⋈ ΔO) — the classic
    * distributivity of join over union, with the old×old term never
    * recomputed. The splits are deliberately INDEPENDENT (orders by
    * orderkey mod, lineitems by (orderkey+linenumber) mod) so all three
    * delta terms are non-empty — a lineitem can arrive late for an
    * already-loaded order and vice versa, which is exactly the case that
    * breaks "deltas arrive together" shortcuts.
    *
    * Scale shape: each delta term's cost is ∝|Δ| (the delta side drives
    * the join; AQE broadcasts it when small, degrades to shuffle when
    * not), the union aggregates ONCE map-side before the merge, and the
    * merge with the old view is a keyed full-outer + coalesce-sum — the
    * 100 TB path never touches L_old ⋈ O_old again. The oracle is the
    * from-scratch join: equality IS the IVM correctness proof. */
  val q295IvmDeltaJoin: Q = Q(
    "q295_ivm_delta_join",
    """SELECT o.o_custkey AS custkey, CAST(count(*) AS BIGINT) AS n_lines,
      |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |         AS sum_cents
      |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val o = Tables(s, dir, "orders")
      .select(col("o_orderkey").as("ok"), col("o_custkey").as("custkey"))
    val l = Tables(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"),
        ((col("l_orderkey") + col("l_linenumber")) % 7).as("slot"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val oOld = o.filter(col("ok") % 5 =!= 4)
    val oDelta = o.filter(col("ok") % 5 === 4)
    val lOld = l.filter(col("slot") =!= 0).drop("slot")
    val lDelta = l.filter(col("slot") === 0).drop("slot")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("custkey"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))
    val vOld = agg(lOld.join(oOld, "ok"))
      .withColumnsRenamed(Map("n" -> "bn", "c" -> "bc"))
    val dAgg = agg(
      lDelta.join(oOld, "ok")
        .unionByName(lOld.join(oDelta, "ok"))
        .unionByName(lDelta.join(oDelta, "ok")))
      .withColumnsRenamed(Map("n" -> "dn", "c" -> "dc"))
    vOld.join(dAgg, Seq("custkey"), "full_outer")
      .select(col("custkey"),
        (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_lines"),
        (coalesce(col("bc"), lit(0L)) + coalesce(col("dc"), lit(0L)))
          .as("sum_cents"))
      .orderBy(col("custkey"))
  }

  /** q300: late-arriving dimension backfill — the "early fact" problem:
    * fact rows land before their dimension row exists (CDC lag, upstream
    * batch cadence), so the enrichment join CANNOT be inner (it would
    * silently drop in-flight facts). The production pattern, executed
    * here: phase 1 left-joins the on-time dimension snapshot and parks
    * unmatched facts under a placeholder key; phase 2 re-joins ONLY the
    * parked facts against the late-arriving dimension slice and
    * backfills. The oracle is the naive join against the complete
    * dimension — equality proves the two-phase flow loses nothing,
    * duplicates nothing, and converges to the same enriched state, with
    * the backfill volume surfaced per group (the reconciliation metric
    * an operator actually watches).
    *
    * Scale shape: phase 2's join is |parked|-sized — late arrivals are
    * the exception, so the rejoin is a broadcast against a sliver, not a
    * second pass over the fact table; the placeholder parking keeps
    * phase 1 a single streaming-friendly left join. Late slice =
    * c_custkey % 4 == 3 (deterministic, both engines derive it). */
  val q300LateDimBackfill: Q = Q(
    "q300_late_dim_backfill",
    """SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |         AS sum_cents,
      |       CAST(count(*) FILTER (WHERE c.c_custkey % 4 = 3) AS BIGINT)
      |         AS n_backfilled
      |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val cust = Tables(s, dir, "customer")
      .select(col("c_custkey").as("ck"), col("c_nationkey").cast("long").as("nk"))
    val onTime = cust.filter(col("ck") % 4 =!= 3)
    val late = cust.filter(col("ck") % 4 === 3)
    val facts = Tables(s, dir, "orders")
      .select(col("o_custkey").as("ck"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val p1 = facts.join(onTime, Seq("ck"), "left_outer")
    val resolved = p1.filter(col("nk").isNotNull)
      .withColumn("backfilled", lit(false))
    // Phase 2 re-joins ONLY the parked rows; still-unknown keys keep the
    // placeholder (-1) rather than vanishing — visible, not dropped.
    val parked = p1.filter(col("nk").isNull).drop("nk")
      .join(late, Seq("ck"), "left_outer")
      .withColumn("backfilled", col("nk").isNotNull)
      .withColumn("nk", coalesce(col("nk"), lit(-1L)))
    resolved.unionByName(parked)
      .groupBy(col("nk").as("nationkey"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"),
        count_if(col("backfilled")).as("n_backfilled"))
      .orderBy(col("nationkey"))
  }

  /** q153: schema-evolution union — reading across generations where a
    * column was ADDED mid-history is the everyday lake problem: the old
    * generation simply lacks the column. `unionByName(…,
    * allowMissingColumns = true)` aligns by NAME and nulls the missing
    * column (positional union would silently mis-bind), and downstream
    * code owns the null policy explicitly (here: a '<legacy>' bucket).
    * Generations are derived deterministically from orders (even keys =
    * old schema, odd = new), so the oracle can rebuild both.
    *
    * Scale: the union is plan-level — two scans, each pruned to ITS
    * generation's columns (the legacy scan never reads the added column),
    * partial aggs collapse before one shuffle. */
  val q153SchemaEvolution: Q = Q(
    "q153_schema_evolution",
    s"""WITH gen1 AS (
       |  SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
       |  FROM orders WHERE o_orderkey % 2 = 0),
       |gen2 AS (
       |  SELECT o_orderkey, o_totalprice, o_orderpriority
       |  FROM orders WHERE o_orderkey % 2 = 1),
       |u AS (SELECT * FROM gen1 UNION ALL SELECT * FROM gen2)
       |SELECT coalesce(o_orderpriority, '<legacy>') AS priority,
       |       count(*) AS n, ${Q.oSum2("o_totalprice")} AS total
       |FROM u GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val o = Tables(s, dir, "orders")
    val gen1 = o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
    val gen2 = o.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    gen1.unionByName(gen2, allowMissingColumns = true)
      .groupBy(coalesce(col("o_orderpriority"), lit("<legacy>")).as("priority"))
      .agg(count(lit(1)).as("n"), Q.dsum2(col("o_totalprice")).as("total"))
      .orderBy(col("priority"))
  }

  /** q175: header-detail reconciliation — the finance-close audit: does
    * each order header's total equal the sum of its lines at
    * extprice·(1−disc)·(1+tax)? The per-line product is one double
    * expression (bit-identical across engines), immediately pinned to
    * DECIMAL(28,6) so the per-order SUM is associative — a raw double sum
    * would hash-differ by partial-agg order. Comparison at cent grain.
    * (This synthetic data reconciles almost nowhere — the point is the
    * audit computes the discrepancy FEED deterministically; n_within_1c /
    * max_abs_diff are real data, not a vacuous zero.)
    *
    * Scale: one join shuffle on orderkey with map-side partial sums;
    * output is four scalars. */
  val q175HeaderDetailRecon: Q = Q(
    "q175_header_detail_recon",
    """WITH d AS (
      |  SELECT l_orderkey,
      |         sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
      |                  AS DECIMAL(28,6))) AS detail
      |  FROM lineitem GROUP BY 1),
      |j AS (
      |  SELECT CAST(round(o.o_totalprice * 100) AS BIGINT) AS hc,
      |         CAST(round(d.detail * 100) AS BIGINT) AS dc
      |  FROM orders o JOIN d ON o.o_orderkey = d.l_orderkey)
      |SELECT count(*) AS n_orders,
      |       count(*) FILTER (WHERE abs(hc - dc) <= 1) AS n_within_1c,
      |       CAST(max(abs(hc - dc)) AS BIGINT) AS max_abs_diff_cents,
      |       CAST(sum(abs(hc - dc)) AS BIGINT) AS total_abs_diff_cents
      |FROM j""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.types.DecimalType
    val d = Tables(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))
        * (lit(1) + col("l_tax"))).cast(DecimalType(28, 6))).as("detail"))
    Tables(s, dir, "orders")
      .join(d, col("o_orderkey") === col("l_orderkey"))
      .select(round(col("o_totalprice") * 100).cast("long").as("hc"),
        round(col("detail") * 100).cast("long").as("dc"))
      .agg(count(lit(1)).as("n_orders"),
        count_if(abs(col("hc") - col("dc")) <= 1).as("n_within_1c"),
        max(abs(col("hc") - col("dc"))).cast("long").as("max_abs_diff_cents"),
        sum(abs(col("hc") - col("dc"))).cast("long").as("total_abs_diff_cents"))
  }

  /** q188: data-contract validation — the producer/consumer contract
    * (ranges, enum membership, time window, payload parseability)
    * evaluated as one pass with per-RULE violation counts, the report a
    * contract gate publishes before promoting a batch. Rules are chosen
    * so both outcomes occur (value ≤ 95 genuinely fails on real rows;
    * the enum/window/JSON rules genuinely pass) — a contract checker
    * that's never seen a violation is untested. One scan, one 1-row agg
    * exploded to rule rows (the q141 shape); per-row quarantine routing
    * is U7/q55's surface. */
  val q188DataContract: Q = Q(
    "q188_data_contract",
    """WITH s AS (
      |  SELECT count(*) AS n,
      |         count(*) FILTER (WHERE NOT value >= 0) AS v1,
      |         count(*) FILTER (WHERE NOT value <= 95) AS v2,
      |         count(*) FILTER (WHERE event_type NOT IN
      |           ('click', 'error', 'purchase', 'signup', 'view')) AS v3,
      |         count(*) FILTER (WHERE NOT (ts >= TIMESTAMP '2024-01-01'
      |                                 AND ts < TIMESTAMP '2024-02-01')) AS v4,
      |         count(*) FILTER (WHERE json_extract(props, '$.k') IS NULL) AS v5
      |  FROM events)
      |SELECT 'value_nonneg' AS rule, n AS n_checked, v1 AS n_violations FROM s
      |UNION ALL SELECT 'value_le_95', n, v2 FROM s
      |UNION ALL SELECT 'type_enum', n, v3 FROM s
      |UNION ALL SELECT 'ts_in_window', n, v4 FROM s
      |UNION ALL SELECT 'props_json_k', n, v5 FROM s
      |ORDER BY rule""".stripMargin) { (s, dir) =>
    val agg = Tables(s, dir, "events").agg(
      count(lit(1)).as("n"),
      count_if(!(col("value") >= 0)).as("v1"),
      count_if(!(col("value") <= 95)).as("v2"),
      count_if(!col("event_type").isin(
        "click", "error", "purchase", "signup", "view")).as("v3"),
      count_if(!(col("ts") >= lit("2024-01-01").cast("timestamp") &&
        col("ts") < lit("2024-02-01").cast("timestamp"))).as("v4"),
      count_if(get_json_object(col("props"), "$.k").isNull).as("v5"))
    val rules = Seq("value_nonneg" -> "v1", "value_le_95" -> "v2",
      "type_enum" -> "v3", "ts_in_window" -> "v4", "props_json_k" -> "v5")
    agg.select(explode(array(rules.map { case (name, c) => struct(
        lit(name).as("rule"), col("n").as("n_checked"),
        col(c).as("n_violations")) }: _*)).as("st"))
      .select(col("st.*"))
      .orderBy(col("rule"))
  }

  /** q190: k-anonymity audit — before publishing a "de-identified"
    * extract, check the quasi-identifier combination (nation, market
    * segment) leaves no group smaller than k=5: such rows are
    * re-identification risks. One group-size aggregate, then scalars —
    * the privacy gate's summary (the remediation — generalize or
    * suppress — consumes the same group table). */
  val q190KAnonymity: Q = Q(
    "q190_k_anonymity",
    """WITH g AS (
      |  SELECT c_nationkey, c_mktsegment, count(*) AS sz
      |  FROM customer GROUP BY 1, 2)
      |SELECT CAST(count(*) AS BIGINT) AS n_groups,
      |       count(*) FILTER (WHERE sz < 5) AS n_groups_below_k,
      |       CAST(coalesce(sum(sz) FILTER (WHERE sz < 5), 0) AS BIGINT)
      |         AS n_rows_at_risk,
      |       CAST(min(sz) AS BIGINT) AS min_group_size
      |FROM g""".stripMargin) { (s, dir) =>
    Tables(s, dir, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_groups"),
        count_if(col("sz") < 5).as("n_groups_below_k"),
        coalesce(sum(when(col("sz") < 5, col("sz"))), lit(0L)).cast("long")
          .as("n_rows_at_risk"),
        min(col("sz")).cast("long").as("min_group_size"))
  }

  /** q206: freshness audit — per time-bearing table, the newest
    * timestamp and its lag in hours behind the freshest table: the
    * "is anything stale" dashboard a delivery pipeline publishes with
    * every batch. One max per table (map-side, no shuffle beyond the
    * 3-row union); lag by integer hour arithmetic. */
  val q206FreshnessAudit: Q = Q(
    "q206_freshness_audit",
    """WITH m AS (
      |  SELECT 'events' AS table_name,
      |         max(CAST(floor(epoch(ts)) AS BIGINT)) AS max_s FROM events
      |  UNION ALL
      |  SELECT 'lineitem', max(CAST(floor(epoch(l_shipdate)) AS BIGINT))
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'orders', max(CAST(floor(epoch(o_orderdate)) AS BIGINT))
      |  FROM orders),
      |t AS (SELECT max(max_s) AS freshest FROM m)
      |SELECT m.table_name, m.max_s,
      |       CAST((t.freshest - m.max_s) // 3600 AS BIGINT) AS lag_hours
      |FROM m CROSS JOIN t ORDER BY table_name""".stripMargin) { (s, dir) =>
    def leg(table: String, tsCol: String) =
      Tables(s, dir, table)
        .agg(max(unix_timestamp(col(tsCol))).as("max_s"))
        .select(lit(table).as("table_name"), col("max_s"))
    val m = leg("events", "ts")
      .unionByName(leg("lineitem", "l_shipdate"))
      .unionByName(leg("orders", "o_orderdate"))
    val t = m.agg(max(col("max_s")).as("freshest"))
    m.crossJoin(broadcast(t))
      .select(col("table_name"), col("max_s"),
        expr("(freshest - max_s) div 3600").cast("long").as("lag_hours"))
      .orderBy(col("table_name"))
  }

  /** q207: cents-convention precision audit — the meta-check behind every
    * exact-integer query in this engine: is `round(x·100)` actually a
    * lossless representation of the monetary doubles? Max residual
    * |x·100 − round(x·100)| and the count beyond 1e-6 per column, plus
    * the extrema where a residual is largest (evidence, not just a
    * flag). Pure float arithmetic, bit-identical across engines; max is
    * order-insensitive. */
  val q207CentsPrecision: Q = Q(
    "q207_cents_precision",
    """WITH e AS (
      |  SELECT 'events.value' AS col_name,
      |         abs(value * 100 - round(value * 100)) AS err FROM events
      |  UNION ALL
      |  SELECT 'orders.o_totalprice',
      |         abs(o_totalprice * 100 - round(o_totalprice * 100)) FROM orders
      |  UNION ALL
      |  SELECT 'lineitem.l_extendedprice',
      |         abs(l_extendedprice * 100 - round(l_extendedprice * 100))
      |  FROM lineitem)
      |SELECT col_name, count(*) AS n_rows,
      |       count(*) FILTER (WHERE err > 0.000001) AS n_beyond_tol,
      |       max(err) AS max_err
      |FROM e GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    def leg(name: String, table: String, c: String) =
      Tables(s, dir, table).select(lit(name).as("col_name"),
        abs(col(c) * 100 - round(col(c) * 100)).as("err"))
    leg("events.value", "events", "value")
      .unionByName(leg("orders.o_totalprice", "orders", "o_totalprice"))
      .unionByName(leg("lineitem.l_extendedprice", "lineitem", "l_extendedprice"))
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_rows"),
        count_if(col("err") > 0.000001).as("n_beyond_tol"),
        max(col("err")).as("max_err"))
      .orderBy(col("col_name"))
  }

  val all: Seq[Q] = Seq(q79SnapshotDiff, q112TableChecksum, q118ShardRepair,
    q120CdcApply, q130FkAudit, q143BenfordAudit, q144IvmDeltaAgg,
    q295IvmDeltaJoin, q300LateDimBackfill,
    q153SchemaEvolution, q175HeaderDetailRecon, q188DataContract,
    q190KAnonymity, q206FreshnessAudit, q207CentsPrecision)
}
