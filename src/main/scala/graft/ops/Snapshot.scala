package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val all: Seq[Q] = Seq(q79SnapshotDiff, q112TableChecksum)
}
