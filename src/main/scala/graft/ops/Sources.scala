package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-format sources under the CORRECTNESS gate (CSV / JSON-lines were
  * previously ScalaTest-only in `FormatsSpec`): each query derives a
  * deterministic text dataset from the parquet tables on the fly, plants
  * malformed lines, reads it back through the REAL Spark source with an
  * explicit schema + PERMISSIVE mode, and proves (a) the parsed aggregate
  * equals the parquet-derived oracle and (b) the malformed lines land in
  * the corrupt-record column as rejected ROWS, not task failures — U7's
  * error-isolation discipline at the source boundary.
  *
  * Numeric fields travel as integer cents — float→text→float formatting
  * is the one step two engines (or two Spark versions) may render
  * differently, so the gated path never round-trips a double through text.
  *
  * Scale: the staged text is a stand-in for the real 100 TB landing zone;
  * the read path (schema-on-read, per-row reject capture, one pass to the
  * partial aggregate) is exactly the production shape.
  */
object Sources {

  private def stage(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    org.apache.commons.io.FileUtils.forceDeleteOnExit(p.toFile)
    p
  }

  /** Planted malformed records, one list per format: the oracle's
    * `n_corrupt` literal is DERIVED from each list's size, so adding or
    * dropping a planted row can never silently diverge the two sides —
    * the count the gate compares and the rows the query plants share one
    * definition. Every entry must be TYPE- or STRUCTURE-invalid under
    * the format's PERMISSIVE parse (a merely short CSV row is NOT
    * corrupt — missing trailing columns read as nulls). */
  private val CsvPlanted = Seq("x,y,z", "1,2,notanumber")
  private val JsonlPlanted = Seq("{\"k\": 1, \"c\": 2, \"cents\":", " not json at all")
  // A type-invalid cents value and an unclosed element (XML adds a
  // structural failure mode CSV doesn't have).
  private val XmlPlanted = Seq(
    "<row><k>1</k><c>2</c><cents>notanumber</cents></row>",
    "<row><k>3</k><c>4</c><cents>99")

  /** q160: CSV with corrupt-record isolation. */
  val q160CsvRejects: Q = Q(
    "q160_csv_rejects",
    s"""SELECT CAST(count(*) AS BIGINT) AS n_good,
      |       CAST(${CsvPlanted.size} AS BIGINT) AS n_corrupt,
      |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |         AS sum_cents
      |FROM orders""".stripMargin) { (s, dir) =>
    val work = stage("graft-csv-")
    Tables(s, dir, "orders")
      .select(concat_ws(",", col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long")).as("value"))
      .coalesce(1).write.mode("overwrite").text(work.resolve("csv").toString)
    java.nio.file.Files.writeString(work.resolve("csv").resolve("bad.txt"),
      CsvPlanted.mkString("", "\n", "\n"))
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("c", LongType),
      StructField("cents", LongType), StructField("_corrupt", StringType)))
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(work.resolve("csv").toString)
      .agg(count(when(col("_corrupt").isNull, 1)).as("n_good"),
        count(col("_corrupt")).as("n_corrupt"),
        sum(col("cents")).as("sum_cents"))
  }

  /** q161: JSON-lines with corrupt-record isolation (the other landing
    * format; field ORDER in the staged text is deliberately non-schema
    * order — JSON binds by name). */
  val q161JsonlRejects: Q = Q(
    "q161_jsonl_rejects",
    s"""SELECT CAST(count(*) AS BIGINT) AS n_good,
      |       CAST(${JsonlPlanted.size} AS BIGINT) AS n_corrupt,
      |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |         AS sum_cents
      |FROM orders""".stripMargin) { (s, dir) =>
    val work = stage("graft-jsonl-")
    Tables(s, dir, "orders")
      .select(to_json(struct(
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey").as("k"), col("o_custkey").as("c"))).as("value"))
      .coalesce(1).write.mode("overwrite").text(work.resolve("jl").toString)
    java.nio.file.Files.writeString(work.resolve("jl").resolve("bad.txt"),
      JsonlPlanted.mkString("", "\n", "\n"))
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("c", LongType),
      StructField("cents", LongType), StructField("_corrupt", StringType)))
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(work.resolve("jl").toString)
      .agg(count(when(col("_corrupt").isNull, 1)).as("n_good"),
        count(col("_corrupt")).as("n_corrupt"),
        sum(col("cents")).as("sum_cents"))
  }

  /** q172: the DataSourceV2 generator source under the gate — 20000 rows
    * planned as 16 input partitions, read in executors, rolled up by
    * id mod 8. The oracle reproduces the generator's closed form over
    * `generate_series`, so gate equality proves the source's partition
    * planning covers [0, rows) exactly once — the off-by-one class of
    * connector bug (gap or overlap at split boundaries) cannot pass. */
  val q172GenSource: Q = Q(
    "q172_gen_source",
    """WITH g AS (
      |  SELECT i AS id, (i * 2654435761) % 1000 AS val
      |  FROM generate_series(0, 19999) t(i))
      |SELECT id % 8 AS bucket, count(*) AS n,
      |       CAST(sum(val) AS BIGINT) AS sum_val,
      |       CAST(min(id) AS BIGINT) AS min_id, CAST(max(id) AS BIGINT) AS max_id
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    s.read.format("graft.sources.GenSource")
      .option("rows", "20000").option("numPartitions", "16").load()
      .groupBy((col("id") % 8).as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("val")).cast("long").as("sum_val"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"))
      .orderBy(col("bucket"))
  }

  /** q173: the DataSourceV2 digest SINK under the gate — events rows
    * stream through the V2 write path (executor DataWriters → task
    * commit messages → driver BatchWrite.commit → atomic one-line JSON
    * publish), and the published digest must equal the q112-algebra
    * checksum DuckDB computes over the same rows. Gate equality proves
    * the whole two-phase commit pipeline delivered every row exactly
    * once; nothing row-sized crossed the driver. */
  val q173DigestSink: Q = Q(
    "q173_digest_sink",
    s"""SELECT count(*) AS n_rows,
       |       bit_xor(h) AS xor_digest, CAST(sum(h) AS BIGINT) AS sum_digest
       |FROM (SELECT ${graft.ops.PortableHash.hexHeadToLong("m", "strpos")} AS h
       |      FROM (SELECT md5(concat_ws('|', event_id, user_id, event_type)) AS m
       |            FROM events))""".stripMargin) { (s, dir) =>
    val out = stage("graft-digest-").resolve("digest.json")
    Tables(s, dir, "events")
      .select(md5(concat_ws("|", col("event_id"), col("user_id"),
        col("event_type"))).as("m"))
      .write.format("graft.sources.DigestSink")
      .option("out", out.toString).mode("append").save()
    val line = java.nio.file.Files.readString(out)
    def field(k: String): Long =
      s""""$k":\\s*(-?\\d+)""".r.findFirstMatchIn(line).get.group(1).toLong
    import s.implicits._
    Seq((field("n_rows"), field("xor_digest"), field("sum_digest")))
      .toDF("n_rows", "xor_digest", "sum_digest")
  }

  /** q174: the generator's STREAMING read path gated end-to-end — the
    * same 20000 rows arrive through an actual `readStream` →
    * `Trigger.AvailableNow` drain, admitted 3000 rows per micro-batch by
    * the source's `latestOffset(start, limit)` (a backlogged-topic
    * simulation), into a parquet sink the same rollup reads back. Gate
    * equality proves the offset ranges tile [0, rows) with no gap or
    * overlap ACROSS batch boundaries — the streaming connector's
    * exactly-once read contract, checked as data. */
  val q174GenStream: Q = Q(
    "q174_gen_stream",
    """WITH g AS (
      |  SELECT i AS id, (i * 2654435761) % 1000 AS val
      |  FROM generate_series(0, 19999) t(i))
      |SELECT id % 8 AS bucket, count(*) AS n,
      |       CAST(sum(val) AS BIGINT) AS sum_val,
      |       CAST(min(id) AS BIGINT) AS min_id, CAST(max(id) AS BIGINT) AS max_id
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.streaming.Trigger
    val work = stage("graft-genstream-")
    val query = s.readStream.format("graft.sources.GenSource")
      .option("rows", "20000").option("numPartitions", "4")
      .option("batchSize", "3000").load()
      .writeStream.format("parquet")
      .option("path", work.resolve("out").toString)
      .option("checkpointLocation", work.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    graft.PlanProbe.recordStreaming(query)
    s.read.parquet(work.resolve("out").toString)
      .groupBy((col("id") % 8).as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("val")).cast("long").as("sum_val"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"))
      .orderBy(col("bucket"))
  }

  /** q246: ORC source/sink round-trip — the second columnar format the
    * landing zone speaks (Spark's built-in ORC datasource): lineitem is
    * written PARTITIONED by l_returnflag to ORC, read back through the
    * ORC scan with a partition filter (directory pruning — the 'A'
    * partition is the only one listed) plus a data filter (l_quantity,
    * pushed into the ORC reader as a search argument), and the rollup
    * must equal the parquet-derived oracle. Floats never round-trip
    * through the format boundary decision: the gated aggregates are the
    * integer-cents/integer-quantity casts (the q160 discipline).
    * Plan evidence: the OrcScan shows PushedFilters + the pruned
    * partition count (recorded in PLANS.md). */
  val q246OrcRoundtrip: Q = Q(
    "q246_orc_roundtrip",
    """SELECT l_linestatus, count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |         AS sum_cents
      |FROM lineitem WHERE l_returnflag = 'A' AND l_quantity > 25
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val work = stage("graft-orc-")
    Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linestatus"), col("l_returnflag"),
        col("l_quantity"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .write.mode("overwrite").partitionBy("l_returnflag")
      .orc(work.resolve("orc").toString)
    s.read.orc(work.resolve("orc").toString)
      .filter(col("l_returnflag") === "A" && col("l_quantity") > 25)
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(col("cents")).as("sum_cents"))
      .orderBy(col("l_linestatus"))
  }

  /** q256: XML source with corrupt-record isolation — the fourth landing
    * format (built-in since Spark 4.0), under the same U7 discipline as
    * q160/q161: orders rows round-trip through a real XML write/read with
    * an explicit schema + PERMISSIVE mode, two planted malformed records
    * land in the corrupt column as rows (not task failures), and the
    * parsed aggregate equals the parquet-derived oracle. Integer cents
    * only across the text boundary (the q160 float rule). */
  val q256XmlRejects: Q = Q(
    "q256_xml_rejects",
    s"""SELECT CAST(count(*) AS BIGINT) AS n_good,
      |       CAST(${XmlPlanted.size} AS BIGINT) AS n_corrupt,
      |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |         AS sum_cents
      |FROM orders""".stripMargin) { (s, dir) =>
    val work = stage("graft-xml-")
    Tables(s, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_custkey").as("c"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .coalesce(1).write.format("xml").option("rowTag", "row")
      .mode("overwrite").save(work.resolve("xml").toString)
    java.nio.file.Files.writeString(work.resolve("xml").resolve("bad.xml"),
      XmlPlanted.mkString("", "\n", "\n"))
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("c", LongType),
      StructField("cents", LongType), StructField("_corrupt", StringType)))
    s.read.schema(schema)
      .option("rowTag", "row")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .format("xml").load(work.resolve("xml").toString)
      .agg(count(when(col("_corrupt").isNull, 1)).as("n_good"),
        count(col("_corrupt")).as("n_corrupt"),
        sum(col("cents")).as("sum_cents"))
  }

  // One under-length line (structural) and one full-length line whose
  // cents field is non-numeric (type) — the two fixed-width failure
  // modes. Both are exactly what a mainframe feed actually ships.
  private val FwPlanted = Seq(
    "too short line",
    "0000000001" + "0000000002" + "0000notanum0")

  /** q286: FIXED-WIDTH text with reject isolation — the fifth landing
    * format, and the one Spark has NO built-in source for: the read
    * path is `text()` + positional substring slicing with an explicit
    * schema-on-read contract (line length + per-field `try_cast`), and
    * reject capture is therefore MANUAL — the validity predicate is the
    * corrupt-record column. That is the production reality of
    * mainframe/finance feeds, and the interesting delta vs q160/q161:
    * when the format has no parser, U7's error-isolation discipline has
    * to be stated as expressions, and the gate proves the stated
    * contract (32-char lines, zero-padded digit fields) classifies
    * every planted failure mode without a task failure.
    *
    * Scale shape: one text scan, per-row slicing inside codegen, one
    * partial aggregate — schema-on-read at its cheapest; rejects cost a
    * length check and three try_casts per row. */
  val q286FixedwidthRejects: Q = Q(
    "q286_fixedwidth_rejects",
    s"""SELECT CAST(count(*) AS BIGINT) AS n_good,
      |       CAST(${FwPlanted.size} AS BIGINT) AS n_corrupt,
      |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |         AS sum_cents
      |FROM orders""".stripMargin) { (s, dir) =>
    val work = stage("graft-fw-")
    Tables(s, dir, "orders")
      .select(concat(
        lpad(col("o_orderkey").cast("string"), 10, "0"),
        lpad(col("o_custkey").cast("string"), 10, "0"),
        lpad(round(col("o_totalprice") * 100).cast("long").cast("string"),
          12, "0")).as("value"))
      .coalesce(1).write.mode("overwrite").text(work.resolve("fw").toString)
    java.nio.file.Files.writeString(work.resolve("fw").resolve("bad.txt"),
      FwPlanted.mkString("", "\n", "\n"))
    s.read.text(work.resolve("fw").toString)
      .select(col("value"),
        expr("try_cast(substring(value, 1, 10) AS BIGINT)").as("k"),
        expr("try_cast(substring(value, 11, 10) AS BIGINT)").as("c"),
        expr("try_cast(substring(value, 21, 12) AS BIGINT)").as("cents"))
      .withColumn("bad",
        length(col("value")) =!= 32 || col("k").isNull || col("c").isNull ||
          col("cents").isNull)
      .agg(count_if(!col("bad")).as("n_good"),
        count_if(col("bad")).as("n_corrupt"),
        sum(when(!col("bad"), col("cents"))).cast("long").as("sum_cents"))
  }

  val all: Seq[Q] = Seq(q160CsvRejects, q161JsonlRejects, q172GenSource,
    q173DigestSink, q174GenStream, q246OrcRoundtrip, q256XmlRejects,
    q286FixedwidthRejects)
}
