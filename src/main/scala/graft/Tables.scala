package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named access to the driver-generated parquet tables (TESTDATA.md).
  *
  * Scale notes (100 TB story): every reader goes through
  * `spark.read.parquet` so Catalyst's vectorized parquet reader, filter
  * pushdown, and column pruning apply unchanged on a real cluster; the
  * `sfDir` is just a prefix and could be `s3://bucket/sf100/`.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read a table and round-robin repartition it to the session's default
    * parallelism when the scan yields fewer input splits than that — the
    * optimization-guide §2.5 unsplittable-input fix, applied ONLY at
    * CPU-heavy per-row sites (per-position/shingle hashing, per-char and
    * per-element explodes). The driver testdata ships each table as ONE
    * parquet row group, so without this every pre-shuffle stage of such a
    * query runs on one core regardless of `local[N]`. The condition is
    * scale-adaptive, not local-tuned: at cluster scale a big table's scan
    * already has ≥ cores splits, the branch is false, and NO extra
    * exchange is added — while a genuinely tiny-but-explode-heavy input
    * (the 100 TB analogue: one fused dimension file feeding a hash
    * stage) still gets spread. Round-robin repartition is retry-safe
    * (sortBeforeRepartition stays on) and costs one shuffle of the
    * small input — microseconds next to the hashing it parallelizes. */
  def sharded(spark: SparkSession, sfDir: String, name: String): DataFrame =
    shard(apply(spark, sfDir, name))

  /** The same unsplittable-input fix for an arbitrary frame — streaming
    * micro-batches arrive as one small staged file (one scan partition),
    * so a CPU-heavy per-row stage inside a foreachBatch body is
    * single-threaded without it. No-op whenever the input already has
    * ≥ default-parallelism partitions (any real cluster-scale scan). */
  def shard(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown table: $name")
    if (name == "events") {
      // events.ts has shipped as parquet TIMESTAMP(NANOS) in some data
      // drops (Spark's vectorized reader rejects it —
      // [PARQUET_TYPE_ILLEGAL] — unless nanos are read as Long) and as
      // TIMESTAMP(MICROS) without timezone (read as TIMESTAMP_NTZ) in
      // others. Normalize BOTH to a µs TimestampType column so every
      // query sees one stable schema: nanos floor-truncate to µs
      // (FIXTURES.md pins oracle comparisons to ≥1s granularity), and
      // NTZ reinterprets in the session zone, which Verify/Bench pin to
      // UTC — value-identical to what DuckDB reads natively.
      import org.apache.spark.sql.functions.{expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampType}
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampType => raw
        case _ => raw.withColumn("ts", raw("ts").cast(TimestampType))
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
