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
