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
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as Long and
      // convert to a µs TimestampType column (floor-truncation; FIXTURES.md
      // pins all oracle comparisons to ≥1s granularity so this is lossless
      // for the query surface).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
