package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet: JSON lines, CSV, and ORC
  * round-trip the same rows bit-identically (UTC session, explicit read
  * schema — schema inference is banned at scale: one line's bad guess
  * would flip a column type for the whole pipeline). Parquet is the
  * primary format everywhere else in the repo; these prove the engine is
  * not parquet-bound. */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = "id LONG, name STRING, value DOUBLE, ts TIMESTAMP"

  private def fixture = Seq(
    (1L, "alpha", 1.5, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
    (2L, "beta, with comma", 2.25, java.sql.Timestamp.valueOf("2024-06-15 23:59:59")),
    (3L, null.asInstanceOf[String], -0.75, java.sql.Timestamp.valueOf("2025-02-28 00:00:01")))
    .toDF("id", "name", "value", "ts")

  test("json, csv, and orc round-trip the parquet rows exactly") {
    val root = java.nio.file.Files.createTempDirectory("formats").toString
    val df = fixture
    df.write.mode("overwrite").parquet(s"$root/p")
    df.write.mode("overwrite").json(s"$root/j")
    df.write.mode("overwrite").option("header", "true").csv(s"$root/c")
    df.write.mode("overwrite").orc(s"$root/o")

    val base = rowStrings(spark.read.schema(schema).parquet(s"$root/p"))
    assert(rowStrings(spark.read.schema(schema).json(s"$root/j")) === base)
    assert(rowStrings(spark.read.schema(schema)
      .option("header", "true").csv(s"$root/c")) === base)
    assert(rowStrings(spark.read.schema(schema).orc(s"$root/o")) === base)
  }

  test("orc scans get predicate pushdown and column pruning like parquet") {
    val root = java.nio.file.Files.createTempDirectory("orcpush").toString
    fixture.write.mode("overwrite").orc(s"$root/o")
    val plan = spark.read.schema(schema).orc(s"$root/o")
      .where(col("id") > 1).select("id", "value")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)]"), plan)
    assert(plan.contains("ReadSchema: struct<id:bigint,value:double>"), plan)
  }
}
