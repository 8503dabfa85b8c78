package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One named query: a Spark DataFrame program plus (optionally) an ANSI SQL
  * rendering DuckDB can run on the same parquet tables (the driver's
  * correctness oracle — see Verify.scala).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))

  /** Oracle-parity helpers.
    *
    * Floating-point sums are order-dependent, and Spark's partial/final
    * aggregation order differs from DuckDB's. For sums that must
    * hash-match the oracle we route through an exact DECIMAL
    * accumulation (associative ⇒ order-insensitive ⇒ identical in both
    * engines), then surface DOUBLE. The double→decimal rounding step is
    * itself deterministic and identical across engines (IEEE 754 input,
    * half-up rounding), so the whole pipeline is reproducible.
    *
    * At 100 TB this is also the *right* behavior: decimal partial
    * aggregates are codegen'd and keep map-side combine, so the shape of
    * the plan (partial agg → shuffle → final agg) is unchanged.
    */
  def dsum2(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)
  def dsum6(c: Column): Column = sum(c.cast(DecimalType(28, 6))).cast(DoubleType)
  /** Oracle-side renderings of the same. */
  def oSum2(expr: String): String = s"CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS DOUBLE)"
  def oSum6(expr: String): String = s"CAST(SUM(CAST($expr AS DECIMAL(28,6))) AS DOUBLE)"
}
