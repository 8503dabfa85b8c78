package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** l2sq_f32 parity: the codegen'd loop must agree with the
  * zip_with+aggregate composition it replaced (same double arithmetic,
  * same order) for float-float and float-double operand shapes, and
  * null arrays must stay null. */
class L2SqF32Spec extends SparkSpec {
  import spark.implicits._

  test("matches the zip_with fold on float-float and float-double operands") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map { i =>
      (i.toLong,
        Array.fill(16)(rnd.nextFloat() * 2 - 1),
        Array.fill(16)(rnd.nextFloat() * 2 - 1),
        Array.fill(16)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b", "d")
      .withColumn("got_ff", expr("l2sq_f32(a, b)"))
      .withColumn("exp_ff", expr(
        """aggregate(zip_with(a, b, (x, y) ->
          |  (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
          |  * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
          |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin))
      .withColumn("got_fd", expr("l2sq_f32(a, d)"))
      .withColumn("exp_fd", expr(
        """aggregate(zip_with(a, d, (x, y) ->
          |  (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),
          |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin))
    val bad = df.filter(col("got_ff") =!= col("exp_ff") ||
      col("got_fd") =!= col("exp_fd")).count()
    assert(bad == 0, s"$bad rows diverge from the fold") // bit-exact: same op order
  }

  test("null propagation") {
    GraftFunctions.register(spark)
    val r = Seq((Option.empty[Array[Float]], Array(1.0f)))
      .toDF("a", "b").selectExpr("l2sq_f32(a, b)").collect()
    assert(r.head.isNullAt(0))
  }
}
