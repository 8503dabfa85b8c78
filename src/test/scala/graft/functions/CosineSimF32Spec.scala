package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CosineSimF32Spec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)), // identical → 1.0
    (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)), // orthogonal → 0.0
    (Array(1.0f, 2.0f, 3.0f), Array(-1.0f, -2.0f, -3.0f)), // opposite → -1.0
    (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)) // zero norm → null
  ).toDF("a", "b")

  test("cosine_f32 matches analytic values (interpreted + codegen)") {
    GraftFunctions.register(spark)
    val out = df.select(expr("cosine_f32(a, b)").as("c")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(math.round(r.getDouble(0) * 1e9) / 1e9))
    assert(out.toSeq == Seq(Some(1.0), Some(0.0), Some(-1.0), None))
  }

  test("cosine_f32 agrees with the zip_with/aggregate double fold") {
    GraftFunctions.register(spark)
    val fold =
      """aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |  CAST(0 AS DOUBLE), (acc, v) -> acc + v) /
        |(sqrt(aggregate(zip_with(a, a, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)) *
        | sqrt(aggregate(zip_with(b, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)))""".stripMargin
    val rows = df.limit(3)
      .select(expr("cosine_f32(a, b)").as("native"), expr(fold).as("folded"))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
  }

  test("null inputs propagate") {
    GraftFunctions.register(spark)
    val n = Seq((Option.empty[Array[Float]], Some(Array(1.0f))))
      .toDF("a", "b")
      .select(expr("cosine_f32(a, b)").as("c")).collect()
    assert(n(0).isNullAt(0))
  }
}
