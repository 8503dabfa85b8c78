package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Parity check for the two-stage PQ encode: the double-prefilter +
  * bounded-heap top-2 + decimal rescore must pick exactly the code a
  * FULL decimal argmin over all 16 codes picks, for every (vector,
  * subspace) in the driver fixture. This turns the "~1e-13 rounding
  * band" scaladoc assumption into a checked invariant — the expressions
  * here are written independently of the production path on purpose. */
class PqEncodeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("two-stage encode ≡ full-decimal argmin on the driver fixture") {
    assume(new java.io.File(dir).isDirectory, s"driver testdata absent at $dir")
    graft.functions.GraftFunctions.register(spark)
    val (enc, _) = Similarity.pqEncoded(spark, dir)
    // Independent brute force: explode subspaces, score ALL 16 codes
    // decimal-exact, argmin by (d2, c).
    val e = graft.Tables(spark, dir, "embeddings")
    val subs = e.select(col("vec_id"), posexplode(expr(
      "transform(sequence(0, 3), sp -> slice(embedding, sp * 16 + 1, 16))"))
      .as(Seq("s", "sv")))
    val cb = subs.filter(col("vec_id") < 16)
      .select(col("s"), col("vec_id").as("c"), col("sv").as("cv"))
    val d2 =
      """aggregate(zip_with(sv, cv, (x, y) ->
        |  CAST((CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
        |       * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) AS DECIMAL(38,12))),
        |  CAST(0 AS DECIMAL(38,12)),
        |  (acc, v) -> CAST(acc + v AS DECIMAL(38,12)))""".stripMargin
    val brute = subs.join(broadcast(cb), "s")
      .withColumn("d2", expr(d2))
      .groupBy(col("vec_id"), col("s"))
      .agg(min_by(col("c"), struct(col("d2"), col("c"))).as("c"))
    val got = enc.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exp = brute.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == exp, {
      val d = (got diff exp) ++ (exp diff got)
      s"two-stage and full-decimal argmin disagree on ${d.size} cells: ${d.take(5)}"
    })
  }
}
