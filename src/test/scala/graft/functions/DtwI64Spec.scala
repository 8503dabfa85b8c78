package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DtwI64: codegen and interpreted paths agree with a recursive reference
  * on random integer sequences, and the degenerate shapes are right. */
class DtwI64Spec extends SparkSpec {

  /** Exponential-time textbook recurrence — the unimpeachable reference. */
  private def ref(a: Seq[Long], b: Seq[Long]): Long = {
    val memo = scala.collection.mutable.Map.empty[(Int, Int), Long]
    def d(i: Int, j: Int): Long =
      if (i == 0 && j == 0) 0L
      else if (i == 0 || j == 0) Long.MaxValue / 4
      else memo.getOrElseUpdate((i, j),
        math.abs(a(i - 1) - b(j - 1)) +
          math.min(d(i - 1, j), math.min(d(i, j - 1), d(i - 1, j - 1))))
    d(a.length, b.length)
  }

  test("codegen == interpreted == recursive reference on random sequences") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 40).map { i =>
      val n = 1 + rnd.nextInt(12)
      val m = 1 + rnd.nextInt(12)
      (i.toLong, Seq.fill(n)(rnd.nextInt(1000).toLong),
        Seq.fill(m)(rnd.nextInt(1000).toLong))
    }
    val df = rows.toDF("id", "a", "b")
    for (cg <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", cg)
      val got = df.select(col("id"), expr("dtw_i64(a, b)").as("d"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      rows.foreach { case (id, a, b) =>
        assert(got(id) == ref(a, b), s"id $id codegen=$cg")
      }
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("degenerate shapes: identical series -> 0; empty -> null") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Seq(5L, 9L, 2L), Seq(5L, 9L, 2L)),
      (2L, Seq.empty[Long], Seq(1L, 2L))).toDF("id", "a", "b")
    val rows = df.select(col("id"), expr("dtw_i64(a, b)").as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    assert(rows(1L).contains(0L))
    assert(rows(2L).isEmpty)
  }

  test("arrays containing null elements -> null, both eval paths") {
    GraftFunctions.register(spark)
    // Build containsNull=true arrays in SQL so the doc contract ("inputs
    // with nulls yield null") is exercised through the registered
    // function, not just the typed API.
    val q = """SELECT id,
              |       dtw_i64(a, b) AS d
              |FROM VALUES
              |  (1, array(1L, NULL, 3L), array(1L, 2L)),
              |  (2, array(1L, 2L), array(CAST(NULL AS BIGINT))),
              |  (3, array(1L, 2L), array(1L, 4L))
              |  AS t(id, a, b)""".stripMargin
    for (cg <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", cg)
      val rows = spark.sql(q).collect()
        .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None
          else Some(r.getLong(1)))).toMap
      assert(rows(1).isEmpty, s"null element left side, codegen=$cg")
      assert(rows(2).isEmpty, s"all-null right side, codegen=$cg")
      // dtw([1,2],[1,4]): |1-1| + |2-4| along the diagonal = 2
      assert(rows(3).contains(2L), s"clean row unaffected, codegen=$cg")
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
