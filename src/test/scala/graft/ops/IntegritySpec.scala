package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-answer fixtures for the operational-integrity operators: the
  * foreign-key audit (q130) and CUSUM changepoint detection (q131). */
class IntegritySpec extends SparkSpec {
  import spark.implicits._

  test("q130 fk audit: planted orphan detected, clean legs stay clean") {
    val dir = java.nio.file.Files.createTempDirectory("fkaudit").toString
    Seq((1L, 5L), (2L, 6L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((5L, 1L), (6L, 1L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq(Tuple1(1L)).toDF("n_nationkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    // l_orderkey 97 trips the %97 corruption → remapped to 1000000097,
    // which no order has: exactly one orphan key carrying one row.
    Seq(1L, 1L, 2L, 97L).toDF("l_orderkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Snapshot.q130FkAudit.fn(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) -1L else r.getLong(5)))).toMap
    assert(got == Map(
      "lineitem.l_orderkey->orders" -> ((4L, 3L, 1L, 1L, 1000000097L)),
      "orders.o_custkey->customer" -> ((2L, 2L, 0L, 0L, -1L)),
      "customer.c_nationkey->nation" -> ((2L, 1L, 0L, 0L, -1L))))
  }

  test("q131 cusumOf: flat series stays quiet, step change flags its day") {
    def day(n: Int) = java.sql.Date.valueOf(f"2024-01-$n%02d")
    val d =
      ((1 to 10).map(i => ("flat", day(i), 10L)) ++
        (1 to 5).map(i => ("step", day(i), 0L)) ++
        (6 to 10).map(i => ("step", day(i), 100L)))
        .toDF("event_type", "day", "c")
    val got = Events.cusumOf(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDate(4).toString, r.getBoolean(5)))).toMap
    // flat: cum_k = 10k, dev = 10·10k − k·100 = 0 on every day.
    assert(got("flat") == ((10L, 100L, 0L, "2024-01-01", false)))
    // step: max |10·cum_k − 500k| at k=5 (cum=0): 2500; 2500·10 > 10·500.
    assert(got("step") == ((10L, 500L, 2500L, "2024-01-05", true)))
  }
}
