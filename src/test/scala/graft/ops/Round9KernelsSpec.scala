package graft.ops

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Random-data references for the round-9 session-3 kernels: the oracle
  * gate proves Spark ≡ DuckDB on the driver fixtures; these prove the
  * SEMANTICS against independent Scala implementations on seeded random
  * inputs the fixtures never exercise (duplicate names, gap-heavy
  * calendars, degenerate graphs). Fixture layout mirrors Tables'
  * `<dir>/<table>.parquet` contract.
  */
class Round9KernelsSpec extends SparkSpec {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q288 SNM: block-stitched ranks == the plain global-order pairing (random names)") {
    import spark.implicits._
    for (seed <- Seq(11, 42)) {
      val rnd = new scala.util.Random(seed)
      val words = Seq("cold", "small", "large", "blue", "red", "warm",
        "widget", "bolt", "rod", "gear", "cog", "pin")
      val names = Seq.fill(300)(
        s"${words(rnd.nextInt(6))} ${words(6 + rnd.nextInt(6))}")
      val dir = Files.createTempDirectory("graft-snm-").toString
      names.toDF("p_name").write.parquet(s"$dir/part.parquet")
      val got = Fuzzy.q288SortedNeighborhood.fn(spark, dir)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
      val distinct = names.distinct.sorted
      val want = (for {
        i <- distinct.indices; g <- 1 to 2; if i + g < distinct.length
        l = lev(distinct(i), distinct(i + g)); if l <= 3
      } yield (distinct(i), distinct(i + g), g.toLong, l.toLong)).sorted
      assert(got == want, s"seed $seed")
    }
  }

  test("q289 Theil-Sen: engine median slope == brute-force BigInt reference (gap-heavy calendar)") {
    import spark.implicits._
    for (seed <- Seq(7, 19)) {
      val rnd = new scala.util.Random(seed)
      // Gap-heavy: random days from a 40-day window, several missing.
      val rows = for {
        t <- Seq("a", "b"); _ <- 1 to 120
      } yield {
        val day = 19000L + rnd.nextInt(40)
        val sec = day * 86400L + rnd.nextInt(86400)
        (new Timestamp(sec * 1000L), t, rnd.nextInt(100000) / 100.0)
      }
      val dir = Files.createTempDirectory("graft-ts-").toString
      rows.toDF("ts", "event_type", "value").write.parquet(s"$dir/events.parquet")
      val got = Events.q289TheilSen.fn(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(3))).toMap
      val want = rows.groupBy(_._2).map { case (t, rs) =>
        val daily = rs.groupBy(r => r._1.getTime / 1000L / 86400L)
          .map { case (d, xs) => d -> xs.map(x => Math.round(x._3 * 100)).sum }
          .toSeq.sortBy(_._1)
        val slopes = (for {
          i <- daily.indices; j <- i + 1 until daily.length
          (d1, v1) = daily(i); (d2, v2) = daily(j)
        } yield {
          // BigInt./ truncates toward zero — the engines' semantics.
          val s = (BigInt(v2) - v1) * 1000000 / BigInt(d2 - d1)
          (s.toLong, d1, d2)
        }).sorted
        t -> slopes((slopes.length + 1) / 2 - 1)._1
      }
      assert(got == want, s"seed $seed")
    }
  }

  test("q292 k-core: engine peel == reference peel (random baskets)") {
    import spark.implicits._
    for (seed <- Seq(3, 23)) {
      val rnd = new scala.util.Random(seed)
      val baskets = (1 to 40).map(o =>
        o.toLong -> Seq.fill(2 + rnd.nextInt(4))(1L + rnd.nextInt(15)).distinct)
      val li = baskets.flatMap { case (o, ps) => ps.map(p => (o, p)) }
      val dir = Files.createTempDirectory("graft-kcore-").toString
      li.toDF("l_orderkey", "l_partkey").write.parquet(s"$dir/lineitem.parquet")
      val got = Graph.q292KCore.fn(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      // Reference: co-purchase edges (support >= 2), three peels.
      val pairs = baskets.flatMap { case (_, ps) =>
        for (a <- ps; b <- ps; if a < b) yield (a, b)
      }.groupBy(x => x).filter(_._2.size >= 2).keySet
      var edges = pairs.toSet
      val rounds = (1 to 3).map { _ =>
        val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (n, xs) => n -> xs.size }
        val surv = deg.filter(_._2 >= 3).keySet
        edges = edges.filter(e => surv(e._1) && surv(e._2))
        (surv.size.toLong, edges.size.toLong)
      }
      val conv = rounds(1)._1 == rounds(2)._1
      val want = rounds.zipWithIndex.map { case ((n, e), i) =>
        (i + 1L, n, e, conv)
      }
      assert(got.toSeq == want, s"seed $seed")
    }
  }

  test("q299 quantile normalize: engine deciles == sorted-array reference") {
    import spark.implicits._
    for (seed <- Seq(5, 31)) {
      val rnd = new scala.util.Random(seed)
      val rows = for (t <- Seq("x", "y", "z"); _ <- 1 to 150) yield {
        val sec = 1680000000L + rnd.nextInt(1000000)
        (1L, new Timestamp(sec * 1000L), 1L, t, rnd.nextInt(50000) / 100.0, "")
      }
      val dir = Files.createTempDirectory("graft-qn-").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val got = Extended.q299QuantileNormalize.fn(spark, dir)
        .collect().map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
        .toMap
      def decile(sorted: Seq[Long], d: Int): Long = {
        val n = sorted.length
        // smallest value whose cumulative count covers d/10 of the mass
        sorted(((d * n + 9) / 10) - 1)
      }
      val byType = rows.groupBy(_._4)
        .map { case (t, rs) => t -> rs.map(r => Math.round(r._5 * 100)).sorted }
      val pooled = rows.map(r => Math.round(r._5 * 100)).sorted
      for (t <- Seq("x", "y", "z"); d <- 1 to 10) {
        val w = (decile(byType(t), d), decile(pooled, d))
        assert(got((t, d.toLong)) == w, s"seed $seed type $t decile $d")
      }
    }
  }
}
