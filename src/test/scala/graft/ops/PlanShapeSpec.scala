package graft.ops

import java.nio.file.Paths

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, RangePartitioning}
import org.scalatest.BeforeAndAfterAll

/** Encodes PLANS.md's single-Exchange claims for the session-3 interval
  * kernels as executable asserts (the MetricsSpec discipline): q139's one
  * user_id Exchange serving both window passes AND the island groupBy,
  * and q152's one bucket Exchange feeding all four carry windows with the
  * cross-bucket cascade confined to the ≤ #buckets summary. */
class PlanShapeSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val dir =
    Paths.get("target", "tmp", s"planshape-${System.nanoTime}").toAbsolutePath.toString

  override def beforeAll(): Unit = {
    super.beforeAll()
    val ns = (m: Long) => m * 60L * 1000000000L
    Seq((1L, ns(0), 1L, "click", 1.0, "{}"), (2L, ns(5), 1L, "view", 2.0, "{}"),
      (3L, ns(30), 1L, "click", 3.0, "{}"), (4L, ns(2), 2L, "view", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Seq((1L, "red bolt", 10.0), (2L, "blue gear", 25.5))
      .toDF("p_partkey", "p_name", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((1L, 12.0), (2L, 24.0)).toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, "a"), (2L, "b"), (700L, "c")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  /** Physical plan with Exchanges visible: EnsureRequirements only runs
    * in executedPlan, and AQE would wrap the tree — plan with it off. */
  private def planned(mk: => DataFrame): org.apache.spark.sql.execution.SparkPlan = {
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try mk.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }
  private def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Seq[ShuffleExchangeExec] =
    p.collect { case e: ShuffleExchangeExec => e }
  private def windows(p: org.apache.spark.sql.execution.SparkPlan): Seq[WindowExec] =
    p.collect { case w: WindowExec => w }

  test("q139: one user_id Exchange serves both windows AND the groupBy; only the sort repartitions") {
    val p = planned(Intervals.q139IntervalCoalesce.fn(spark, dir))
    val ex = shuffles(p)
    val hash = ex.filter(_.outputPartitioning.isInstanceOf[HashPartitioning])
    val range = ex.filter(_.outputPartitioning.isInstanceOf[RangePartitioning])
    assert(hash.length == 1,
      s"expected ONE hash Exchange (user_id, reused by windows + groupBy), got ${hash.length}:\n$p")
    assert(hash.head.outputPartitioning.asInstanceOf[HashPartitioning]
      .expressions.map(_.sql).exists(_.contains("user_id")),
      "the single hash Exchange must partition by user_id")
    assert(range.length == 1, "only the presentation sort may range-repartition")
    assert(windows(p).forall(_.partitionSpec.nonEmpty),
      "no unpartitioned window anywhere in q139")
  }

  test("q152: one bucket Exchange feeds all four carry windows; cascade confined to the summary") {
    val p = planned(Intervals.q152NearestJoin.fn(spark, dir))
    val winParted = windows(p).filter(_.partitionSpec.nonEmpty)
    val winGlobal = windows(p).filter(_.partitionSpec.isEmpty)
    // Four carries = two WindowExec nodes (prev pair shares the asc frame,
    // next pair the desc frame), both inside ONE Exchange(b).
    assert(winParted.length == 2,
      s"expected the 4 in-bucket carries in 2 partitioned WindowExec nodes, got ${winParted.length}:\n$p")
    // The only b-partitioned Exchange under the carry windows is the one
    // they share (the refs/probes level reductions shuffle on their own
    // keys below it — those are different, smaller distributions).
    val bExchanges = winParted.flatMap(_.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[HashPartitioning] &&
          e.outputPartitioning.asInstanceOf[HashPartitioning]
            .expressions.exists(_.sql == "b") => e
    }).distinct
    assert(bExchanges.length == 1,
      s"the in-bucket carry windows must share ONE Exchange(b), got ${bExchanges.length}:\n$p")
    // The cross-bucket cascade windows run over the per-bucket summary
    // (b, hi_ref, lo_ref) — never over the row-scale tagged union.
    assert(winGlobal.nonEmpty)
    winGlobal.foreach { w =>
      val cols = w.child.output.map(_.name).toSet
      assert(!cols.contains("tag") && !cols.contains("rk"),
        s"cascade window reads row-scale columns: $cols")
    }
    // The carries re-enter via broadcast, not another shuffle.
    val bcasts = p.collect { case b: BroadcastExchangeExec => b }
    assert(bcasts.length == 1,
      s"expected the summary to re-enter via ONE broadcast, got ${bcasts.length}")
  }

  test("q235: the recount joins broadcast candidates — no sort-merge join anywhere") {
    // PLANS.md's candidate-bounded claim as an assert: the only join in
    // the heavy-hitter pipeline is the ≤k-candidate broadcast equi-join;
    // a SortMergeJoin would mean the vocabulary-scale token stream is
    // being shuffled on gram, exactly the exchange the sketch exists to
    // avoid.
    graft.functions.GraftFunctions.register(spark)
    val p = planned(TextAnalysis.q235HeavyHitters.fn(spark, dir))
    val smj = p.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smj.isEmpty, s"vocabulary-scale shuffle join in q235:\n$p")
    val bhj = p.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(bhj.nonEmpty, "the candidate recount must be a broadcast hash join")
  }

  test("q150: global rank with no global sort — the offsets window reads only bucket counts") {
    val p = planned(Training.q150DenseIds.fn(spark, dir))
    val winGlobal = p.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(winGlobal.length == 1,
      s"expected exactly the offsets window unpartitioned, got ${winGlobal.length}:\n$p")
    val cols = winGlobal.head.child.output.map(_.name).toSet
    assert(!cols.contains("doc_id"),
      s"the offsets window must read per-bucket counts, not row-scale ids: $cols")
    // The rank window is partitioned (by bucket) and the offsets re-enter
    // via broadcast; the only range exchange is the presentation sort.
    assert(p.collect { case w: WindowExec if w.partitionSpec.nonEmpty => w }.nonEmpty)
    assert(p.collect { case b: BroadcastExchangeExec => b }.length == 1)
    val range = p.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[RangePartitioning] => e
    }
    assert(range.length == 1, "only the presentation sort may globally order")
  }
}
