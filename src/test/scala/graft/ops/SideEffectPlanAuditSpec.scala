package graft.ops

import graft.{PlanProbe, SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** The scale-killer sweep for the SIDE-EFFECTFUL tier — the ~20 queries
  * PlanAuditSpec must skip because their fn() executes work at
  * construction (streaming runs, index maintenance, source/sink round
  * trips). Those are exactly the heaviest queries in the bench record, so
  * "audited in prose" was a standing-guarantee gap: here the gates run
  * for real under [[PlanProbe]], which captures (a) every named batch
  * action's executedPlan via QueryExecutionListener — on the root session
  * AND the gates' child sessions — and (b) every finished streaming
  * query's last micro-batch IncrementalExecution, and the same three
  * asserts run over the ACTUAL executed plans. */
class SideEffectPlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def sideEffectful: Seq[graft.Q] = {
    val names = graft.streaming.StreamGate.all.map(_.name).toSet ++
      Set("q100_ann_incremental", "q232_ann_retrain",
        "q233_dedup_incremental_cluster", "q160_csv_rejects",
        "q161_jsonl_rejects", "q173_digest_sink", "q174_gen_stream",
        "q246_orc_roundtrip", "q255_countmin_audit", "q256_xml_rejects")
    SparkEntry.registry.filter(q => names(q.name))
  }

  /** Every plan node, descending into subqueries AND adaptive plans
    * (AdaptiveSparkPlanExec presents no children; its executed tree is
    * reached via the public executedPlan accessor). */
  private def flatten(p: SparkPlan): Seq[SparkPlan] =
    p.collectWithSubqueries { case q => q }.flatMap {
      case a: AdaptiveSparkPlanExec => (a: SparkPlan) +: flatten(a.executedPlan)
      case q => Seq(q)
    }

  /** One probed sweep shared by the asserts: run every side-effectful
    * gate with capture on, then wait for the async listener bus to drain
    * (QueryExecutionListener events are delivered off-thread — a count
    * poll beats a fixed sleep). */
  private lazy val captured: Seq[(String, SparkPlan)] = {
    assume(new java.io.File(dir).isDirectory, s"driver testdata absent at $dir")
    graft.functions.GraftFunctions.register(spark)
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, SparkPlan)]()
    PlanProbe.start((label, plan) => buf.add((label, plan)))
    PlanProbe.attach(spark, "root")
    try {
      sideEffectful.foreach { q =>
        val frame = q.fn(spark, dir)
        // The returned read-back frame is part of the query too.
        buf.add((s"${q.name}/result", frame.queryExecution.executedPlan))
        spark.catalog.clearCache()
      }
      var last = -1
      var stable = 0
      while (stable < 5) { // 5 × 100 ms of no new events = drained
        Thread.sleep(100)
        val n = buf.size
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
    } finally PlanProbe.stop()
    import scala.jdk.CollectionConverters._
    buf.asScala.toSeq
  }

  test("probe captures the whole tier (streaming micro-batches included)") {
    val labels = captured.map(_._1)
    assert(labels.size >= sideEffectful.size,
      s"expected at least one captured plan per gate, got ${labels.size}")
    assert(labels.exists(_.startsWith("stream/")),
      "no streaming micro-batch plans captured — the reflective " +
        "lastExecution unwrap broke (Spark internals moved?)")
    assert(labels.exists(_.startsWith("stream-child/")) ||
      labels.exists(_.startsWith("root/")),
      "no batch-action plans captured via QueryExecutionListener")
  }

  test("no CartesianProductExec in any executed side-effect plan") {
    val offenders = captured.collect {
      case (label, p) if flatten(p).exists(_.isInstanceOf[CartesianProductExec]) =>
        label
    }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.distinct}")
  }

  test("unpartitioned windows only where the input is a bounded reduction") {
    val withGlobal = captured.collect {
      case (label, p) if flatten(p).exists {
        case w: WindowExec => w.partitionSpec.isEmpty
        case _ => false
      } => label
    }.distinct.sorted
    // Allow-list of audited bounded-reduction global windows. Currently
    // EMPTY on purpose: no executed side-effect plan contains an
    // unpartitioned window at all (the IVF probes, crosstab pivot, and
    // sketch folds that LOOK global all partition or pre-reduce before
    // any window). When this assert ever fires, verify the new entry is
    // a bounded reduction (≤k rows feeding the window) and admit it here
    // with a one-line justification; the stale-entry assert below keeps
    // the list honest in the other direction.
    val audited: Set[String] = Set()
    val unexpected = withGlobal.filterNot(audited)
    assert(unexpected.isEmpty,
      s"NEW unpartitioned windows in executed side-effect plans " +
        s"(verify each is a bounded reduction, then admit): $unexpected")
    val stale = audited.filterNot(withGlobal.toSet)
    assert(stale.isEmpty, s"stale allow-list entries: $stale")
  }

  test("column pruning reaches every lineitem scan in executed plans") {
    val offenders = captured.collect {
      case (label, p) if flatten(p).exists {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.rootPaths.exists(_.toString.contains("lineitem")) &&
            s.requiredSchema.length >= 11
        case _ => false
      } => label
    }
    assert(offenders.isEmpty, s"unpruned lineitem scans in: ${offenders.distinct}")
  }
}
