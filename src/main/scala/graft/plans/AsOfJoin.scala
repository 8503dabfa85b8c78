package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a first-class operator — the (c) tier of the extension
  * preference order (SURVEY §7.4): a custom `LogicalPlan` node, an optimizer
  * `Rule[LogicalPlan]`, a `SparkStrategy`, and a sort-merge physical
  * `SparkPlan`, registered through the public `spark.experimental` hooks.
  *
  * Semantics (backward as-of, DuckDB `ASOF LEFT JOIN` / pandas
  * `merge_asof`): for every left row, attach the single right row with equal
  * keys and the greatest right time ≤ the left time; left rows with no such
  * match keep nulls. Exactly one output row per left row. A null join key or
  * null time on either side never matches (SQL equi-join / DuckDB ASOF
  * semantics): null-key/null-time left rows emit right-side nulls, and such
  * right rows are never candidates.
  *
  * Why a custom operator: Spark has no native as-of join. The composed
  * rendering (union + last-value window, ops/Events.scala q24) is linear but
  * pays a union materialization and a window sort over the merged stream.
  * This node instead REQUIRES each child hash-clustered on its keys and
  * sorted (keys, time) — Catalyst's EnsureRequirements inserts (or reuses!)
  * the exchanges/sorts — and then streams both sides through a per-partition
  * two-pointer merge: O(|L| + |R|) time, O(1) state (one buffered right
  * row), no materialized union, no window buffer. At 100 TB: one shuffle per
  * side (skipped entirely if the sources are already bucketed by key), then
  * a single streaming pass.
  */
object AsOf {

  /** Backward as-of left join. Right-side columns are suffixed (default
    * "_r") so output names stay unambiguous for self-joins. Key and time
    * column types must match pairwise between the two sides — a
    * timestamp-vs-bigint mismatch would otherwise surface as wrong
    * comparisons deep inside the merge, so it fails fast here instead. */
  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightSuffix: String = "_r"): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = left.queryExecution.analyzed
    // Fresh aliases give the right side new exprIds (self-join safety) and
    // the disambiguating suffix in one step.
    val rAnalyzed = right.queryExecution.analyzed
    val rPlan = Project(
      rAnalyzed.output.map(a => Alias(a, a.name + rightSuffix)()), rAnalyzed)
    // Session-configured resolver (spark.sql.caseSensitive); ambiguous names
    // are an error rather than first-match-wins.
    val resolver = spark.sessionState.conf.resolver
    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.filter(a => resolver(a.name, name)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"as-of join: no column '$name' in [${plan.output.map(_.name).mkString(", ")}]")
        case many => throw new IllegalArgumentException(
          s"as-of join: ambiguous column '$name' matches [${many.map(_.name).mkString(", ")}]")
      }
    val lKeys = on.map(resolve(lPlan, _))
    val rKeys = on.map(n => resolve(rPlan, n + rightSuffix))
    val lTime = resolve(lPlan, leftTimeCol)
    val rTime = resolve(rPlan, rightTimeCol + rightSuffix)
    lKeys.zip(rKeys).foreach { case (l, r) =>
      if (l.dataType != r.dataType) throw new IllegalArgumentException(
        s"as-of join: key type mismatch: '${l.name}' is ${l.dataType.sql} " +
          s"but '${r.name}' is ${r.dataType.sql}")
    }
    if (lTime.dataType != rTime.dataType) throw new IllegalArgumentException(
      s"as-of join: time type mismatch: '${lTime.name}' is ${lTime.dataType.sql} " +
        s"but '${rTime.name}' is ${rTime.dataType.sql}")
    val node = AsOfJoin(lPlan, rPlan, lKeys, rKeys, lTime, rTime)
    org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, node)
  }

  /** Idempotently install the planner strategy + optimizer rule on a session
    * (the public runtime extension hooks; a packaged deployment would use
    * SparkSessionExtensions.injectPlannerStrategy/injectOptimizerRule). */
  def register(spark: SparkSession): Unit = synchronized {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
    if (!exp.extraOptimizations.contains(PushFilterThroughAsOfJoin))
      exp.extraOptimizations = exp.extraOptimizations :+ PushFilterThroughAsOfJoin
  }
}

/** Logical node. Output = left columns ++ right columns (right side made
  * nullable: unmatched left rows yield nulls). Built from analyzed children
  * with resolved attributes, so it is born resolved. */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Left-only predicates commute with the join (each left row maps to exactly
  * one output row with unchanged left-side values), so push them below —
  * they can then reach the parquet scan as PushedFilters. */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoin)
        if cond.references.subsetOf(aj.left.outputSet) &&
          cond.deterministic =>
      aj.copy(left = Filter(cond, aj.left))
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Sort-merge backward as-of join.
  *
  * Children are required hash-clustered on the join keys and sorted by
  * (keys…, time) ascending — the same contract as SortMergeJoinExec, so
  * EnsureRequirements plans the minimal exchanges and sorts (and elides
  * them when a child is already partitioned/sorted, e.g. bucketed tables).
  *
  * Per partition, a single forward merge: for each left row, the right
  * pointer advances while (rKeys, rTime) ≤ (lKeys, lTime) lexicographically
  * — every skipped row either matches a smaller key (can never match a
  * later left row, keys ascend) or is a better (later) as-of candidate for
  * the current key. The last advanced-over right row is the match iff its
  * keys equal the left row's. O(|L|+|R|) per partition, one buffered row.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys; val rk = rightKeys
    val lt = leftTime; val rt = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      // Separate projection instances — each owns its result buffer, so two
      // freshly projected rows may be compared without copying.
      val lktProj = UnsafeProjection.create(lk :+ lt, lOut)
      val rktProj = UnsafeProjection.create((rk: Seq[Expression]) :+ rt, rOut)
      val lkProj = UnsafeProjection.create(lk, lOut)
      val rkProj = UnsafeProjection.create((rk: Seq[Expression]), rOut)
      val ktOrd = RowOrdering.createNaturalAscendingOrdering((lk :+ lt).map(_.dataType))
      val kOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      // Bind against the nullable-adjusted schema (same exprIds/ordinals as
      // lOut ++ rOut): binding against the raw child outputs would mark the
      // right side non-nullable and elide the null checks the unmatched-row
      // path needs.
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val rBuf = rIt.buffered
      var lastR: InternalRow = null
      lIt.map { l =>
        val lkt = lktProj(l)
        if (lkt.anyNull) {
          // SQL equi-join semantics: a null key or null time never matches
          // (matches DuckDB ASOF). Null-first sort order puts these rows at
          // the partition head, so not advancing the right pointer is safe.
          outProj(joined(l, nullRight))
        } else {
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rkt = rktProj(rBuf.head)
            if (rkt.anyNull) {
              // Null key or null time can never match any left row — discard
              // without making it the buffered candidate.
              rBuf.next()
            } else if (ktOrd.compare(rkt, lkt) <= 0) {
              lastR = rBuf.next().copy()
            } else {
              advancing = false
            }
          }
          val matched = lastR != null && kOrd.compare(rkProj(lastR), lkProj(l)) == 0
          outProj(joined(l, if (matched) lastR else nullRight))
        }
      }
    }
  }
}
