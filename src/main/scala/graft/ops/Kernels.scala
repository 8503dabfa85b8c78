package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small shared plan kernels used across the query families. */
object Kernels {

  /** Level-CDF: given a LEVEL table (one row per distinct value with its
    * count), add the running cumulative count `cum` (value order) and the
    * grand total `n` — the exact-percentile readout the histogram /
    * median / tail-threshold consumers share (q43/q70/q173-style
    * `min(when(cum ≥ q·n, v))` follows).
    *
    * The single-partition windows here run over DISTINCT VALUE LEVELS —
    * bounded by construction at every call site — never over rows;
    * row-scale inputs must reduce to levels first, or take the q135
    * bucket-offset decomposition instead. Input columns are kept:
    * downstream projection pruning drops whatever a consumer doesn't
    * read. */
  def levelCdf(levels: DataFrame, valueCol: String, cntCol: String = "c"): DataFrame =
    levels.select(col(valueCol), col(cntCol),
      sum(col(cntCol)).over(Window.orderBy(col(valueCol))).as("cum"),
      sum(col(cntCol)).over(Window.partitionBy()).as("n"))
}
