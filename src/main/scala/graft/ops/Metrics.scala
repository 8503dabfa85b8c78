package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** A minimal semantic layer — metric definitions as DATA (name +
  * aggregate expression + row filter), compiled into a plan at query
  * time. The engine property worth having: N metrics over one table FUSE
  * into ONE scan — each definition becomes `agg FILTER (WHERE pred)` in
  * a single aggregate — instead of N dashboard queries rescanning 100 TB
  * N times. Adding a metric is a catalog row, not a new pipeline.
  */
object Metrics {

  /** One metric: SQL aggregate + SQL predicate (Spark dialect; 'true'
    * means unfiltered). */
  final case class MetricDef(name: String, agg: String, filter: String)

  val catalog: Seq[MetricDef] = Seq(
    MetricDef("n_buyers", "count(DISTINCT o_custkey)", "true"),
    MetricDef("n_orders", "count(1)", "true"),
    MetricDef("orders_1996", "count(1)", "year(o_orderdate) = 1996"),
    MetricDef("revenue_cents",
      "sum(CAST(round(o_totalprice * 100) AS BIGINT))", "true"),
    MetricDef("revenue_cents_urgent",
      "sum(CAST(round(o_totalprice * 100) AS BIGINT))",
      "o_orderpriority = '1-URGENT'"))

  /** Compile the catalog into one fused aggregate over `table`. */
  def compiled(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val aggs = catalog.map { m =>
      val e =
        if (m.filter == "true") m.agg
        else s"${m.agg} FILTER (WHERE ${m.filter})"
      expr(e).cast("long").as(m.name)
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(catalog.map(m => struct(
        lit(m.name).as("metric"), col(m.name).as("value"))): _*)).as("st"))
      .select(col("st.*"))
      .orderBy(col("metric"))
  }

  /** q200: the metrics layer under the gate — five catalog-defined
    * metrics (two filtered, one distinct) compiled to ONE orders scan;
    * the oracle hand-renders each definition, so gate equality proves
    * the compiler preserves every metric's semantics while fusing. */
  val q200MetricsLayer: Q = Q(
    "q200_metrics_layer",
    """WITH s AS (
      |  SELECT count(DISTINCT o_custkey) AS n_buyers,
      |         count(*) AS n_orders,
      |         count(*) FILTER (WHERE year(o_orderdate) = 1996) AS orders_1996,
      |         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS revenue_cents,
      |         sum(CAST(round(o_totalprice * 100) AS BIGINT))
      |           FILTER (WHERE o_orderpriority = '1-URGENT')
      |           AS revenue_cents_urgent
      |  FROM orders)
      |SELECT 'n_buyers' AS metric, CAST(n_buyers AS BIGINT) AS value FROM s
      |UNION ALL SELECT 'n_orders', CAST(n_orders AS BIGINT) FROM s
      |UNION ALL SELECT 'orders_1996', CAST(orders_1996 AS BIGINT) FROM s
      |UNION ALL SELECT 'revenue_cents', CAST(revenue_cents AS BIGINT) FROM s
      |UNION ALL SELECT 'revenue_cents_urgent', CAST(revenue_cents_urgent AS BIGINT) FROM s
      |ORDER BY metric""".stripMargin) { (s, dir) =>
    compiled(Tables(s, dir, "orders"))
  }

  val all: Seq[Q] = Seq(q200MetricsLayer)
}
