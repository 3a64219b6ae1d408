package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Classic OLAP surface — the reporting shapes any analytics-engine
  * user expects on day one: hierarchy rollups, per-key moving-window
  * analytics, and pivoted cross-tabs.
  *
  * Scale shape: rollup is ONE pass — Spark expands GROUPING SETS via
  * Expand before the hash agg (no per-level re-scan); the moving
  * window shuffles once on the partition key and sorts within
  * partitions only; the pivot with an EXPLICIT value list is a single
  * conditional-agg pass (never the two-job distinct-discovery form —
  * at 100 TB an unbounded pivot column set is a bug, not a feature).
  * Money math stays DECIMAL inside aggregates (exact, order-free) and
  * surfaces as double, the library's q32/q77 convention. */
object Olap {

  // ---------------------------------------------------------------- q84
  /** Order revenue rolled up the region → nation hierarchy:
    * grand total, per-region, per-(region, nation) — with the
    * grouping bitmask so consumers can tell levels apart. */
  def q84Rollup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders.select(col("o_custkey"), col("o_totalprice"))
      .join(t.customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"),
        col("n_regionkey"))), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg((grouping(col("r_name")) * 2 + grouping(col("n_name")))
          .cast("long").as("lvl"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .select(col("r_name"), col("n_name"), col("lvl"), col("n_orders"),
        col("revenue"))
      .orderBy(col("lvl"), col("r_name"), col("n_name"))
  }

  // ---------------------------------------------------------------- q85
  /** Per-customer order history analytics: sequence number, cumulative
    * spend, and a 3-order moving total — one shuffle on the customer
    * key, in-partition sort, decimal-exact sums surfaced as double. */
  def q85MovingWindow(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val o = t.orders.select(col("o_custkey"), col("o_orderkey"),
      col("o_orderdate"), col("o_totalprice").cast("decimal(18,2)").as("p"))
    val byKey = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val cum = byKey.rowsBetween(Window.unboundedPreceding, 0)
    val last3 = byKey.rowsBetween(-2, 0)
    o.select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        row_number().over(byKey).cast("long").as("seq"),
        sum(col("p")).over(cum).cast("double").as("cum_spend"),
        sum(col("p")).over(last3).cast("double").as("last3_spend"))
      .orderBy("o_custkey", "seq")
  }

  // ---------------------------------------------------------------- q86
  /** Event-type cross-tab per user: the pivot with an EXPLICIT column
    * list — one conditional-agg pass, no distinct-discovery job. */
  val PivotTypes = Seq("click", "error", "purchase", "signup", "view")

  def q86Pivot(spark: SparkSession, dir: String): DataFrame = {
    val piv = Tables(spark, dir).events
      .groupBy("user_id")
      .pivot("event_type", PivotTypes)
      .agg(count(lit(1)))
    PivotTypes.foldLeft(piv) { (d, c) =>
      d.withColumn(c, coalesce(col(c), lit(0L)))
    }.orderBy("user_id")
  }

  // ---------------------------------------------------------------- q91
  /** Customer-LTV deciles: total spend per customer, `ntile(10)` over
    * the global spend order, then per-decile population and revenue —
    * the segmentation report behind "top decile drives X% of
    * revenue". The global ntile is a single total-order window: at
    * 100 TB swap in `approx_percentile`-derived cut points + a
    * broadcast bucket join (same output, no total sort); here the
    * exact form is the oracle-able entry. */
  def q91SpendDeciles(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val spend = t.orders
      .groupBy(col("o_custkey").as("cust"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"),
        count(lit(1)).as("n_orders"))
    val w = Window.orderBy(col("spend").desc, col("cust").asc)
    spend.withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("n_orders")).as("n_orders"),
        sum(col("spend")).cast("double").as("revenue"))
      .orderBy("decile")
  }

  // ---------------------------------------------------------------- q95
  /** Full CUBE over (status, priority): all four grouping sets —
    * per-cell, per-status, per-priority, grand total — in ONE pass
    * (Expand before the hash agg, like the rollup; the expansion
    * factor is the fixed grouping-set count, never data-dependent).
    * The grouping bitmask distinguishes levels; money stays decimal
    * inside the sum. */
  def q95Cube(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).orders
      .select(col("o_orderstatus"), col("o_orderpriority"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg((grouping(col("o_orderstatus")) * 2
          + grouping(col("o_orderpriority"))).cast("long").as("lvl"),
        count(lit(1)).as("n_orders"),
        sum(col("p")).cast("double").as("revenue"))
      .select(col("o_orderstatus"), col("o_orderpriority"), col("lvl"),
        col("n_orders"), col("revenue"))
      .orderBy(col("lvl"), col("o_orderstatus"), col("o_orderpriority"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q84_rollup" -> (q84Rollup _),
    "q85_moving_window" -> (q85MovingWindow _),
    "q86_pivot" -> (q86Pivot _),
    "q91_spend_deciles" -> (q91SpendDeciles _),
    "q95_cube" -> (q95Cube _),
  )

  val oracleSql: Map[String, String] = Map(
    "q84_rollup" ->
      """SELECT r.r_name, n.n_name,
        |       CAST(GROUPING(r.r_name) * 2 + GROUPING(n.n_name) AS BIGINT)
        |         AS lvl,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS revenue
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY ROLLUP (r.r_name, n.n_name)
        |ORDER BY lvl, r_name, n_name""".stripMargin,

    "q85_moving_window" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |       CAST(row_number() OVER w AS BIGINT) AS seq,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |            OVER (w ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_spend,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |            OVER (w ROWS 2 PRECEDING) AS DOUBLE) AS last3_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, seq""".stripMargin,

    "q91_spend_deciles" ->
      """WITH s AS (
        |  SELECT o_custkey AS cust,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend,
        |         CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1),
        |d AS (
        |  SELECT cust, spend, n_orders,
        |         CAST(ntile(10) OVER (ORDER BY spend DESC, cust ASC)
        |              AS BIGINT) AS decile
        |  FROM s)
        |SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(n_orders) AS BIGINT) AS n_orders,
        |       CAST(sum(spend) AS DOUBLE) AS revenue
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    "q95_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
        |            AS BIGINT) AS lvl,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS revenue
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY lvl, o_orderstatus, o_orderpriority""".stripMargin,

    "q86_pivot" ->
      """SELECT user_id,
        |       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
        |       CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
        |       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
        |       CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
        |       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
