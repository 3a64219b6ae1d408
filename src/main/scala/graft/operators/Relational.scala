package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.graph.TradeGraph

/** Relational core — the reference's entity/property query surface
  * re-expressed as single-pass DataFrame plans.
  *
  * Reference mapping (rossanthony/github-miner):
  *  - q01/q02: documentation/queries.md "export properties" /
  *    GithubApiClient.ts search filters (stars/forks/pushed ranges) —
  *    projection + filters that Catalyst pushes into the parquet scan.
  *  - q03/q04: queries.md top-k degree queries ("most depended-upon
  *    modules", "users by repos owned").
  *  - q05–q10: queries.md label/relationship stats, self-loops,
  *    OPTIONAL MATCH hosted/not-hosted breakdown.
  *
  * All outputs carry explicit ORDER BY with a unique tie-break so the
  * driver's hash compare is order-stable across engines.
  */
object Relational {

  /** q01: property export — pure projection; ReadSchema in the scan
    * must contain only the 4 exported columns. */
  def q01PropertyExport(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).part
      .select("p_partkey", "p_name", "p_brand", "p_retailprice")
      .orderBy("p_partkey")

  /** q02: threshold filters (the miner's stars/forks/pushed-date
    * predicates) — all three predicates reach PushedFilters. */
  def q02ThresholdFilter(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .filter(col("o_totalprice") > 150000.0 &&
        col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") <  lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      .orderBy("o_orderkey")

  /** q03: top-k in-degree — "most depended-upon modules". Partial
    * aggregation (map-side combine) then a 10-row ordered limit; the
    * part dimension is broadcast. */
  def q03TopIndegree(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val deg = t.lineitem.groupBy("l_partkey")
      .agg(count(lit(1)).as("indegree"))
    deg.join(broadcast(t.part.select("p_partkey", "p_name")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("indegree"))
      .orderBy(col("indegree").desc, col("p_partkey").asc)
      .limit(10)
  }

  /** q04: owner degree — "users ranked by repos owned". */
  def q04OwnerDegree(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val deg = t.orders.groupBy("o_custkey").agg(count(lit(1)).as("repos"))
    deg.join(t.customer.select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("repos"))
      .orderBy(col("repos").desc, col("c_custkey").asc)
      .limit(10)
  }

  /** q05: degree centrality over the trade graph — two partial aggs
    * joined back to the (broadcast) node list; zero-degree nodes kept. */
  def q05DegreeCentrality(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val e = TradeGraph.edges(t)
    val outDeg = e.groupBy(col("src").as("node_o")).agg(count(lit(1)).as("out_deg"))
    val inDeg  = e.groupBy(col("dst").as("node_i")).agg(count(lit(1)).as("in_deg"))
    TradeGraph.nodes(t)
      .join(outDeg, col("node") === col("node_o"), "left")
      .join(inDeg, col("node") === col("node_i"), "left")
      .select(col("node"), col("n_name"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"))
      .withColumn("total_deg", col("in_deg") + col("out_deg"))
      .orderBy(col("total_deg").desc, col("node").asc)
  }

  /** q06: node counts by label — union-all of per-table counts (the
    * reference's `MATCH (n) RETURN labels(n), count(*)`). */
  def q06NodeCounts(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val labeled = Seq(
      "customer" -> t.customer, "nation" -> t.nation, "orders" -> t.orders,
      "part" -> t.part, "supplier" -> t.supplier)
    labeled.map { case (label, df) =>
      df.agg(count(lit(1)).as("n")).select(lit(label).as("label"), col("n"))
    }.reduce(_.union(_)).orderBy("label")
  }

  /** q07: edge counts by relationship type. HOSTED_ON is a distinct
    * (part,supplier) pair count — two-level agg, no collect_set. */
  def q07EdgeCounts(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val owns = t.orders.agg(count(lit(1)).as("n"))
      .select(lit("OWNS").as("edge_type"), col("n"))
    val depends = t.lineitem.agg(count(lit(1)).as("n"))
      .select(lit("DEPENDS_ON").as("edge_type"), col("n"))
    val hosted = t.lineitem.select("l_partkey", "l_suppkey").distinct()
      .agg(count(lit(1)).as("n"))
      .select(lit("HOSTED_ON").as("edge_type"), col("n"))
    val trade = TradeGraph.edges(t).agg(count(lit(1)).as("n"))
      .select(lit("TRADE").as("edge_type"), col("n"))
    owns.union(depends).union(hosted).union(trade).orderBy("edge_type")
  }

  /** q08: self-loops in the trade graph (the reference's "modules
    * depending on themselves"). */
  def q08SelfLoops(spark: SparkSession, dir: String): DataFrame =
    TradeGraph.edges(Tables(spark, dir))
      .filter(col("src") === col("dst"))
      .select("src", "cnt")
      .orderBy("src")

  /** q09: relationship-exists — parts supplied by any supplier in
    * nations 0–4, as a left-semi join (EXISTS). */
  def q09EdgeExists(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val edges = t.lineitem.select("l_partkey", "l_suppkey")
      .join(broadcast(t.supplier.filter(col("s_nationkey") < 5)
        .select("s_suppkey")), col("l_suppkey") === col("s_suppkey"))
      .select("l_partkey")
    t.part.join(edges, col("p_partkey") === col("l_partkey"), "left_semi")
      .select("p_partkey", "p_name")
      .orderBy("p_partkey")
  }

  /** q10: hosted / not-hosted breakdown (OPTIONAL MATCH + count):
    * parts with at least one lineitem vs parts never ordered —
    * left-semi + left-anti against the same edge relation. */
  def q10HostedBreakdown(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val li = t.lineitem.select("l_partkey")
    val hosted = t.part.join(li, col("p_partkey") === col("l_partkey"), "left_semi")
      .agg(count(lit(1)).as("n")).select(lit("hosted").as("status"), col("n"))
    val orphan = t.part.join(li, col("p_partkey") === col("l_partkey"), "left_anti")
      .agg(count(lit(1)).as("n")).select(lit("not_hosted").as("status"), col("n"))
    hosted.union(orphan).orderBy("status")
  }

  /** q42: undirected relationship-exists between two named entities
    * (the reference's `EXISTS((a)-[:DEV_DEPENDS_ON]-(b))` point check,
    * queries.md:192-196) for every pair of the first five nations —
    * the existence probe is a broadcast left join against the
    * deduplicated undirected edge set, emitted as 0/1. */
  def q42EdgeExistsPairs(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val und = TradeGraph.undirectedEdges(t)
    val ids = t.nation.filter(col("n_nationkey") < 5)
      .select(col("n_nationkey").cast("long").as("id"))
    val pairs = ids.as("x").join(ids.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
    pairs.join(und, col("a") === col("src") && col("b") === col("dst"), "left")
      .select(col("a"), col("b"),
        when(col("src").isNotNull, 1L).otherwise(0L).as("connected"))
      .orderBy("a", "b")
  }

  // ---------------------------------------------------------------- q62
  /** Per-nation top-5 order totals through the custom KEYED
    * [[graft.functions.TopKKeyedAgg]] Catalyst aggregate — the
    * partial-aggregating replacement for the window row_number
    * pattern: a window shuffles and sorts every group's full row set,
    * while the aggregate ships only k (total, order-id) pairs per
    * group per partition (map-side combine). The payload makes the
    * answer actionable: WHICH orders won, not just the winning
    * totals. Tie order (total desc, orderkey asc) matches the
    * oracle's window exactly. */
  def q62TopOrderTotals(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long").as("nation"),
        col("o_orderkey").cast("long").as("okey"),
        col("o_totalprice").cast("double").as("p"))
      .groupBy("nation")
      .agg(graft.functions.TopKAgg.topkKeyed(col("p"), col("okey"), 5)
        .as("tops"))
      .select(col("nation"), posexplode(col("tops")).as(Seq("pos", "t")))
      .select(col("nation"), (col("pos") + 1).cast("long").as("rank"),
        col("t.id").as("o_orderkey"), round(col("t.v"), 2).as("price"))
      .orderBy("nation", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q62_top_order_totals" -> (q62TopOrderTotals _),
    "q01_property_export" -> (q01PropertyExport _),
    "q42_edge_exists_pairs" -> (q42EdgeExistsPairs _),
    "q02_threshold_filter" -> (q02ThresholdFilter _),
    "q03_top_indegree" -> (q03TopIndegree _),
    "q04_owner_degree" -> (q04OwnerDegree _),
    "q05_degree_centrality" -> (q05DegreeCentrality _),
    "q06_node_counts" -> (q06NodeCounts _),
    "q07_edge_counts" -> (q07EdgeCounts _),
    "q08_self_loops" -> (q08SelfLoops _),
    "q09_edge_exists" -> (q09EdgeExists _),
    "q10_hosted_breakdown" -> (q10HostedBreakdown _),
  )

  private val T = TradeGraph.sqlCte

  val oracleSql: Map[String, String] = Map(
    "q62_top_order_totals" ->
      """WITH j AS (SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
        |                  CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
        |                  CAST(o.o_totalprice AS DOUBLE) AS p
        |           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |r AS (SELECT nation, o_orderkey, p,
        |        row_number() OVER (PARTITION BY nation
        |                           ORDER BY p DESC, o_orderkey ASC) AS rk
        |      FROM j)
        |SELECT nation, CAST(rk AS BIGINT) AS rank, o_orderkey,
        |       round(p, 2) AS price
        |FROM r WHERE rk <= 5 ORDER BY nation, rank""".stripMargin,

    "q42_edge_exists_pairs" ->
      s"""WITH $T, ${TradeGraph.sqlUndirectedCte},
         |ids AS (SELECT CAST(n_nationkey AS BIGINT) AS id FROM nation
         |        WHERE n_nationkey < 5)
         |SELECT x.id AS a, y.id AS b,
         |       CAST(CASE WHEN u.src IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         |         AS connected
         |FROM ids x JOIN ids y ON x.id < y.id
         |LEFT JOIN undirected u ON u.src = x.id AND u.dst = y.id
         |ORDER BY a, b""".stripMargin,

    "q01_property_export" ->
      """SELECT p_partkey, p_name, p_brand, p_retailprice
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q02_threshold_filter" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        |FROM orders
        |WHERE o_totalprice > 150000.0
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |ORDER BY o_orderkey""".stripMargin,

    "q03_top_indegree" ->
      """SELECT p.p_partkey, p.p_name, CAST(count(*) AS BIGINT) AS indegree
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY 1, 2
        |ORDER BY indegree DESC, p_partkey ASC
        |LIMIT 10""".stripMargin,

    "q04_owner_degree" ->
      """SELECT c.c_custkey, c.c_name, CAST(count(*) AS BIGINT) AS repos
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1, 2
        |ORDER BY repos DESC, c_custkey ASC
        |LIMIT 10""".stripMargin,

    "q05_degree_centrality" ->
      s"""WITH $T,
         |outd AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS out_deg
         |         FROM trade GROUP BY 1),
         |ind AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS in_deg
         |        FROM trade GROUP BY 1)
         |SELECT CAST(n.n_nationkey AS BIGINT) AS node, n.n_name,
         |       COALESCE(i.in_deg, 0) AS in_deg,
         |       COALESCE(o.out_deg, 0) AS out_deg,
         |       COALESCE(i.in_deg, 0) + COALESCE(o.out_deg, 0) AS total_deg
         |FROM nation n
         |LEFT JOIN outd o ON CAST(n.n_nationkey AS BIGINT) = o.node
         |LEFT JOIN ind i ON CAST(n.n_nationkey AS BIGINT) = i.node
         |ORDER BY total_deg DESC, node ASC""".stripMargin,

    "q06_node_counts" ->
      """SELECT 'customer' AS label, CAST(count(*) AS BIGINT) AS n FROM customer
        |UNION ALL SELECT 'nation', CAST(count(*) AS BIGINT) FROM nation
        |UNION ALL SELECT 'orders', CAST(count(*) AS BIGINT) FROM orders
        |UNION ALL SELECT 'part', CAST(count(*) AS BIGINT) FROM part
        |UNION ALL SELECT 'supplier', CAST(count(*) AS BIGINT) FROM supplier
        |ORDER BY label""".stripMargin,

    "q07_edge_counts" ->
      s"""WITH $T
         |SELECT 'OWNS' AS edge_type, CAST(count(*) AS BIGINT) AS n FROM orders
         |UNION ALL SELECT 'DEPENDS_ON', CAST(count(*) AS BIGINT) FROM lineitem
         |UNION ALL SELECT 'HOSTED_ON', CAST(count(*) AS BIGINT) FROM
         |  (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) h
         |UNION ALL SELECT 'TRADE', CAST(count(*) AS BIGINT) FROM trade
         |ORDER BY edge_type""".stripMargin,

    "q08_self_loops" ->
      s"""WITH $T
         |SELECT src, cnt FROM trade WHERE src = dst ORDER BY src""".stripMargin,

    "q09_edge_exists" ->
      """SELECT p_partkey, p_name FROM part p
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE s.s_nationkey < 5 AND l.l_partkey = p.p_partkey)
        |ORDER BY p_partkey""".stripMargin,

    "q10_hosted_breakdown" ->
      """SELECT 'hosted' AS status, CAST(count(*) AS BIGINT) AS n FROM part p
        |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
        |UNION ALL
        |SELECT 'not_hosted', CAST(count(*) AS BIGINT) FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
        |ORDER BY status""".stripMargin,
  )
}
