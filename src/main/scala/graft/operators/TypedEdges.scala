package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.graph.TradeGraph

/** Per-edge-type graph analytics — the reference's typed relationship
  * queries re-expressed over two deterministic typed edge relations:
  *
  *  - repo→module dependency edges: every lineitem is an edge whose
  *    type derives from the line number (the stand-in for
  *    InsertDataHelper.ts mapping dependencies / devDependencies /
  *    peerDependencies to DEPENDS_ON / DEV_DEPENDS_ON /
  *    PEER_DEPENDS_ON);
  *  - the typed trade graph ([[TradeGraph.typedEdges]]): partner rank
  *    → dependency type.
  *
  * Reference queries covered: top-10 dev-dependencies
  * (documentation/queries.md:219-224), self-dev-loops
  * (queries.md:226-229), and the dependedOnBy breakdown per edge type
  * (queries.md:270-278).
  *
  * Scale notes: the typed-edge derivation is a pure projection (no
  * shuffle, type is in-row math on the line number); the per-type
  * aggregations are partial-agg friendly; the distinct-depender counts
  * in q36 use conditional count-distinct (one Expand of ×3, resolved
  * by two-level hash aggregation — no collect_set).
  */
object TypedEdges {

  /** (repo, module, edge_type) typed dependency edges. */
  def depEdges(t: Tables): DataFrame =
    t.lineitem.select(
      col("l_orderkey").cast("long").as("repo"),
      col("l_partkey").cast("long").as("module"),
      when(col("l_linenumber").cast("long") % 3 === 0, "DEPENDS_ON")
        .when(col("l_linenumber").cast("long") % 3 === 1, "DEV_DEPENDS_ON")
        .otherwise("PEER_DEPENDS_ON").as("edge_type"))

  private val depEdgesSql =
    """e AS (
      |  SELECT CAST(l_orderkey AS BIGINT) AS repo,
      |         CAST(l_partkey AS BIGINT) AS module,
      |         CASE CAST(l_linenumber AS BIGINT) % 3
      |              WHEN 0 THEN 'DEPENDS_ON'
      |              WHEN 1 THEN 'DEV_DEPENDS_ON'
      |              ELSE 'PEER_DEPENDS_ON' END AS edge_type
      |  FROM lineitem
      |)""".stripMargin

  // ---------------------------------------------------------------- q34
  /** Top-10 modules by DEV_DEPENDS_ON in-degree (the reference's
    * "top-10 devDependencies" — queries.md:219-224). The type filter
    * prunes before the aggregate; part names join on the broadcast
    * dimension. */
  def q34TopDevDependencies(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    depEdges(t).filter(col("edge_type") === "DEV_DEPENDS_ON")
      .groupBy("module").agg(count(lit(1)).as("n_dev_deps"))
      .join(broadcast(t.part.select("p_partkey", "p_name")),
        col("module") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("n_dev_deps"))
      .orderBy(col("n_dev_deps").desc, col("p_partkey").asc)
      .limit(10)
  }

  // ---------------------------------------------------------------- q35
  /** Self-loops per edge type on the typed trade graph (the
    * reference's "modules that devDepend on themselves" —
    * queries.md:226-229, widened to all types so the result is
    * non-empty at every scale factor). */
  def q35SelfDevLoops(spark: SparkSession, dir: String): DataFrame =
    TradeGraph.typedEdges(Tables(spark, dir))
      .filter(col("src") === col("dst"))
      .select(col("src"), col("edge_type"), col("cnt"))
      .orderBy("src")

  // ---------------------------------------------------------------- q36
  /** dependedOnBy breakdown: for each module, how many distinct repos
    * depend on it through each edge type (queries.md:270-278), top-10
    * by total. */
  def q36DependedBreakdown(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def cd(tp: String) =
      countDistinct(when(col("edge_type") === tp, col("repo")))
    depEdges(t)
      .groupBy("module")
      .agg(cd("DEPENDS_ON").as("n_dep_repos"),
        cd("DEV_DEPENDS_ON").as("n_dev_repos"),
        cd("PEER_DEPENDS_ON").as("n_peer_repos"))
      .withColumn("n_total",
        col("n_dep_repos") + col("n_dev_repos") + col("n_peer_repos"))
      .join(broadcast(t.part.select("p_partkey", "p_name")),
        col("module") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("n_dep_repos"),
        col("n_dev_repos"), col("n_peer_repos"), col("n_total"))
      .orderBy(col("n_total").desc, col("p_partkey").asc)
      .limit(10)
  }

  // ---------------------------------------------------------------- q54
  /** Schema meta-graph — the reference's `CALL apoc.meta.graph()`
    * (documentation/queries.md:3): one row per (src_label, edge_type,
    * dst_label) relation in the data model with its edge count. Each
    * relation is a single partial-agg count (HOSTED_ON dedups the
    * (module, host) pair with a two-level agg first); the union is
    * |schema| rows, driver-safe at any corpus size. */
  def q54MetaGraph(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val owns = t.orders.agg(count(lit(1)).as("n_edges"))
      .select(lit("GitUser").as("src_label"), lit("OWNS").as("edge_type"),
        lit("GitRepo").as("dst_label"), col("n_edges"))
    val deps = depEdges(t)
      .groupBy("edge_type").agg(count(lit(1)).as("n_edges"))
      .select(lit("GitRepo").as("src_label"), col("edge_type"),
        lit("NodeModule").as("dst_label"), col("n_edges"))
    val hosted = t.lineitem.select("l_partkey", "l_suppkey").distinct()
      .agg(count(lit(1)).as("n_edges"))
      .select(lit("NodeModule").as("src_label"),
        lit("HOSTED_ON").as("edge_type"),
        lit("GitRepo").as("dst_label"), col("n_edges"))
    owns.unionByName(deps).unionByName(hosted).orderBy("edge_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_top_dev_dependencies" -> (q34TopDevDependencies _),
    "q35_self_dev_loops" -> (q35SelfDevLoops _),
    "q36_depended_breakdown" -> (q36DependedBreakdown _),
    "q54_meta_graph" -> (q54MetaGraph _),
  )

  val oracleSql: Map[String, String] = Map(
    "q34_top_dev_dependencies" ->
      s"""WITH $depEdgesSql
         |SELECT p.p_partkey, p.p_name, CAST(count(*) AS BIGINT) AS n_dev_deps
         |FROM e JOIN part p ON e.module = p.p_partkey
         |WHERE e.edge_type = 'DEV_DEPENDS_ON'
         |GROUP BY 1, 2
         |ORDER BY n_dev_deps DESC, p_partkey ASC
         |LIMIT 10""".stripMargin,

    "q35_self_dev_loops" ->
      s"""WITH ${TradeGraph.sqlCte}, ${TradeGraph.sqlTypedCte}
         |SELECT src, edge_type, cnt FROM typed
         |WHERE src = dst ORDER BY src""".stripMargin,

    "q36_depended_breakdown" ->
      s"""WITH $depEdgesSql,
         |agg AS (
         |  SELECT module,
         |    CAST(count(DISTINCT CASE WHEN edge_type = 'DEPENDS_ON'
         |         THEN repo END) AS BIGINT) AS n_dep_repos,
         |    CAST(count(DISTINCT CASE WHEN edge_type = 'DEV_DEPENDS_ON'
         |         THEN repo END) AS BIGINT) AS n_dev_repos,
         |    CAST(count(DISTINCT CASE WHEN edge_type = 'PEER_DEPENDS_ON'
         |         THEN repo END) AS BIGINT) AS n_peer_repos
         |  FROM e GROUP BY 1)
         |SELECT p.p_partkey, p.p_name, a.n_dep_repos, a.n_dev_repos,
         |       a.n_peer_repos,
         |       a.n_dep_repos + a.n_dev_repos + a.n_peer_repos AS n_total
         |FROM agg a JOIN part p ON a.module = p.p_partkey
         |ORDER BY n_total DESC, p_partkey ASC
         |LIMIT 10""".stripMargin,

    "q54_meta_graph" ->
      s"""WITH $depEdgesSql
         |SELECT * FROM (
         |  SELECT 'GitUser' AS src_label, 'OWNS' AS edge_type,
         |         'GitRepo' AS dst_label, CAST(count(*) AS BIGINT) AS n_edges
         |  FROM orders
         |  UNION ALL
         |  SELECT 'GitRepo', edge_type, 'NodeModule',
         |         CAST(count(*) AS BIGINT)
         |  FROM e GROUP BY edge_type
         |  UNION ALL
         |  SELECT 'NodeModule', 'HOSTED_ON', 'GitRepo',
         |         CAST(count(*) AS BIGINT)
         |  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
         |) ORDER BY edge_type""".stripMargin,
  )
}
