package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The co-occurrence graph of SURVEY §1.1: parts co-purchased within
  * one order become edges — the LARGE graph of the test schema
  * (thousands of part nodes, 10⁵⁺ edges at sf0.1, vs the 25-node
  * trade graph), so the iterative algorithms have a real-sized input
  * (spec-exercised: CC + PageRank run on it unchanged).
  *
  * Scale shape of the builder: the pair join is keyed by order and
  * order sizes are bounded (≤7 lineitems in TPC-H-shaped data), so
  * pair generation is per-order local — linear in orders with a small
  * constant, never corpus-quadratic; one distinct dedups pairs across
  * orders. At 100 TB this is the classic market-basket edge derivation
  * (same shape as a shuffle-keyed self-join on basket id). */
object CoPurchase {

  /** Distinct undirected co-purchase edges (src < dst). */
  def edges(t: Tables): DataFrame = {
    val li = t.lineitem
      .select(col("l_orderkey").as("o"), col("l_partkey").cast("long").as("p"))
      .distinct()
    li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("src"), col("b.p").as("dst"))
      .distinct()
  }

  /** (nodes, edges) view for the iterative algorithms. */
  def graph(t: Tables): (DataFrame, DataFrame) =
    (t.part.select(col("p_partkey").cast("long").as("node")), edges(t))

  // ---------------------------------------------------------------- q61
  /** Top-20 parts by co-purchase degree (distinct partners) — the
    * market-basket "most connected product" analytics over the large
    * graph. Edges are distinct, so a plain count per endpoint IS the
    * distinct-partner count; the part dimension broadcasts. */
  def q61CopurchaseDegree(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val e = edges(t)
    val deg = e.select(col("src").as("p"))
      .union(e.select(col("dst").as("p")))
      .groupBy("p").agg(count(lit(1)).as("partners"))
    deg.join(broadcast(t.part.select(col("p_partkey"), col("p_name"))),
        col("p") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("partners"))
      .orderBy(col("partners").desc, col("p_partkey").asc)
      .limit(20)
  }

  // ---------------------------------------------------------------- q94
  /** Degree distribution of the co-purchase graph: how many nodes
    * have each degree (isolated parts included at degree 0) — the
    * structural profile (power-law check, hub census) read before
    * choosing skew strategies for the graph algorithms. Two partial
    * aggs: per-node degree, then nodes per degree — output height =
    * |distinct degrees| at any scale. */
  def q94DegreeDistribution(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val e = edges(t)
    val deg = e.select(col("src").as("p"))
      .union(e.select(col("dst").as("p")))
      .groupBy("p").agg(count(lit(1)).as("degree"))
    t.part.select(col("p_partkey").cast("long").as("p"))
      .join(deg, Seq("p"), "left")
      .select(coalesce(col("degree"), lit(0L)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
      .orderBy("degree")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q61_copurchase_degree" -> (q61CopurchaseDegree _),
    "q94_degree_distribution" -> (q94DegreeDistribution _),
  )

  val oracleSql: Map[String, String] = Map(
    "q61_copurchase_degree" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o,
        |              CAST(l_partkey AS BIGINT) AS p FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS src, b.p AS dst
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |d AS (SELECT p, CAST(count(*) AS BIGINT) AS partners FROM
        |        (SELECT src AS p FROM e UNION ALL SELECT dst FROM e)
        |      GROUP BY 1)
        |SELECT pt.p_partkey, pt.p_name, d.partners
        |FROM d JOIN part pt ON pt.p_partkey = d.p
        |ORDER BY partners DESC, p_partkey ASC
        |LIMIT 20""".stripMargin,

    "q94_degree_distribution" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o,
        |              CAST(l_partkey AS BIGINT) AS p FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS src, b.p AS dst
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |d AS (SELECT p, CAST(count(*) AS BIGINT) AS degree FROM
        |        (SELECT src AS p FROM e UNION ALL SELECT dst FROM e)
        |      GROUP BY 1)
        |SELECT COALESCE(d.degree, 0) AS degree,
        |       CAST(count(*) AS BIGINT) AS n_nodes
        |FROM part pt
        |LEFT JOIN d ON d.p = CAST(pt.p_partkey AS BIGINT)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
