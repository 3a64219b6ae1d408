package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Association-rule mining over order baskets — the market-basket
  * analysis (support / confidence / lift) that the co-purchase graph
  * (graph.CoPurchase) feeds in recommender pipelines.
  *
  * Scale shape: the (order, item) relation is one distinct pass; the
  * pair counts join baskets WITH THEMSELVES KEYED BY ORDER (basket
  * sizes are bounded → linear in orders, never corpus-quadratic —
  * the CoPurchase discipline); item supports are a partial agg
  * broadcast back; the order total is a one-row broadcast. All
  * metrics are ratios of exact integers, rounded 6dp in the same
  * association order on both engines. */
object Association {

  /** Minimum co-occurrence count for a reported rule — keeps the
    * output stable across scale factors (a pair seen once is noise). */
  val MinSupport = 3L
  val TopRules = 20

  /** Rules over a (o, item) basket relation (need not be distinct). */
  def rules(baskets: DataFrame, minSupport: Long, topK: Int): DataFrame = {
    val bi = baskets.select("o", "item").distinct()
    val nOrders = bi.select("o").distinct().agg(count(lit(1)).as("n_orders"))
    val itemN = bi.groupBy("item").agg(count(lit(1)).as("n_item"))
    val pairs = bi.as("x").join(bi.as("y"),
        col("x.o") === col("y.o") && col("x.item") < col("y.item"))
      .groupBy(col("x.item").as("a"), col("y.item").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(itemN.select(col("item").as("a"), col("n_item").as("n_a")), Seq("a"))
      .join(itemN.select(col("item").as("b"), col("n_item").as("n_b")), Seq("b"))
      .crossJoin(broadcast(nOrders))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        round(col("n_ab").cast("double") / col("n_a"), 6).as("conf_ab"),
        round(col("n_ab").cast("double") / col("n_b"), 6).as("conf_ba"),
        round(col("n_ab").cast("double") * col("n_orders")
          / (col("n_a") * col("n_b")), 6).as("lift"))
      .orderBy(col("lift").desc, col("a").asc, col("b").asc)
      .limit(topK)
  }

  def q89AssociationRules(spark: SparkSession, dir: String): DataFrame =
    rules(Tables(spark, dir).lineitem.select(col("l_orderkey").as("o"),
      col("l_partkey").cast("long").as("item")), MinSupport, TopRules)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q89_association_rules" -> (q89AssociationRules _),
  )

  val oracleSql: Map[String, String] = Map(
    "q89_association_rules" ->
      s"""WITH bi AS (
         |  SELECT DISTINCT l_orderkey AS o, CAST(l_partkey AS BIGINT) AS item
         |  FROM lineitem),
         |no AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM bi),
         |itn AS (SELECT item, CAST(count(*) AS BIGINT) AS n_item
         |        FROM bi GROUP BY 1),
         |p AS (
         |  SELECT x.item AS a, y.item AS b, CAST(count(*) AS BIGINT) AS n_ab
         |  FROM bi x JOIN bi y ON x.o = y.o AND x.item < y.item
         |  GROUP BY 1, 2
         |  HAVING count(*) >= $MinSupport)
         |SELECT p.a, p.b, p.n_ab, ia.n_item AS n_a, ib.n_item AS n_b,
         |       round(CAST(p.n_ab AS DOUBLE) / ia.n_item, 6) AS conf_ab,
         |       round(CAST(p.n_ab AS DOUBLE) / ib.n_item, 6) AS conf_ba,
         |       round(CAST(p.n_ab AS DOUBLE) * no.n_orders
         |             / (ia.n_item * ib.n_item), 6) AS lift
         |FROM p
         |JOIN itn ia ON ia.item = p.a
         |JOIN itn ib ON ib.item = p.b, no
         |ORDER BY lift DESC, a ASC, b ASC
         |LIMIT $TopRules""".stripMargin,
  )
}
