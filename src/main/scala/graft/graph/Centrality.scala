package graft.graph

import scala.util.chaining._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Checkpoints, Tables}

/** Distance- and weight-based centrality — the "node rank /
  * centrality" family of the reference's analytics surface
  * (reference: documentation/queries.md:55-64 degree centrality,
  * 177-190 PageRank): harmonic (closeness-family) centrality and
  * weighted PageRank.
  *
  * Harmonic centrality needs the full distance distribution, which is
  * all-pairs BFS — O(V²) pairs, intrinsic to the definition, sane
  * only on small graphs. The 100 TB path is
  * [[HyperBall.harmonicEstimates]]: per-node HLL ball sizes at every
  * radius, harmonic ≈ Σ_t (|B(v,t)|−|B(v,t−1)|)/t with O(V·m) state —
  * the exact query here is the oracle-able entry, the sketch is the
  * scale deployment (agreement spec in HyperBallSpec).
  *
  * Weighted PageRank reuses [[Algorithms.pagerank]]'s join-agg
  * iteration with rank mass split by edge weight (lineitem counts)
  * instead of uniformly — same shuffle shape, same checkpoint
  * lifecycle, oracle unrolled the same way.
  */
object Centrality {

  // ---------------------------------------------------------------- q71
  /** Exact harmonic centrality over directed forward distances:
    * h(v) = Σ_{u ≠ v reachable} 1/d(v,u), plus the reachable count.
    * Nodes with no out-edges score 0. Sum rounded to 6dp (the
    * pagerank float-rounding contract). */
  def harmonic(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val e = edges.select("src", "dst").pipe(Checkpoints.cut)
    val sp = Algorithms.shortestPaths(e, None) // eager loop
    Checkpoints.release(e)
    val h = sp.filter(col("src") =!= col("dst"))
      .groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("n_reachable"),
        round(sum(lit(1.0) / col("hops")), 6).as("harmonic"))
    nodes.select("node")
      .join(h, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("n_reachable"), lit(0L)).as("n_reachable"),
        coalesce(col("harmonic"), lit(0.0)).as("harmonic"))
      .orderBy("node")
  }

  def q71HarmonicCentrality(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    harmonic(TradeGraph.nodes(t), TradeGraph.edges(t))
  }

  // ---------------------------------------------------------------- q72
  /** Weighted PageRank (GraphX semantics, rank mass ∝ edge weight):
    * r ← 0.15 + 0.85 · Σ_in r(src)·w/outw(src), fixed iterations,
    * 6dp. The per-iteration body is the [[Algorithms.pagerank]] plan
    * with the outdegree replaced by the out-weight sum. */
  def weightedPagerank(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    val outw = edges.groupBy(col("src").as("ow_node"))
      .agg(sum(col("cnt")).as("ow")).pipe(Checkpoints.cut)
    var ranks = nodes.select(col("node"), lit(1.0).as("r")).pipe(Checkpoints.cut)
    for (_ <- 1 to iters) {
      val prev = ranks
      ranks = nodes.select(col("node"))
        .join(edges.select(col("src"), col("dst"), col("cnt")),
          col("dst") === col("node"), "left")
        .join(prev.select(col("node").as("rn"), col("r")), col("rn") === col("src"), "left")
        .join(outw, col("ow_node") === col("src"), "left")
        .groupBy(col("node"))
        .agg((lit(0.15) + lit(0.85) *
          coalesce(sum(col("r") * col("cnt") / col("ow")), lit(0.0))).as("r"))
        .pipe(Checkpoints.cut)
      Checkpoints.release(prev)
    }
    Checkpoints.release(outw)
    ranks
  }

  val WprIters = 5

  def q72WeightedPagerank(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val e = TradeGraph.edges(t).pipe(Checkpoints.cut)
    val out = weightedPagerank(TradeGraph.nodes(t).select("node"), e, WprIters)
    Checkpoints.release(e)
    out.select(col("node"), round(col("r"), 6).as("pagerank"))
      .orderBy("node")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q71_harmonic_centrality" -> (q71HarmonicCentrality _),
    "q72_weighted_pagerank" -> (q72WeightedPagerank _),
  )

  private val T = TradeGraph.sqlCte

  /** Unrolled weighted-PageRank SQL r0..rN — [[Algorithms]]'
    * pagerankSql with out-weight in place of out-degree, identical
    * association order (r · cnt / ow) so the float math mirrors the
    * Spark plan exactly. */
  private def weightedPagerankSql(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |         0.15 + 0.85 * COALESCE(SUM(p.r * t.cnt / o.ow), 0.0) AS r
         |  FROM nodes n
         |  LEFT JOIN trade t ON t.dst = n.node
         |  LEFT JOIN r${i - 1} p ON p.node = t.src
         |  LEFT JOIN outw o ON o.node = t.src
         |  GROUP BY n.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $T,
       |nodes AS (SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation),
       |outw AS (SELECT src AS node, CAST(sum(cnt) AS BIGINT) AS ow
       |         FROM trade GROUP BY 1),
       |r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS r FROM nodes),
       |$steps
       |SELECT node, round(r, 6) AS pagerank FROM r$iters ORDER BY node""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    // all-pairs BFS distances (the q13 recursion, unfiltered seed),
    // then Σ 1/d per source; bound 25 = |V| caps any simple path
    "q71_harmonic_centrality" ->
      s"""WITH RECURSIVE $T,
         |sp AS (
         |  SELECT src, dst, CAST(1 AS BIGINT) AS hops FROM trade
         |  UNION
         |  SELECT s.src, t.dst, s.hops + 1 FROM sp s
         |  JOIN trade t ON t.src = s.dst WHERE s.hops < 25
         |),
         |d AS (SELECT src, dst, min(hops) AS hops FROM sp GROUP BY 1, 2),
         |h AS (
         |  SELECT src AS node, CAST(count(*) AS BIGINT) AS n_reachable,
         |         round(sum(1.0 / hops), 6) AS harmonic
         |  FROM d WHERE src <> dst GROUP BY 1)
         |SELECT CAST(n.n_nationkey AS BIGINT) AS node,
         |       CAST(COALESCE(h.n_reachable, 0) AS BIGINT) AS n_reachable,
         |       COALESCE(h.harmonic, 0.0) AS harmonic
         |FROM nation n
         |LEFT JOIN h ON h.node = CAST(n.n_nationkey AS BIGINT)
         |ORDER BY node""".stripMargin,

    "q72_weighted_pagerank" -> weightedPagerankSql(WprIters),
  )
}
