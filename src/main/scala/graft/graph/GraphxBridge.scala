package graft.graph

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** RDD/GraphX interop for the algorithms where Pregel is the proven
  * cluster-scale path (reference analytics surface:
  * documentation/queries.md PageRank / Louvain / SCC sections).
  *
  * The DataFrame implementations in [[Algorithms]] are the primary,
  * oracle-checked forms; this bridge exposes the same graphs to
  * GraphX's Pregel implementations (PageRank, connected components,
  * label propagation as the Louvain-family community detector, SCC)
  * for users who want RDD-level control. Label propagation is
  * nondeterministic on tie votes — spec-tested structurally, not
  * oracle-hashed (SURVEY §2.3 A7).
  */
object GraphxBridge {

  /** (node, name?) + (src, dst) DataFrames → GraphX graph. */
  def toGraph(nodes: DataFrame, edges: DataFrame): Graph[Long, Long] = {
    val vs: RDD[(VertexId, Long)] =
      nodes.select(col("node").cast("long")).rdd.map(r => (r.getLong(0), r.getLong(0)))
    val es: RDD[Edge[Long]] = edges
      .select(col("src").cast("long"), col("dst").cast("long")).rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), 1L))
    Graph(vs, es)
  }

  /** NOTE one semantic divergence from [[Algorithms.pagerank]]: GraphX
    * rescales the final ranks so their TOTAL equals the vertex count
    * (SPARK-18847 — rank mass absorbed by sinks is restored by one
    * global n/sum factor). On a sink-free graph the factor is exactly
    * 1 and the two paths agree per node; AlgorithmsSpec pins both
    * facts. */
  def pagerank(g: Graph[Long, Long], iters: Int): DataFrame = {
    val spark = SparkSession.active
    import spark.implicits._
    g.staticPageRank(iters).vertices.toDF("node", "pagerank")
  }

  def connectedComponents(g: Graph[Long, Long]): DataFrame = {
    val spark = SparkSession.active
    import spark.implicits._
    g.connectedComponents().vertices.map { case (v, c) => (v, c) }
      .toDF("node", "component")
  }

  def stronglyConnectedComponents(g: Graph[Long, Long], maxIters: Int): DataFrame = {
    val spark = SparkSession.active
    import spark.implicits._
    g.stronglyConnectedComponents(maxIters).vertices
      .map { case (v, c) => (v, c) }.toDF("node", "scc")
  }

  /** Community detection via label propagation (the scale path for
    * the reference's Louvain queries; nondeterministic tie-breaks). */
  def labelPropagation(g: Graph[Long, Long], iters: Int): DataFrame = {
    val spark = SparkSession.active
    import spark.implicits._
    org.apache.spark.graphx.lib.LabelPropagation.run(g, iters).vertices
      .map { case (v, c) => (v, c) }.toDF("node", "community")
  }
}
