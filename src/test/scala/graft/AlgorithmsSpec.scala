package graft

import org.apache.spark.sql.functions._
import graft.graph.{Algorithms, GraphxBridge, TradeGraph}

class AlgorithmsSpec extends SparkSpec {
  import spark.implicits._

  // cycle 1→2→3→1, spur 1→5, isolated 4
  private lazy val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("node")
  private lazy val edges =
    Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 5L)).toDF("src", "dst")
  private lazy val undirected = {
    val e = edges
    e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  test("transitive closure finds the cycle and the spur") {
    val reach = Algorithms.transitiveClosure(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reach.filter(_._1 == 1L).map(_._2) == Set(1L, 2L, 3L, 5L))
    assert(reach.filter(_._1 == 5L).isEmpty)
  }

  test("connected components: min-id per undirected component") {
    val comp = Algorithms.connectedComponents(nodes, undirected)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L, 4L -> 4L))
  }

  test("pagerank: no-in-edge nodes hold the base 0.15; iterates stably") {
    val pr = Algorithms.pagerank(nodes, edges, 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr(4L) - 0.15) < 1e-12)
    assert(pr.values.forall(_ >= 0.15 - 1e-12))
    assert(pr(1L) > pr(5L), "cycle member should outrank leaf")
  }

  test("GraphX bridge agrees with DataFrame connected components") {
    val g = GraphxBridge.toGraph(nodes, edges)
    val gx = GraphxBridge.connectedComponents(g)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val df = Algorithms.connectedComponents(nodes, undirected)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gx == df) // both use min-vertex-id as component label
  }

  test("GraphX label propagation produces a community per node") {
    val g = GraphxBridge.toGraph(nodes, edges)
    val lp = GraphxBridge.labelPropagation(g, 5).collect()
    assert(lp.length == 5)
  }

  test("trade graph: ≤3 out-edges per src, deterministic across runs") {
    val t = Tables(spark, sfDir())
    val e1 = TradeGraph.edges(t).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e2 = TradeGraph.edges(t).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e1 == e2)
    val outdeg = e1.groupBy(_._1).map(_._2.size)
    assert(outdeg.forall(_ <= 3))
  }
}
