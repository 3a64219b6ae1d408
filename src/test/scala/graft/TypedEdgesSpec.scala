package graft

import org.apache.spark.sql.functions._
import graft.graph.TradeGraph
import graft.operators.TypedEdges

class TypedEdgesSpec extends SparkSpec {

  private val TypeNames =
    Set("DEPENDS_ON", "DEV_DEPENDS_ON", "PEER_DEPENDS_ON")

  test("typed trade edges partition the edge set, one type per rank") {
    val t = Tables(spark, sfDir())
    val typed = TradeGraph.typedEdges(t)
    assert(typed.count() == TradeGraph.edges(t).count())
    val types = typed.select("edge_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types.subsetOf(TypeNames))
    // rank is unique per src, so a src never repeats an edge type
    val dup = typed.groupBy("src", "edge_type")
      .count().filter(col("count") > 1).count()
    assert(dup == 0)
  }

  test("dependency edges cover every lineitem deterministically") {
    val t = Tables(spark, sfDir())
    val e = TypedEdges.depEdges(t)
    assert(e.count() == t.lineitem.count())
    val types = e.select("edge_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types == TypeNames)
    val once = e.groupBy("edge_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val twice = TypedEdges.depEdges(t).groupBy("edge_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(once == twice)
  }
}
