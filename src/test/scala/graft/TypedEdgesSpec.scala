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

  test("meta graph lists every schema relation with consistent counts") {
    val t = Tables(spark, sfDir())
    val rows = TypedEdges.q54MetaGraph(spark, sfDir()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toList
    assert(rows.map(_._2).toSet ==
      TypeNames ++ Set("OWNS", "HOSTED_ON"))
    val byType = rows.map(r => r._2 -> r._4).toMap
    assert(byType("OWNS") == t.orders.count())
    assert(TypeNames.map(byType).sum == t.lineitem.count())
    assert(byType("HOSTED_ON") ==
      t.lineitem.select("l_partkey", "l_suppkey").distinct().count())
    // labels follow the data-model mapping
    assert(rows.forall {
      case (_, "OWNS", dst, _) => dst == "GitRepo"
      case (_, "HOSTED_ON", dst, _) => dst == "GitRepo"
      case (_, _, dst, _) => dst == "NodeModule"
    })
  }
}
