package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import scala.collection.mutable

import org.apache.spark.sql.functions._
import graft.graph.NodeEmbeddings

class NodeEmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  /** The operator's projection sign, recomputed scalar-side: parity
    * of the first 15 md5 hex nibbles of "context:dim". */
  private def signOf(v: Long, dim: Long): Int = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$v:$dim".getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(15)
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1 else -1
  }

  private val Half = BigDecimal.RoundingMode.HALF_UP

  test("pipeline matches a scalar PPMI+projection reference on a designed corpus") {
    val corpus = Seq(
      (1L, Seq(10L, 11L, 12L, 10L, 13L)),
      (2L, Seq(11L, 10L, 13L)),
      (3L, Seq(12L, 12L, 10L)))
    val walks = corpus.flatMap { case (id, ns) =>
      ns.zipWithIndex.map { case (n, s) => (id, s.toLong, n) }
    }.toDF("walk_id", "step", "node")
    val dims = 4
    val window = 2

    val got = NodeEmbeddings.project(
      NodeEmbeddings.ppmiRows(NodeEmbeddings.skipGramPairs(walks, window)),
      dims)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // scalar reference of the same contract
    val pairs = mutable.Map[(Long, Long), Long]()
    for ((_, ns) <- corpus; i <- ns.indices; j <- ns.indices
         if i != j && math.abs(i - j) <= window)
      pairs((ns(i), ns(j))) = pairs.getOrElse((ns(i), ns(j)), 0L) + 1L
    val nU = pairs.groupBy(_._1._1).map { case (u, m) => u -> m.values.sum }
    val dTot = pairs.values.sum
    val ppmi = pairs.flatMap { case ((u, v), n) =>
      val x = math.max(0.0,
        math.log(n.toDouble * dTot / (nU(u).toDouble * nU(v))))
      val r = BigDecimal(x).setScale(6, Half)
      if (r > 0) Some(((u, v), r)) else None
    }
    val e = mutable.Map[(Long, Long), BigDecimal]()
    for (((u, v), p) <- ppmi; dim <- 0L until dims.toLong)
      e((u, dim)) = e.getOrElse((u, dim), BigDecimal(0)) + p * signOf(v, dim)
    val norm = e.groupBy(_._1._1).map { case (u, m) =>
      u -> math.sqrt(m.values.map(x => (x * x).toDouble).sum)
    }
    val want = e.map { case ((u, dim), x) =>
      val out = if (norm(u) == 0) 0.0
        else BigDecimal(x.toDouble / norm(u)).setScale(6, Half).toDouble
      (u, dim, out)
    }.toSet

    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q223 rows are unit-norm per node across all dims") {
    val rows = NodeEmbeddings.q223NodeEmbeddings(spark, sfDir())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    val byNode = rows.groupBy(_._1)
    for ((n, rs) <- byNode) {
      assert(rs.length == NodeEmbeddings.Dims, s"node $n dim count")
      val sq = rs.map(r => r._3 * r._3).sum
      assert(sq == 0.0 || math.abs(sq - 1.0) < 1e-4, s"node $n norm² $sq")
    }
  }

  test("output is invariant to the input partitioning (DECIMAL sums)") {
    val t = Tables(spark, sfDir())
    val seeds = t.nation
      .select(col("n_nationkey").cast("long").as("node"))
      .select(col("node"),
        explode(expr(s"sequence(0, ${graft.graph.RandomWalks.WalksPerNode - 1})"))
          .as("w"))
      .select(
        (col("node") * graft.graph.RandomWalks.WalksPerNode + col("w"))
          .as("walk_id"),
        col("node"))
    val walks = graft.graph.RandomWalks.walkRows(
      seeds, graft.graph.RandomWalks.adjacency(t),
      graft.graph.RandomWalks.WalkLen)
    def run(parts: Int) = NodeEmbeddings.project(
      NodeEmbeddings.ppmiRows(NodeEmbeddings.skipGramPairs(
        walks.repartition(parts), NodeEmbeddings.CtxWindow)),
      NodeEmbeddings.Dims)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run(1) == run(7))
  }
}
