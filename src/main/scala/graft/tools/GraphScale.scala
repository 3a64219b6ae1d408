package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling diagnostic for the ITERATIVE graph family on a large
  * derived graph (BENCH_SCALING.md part 3): the oracle-checked rows
  * run on the 25-node trade graph, so this measures the same library
  * functions — connected components, PageRank, k-core, label
  * propagation — on the co-purchase graph (20k nodes / 1.2M
  * undirected edges at sf0.1, 10× that at /tmp/sf1) where the
  * per-iteration join-agg cost and the round counts actually move.
  *
  * Usage: sbt "runMain graft.tools.GraphScale <sfDir>"
  */
object GraphScale {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
        .appName("graph-scale").master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.Tables(spark, dir)

    val e = graft.Checkpoints.cut(graft.graph.CoPurchase.edges(t))
    val und = graft.Checkpoints.cut(
      e.union(e.select(col("dst").as("src"), col("src").as("dst"))))
    val nodes = graft.Checkpoints.cut(
      t.part.select(col("p_partkey").cast("long").as("node")))
    println(s"== $dir nodes=${nodes.count()} undirected-edge-rows=${und.count()}")

    def timed(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val v = body
      println(f"GRAPH $name%-18s rows=$v%10d wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
      // NOTE: no releaseAll here — e/und/nodes cuts are shared across
      // the algorithms; each algorithm releases its own internal cuts
    }

    timed("cc") {
      graft.graph.Algorithms.connectedComponents(nodes, und).count()
    }
    timed("pagerank_5") {
      graft.graph.Algorithms.pagerank(nodes, e, 5).count()
    }
    timed("kcore_8") {
      graft.graph.Cores.kcore(nodes, und, 8).count()
    }
    timed("labelprop_5") {
      graft.graph.Cores.labelPropagation(nodes, und, 5).count()
    }
    spark.stop()
  }
}
