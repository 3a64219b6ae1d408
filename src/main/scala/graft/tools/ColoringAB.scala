package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B diagnostic for the q136 coloring strategies on the REAL test
  * graphs: Jones–Plassmann waves vs the MIS-per-color-class fallback
  * (`graph/Cores.scala`). Prints wall time, iteration depth, and
  * color count per strategy per graph so the routing threshold in
  * `Cores.coloringAuto` is justified by measurement, not argument.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.ColoringAB"
  */
object ColoringAB {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.Tables.configure(SparkSession.builder()
        .appName("coloring-ab").master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.Tables(spark, dir)

    val trade = (graft.graph.TradeGraph.nodes(t).select("node"),
      graft.graph.TradeGraph.undirectedEdges(t)
        .filter(col("src") =!= col("dst")), "trade")
    val cop = {
      val e = graft.graph.CoPurchase.edges(t) // (src, dst), src < dst
      val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      (und.select(col("src").as("node")).distinct(), und, "copurchase")
    }

    for ((nodes, und, name) <- Seq(trade, cop)) {
      val v = nodes.count(); val e = und.count()
      println(s"== $name: |V|=$v |E_dir|=$e avgDeg=${e.toDouble / v}")
      for ((label, run) <- Seq(
        "jp" -> (() => graft.graph.Cores.greedyColoring(nodes, und)),
        "mis" -> (() => graft.graph.Cores.misColoring(nodes, und)))) {
        val t0 = System.nanoTime()
        val out = run().agg(max("wave").as("depth"),
          countDistinct("color").as("colors"), count(lit(1)).as("n")).collect()(0)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"  $label%-4s depth=${out.getLong(0)}%4d colors=${out.getLong(1)}%4d nodes=${out.getLong(2)} wall=$sec%.1fs")
      }
    }
    spark.stop()
  }
}
