package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-stage wall profile of the q229 pipeline (VERDICT r9 task #8:
  * q229 is the suite's #2 wall at ~20 s — say WHERE the time goes).
  * Stages are isolated with eager cuts so each timer measures one
  * stage's work, not its lineage; the end-to-end q228/q229 walls are
  * printed alongside for reconciliation.
  *
  * Usage: java ... graft.tools.Prod2VecProfile [sfDir]
  */
object Prod2VecProfile {

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
        .appName("prod2vec-profile").master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.Tables(spark, dir)

    def timed(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val v = body
      println(f"P2V $name%-18s rows=$v%10d wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    def timedCut(name: String)(body: => DataFrame): DataFrame = {
      var out: DataFrame = null
      timed(name) { out = graft.Checkpoints.cut(body); out.count() }
      out
    }

    // ---- trainer, stage by stage (the q228 chain)
    val pairs = timedCut("basket_pairs")(graft.sim.Prod2Vec.basketPairs(t))
    val ppmi = timedCut("ppmi_rows")(
      graft.graph.NodeEmbeddings.ppmiRows(pairs, cutInput = false))
    val emb = timedCut("project")(
      graft.graph.NodeEmbeddings.project(ppmi, graft.graph.NodeEmbeddings.Dims))

    // ---- audit, stage by stage (the q229 tail over a cut table)
    val rep = timedCut("repeat_edges")(
      graft.graph.CoPurchase.repeatEdges(t, graft.graph.CoPurchase.TriMinSupport))
    val sym = rep.unionByName(
      rep.select(col("dst").as("src"), col("src").as("dst")))
    val scored = timedCut("scored_sampled")(
      graft.graph.NodeEmbeddings.scoredSampledPairs(emb, sym,
        graft.sim.Prod2Vec.NegK))
    timed("auc_report")(
      graft.graph.NodeEmbeddings.aucReport(scored).count())

    // ---- end-to-end walls as the suite sees them (each re-trains)
    graft.Checkpoints.releaseAll(spark)
    timed("q228_end_to_end")(
      graft.sim.Prod2Vec.q228Prod2vec(spark, dir).count())
    graft.Checkpoints.releaseAll(spark)
    timed("q229_end_to_end")(
      graft.sim.Prod2Vec.q229Prod2vecLinkAuc(spark, dir).count())

    spark.stop()
  }
}
