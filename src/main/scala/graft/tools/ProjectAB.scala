package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B for the JL-projection stage (the 30× trainer wall in
  * BENCH_SCALING Part 11: the ×dims explode spills): exploded
  * crossJoin form vs the wide-aggregate form (dims conditional sums
  * per u, posexplode unpivot of the |V|-sized result). Arms
  * alternate in one JVM over the SAME pre-cut PPMI relation; an
  * equality probe runs last.
  *
  * Usage: java ... graft.tools.ProjectAB <dir> [gamma] [len] [arms]
  */
object ProjectAB {

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/scale1"
    val gamma = if (args.length > 1) args(1).toInt else 2
    val len = if (args.length > 2) args(2).toInt else 8
    val arms = (if (args.length > 3) args(3) else "x,w,x,w")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
        .appName("project-ab").master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.Tables(spark, dir)

    // same walk-corpus PPMI build as WalkScale/PpmiBucketAB
    val pair = t.lineitem
      .select(col("l_orderkey").as("o"), col("l_partkey").cast("long").as("p"))
      .distinct()
    val half = pair.as("a").join(pair.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("src"), col("b.p").as("dst"))
      .agg(count(lit(1)).as("cnt"))
    val weighted = graft.Checkpoints.cut(
      half.unionByName(half.select(col("dst").as("src"),
        col("src").as("dst"), col("cnt"))))
    val adj = graft.Checkpoints.cut(
      graft.graph.RandomWalks.rankedAdjacency(weighted))
    val seeds = weighted.select(col("src").as("node")).distinct()
      .select(col("node"),
        explode(expr(s"sequence(0, ${gamma - 1})")).as("w"))
      .select((col("node") * gamma + col("w")).as("walk_id"), col("node"))
    val walks = graft.Checkpoints.cut(
      graft.graph.RandomWalks.walkRows(seeds, adj, len))
    val ppmi = graft.Checkpoints.cut(graft.graph.NodeEmbeddings.ppmiRows(
      graft.graph.NodeEmbeddings.skipGramPairs(walks, 2)))
    println(s"== $dir ppmi_nnz=${ppmi.count()}")

    val d = graft.graph.NodeEmbeddings.Dims
    for ((a, i) <- arms.zipWithIndex) {
      val t0 = System.nanoTime()
      val n = (if (a == "x") graft.graph.NodeEmbeddings.project(ppmi, d)
        else graft.graph.NodeEmbeddings.projectWide(ppmi, d)).count()
      println(f"PROJ arm$i ${if (a == "x") "exploded" else "wide"}%-8s" +
        f" rows=$n%10d wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
      System.gc()
    }
    val e1 = graft.graph.NodeEmbeddings.project(ppmi, d)
    val e2 = graft.graph.NodeEmbeddings.projectWide(ppmi, d)
    val diff = e1.exceptAll(e2).count() + e2.exceptAll(e1).count()
    println(s"PROJ diff_rows=$diff")
    spark.stop()
  }
}
