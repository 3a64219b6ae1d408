package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling diagnostic for the walk-sampling + embedding-training
  * family (A38 q222 / A39 q223 / A40 q224) on a large derived graph
  * (BENCH_SCALING.md Part 11): the oracle-checked rows run on the
  * 25-node trade graph, so this measures the same library functions
  * on the co-purchase graph (20k nodes / 1.2M undirected edge rows at
  * sf0.1; /tmp/scaleN for N×) where the per-step join and the
  * pair-aggregation volumes actually move.
  *
  * What each reading means at 100 TB:
  * - walk corpus: one frontier⋈adjacency equi join per step — rows
  *   should track γ·|V|·(len+1), wall the adjacency shuffle.
  * - skip-gram pairs / PPMI nnz: the walk self-join is band-bounded
  *   (≤ 2·W·len pairs per walk), so pair volume must stay linear in
  *   the corpus, never |V|².
  * - embedding training: PPMI nnz × d projection rows, two partial
  *   aggs — linear in nnz.
  * - node2vec adj2: Σ out-deg² — the paper's own preprocessing cost.
  *   UNBOUNDED degree makes it quadratic; the measured answer is the
  *   same one the triangle family uses (q104): threshold to repeat
  *   edges (support ≥ 2), which bounds the hub degrees that drive
  *   the square. Both the raw and thresholded counts are printed so
  *   the curve shows the threshold doing the bounding.
  *
  * Usage: java ... graft.tools.WalkScale <dir> [gamma] [len]
  */
object WalkScale {

  /** Ranked adjacency — the library's own constructor (promoted to
    * RandomWalks.rankedAdjacency in round 10; this alias keeps the
    * sweep's call sites short). */
  private def rankedAdj(weighted: DataFrame): DataFrame =
    graft.graph.RandomWalks.rankedAdjacency(weighted)

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val gamma = if (args.length > 1) args(1).toInt else 2
    val len = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
        .appName("walk-scale").master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.Tables(spark, dir)

    // weighted co-purchase graph, symmetrized (walks can leave any node)
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
    val adj = graft.Checkpoints.cut(rankedAdj(weighted))
    val nodes = graft.Checkpoints.cut(
      weighted.select(col("src").as("node")).distinct())
    println(s"== $dir nodes=${nodes.count()} directed-edge-rows=${adj.count()} gamma=$gamma len=$len")

    def timed(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val v = body
      println(f"WALK $name%-22s rows=$v%12d wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    // cut INSIDE the timer: cut is an eager localCheckpoint, so the
    // stage's work happens at cut time, not at count time
    def timedCut(name: String)(body: => DataFrame): DataFrame = {
      var out: DataFrame = null
      timed(name) { out = graft.Checkpoints.cut(body); out.count() }
      out
    }

    val seeds = nodes
      .select(col("node"),
        explode(expr(s"sequence(0, ${gamma - 1})")).as("w"))
      .select((col("node") * gamma + col("w")).as("walk_id"), col("node"))
    if (sys.env.contains("WALKSCALE_STEPS")) {
      // per-stage breakdown of the corpus build
      def t[A](name: String)(body: => A): A = {
        val t0 = System.nanoTime()
        val v = body
        println(f"STEP $name%-12s ${(System.nanoTime() - t0) / 1e9}%.1fs")
        v
      }
      val a = t("cache_adj") {
        val x = adj.repartition(col("src"))
          .sortWithinPartitions("src").persist()
        x.count(); x
      }
      var cur = t("cut_seeds")(graft.Checkpoints.cut(
        seeds.select(col("walk_id"), col("node"))))
      for (s <- 1 to len)
        cur = t(s"step_$s")(graft.Checkpoints.cut(
          graft.graph.RandomWalks.stepJoin(cur, a, s)))
      spark.stop()
      return
    }
    if (sys.env.contains("WALKSCALE_EXPLAIN")) {
      // one step against the cached pre-partitioned adjacency, as
      // walkRows sees it: does the big side keep its partitioning
      // (no Exchange under the join)?
      val a = adj.repartition(col("src")).sortWithinPartitions("src")
        .persist()
      a.count()
      val f = graft.Checkpoints.cut(seeds.select(col("walk_id"), col("node")))
      graft.graph.RandomWalks.stepJoin(f, a, 1).explain("formatted")
      spark.stop()
      return
    }
    if (sys.env.contains("WALKSCALE_ONLY_N2V")) {
      // just the node2vec family (adj2 + the bounded end-to-end
      // library call) — skips the DeepWalk corpus/trainer stages
      val rep0 = graft.Checkpoints.cut(graft.graph.Node2Vec
        .boundedEdges(weighted, 2).select("src", "dst", "cnt"))
      val repAdj0 = graft.Checkpoints.cut(rankedAdj(rep0))
      timedCut("adj2_support2")(
        graft.graph.Node2Vec.transitionIntervals(
          repAdj0, rep0.select("src", "dst")))
      val rn = rep0.select(col("src").as("node")).distinct()
      val rs = rn.select(col("node"),
          explode(expr(s"sequence(0, ${gamma - 1})")).as("w"))
        .select((col("node") * gamma + col("w")).as("walk_id"), col("node"))
      timed("node2vec_e2e_lib")(
        graft.graph.Node2Vec.node2vecWalks(rs, weighted, len,
          minSupport = 2).count())
      spark.stop()
      return
    }
    val walks = timedCut("walk_corpus")(
      graft.graph.RandomWalks.walkRows(seeds, adj, len))

    val pairs = timedCut("skipgram_pairs")(
      graft.graph.NodeEmbeddings.skipGramPairs(walks, 2))

    val ppmi = timedCut("ppmi_nnz")(
      graft.graph.NodeEmbeddings.ppmiRows(pairs))

    timed("embedding_rows")(
      graft.graph.NodeEmbeddings.project(ppmi, 16).count())

    // node2vec transition table: raw Σ deg² vs the support-≥2
    // thresholded graph (the q104 bounding answer). The raw count is
    // the expensive demonstration — skippable when re-measuring the
    // walk stages (WALKSCALE_SKIP_RAW=1).
    if (!sys.env.contains("WALKSCALE_SKIP_RAW"))
      timed("adj2_raw")(
        graft.graph.Node2Vec.transitionIntervals(
          adj, weighted.select("src", "dst")).count())
    val rep = graft.Checkpoints.cut(graft.graph.Node2Vec
      .boundedEdges(weighted, 2).select("src", "dst", "cnt"))
    val repAdj = graft.Checkpoints.cut(rankedAdj(rep))
    timedCut("adj2_support2")(
      graft.graph.Node2Vec.transitionIntervals(
        repAdj, rep.select("src", "dst")))

    // node2vec walks END-TO-END through the library knob: ONE call —
    // boundedEdges + rankedAdjacency + transitionIntervals + walkRows
    // all inside the timer, on the UNfiltered edge list, exactly as a
    // user would invoke it on a hub-heavy graph
    val repNodes = rep.select(col("src").as("node")).distinct()
    val repSeeds = repNodes
      .select(col("node"),
        explode(expr(s"sequence(0, ${gamma - 1})")).as("w"))
      .select((col("node") * gamma + col("w")).as("walk_id"), col("node"))
    timed("node2vec_e2e_lib")(
      graft.graph.Node2Vec.node2vecWalks(repSeeds, weighted, len,
        minSupport = 2).count())

    spark.stop()
  }
}
