package graft.graph

import scala.util.chaining._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Checkpoints, Tables}

/** Modularity-based community detection — the reference's Louvain
  * surface (documentation/queries.md:82-98) as a deterministic
  * DataFrame program, plus the modularity metric itself so community
  * quality is measurable.
  *
  * The local-move phase is the semi-synchronous variant: every node
  * scores each neighboring community c with the standard gain ordering
  * score(n→c) = w_nc/m − deg_n·Σtot_c\n/(2m²) (terms constant across
  * candidates cancel) and adopts the argmax (tie-break: smaller
  * community id) — but only nodes whose id parity matches the sweep
  * parity may move, which deterministically breaks the two-node swap
  * cycles a fully synchronous update oscillates on. Each even sweep's
  * assignment is scored with Q and the best-scoring assignment wins.
  *
  * [[louvainTwoLevel]] adds the REAL Louvain second phase: communities
  * contract into super-nodes (intra-community weight becomes a
  * self-loop, inter-community weights sum), the weighted local move
  * runs again on the contracted graph, and labels map back.
  * Contraction preserves Q exactly (self-loops keep W_c, summed
  * weights keep degrees and m), and each level's argmax-Q starts at
  * the previous level's partition — so multi-level modularity can
  * never decrease (spec-asserted).
  *
  * Scale: one iteration = two joins + two aggs, all keyed by node or
  * community; the only per-iteration driver traffic is the modularity
  * scalar. The contracted graph is |communities| nodes — each level is
  * strictly cheaper than the last.
  */
object Louvain {

  /** Modularity Q = Σ_c [ W_c/m − (d_c/(2m))² ] of `assign` (node,
    * community) over an undirected graph given as one row per edge
    * (self-loops allowed; a self-loop adds 2·w to its node's degree).
    * Edges may carry a `weight` column; absent means weight 1. */
  def modularity(edges: DataFrame, assign: DataFrame): Double = {
    val e = weighted(edges)
    val m = e.agg(sum(col("ew"))).first().getDouble(0)
    if (m == 0) return 0.0
    val a = assign.select(col("node"), col("community"))
    val within = e
      .join(a.select(col("node").as("src"), col("community").as("cs")), "src")
      .join(a.select(col("node").as("dst"), col("community").as("cd")), "dst")
      .filter(col("cs") === col("cd"))
      .groupBy(col("cs").as("community")).agg(sum(col("ew")).as("lc"))
    val deg = e.select(col("src").as("node"), col("ew"))
      .union(e.select(col("dst").as("node"), col("ew")))
      .groupBy("node").agg(sum(col("ew")).as("deg"))
    a.join(deg, Seq("node"), "left")
      .groupBy("community").agg(sum(coalesce(col("deg"), lit(0.0))).as("dc"))
      .join(within, Seq("community"), "left")
      .select(sum(coalesce(col("lc"), lit(0.0)) / m
        - pow(col("dc") / (2.0 * m), 2.0)).as("q"))
      .first().getDouble(0)
  }

  /** (src, dst, ew): normalize the optional `weight` column (absent →
    * 1.0) so every consumer sees one shape. */
  private def weighted(edges: DataFrame): DataFrame =
    if (edges.columns.contains("weight"))
      edges.select(col("src"), col("dst"), col("weight").cast("double").as("ew"))
    else edges.select(col("src"), col("dst")).withColumn("ew", lit(1.0))

  /** Louvain local-move phase (semi-synchronous, deterministic):
    * returns (node, community) of the best-modularity assignment seen
    * within `iters` sweeps, starting from singleton communities.
    * `edges` is undirected, one row per edge, optional `weight`.
    *
    * Default sweep budget: 3 full even+odd passes — local moves on
    * the test graphs stop producing changes by pass 3, and
    * semi-synchronous sweeps can limit-cycle (never two consecutive
    * stable sweeps), so a budget beats waiting for strict
    * convergence; the argmax-Q selection makes extra sweeps safe but
    * not useful. */
  def louvain(nodes: DataFrame, edges: DataFrame, iters: Int = 6): DataFrame = {
    val e = weighted(edges).pipe(Checkpoints.cut)
    val m = e.agg(sum(col("ew"))).first() match {
      case r if r.isNullAt(0) => 0.0
      case r => r.getDouble(0)
    }
    var assign = nodes.select(col("node"), col("node").as("community"))
      .pipe(Checkpoints.cut)
    if (m == 0) { Checkpoints.release(e); return assign }
    // both directions for scoring; self-loops excluded — they move
    // with the node, contributing equally to every candidate
    val und = e.filter(col("src") =!= col("dst"))
    val adj = und.select(col("src").as("node"), col("dst").as("nbr"), col("ew"))
      .union(und.select(col("dst").as("node"), col("src").as("nbr"), col("ew")))
      .pipe(Checkpoints.cut)
    val deg = e.select(col("src").as("node"), col("ew"))
      .union(e.select(col("dst").as("node"), col("ew")))
      .groupBy("node").agg(sum(col("ew")).as("deg"))
      .pipe(Checkpoints.cut)
    // single-job Q evaluation with m and deg precomputed (modularity()
    // would recount edges and re-aggregate degrees on every call)
    def qOf(a: DataFrame): Double = {
      val within = e
        .join(a.select(col("node").as("src"), col("community").as("cs")), "src")
        .join(a.select(col("node").as("dst"), col("community").as("cd")), "dst")
        .filter(col("cs") === col("cd"))
        .groupBy(col("cs").as("community")).agg(sum(col("ew")).as("lc"))
      a.join(deg, Seq("node"), "left")
        .groupBy("community").agg(sum(coalesce(col("deg"), lit(0.0))).as("dc"))
        .join(within, Seq("community"), "left")
        .select(sum(coalesce(col("lc"), lit(0.0)) / m
          - pow(col("dc") / (2.0 * m), 2.0)).as("q"))
        .first().getDouble(0)
    }
    var best = assign
    var bestQ = qOf(assign)
    var sweep = 0
    while (sweep < iters) {
      sweep += 1
      val tot = assign.join(deg, Seq("node"), "left")
        .groupBy("community").agg(sum(coalesce(col("deg"), lit(0.0))).as("dtot"))
      // candidate communities per node: every neighbor community plus
      // the current one (w_nc = 0 for the current if no internal edge)
      val nbrW = adj
        .join(assign.select(col("node").as("nbr"), col("community").as("c")), "nbr")
        .groupBy("node", "c").agg(sum(col("ew")).as("w"))
      val cands = nbrW
        .unionByName(assign.select(col("node"), col("community").as("c"))
          .withColumn("w", lit(0.0)))
        .groupBy("node", "c").agg(max(col("w")).as("w"))
      val scored = cands
        .join(assign, Seq("node"))
        .join(deg, Seq("node"), "left").na.fill(0.0, Seq("deg"))
        .join(tot.select(col("community").as("c"), col("dtot")), Seq("c"))
        // Σtot of the candidate community EXCLUDING the node itself
        .withColumn("dtot_x",
          when(col("c") === col("community"), col("dtot") - col("deg"))
            .otherwise(col("dtot")))
        .withColumn("score",
          col("w") / m - col("deg") * col("dtot_x") / (2.0 * m * m))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("node").orderBy(col("score").desc, col("c").asc)
      val prev = assign
      assign = scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("node"),
          when(pmod(col("node"), lit(2)) === lit(sweep % 2), col("c"))
            .otherwise(col("community")).as("community"))
        .pipe(Checkpoints.cut)
      // score once per full even+odd pass — the argmax-Q selection
      // both absorbs semi-synchronous limit cycles and replaces a
      // convergence test (which a cycle would never satisfy); one
      // driver scalar per pass is the only loop traffic
      if (sweep % 2 == 0 || sweep == iters) {
        val q = qOf(assign)
        if (q > bestQ) {
          bestQ = q
          if (!(best eq prev)) Checkpoints.release(best)
          best = assign
        }
      }
      // free the superseded sweep unless it is still the best-Q holder
      if (!(prev eq best)) Checkpoints.release(prev)
    }
    Checkpoints.release(e, adj, deg)
    if (!(assign eq best)) Checkpoints.release(assign)
    best
  }

  /** Phase-2 contraction: communities become super-nodes; intra-
    * community weight becomes a self-loop, inter-community weights
    * sum (canonical direction, so the graph stays one-row-per-edge).
    * Preserves m, degrees, and therefore Q, exactly. */
  def contract(edges: DataFrame, assign: DataFrame): DataFrame =
    weighted(edges)
      .join(assign.select(col("node").as("src"), col("community").as("cs")), "src")
      .join(assign.select(col("node").as("dst"), col("community").as("cd")), "dst")
      .select(least(col("cs"), col("cd")).as("src"),
        greatest(col("cs"), col("cd")).as("dst"), col("ew"))
      .groupBy("src", "dst").agg(sum(col("ew")).as("weight"))

  /** Full two-level Louvain: local moves, contract, local moves on the
    * weighted community graph, map back. Q(two-level) ≥ Q(one-level)
    * by construction (contraction preserves Q; level 2's argmax starts
    * at the contracted singletons = level-1 partition). */
  def louvainTwoLevel(nodes: DataFrame, edges: DataFrame,
      iters: Int = 6): DataFrame = {
    val l1 = louvain(nodes, edges, iters)
    val superNodes = l1.select(col("community").as("node")).distinct()
    val superEdges = contract(edges, l1).pipe(Checkpoints.cut)
    val l2 = louvain(superNodes, superEdges, iters)
    Checkpoints.release(superEdges)
    val out = l1
      .join(l2.select(col("node").as("community"), col("community").as("c2")),
        Seq("community"))
      .select(col("node"), col("c2").as("community"))
      .pipe(Checkpoints.cut)
    Checkpoints.release(l1)
    if (!(l2 eq out)) Checkpoints.release(l2)
    out
  }

  /** q38: Louvain communities on the undirected trade graph —
    * deterministic (semi-synchronous sweeps, argmax-Q), rows-only
    * checked (modularity math is not ANSI-SQL-expressible without
    * unrolling the sweep; quality is spec-asserted vs random/singleton
    * partitions instead). */
  def q38Louvain(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // one row per undirected edge, canonical direction only; cut the
    // lineage so the lineitem-scale derivation runs once, not once per
    // sweep job (louvain + modularity reference `edges` repeatedly)
    val e = Checkpoints.cut(TradeGraph.edges(t)
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .distinct())
    val best = louvain(TradeGraph.nodes(t).select("node"), e)
    Checkpoints.release(e) // sweeps are eager; best is checkpointed
    best.orderBy("node")
  }

  /** q58: the multi-level (real) Louvain on the same graph — phase 1
    * local moves, community contraction, phase 2 on the weighted
    * super-graph, labels mapped back. Rows-only checked like q38;
    * the Q(two-level) ≥ Q(one-level) invariant is spec-asserted. */
  def q58LouvainMultilevel(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val e = Checkpoints.cut(TradeGraph.edges(t)
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .distinct())
    val out = louvainTwoLevel(TradeGraph.nodes(t).select("node"), e)
    Checkpoints.release(e)
    out.orderBy("node")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_louvain" -> (q38Louvain _),
    "q58_louvain_multilevel" -> (q58LouvainMultilevel _),
  )
}
