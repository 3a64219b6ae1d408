package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Node-embedding TRAINING from the walk corpus — the step DeepWalk
  * (Perozzi et al. 2014) runs after q222's sampling: skip-gram
  * co-occurrence over the trajectories, then an embedding per node.
  * SGD word2vec is a sequential optimizer; the distribution-friendly
  * equivalent is the Levy & Goldberg 2014 result that skip-gram with
  * negative sampling factorizes the shifted positive-PMI matrix — so
  * the engine materializes the PPMI row for each node EXACTLY (it is
  * a pair-count aggregation, not an optimization) and reduces it to
  * [[Dims]] dimensions with a deterministic signed-hash random
  * projection (Achlioptas 2003 database-friendly JL: entries ±1 from
  * a hash of (context, dim), never a stored matrix). Rows are then
  * L2-normalized, cosine-ready for the ANN family (q24/q25/q41).
  * (Reference lineage: documentation/queries.md's dependency-graph
  * analytics — the representation-learning member.)
  *
  * Everything is a pure function of the graph: the walk corpus is
  * q222's hash-seeded table, the projection signs are md5 parities —
  * reproducible across engines/layouts/retries (the q194/q123
  * sampler-determinism discipline) and expressible in ANSI SQL, so
  * the trained embedding table itself is oracle-checkable, not just
  * spot-audited.
  *
  * Float contract: each PPMI cell is rounded to 6dp and carried as
  * DECIMAL(18,6); the projection sum is ±1-weighted DECIMAL addition
  * (accumulation-order-free); only the final normalize divides as
  * double, rounded to 6dp (the q183/q188 discipline).
  *
  * Scale shape: the skip-gram pair relation is ONE self-join of the
  * walk table keyed on walk_id with a bounded ±[[CtxWindow]] step
  * band — linear in corpus size (≤ 2·W·len pairs per walk), never
  * all-pairs. PPMI joins are keyed on the co-occurrence vocabulary
  * (nnz of the matrix, linear in corpus). The projection crossJoins
  * only the broadcast [[Dims]]-row dimension relation (explode ×16),
  * and both the (node, dim) sum and the per-node norm are partial
  * aggs. A billion-node corpus shuffles on node/pair keys only; at
  * JL fidelity Dims grows O(log n) — a constructor param, not a new
  * plan.
  */
object NodeEmbeddings {

  /** Skip-gram context radius (steps on either side). */
  val CtxWindow = 2

  /** Embedding width. 16 suits the suite-scale graph; JL fidelity at
    * larger vocabularies wants O(log n) — same plan, wider explode. */
  val Dims = 16

  /** (u, v, n_uv): co-occurrence counts within ±`window` steps on the
    * same walk, both directions (the symmetric skip-gram corpus). */
  private[graft] def skipGramPairs(walks: DataFrame, window: Int): DataFrame = {
    val w = graft.Checkpoints.cut(
      walks.select(col("walk_id"), col("step"), col("node")))
    w.as("x").join(w.as("y"),
        col("x.walk_id") === col("y.walk_id") &&
          abs(col("x.step") - col("y.step")).between(1, window))
      .groupBy(col("x.node").as("u"), col("y.node").as("v"))
      .agg(count(lit(1)).as("n_uv"))
  }

  /** Positive rows of the PPMI matrix over the pair counts:
    * max(0, ln(#(u,v)·D / (#u·#v))), 6dp, DECIMAL. The marginal #u
    * is the row sum (symmetric corpus ⇒ also the context marginal). */
  private[graft] def ppmiRows(pairs: DataFrame): DataFrame = {
    val p = graft.Checkpoints.cut(pairs)
    val marg = p.groupBy("u").agg(sum("n_uv").as("n_u"))
    val tot = p.agg(sum("n_uv").as("d_tot"))
    p.join(marg, "u")
      .join(marg.select(col("u").as("v"), col("n_u").as("n_v")), "v")
      .crossJoin(broadcast(tot))
      .withColumn("ppmi",
        round(greatest(lit(0d),
          log(col("n_uv").cast("double") * col("d_tot") /
            (col("n_u").cast("double") * col("n_v")))), 6)
          .cast("decimal(18,6)"))
      .filter(col("ppmi") > 0)
      .select("u", "v", "ppmi")
  }

  /** ±1 from the md5 parity of (v ':' dim) — the projection matrix as
    * a hash, never materialized. */
  private def signCol: Column = {
    val bit = expr(
      """cast(conv(substring(md5(concat(cast(v as string), ':',
        |  cast(dim as string))), 1, 15), 16, 10) as bigint) % 2"""
        .stripMargin)
    (lit(1) - lit(2) * bit).cast("int")
  }

  /** (node, dim, emb): signed-hash projection of each PPMI row to
    * `dims` dimensions, L2-normalized. Nodes whose every PMI is ≤ 0
    * have no positive row and are absent (no co-occurrence signal). */
  private[graft] def project(ppmi: DataFrame, dims: Int): DataFrame = {
    val spark = ppmi.sparkSession
    val dimRel = spark.range(0, dims.toLong).select(col("id").as("dim"))
    // cut: e feeds BOTH the norm agg and the final join — without it
    // the whole PPMI subtree (pair join + marginals) is recomputed
    // once per consumer
    val e = graft.Checkpoints.cut(ppmi.crossJoin(broadcast(dimRel))
      .withColumn("sgn", signCol)
      .groupBy("u", "dim")
      .agg(sum(col("ppmi") * col("sgn")).cast("decimal(18,6)").as("e")))
    val nr = e.groupBy("u")
      .agg(sqrt(sum(col("e") * col("e")).cast("double")).as("nrm"))
    e.join(nr, "u")
      .withColumn("emb",
        when(col("nrm") === 0, lit(0d))
          .otherwise(round(col("e").cast("double") / col("nrm"), 6)))
      .select(col("u").as("node"), col("dim"), col("emb"))
      .orderBy("node", "dim")
  }

  /** q223: embeddings for every node of the trade graph from q222's
    * walk corpus (γ = [[RandomWalks.WalksPerNode]], len =
    * [[RandomWalks.WalkLen]], window = [[CtxWindow]], d = [[Dims]]). */
  def q223NodeEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val seeds = t.nation
      .select(col("n_nationkey").cast("long").as("node"))
      .select(col("node"),
        explode(expr(s"sequence(0, ${RandomWalks.WalksPerNode - 1})")).as("w"))
      .select((col("node") * RandomWalks.WalksPerNode + col("w")).as("walk_id"),
        col("node"))
    val walks = RandomWalks.walkRows(
      seeds, RandomWalks.adjacency(t), RandomWalks.WalkLen)
    project(ppmiRows(skipGramPairs(walks, CtxWindow)), Dims)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q223_node_embeddings" -> (q223NodeEmbeddings _),
  )

  val oracleSql: Map[String, String] = Map(
    "q223_node_embeddings" -> {
      // the projection hash feeds on the CONTEXT node and the dim.
      val bitV = graft.text.TextOps.hexToLongSql(
        "md5(CAST(p.v AS VARCHAR) || ':' || CAST(d.dim AS VARCHAR))", 1, 15)
      s"""WITH RECURSIVE ${RandomWalks.walkCteSql},
         |pr AS (
         |  SELECT x.node AS u, y.node AS v, CAST(count(*) AS BIGINT) AS n_uv
         |  FROM walk x JOIN walk y
         |    ON x.walk_id = y.walk_id
         |   AND abs(x.step - y.step) BETWEEN 1 AND $CtxWindow
         |  GROUP BY 1, 2),
         |mg AS (SELECT u, CAST(sum(n_uv) AS BIGINT) AS n_u
         |       FROM pr GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_uv) AS BIGINT) AS d_tot FROM pr),
         |pp AS (
         |  SELECT p.u, p.v,
         |         CAST(round(greatest(0.0,
         |              ln(CAST(p.n_uv AS DOUBLE) * t.d_tot /
         |                 (CAST(mu.n_u AS DOUBLE) * mv.n_u))), 6)
         |              AS DECIMAL(18,6)) AS ppmi
         |  FROM pr p
         |  JOIN mg mu ON mu.u = p.u
         |  JOIN mg mv ON mv.u = p.v, tot t),
         |ppf AS (SELECT * FROM pp WHERE ppmi > 0),
         |dims AS (SELECT CAST(unnest(generate_series(0, ${Dims - 1}))
         |                     AS BIGINT) AS dim),
         |e AS (
         |  SELECT p.u, d.dim,
         |         CAST(sum(p.ppmi * (1 - 2 * ($bitV % 2)))
         |              AS DECIMAL(18,6)) AS e
         |  FROM ppf p, dims d GROUP BY 1, 2),
         |nr AS (SELECT u, sqrt(CAST(sum(e * e) AS DOUBLE)) AS nrm
         |       FROM e GROUP BY 1)
         |SELECT e.u AS node, e.dim,
         |       CASE WHEN nr.nrm = 0 THEN 0.0
         |            ELSE round(CAST(e.e AS DOUBLE) / nr.nrm, 6) END AS emb
         |FROM e JOIN nr ON nr.u = e.u
         |ORDER BY node, dim""".stripMargin
    },
  )
}
