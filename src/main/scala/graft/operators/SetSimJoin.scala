package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Checkpoints, Tables}

/** Exact set-similarity join (AllPairs/PPJoin prefix filtering) — the
  * deterministic complement to the LSH family: finds EVERY pair with
  * token-set jaccard ≥ θ, no recall loss, which is the contract
  * catalog/entity matching needs (a missed duplicate is a wrong
  * answer there, not a tuning knob).
  *
  * Prefix filter: tokens are totally ordered by (global frequency,
  * token) — rarest first — and each item exposes only its first
  * n − ⌈θ·n⌉ + 1 tokens as join keys. Completeness: jac(A,B) ≥ θ
  * implies |A∩B| ≥ ⌈θ·max(|A|,|B|)⌉ (c ≥ θ(na+nb−c) and nb ≥ c give
  * c ≥ θ·na), so the canonically-smallest shared token cannot sit
  * past either prefix — both prefixes contain it and the candidate
  * pair survives (spec proves equality with the brute-force join).
  *
  * Scale shape: the frequency table is corpus-derived and therefore
  * NEVER broadcast-hinted (AQE may, when stats allow); the candidate
  * join is keyed by prefix token — the rarest tokens by construction,
  * the opposite of the hot keys a naive token join explodes on; the
  * verify join ships only candidate pairs' tokens (bounded per item).
  * The per-item token-array relation stays an UN-materialized
  * projection of the item scan so its statistics survive — see the
  * note in [[setSimJoin]] on why checkpointing it would force the
  * verify joins to sort-merge. */
object SetSimJoin {

  val Theta = 0.6

  /** All pairs (a < b) of `items` (id, name) with distinct-token
    * jaccard ≥ theta, exact.
    *
    * Verification is IN-ROW: the candidate pair joins the id→token-
    * array map twice (a per-item relation — rows = items, not tokens —
    * that AQE broadcasts when it fits) and the intersection size is
    * `array_intersect` over the two small arrays. The alternative —
    * exploding candidates against the token relation and counting
    * matches — shuffles |candidates|·|shared tokens| rows; with
    * millions of candidates that re-shuffle dwarfs the verify compute,
    * while the in-row form adds ZERO verify shuffle. */
  def setSimJoin(items: DataFrame, theta: Double): DataFrame = {
    // deliberately NOT checkpointed: the relation is a cheap projection
    // of the item scan, and cutting it would erase the source stats —
    // AQE then can't see that the verify-join build side fits a
    // broadcast and falls back to sort-merge over the (much larger)
    // candidate set. With stats intact the plan adapts: broadcast at
    // dimension-sized |items|, shuffle join at corpus scale.
    val lists = items.select(col("id"),
      array_distinct(split(col("name"), " ")).as("ws"))
    val tok = lists.select(col("id"), explode(col("ws")).as("w"))
    val sz = lists.select(col("id"), size(col("ws")).cast("long").as("nn"))
    val f = tok.groupBy("w").agg(count(lit(1)).as("cf"))
    val rankW = Window.partitionBy("id").orderBy(col("cf"), col("w"))
    val pre = tok.join(f, Seq("w"))
      .select(col("id"), col("w"), row_number().over(rankW).as("r"))
      .join(sz, Seq("id"))
      .filter(col("r") <=
        col("nn") - ceil(lit(theta) * col("nn")).cast("long") + 1)
      .select("id", "w", "r", "nn")
    // candidates are NOT deduplicated before verification: a pair is
    // re-generated once per shared prefix token (≤ prefix length), and
    // a distinct here shuffles the full candidate stream through a
    // partial aggregation that dedups almost nothing (measured 40% of
    // the query's wall time at sf0.1: 18M pairs, ~85% already unique).
    // Verification is in-row, so duplicates cost only their own
    // arithmetic; the distinct runs AFTER the θ filter, over the far
    // smaller surviving-pair set, where identical rows collapse.
    // The self-join EXPLODES: inputs are |items|·prefix rows but the
    // output is the candidate-pair stream, orders of magnitude larger.
    // AQE sizes the join's stage by its tiny INPUTS (coalescing them
    // to ~one partition), which would run the join AND the whole
    // in-row verify single-task — measured 21 of q99's 34 s at sf0.1.
    // Re-spreading the pair stream across the session's shuffle
    // partitions costs one narrow-row shuffle and restores full
    // verify parallelism; the knob scales with the cluster (same
    // convention as CorpusOps.packShards), not a hard constant.
    // PPJoin position filter, applied per GENERATION ROW before the
    // verify joins: a pair found at prefix positions (rx, ry) can
    // share at most 1 + min(na−rx, nb−ry) tokens, while jac ≥ θ
    // forces at least ⌈θ/(1+θ)·(na+nb)⌉ shared. Rows failing the
    // bound drop — Spark-side only, results provably unchanged: the
    // generation at a true pair's MINIMAL shared token has the
    // smallest (rx, ry) and therefore the LOOSEST bound, and for that
    // row the bound is a valid overlap ceiling (all shared tokens sit
    // at ranks ≥ rx in A and ≥ ry in B), so it always survives.
    // Non-minimal duplicate generations may drop — pruning the dup
    // verify work too. The brute-force-equality spec guards this.
    val alpha = ceil(lit(theta / (1 + theta)) * (col("na") + col("nb")))
    // pin the GENERATION stage's parallelism, not just the verify's:
    // AQE sizes the self-join stage by its tiny prefix inputs and can
    // coalesce them to ~one partition — then the 18M-pair enumeration
    // + position filter run single-task (measured 17-97 s swings at
    // sf0.1 depending on the coalesce decision). An explicit-count
    // repartition by the join key is exempt from AQE coalescing, is
    // co-partitioned with the join (no extra exchange), and moves
    // only the small prefix relation.
    val nPart = items.sparkSession.sessionState.conf.numShufflePartitions
    val spread = pre.repartition(nPart, col("w"))
    val cand = spread.as("x").join(spread.as("y"),
        col("x.w") === col("y.w") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        col("x.r").as("rx"), col("y.r").as("ry"),
        col("x.nn").as("na"), col("y.nn").as("nb"))
      .filter(lit(1) + least(col("na") - col("rx"), col("nb") - col("ry"))
        >= alpha)
      .select("a", "b")
      .repartition(items.sparkSession.sessionState.conf.numShufflePartitions,
        col("a"), col("b"))
    val jac: Column =
      col("c").cast("double") / (col("na") + col("nb") - col("c"))
    cand
      .join(lists.select(col("id").as("a"), col("ws").as("wa")), Seq("a"))
      .join(lists.select(col("id").as("b"), col("ws").as("wb")), Seq("b"))
      .withColumn("c", size(array_intersect(col("wa"), col("wb"))).cast("long"))
      .withColumn("na", size(col("wa")).cast("long"))
      .withColumn("nb", size(col("wb")).cast("long"))
      .filter(jac >= theta)
      .select(col("a"), col("b"), round(jac, 6).as("jac"))
      .distinct()
      .orderBy("a", "b")
  }

  /** q99: exact jaccard-0.6 matches over part names — the catalog
    * near-duplicate report. */
  def q99SetsimJoin(spark: SparkSession, dir: String): DataFrame =
    setSimJoin(Tables(spark, dir).part
      .select(col("p_partkey").cast("long").as("id"), col("p_name").as("name")),
      Theta)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q99_setsim_join" -> (q99SetsimJoin _),
  )

  val oracleSql: Map[String, String] = Map(
    "q99_setsim_join" ->
      s"""WITH tok AS (
         |  SELECT p_partkey AS id,
         |         unnest(list_distinct(string_split(p_name, ' '))) AS w
         |  FROM part),
         |sz AS (SELECT id, CAST(count(*) AS BIGINT) AS nn FROM tok GROUP BY 1),
         |f AS (SELECT w, count(*) AS cf FROM tok GROUP BY 1),
         |rk AS (
         |  SELECT t.id, t.w,
         |         row_number() OVER (PARTITION BY t.id ORDER BY f.cf, t.w) AS r
         |  FROM tok t JOIN f ON f.w = t.w),
         |pre AS (
         |  SELECT rk.id, rk.w FROM rk JOIN sz ON sz.id = rk.id
         |  WHERE rk.r <= sz.nn - CAST(ceil($Theta * sz.nn) AS BIGINT) + 1),
         |cand AS (SELECT DISTINCT x.id AS a, y.id AS b
         |         FROM pre x JOIN pre y ON x.w = y.w AND x.id < y.id),
         |inter AS (
         |  SELECT c.a, c.b, CAST(count(*) AS BIGINT) AS c
         |  FROM cand c
         |  JOIN tok ta ON ta.id = c.a
         |  JOIN tok tb ON tb.id = c.b AND tb.w = ta.w
         |  GROUP BY 1, 2)
         |SELECT i.a, i.b,
         |       round(CAST(i.c AS DOUBLE) / (sa.nn + sb.nn - i.c), 6) AS jac
         |FROM inter i
         |JOIN sz sa ON sa.id = i.a
         |JOIN sz sb ON sb.id = i.b
         |WHERE CAST(i.c AS DOUBLE) / (sa.nn + sb.nn - i.c) >= $Theta
         |ORDER BY 1, 2""".stripMargin,
  )
}
