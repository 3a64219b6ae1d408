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
    // The filter is SYMMETRIC under (rx,na)↔(ry,nb), so it is valid
    // before the least/greatest id normalization below.
    val alpha = ceil(lit(theta / (1 + theta)) * (col("na") + col("nb")))
    // GENERATION is skew-bound if keyed by the prefix token alone: a
    // join on `w` processes each token's whole group in ONE task, and
    // pair enumeration is quadratic in group size — on a small hot
    // vocabulary (TPC-H part names: ~92 words) the heaviest token
    // dominates a single task no matter how many partitions exist
    // (driver-measured 267 s at sf0.1 for exactly this reason).
    // Two-level BLOCK DECOMPOSITION removes the skew: each token
    // group is hash-split into nbk = ⌈group/B⌉ blocks, and the join
    // key becomes (w, bi, bj) — one key PER BLOCK PAIR, so a group of
    // g rows spreads over ~(g/B)² independent keys and parallelism
    // scales with group², not with the token count. Each row
    // replicates nbk+1 times total (X: its block paired with every
    // bj ≥ bi; Y: with every bi ≤ bj), i.e. O(pairs/B) replicated
    // rows — a vanishing fraction of the pair stream itself. This is
    // the 100 TB-safe shape: hot tokens exist in real corpora too,
    // and per-key work is capped at ~B² pairs regardless of skew.
    // Pair coverage, exactly once per shared token: an unordered pair
    // with blocks (p, q), p ≤ q, meets only at key (w, p, q) — from
    // the X side the lower-block row, from Y the upper-block row
    // (disjoint row sets when p < q; for p = q the x.id < y.id guard
    // keeps one of the two orderings).
    // The explicit-count repartitions pin the stage's parallelism:
    // AQE sizes the join by its tiny replicated-prefix INPUTS and
    // would coalesce to ~one partition, single-tasking the 18M-pair
    // enumeration; an explicit-count repartition by the join key is
    // exempt from coalescing and co-partitioned with the join.
    val B = 256 // block size: per-key work ≤ ~B² pairs
    val nPart = items.sparkSession.sessionState.conf.numShufflePartitions
    val blocked = pre
      .join(pre.groupBy("w").agg(count(lit(1)).as("pcf")), Seq("w"))
      .withColumn("nbk", ceil(col("pcf") / lit(B)).cast("int"))
      .withColumn("blk", pmod(xxhash64(col("id")), col("nbk")).cast("int"))
    val xs = blocked.select(col("id"), col("r"), col("nn"), col("w"),
        col("blk").as("bi"),
        explode(sequence(col("blk"), col("nbk") - 1)).as("bj"))
      .repartition(nPart, col("w"), col("bi"), col("bj"))
    val ys = blocked.select(col("id"), col("r"), col("nn"), col("w"),
        explode(sequence(lit(0), col("blk"))).as("bi"),
        col("blk").as("bj"))
      .repartition(nPart, col("w"), col("bi"), col("bj"))
    val cand = xs.as("x").join(ys.as("y"),
        col("x.w") === col("y.w") && col("x.bi") === col("y.bi") &&
          col("x.bj") === col("y.bj") &&
          (col("x.bi") < col("x.bj") || col("x.id") < col("y.id")))
      .select(least(col("x.id"), col("y.id")).as("a"),
        greatest(col("x.id"), col("y.id")).as("b"),
        col("x.r").as("rx"), col("y.r").as("ry"),
        col("x.nn").as("na"), col("y.nn").as("nb"))
      .filter(lit(1) + least(col("na") - col("rx"), col("nb") - col("ry"))
        >= alpha)
      .select("a", "b")
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
