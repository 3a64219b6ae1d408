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
  * The token relation is checkpointed once and reused by all three
  * passes (freq, rank, verify); Verify/Bench reclaim it via their
  * end-of-query releaseAll, keeping the in-query plan DAG shared. */
object SetSimJoin {

  val Theta = 0.6

  /** All pairs (a < b) of `items` (id, name) with distinct-token
    * jaccard ≥ theta, exact. */
  def setSimJoin(items: DataFrame, theta: Double): DataFrame = {
    val tok = Checkpoints.cut(items.select(col("id"),
      explode(array_distinct(split(col("name"), " "))).as("w")))
    val sz = tok.groupBy("id").agg(count(lit(1)).as("nn"))
    val f = tok.groupBy("w").agg(count(lit(1)).as("cf"))
    val rankW = Window.partitionBy("id").orderBy(col("cf"), col("w"))
    val pre = tok.join(f, Seq("w"))
      .select(col("id"), col("w"), row_number().over(rankW).as("r"))
      .join(sz, Seq("id"))
      .filter(col("r") <=
        col("nn") - ceil(lit(theta) * col("nn")).cast("long") + 1)
      .select("id", "w")
    val cand = pre.as("x").join(pre.as("y"),
        col("x.w") === col("y.w") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
    val jac: Column =
      col("c").cast("double") / (col("na") + col("nb") - col("c"))
    cand
      .join(tok.select(col("id").as("a"), col("w")), Seq("a"))
      .join(tok.select(col("id").as("b"), col("w")), Seq("b", "w"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
      .join(sz.select(col("id").as("a"), col("nn").as("na")), Seq("a"))
      .join(sz.select(col("id").as("b"), col("nn").as("nb")), Seq("b"))
      .filter(jac >= theta)
      .select(col("a"), col("b"), round(jac, 6).as("jac"))
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
