package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** A point of the frontier: minimize `x`, maximize `y`. */
case class SkyRow(id: Long, x: Double, y: Double)

/** Distributed skyline (Pareto frontier): the rows no other row
  * dominates — b dominates a when b.x ≤ a.x and b.y ≥ a.y with at
  * least one strict (identical points do NOT dominate each other, so
  * duplicates co-survive). The multi-objective selection every
  * curation pipeline eventually needs ("cheapest for its size",
  * "highest quality for its length") — a shape no single ORDER BY or
  * window expresses.
  *
  * Two phases, the textbook distributed algorithm:
  *  1. LOCAL skyline per partition — a globally non-dominated row is
  *     non-dominated in its own partition, so the union of local
  *     skylines is a provably complete candidate set. Each partition
  *     sorts (x asc, y desc) and keeps a row iff the best y at
  *     strictly-smaller x is below it and the best y at equal x does
  *     not strictly beat it: one linear scan. This is the library's
  *     one justified `mapPartitions` class — a per-partition running
  *     maximum over a 2-objective order that neither windows nor aggs
  *     express (a window's frame cannot encode "strictly smaller x OR
  *     equal x with strictly larger y" in one pass).
  *  2. GLOBAL verify among candidates only — a dominance anti-join.
  *     Frontiers are tiny relative to their input (|skyline| ~
  *     O(log n · partitions) for independent dimensions), so the
  *     quadratic check runs on hundreds of rows, never the corpus,
  *     and the nested-loop join it plans is bounded by construction.
  *
  * The output is a SET property of the input — phase 1's partition
  * layout cannot change it (spec-asserted under repartitioning). */
object Skyline {

  /** One linear pass over a partition sorted by (x asc, y desc). */
  private def localSkyline(it: Iterator[SkyRow]): Iterator[SkyRow] = {
    var maxYBefore = Double.NegativeInfinity // best y at strictly smaller x
    var maxYGroup = Double.NegativeInfinity  // best y at the current x
    var curX = Double.NaN
    val out = scala.collection.mutable.ArrayBuffer[SkyRow]()
    it.foreach { r =>
      if (curX != r.x) {
        maxYBefore = math.max(maxYBefore, maxYGroup)
        maxYGroup = Double.NegativeInfinity
        curX = r.x
      }
      if (!(maxYBefore >= r.y || maxYGroup > r.y)) out += r
      maxYGroup = math.max(maxYGroup, r.y)
    }
    out.iterator
  }

  /** Skyline of `rows` (id, x, y): minimize x, maximize y. */
  def skyline(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    // the candidate set is materialized once: the dominance anti-join
    // references it on BOTH sides, and without the cut the broadcast
    // and streamed evaluations would each re-run phase 1 (the full
    // scan + sort + local scan — the query's dominant cost)
    val cands = graft.Checkpoints.cut(rows
      .select(col("id").cast("long").as("id"), col("x").cast("double").as("x"),
        col("y").cast("double").as("y"))
      .as[SkyRow]
      .sortWithinPartitions(col("x").asc, col("y").desc)
      .mapPartitions(localSkyline _)
      .toDF())
    cands.as("a").join(cands.as("b"),
        col("b.x") <= col("a.x") && col("b.y") >= col("a.y") &&
          (col("b.x") < col("a.x") || col("b.y") > col("a.y")),
        "left_anti")
      .select("id", "x", "y")
  }

  /** q100: the price/size frontier of the part catalog — no part is
    * both cheaper and larger than a skyline part. */
  def q100Skyline(spark: SparkSession, dir: String): DataFrame =
    skyline(Tables(spark, dir).part.select(
        col("p_partkey").cast("long").as("id"),
        col("p_retailprice").as("x"), col("p_size").cast("double").as("y")))
      .select(col("id").as("p_partkey"), col("x").as("p_retailprice"),
        col("y").cast("long").as("p_size"))
      .orderBy("p_partkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q100_skyline" -> (q100Skyline _),
  )

  val oracleSql: Map[String, String] = Map(
    "q100_skyline" ->
      """WITH p AS (SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
        |                  p_retailprice,
        |                  CAST(p_size AS BIGINT) AS p_size FROM part)
        |SELECT a.p_partkey, a.p_retailprice, a.p_size FROM p a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p b
        |  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        |    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
        |ORDER BY p_partkey""".stripMargin,
  )
}
