package graft.sim

import scala.util.chaining._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Checkpoints, Tables}
import graft.functions.GraftFunctions.dot

/** Distributed Lloyd k-means over the embedding corpus — the centroid
  * trainer for the IVF coarse quantizer (Similarity.q41 uses
  * md5-derived directions as its deterministic stand-in; this is the
  * real training path, made deterministic by fixed seeding so it stays
  * oracle-checkable).
  *
  * Scale shape per iteration (the canonical distributed k-means):
  *  - centroids are k·d scalars — broadcast, never shuffled with the
  *    corpus;
  *  - assignment is a broadcast cross join + codegen squared distance
  *    (|x|² + |c|² − 2·x·c via [[graft.functions.DotProduct]]) + one
  *    window argmin, all streaming over the corpus once;
  *  - the centroid update aggregates (cell, dim) partial sums — a
  *    shuffle of k·d·partitions rows, independent of corpus size.
  * Superseded centroid/assignment checkpoints are released each
  * iteration, so memory is O(corpus + k·d), not O(iters · corpus).
  *
  * Determinism: init = the first k vectors by vec_id; every join/agg
  * is keyed; the only float nondeterminism is partial-agg order in the
  * per-dim mean, which moves centroids by ~1 ulp — far below the
  * assignment margins of this corpus, so the integer outputs
  * (assignments, sizes) are stable and hash-comparable. A cell that
  * empties vanishes from both engines identically (no reseeding). */
object KMeans {

  val K = 8
  val Iters = 3

  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  private def sqDist(e: Column, c: Column): Column =
    dot(e, e) + dot(c, c) - lit(2.0) * dot(e, c)

  /** (vec_id, cell) after `iters` Lloyd iterations from the
    * first-k-by-id init. */
  def assignments(v: DataFrame, k: Int, iters: Int): DataFrame = {
    require(iters >= 1, "kmeans needs at least one assignment pass")
    var cent = v.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cell"), col("e").as("c"))
      .pipe(Checkpoints.cut)
    var assign: DataFrame = null
    val w = Window.partitionBy("vec_id").orderBy(col("dist").asc, col("cell").asc)
    for (t <- 1 to iters) {
      val prevAssign = assign
      assign = v.crossJoin(broadcast(cent))
        .withColumn("dist", sqDist(col("e"), col("c")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("vec_id"), col("cell"))
        .pipe(Checkpoints.cut)
      if (prevAssign != null) Checkpoints.release(prevAssign)
      if (t < iters) {
        // per-dim means; rebuild the centroid array ordered by dim
        val prevCent = cent
        cent = assign.join(v, "vec_id")
          .select(col("cell"), posexplode(col("e")).as(Seq("i", "x")))
          .groupBy("cell", "i").agg(avg(col("x")).as("cx"))
          .groupBy("cell")
          .agg(array_sort(collect_list(struct(col("i"), col("cx")))).as("p"))
          .select(col("cell"), expr("transform(p, q -> q.cx)").as("c"))
          .pipe(Checkpoints.cut)
        Checkpoints.release(prevCent)
      }
    }
    Checkpoints.release(cent)
    assign
  }

  // ---------------------------------------------------------------- q48
  /** Final assignment + cluster sizes after [[Iters]] iterations with
    * k = [[K]] — deterministic, mirrored by an unrolled SQL oracle. */
  def q48Kmeans(spark: SparkSession, dir: String): DataFrame = {
    val v = vecs(spark, dir)
    val assign = assignments(v, K, Iters)
    val sizes = assign.groupBy("cell").agg(count(lit(1)).as("cluster_size"))
    assign.join(broadcast(sizes), "cell")
      .select(col("vec_id"), col("cell"), col("cluster_size"))
      .orderBy("vec_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q48_kmeans" -> (q48Kmeans _),
  )

  /** Unrolled Lloyd iterations as chained CTEs (exact mirror of
    * [[assignments]]: a_t from c_(t-1), c_t from a_t). */
  private def kmeansSql(k: Int, iters: Int): String = {
    val steps = (1 to iters).map { t =>
      val cent = if (t < iters)
        s""",
           |c$t AS (
           |  SELECT a.cell, v.i, avg(v.x) AS cx
           |  FROM a$t a JOIN vv v ON a.vec_id = v.vec_id
           |  GROUP BY 1, 2)""".stripMargin
      else ""
      s"""d$t AS (
         |  SELECT v.vec_id, c.cell,
         |         sum((v.x - c.cx) * (v.x - c.cx)) AS dist
         |  FROM vv v JOIN c${t - 1} c ON v.i = c.i
         |  GROUP BY 1, 2),
         |a$t AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell,
         |           row_number() OVER (PARTITION BY vec_id
         |                              ORDER BY dist ASC, cell ASC) AS rk
         |    FROM d$t) z
         |  WHERE rk = 1)$cent""".stripMargin
    }.mkString(",\n")
    s"""WITH v AS (SELECT vec_id, embedding FROM embeddings),
       |vd AS (SELECT vec_id, unnest(generate_series(1, len(embedding))) AS i,
       |       embedding FROM v),
       |vv AS (SELECT vec_id, i,
       |       CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x FROM vd),
       |c0 AS (SELECT CAST(vec_id AS INT) AS cell, i, x AS cx FROM vv
       |       WHERE vec_id < $k),
       |$steps,
       |sizes AS (SELECT cell, CAST(count(*) AS BIGINT) AS cluster_size
       |          FROM a$iters GROUP BY 1)
       |SELECT a.vec_id, a.cell, s.cluster_size
       |FROM a$iters a JOIN sizes s ON a.cell = s.cell
       |ORDER BY vec_id""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q48_kmeans" -> kmeansSql(K, Iters),
  )
}
