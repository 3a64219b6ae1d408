package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.dot
import graft.sim.KMeans

class KMeansSpec extends SparkSpec {

  private def vecs: DataFrame = Tables(spark, sfDir()).embeddings
    .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  /** WCSS of an assignment under its own induced centroids. */
  private def wcss(v: DataFrame, assign: DataFrame): Double = {
    val cent = assign.join(v, "vec_id")
      .select(col("cell"), posexplode(col("e")).as(Seq("i", "x")))
      .groupBy("cell", "i").agg(avg(col("x")).as("cx"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("i"), col("cx")))).as("p"))
      .select(col("cell"), expr("transform(p, q -> q.cx)").as("c"))
    assign.join(v, "vec_id").join(cent, "cell")
      .select((dot(col("e"), col("e")) + dot(col("c"), col("c"))
        - lit(2.0) * dot(col("e"), col("c"))).as("d"))
      .agg(sum(col("d"))).first().getDouble(0)
  }

  test("q48 is a partition of the corpus with consistent sizes") {
    val rows = KMeans.q48Kmeans(spark, sfDir()).collect()
    val n = vecs.count()
    assert(rows.length == n, "every vector assigned exactly once")
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == n)
    rows.foreach(r => assert((0 until KMeans.K).contains(r.getAs[Int]("cell"))))
    val bySize = rows.groupBy(_.getAs[Int]("cell"))
    bySize.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("cluster_size")).distinct.toSeq ==
        Seq(rs.length.toLong))
    }
  }

  test("Lloyd iterations do not increase the within-cluster SS") {
    val v = vecs
    val w1 = wcss(v, KMeans.assignments(v, KMeans.K, 1))
    val w3 = wcss(v, KMeans.assignments(v, KMeans.K, 3))
    assert(w3 <= w1 * (1 + 1e-9), s"wcss rose: 1 iter $w1 -> 3 iters $w3")
  }

  test("assignments are deterministic across runs") {
    val a = KMeans.q48Kmeans(spark, sfDir()).collect().toSeq
    val b = KMeans.q48Kmeans(spark, sfDir()).collect().toSeq
    assert(a == b)
  }
}
