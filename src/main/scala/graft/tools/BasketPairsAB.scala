package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B for q228/q229's co-occurrence builder (the top stage of the
  * suite's #1 wall after round 10's profile): the shipped self-join
  * keyed on the order vs a per-order collect+explode (one groupBy on
  * o, pairs emitted by an in-row lambda — the join replaced by
  * basket-local compute; both end in the same (u, v) count agg).
  * Arms alternate in one JVM (the SetSimAB discipline).
  *
  * Usage: java ... graft.tools.BasketPairsAB <dir> [arms]
  */
object BasketPairsAB {

  /** The candidate variant: explode ordered pairs from each basket. */
  private def explodePairs(t: graft.Tables): DataFrame = {
    val li = t.lineitem
      .select(col("l_orderkey").as("o"),
        col("l_partkey").cast("long").as("p"))
      .distinct()
    li.groupBy("o").agg(collect_list("p").as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, x ->
          |  transform(filter(ps, y -> y != x),
          |    y -> struct(x AS u, y AS v))))""".stripMargin)).as("k"))
      .groupBy(col("k.u").as("u"), col("k.v").as("v"))
      .agg(count(lit(1)).as("n_uv"))
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val arms = (if (args.length > 1) args(1) else "j,e,j,e")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
        .appName("basket-pairs-ab").master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.Tables(spark, dir)
    for ((a, i) <- arms.zipWithIndex) {
      val t0 = System.nanoTime()
      val df = if (a == "j") graft.sim.Prod2Vec.basketPairs(t)
        else explodePairs(t)
      val n = df.count()
      println(f"BASKET arm$i ${if (a == "j") "selfjoin" else "explode"}%-8s" +
        f" rows=$n%10d wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
      System.gc()
    }
    // equality probe: symmetric difference must be empty
    val d1 = graft.sim.Prod2Vec.basketPairs(t)
    val d2 = explodePairs(t)
    val diff = d1.exceptAll(d2).count() + d2.exceptAll(d1).count()
    println(s"BASKET diff_rows=$diff")
    spark.stop()
  }
}
