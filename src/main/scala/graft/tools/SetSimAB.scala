package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Paired A/B of q99's candidate-key representation (hashed 8-byte
  * xxhash64 vs token-string pairs) in ONE JVM, alternating arms so
  * run-order drift shows up inside the reading instead of between
  * sessions (the round-10 lesson: a single cross-session 30× number
  * moved 1.5× on identical code).
  *
  * Usage: java ... graft.tools.SetSimAB <dir> [arms]
  * arms is a comma list of h|s (default h,s,h).
  */
object SetSimAB {

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/scale10"
    val arms = (if (args.length > 1) args(1) else "h,s,h")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
        .appName("setsim-ab").master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val items = graft.Tables(spark, dir).part
      .select(col("p_partkey").cast("long").as("id"),
        col("p_name").as("name"))
    for ((a, i) <- arms.zipWithIndex) {
      val hashed = a == "h"
      val t0 = System.nanoTime()
      val n = graft.operators.SetSimJoin
        .setSimJoin(items, graft.operators.SetSimJoin.Theta, hashed)
        .count()
      println(f"SETSIM arm$i ${if (hashed) "hashed" else "string"}%-7s" +
        f" pairs=$n%12d wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
      graft.Checkpoints.releaseAll(spark)
      System.gc()
    }
    spark.stop()
  }
}
