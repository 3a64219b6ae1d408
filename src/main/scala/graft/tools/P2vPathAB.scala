package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Alternating-arm A/B for the prod2vec trainer path (VERDICT r12 #4
  * adjudication): LIVE = Checkpoints.cut pair relation + default
  * ppmiRows (the pre-r13 suite path), BUCKETED = scratch u-bucketed
  * table + uncut ppmiRows (BENCH_NOTES_r10 §3's adopted 100 TB
  * layout, wired into the suite entries in r13). Arms alternate in
  * ONE JVM (the PpmiBucketAB discipline — run-order heap effects hit
  * both arms equally); each arm runs the full q228 shape (train +
  * presentation sort + count).
  *
  * Usage: `graft.tools.P2vPathAB <sfDir> [rounds]` (default 3).
  */
object P2vPathAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("p2v-ab-wh").toString)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.Tables(spark, sfDir)

    def live(): DataFrame =
      graft.graph.NodeEmbeddings.project(
        graft.graph.NodeEmbeddings.ppmiRows(
          graft.sim.Prod2Vec.basketPairs(t)),
        graft.graph.NodeEmbeddings.Dims)

    def bucketed(repart: Boolean): DataFrame = {
      val tmp = java.nio.file.Files
        .createTempDirectory("p2v-ab-pairs").toString
      val run = java.util.UUID.randomUUID().toString.replace("-", "")
      val tbl = s"p2v_ab_pairs_$run"
      try {
        val pairs0 = graft.sim.Prod2Vec.basketPairs(t)
        val pairs = if (repart) pairs0.repartition(32, col("u")) else pairs0
        pairs.write.mode("overwrite").format("parquet")
          .option("path", s"$tmp/pairs")
          .bucketBy(32, "u").sortBy("u")
          .saveAsTable(tbl)
        graft.graph.NodeEmbeddings.project(
          graft.graph.NodeEmbeddings.ppmiRows(
            spark.table(tbl), cutInput = false),
          graft.graph.NodeEmbeddings.Dims)
      } finally {
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        graft.sources.ParquetSink.deleteRecursively(tmp)
      }
    }

    def arm(name: String, f: () => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = f().orderBy("node", "dim").count()
      val w = (System.nanoTime() - t0) / 1e9
      graft.Checkpoints.releaseAll(spark)
      System.gc()
      println(f"P2VAB $name%-10s wall=$w%6.1fs rows=$n")
    }

    // one untimed warmup of each shape (codegen + catalog init)
    arm("warm-live", () => live())
    arm("warm-bkt", () => bucketed(repart = true))
    for (_ <- 1 to rounds) {
      arm("live", () => live())
      arm("bucketed", () => bucketed(repart = true))
      arm("bkt-scatter", () => bucketed(repart = false))
    }
    spark.stop()
  }
}
