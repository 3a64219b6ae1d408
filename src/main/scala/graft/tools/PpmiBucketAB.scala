package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B for the 30× PPMI trainer wall (VERDICT r9 task #7 /
  * BENCH_SCALING Part 11 addendum): at 600k nodes the pair-relation
  * marginal joins fall from broadcast to sort-merge and the ×16
  * projection spills. Hypothesis: writing the skip-gram pair
  * relation through E8's bucketed sink keyed on the co-occurrence
  * vocab (`u`) lets the marginal join, the projection's (u, dim)
  * partial agg, the norm agg, and the final norm join all reuse the
  * scan's hash partitioning — no exchange/sort of the 33M-row pair
  * relation on the u-keyed path (the v-keyed marginal join still
  * exchanges; that one is irreducible without a second copy).
  *
  * Both arms train from DISK (plain parquet vs bucketed table) via
  * the uncut `ppmiRows(pairs, cutInput = false)` path — the cut
  * would erase the bucketed scan's partitioning (localCheckpoint
  * under AQE → UnknownPartitioning) and re-materialize what the
  * table already materializes. The report prints per-arm walls and
  * the Exchange count in each executed plan.
  *
  * Usage: java ... graft.tools.PpmiBucketAB <dir> [gamma] [len]
  * (30×: SPARK_DRIVER_MEM=32g, /tmp/scale30). PPMI_AB_ARM=plain|
  * bucketed runs ONE arm — the first same-JVM reading showed 47%
  * run-order drift between identical plain runs (heap accumulation;
  * the bench_full.json per-query gc discipline, but at 10× the rows),
  * so the decisive comparison is one arm per JVM on an idle box.
  */
object PpmiBucketAB {

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/scale30"
    val gamma = if (args.length > 1) args(1).toInt else 2
    val len = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
        .appName("ppmi-bucket-ab").master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.warehouse.dir", "/tmp/ppmi_ab_warehouse"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.Tables(spark, dir)

    // same corpus build as WalkScale: symmetrized weighted co-purchase
    // graph → γ walks/node → skip-gram pairs
    val pair = t.lineitem
      .select(col("l_orderkey").as("o"), col("l_partkey").cast("long").as("p"))
      .distinct()
    val half = pair.as("a").join(pair.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("src"), col("b.p").as("dst"))
      .agg(count(lit(1)).as("cnt"))
    val weighted = graft.Checkpoints.cut(
      half.unionByName(half.select(col("dst").as("src"),
        col("src").as("dst"), col("cnt"))))
    val adj = graft.Checkpoints.cut(
      graft.graph.RandomWalks.rankedAdjacency(weighted))
    val seeds = weighted.select(col("src").as("node")).distinct()
      .select(col("node"),
        explode(expr(s"sequence(0, ${gamma - 1})")).as("w"))
      .select((col("node") * gamma + col("w")).as("walk_id"), col("node"))
    val walks = graft.Checkpoints.cut(
      graft.graph.RandomWalks.walkRows(seeds, adj, len))
    val pairs = graft.Checkpoints.cut(
      graft.graph.NodeEmbeddings.skipGramPairs(walks, 2))
    println(s"== $dir pairs=${pairs.count()}")

    def trainWall(name: String, src: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val ppmi = graft.graph.NodeEmbeddings.ppmiRows(src, cutInput = false)
      val emb = graft.graph.NodeEmbeddings.project(
        ppmi, graft.graph.NodeEmbeddings.Dims)
      val n = emb.count()
      val wall = (System.nanoTime() - t0) / 1e9
      // mechanism probe: exchanges in the PPMI stage's physical plan
      // (pre-AQE — project()'s internal cut hides this stage from the
      // executed emb plan, so count it on the ppmi relation directly;
      // a u-bucketed scan should satisfy the u-marginal join's
      // distribution and drop that exchange)
      // executedPlan (NOT sparkPlan: exchanges are only inserted by
      // the EnsureRequirements preparation); under AQE this prints
      // the initial plan with its exchanges — building it does not
      // re-execute the query
      val nEx = "Exchange hashpartitioning".r
        .findAllIn(ppmi.queryExecution.executedPlan.toString).length
      println(f"AB $name%-10s rows=$n%10d wall=$wall%.1fs ppmi_stage_exchanges=$nEx")
    }

    val arm = sys.env.getOrElse("PPMI_AB_ARM", "both")
    val plainPath = "/tmp/ppmi_ab_plain"
    if (arm == "plain" || arm == "both") {
      pairs.write.mode("overwrite").parquet(plainPath)
      trainWall("plain", spark.read.parquet(plainPath))
    }
    if (arm == "bucketed" || arm == "both") {
      // a fresh JVM gets a fresh catalog but the warehouse dir
      // persists — clear both or saveAsTable fails with
      // LOCATION_ALREADY_EXISTS
      spark.sql("DROP TABLE IF EXISTS ppmi_ab_pairs_bucketed")
      val loc = java.nio.file.Paths.get(
        "/tmp/ppmi_ab_warehouse/ppmi_ab_pairs_bucketed")
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
      graft.sources.ParquetSink.writeBucketed(
        pairs, "ppmi_ab_pairs_bucketed", "u", cpus.toInt)
      trainWall("bucketed", spark.table("ppmi_ab_pairs_bucketed"))
    }
    // same-JVM rerun exposes run-order / heap effects (both mode only)
    if (arm == "both")
      trainWall("plain2", spark.read.parquet(plainPath))

    spark.stop()
  }
}
