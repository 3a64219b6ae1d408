package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decompose the q241 verify-join cost: array carry vs intersect vs
  * witness text vs join strategy. */
object WinnowProfile3 {
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val k = graft.text.SpanOps.PairK
    val w = graft.text.SpanOps.PairW

    def time(name: String)(body: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-34s ${ts.min}%6.2f s (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    val d = graft.Checkpoints.cut(graft.text.TextOps.docs(spark, sfDir))
    val fps = graft.Checkpoints.cut(
      graft.text.SpanOps.winnowingPicks(d, k, w)
        .select(col("doc_id"), expr("mv div 1048576").as("h"),
          (lit(1048575L) - expr("mv % 1048576")).as("pos"))
        .groupBy("doc_id", "h").agg(min(col("pos")).as("pos")))
    val pairs = graft.Checkpoints.cut(
      fps.select(col("h"), col("doc_id").as("doc_a"), col("pos").as("pa"))
        .join(fps.select(col("h"), col("doc_id").as("doc_b"),
          col("pos").as("pb")), Seq("h"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("n_shared_fps"),
          min(struct(col("h"), col("pa"), col("pb"))).as("w0")))
    println(s"pairs: ${pairs.count()}")
    val candDocs = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val ga = graft.Checkpoints.cut(graft.Partitioning.spread(d)
      .join(candDocs, Seq("doc_id"), "left_semi")
      .filter(length(col("s")) >= k + w - 1)
      .select(col("doc_id"),
        graft.functions.DistinctGrams(col("s"), k).as("gs"), col("s")))
    println(s"ga: ${ga.count()}")

    time("A join chain, no compute, no s") {
      noop(pairs
        .join(ga.select(col("doc_id").as("doc_a"), col("gs").as("gs_a")), Seq("doc_a"))
        .join(ga.select(col("doc_id").as("doc_b"), col("gs").as("gs_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"), size(col("gs_a")) + size(col("gs_b"))))
    }
    time("B + array_intersect") {
      noop(pairs
        .join(ga.select(col("doc_id").as("doc_a"), col("gs").as("gs_a")), Seq("doc_a"))
        .join(ga.select(col("doc_id").as("doc_b"), col("gs").as("gs_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("gs_a"), col("gs_b")))))
    }
    time("C full verify as shipped") {
      noop(pairs
        .join(ga.select(col("doc_id").as("doc_a"), col("gs").as("gs_a"),
          size(col("gs")).cast("long").as("sz_a"), col("s").as("s_a")), Seq("doc_a"))
        .join(ga.select(col("doc_id").as("doc_b"), col("gs").as("gs_b"),
          size(col("gs")).cast("long").as("sz_b"), col("s").as("s_b")), Seq("doc_b"))
        .withColumn("inter",
          size(array_intersect(col("gs_a"), col("gs_b"))).cast("long"))
        .filter(col("inter") >= 1)
        .select(col("doc_a"), col("doc_b"), col("n_shared_fps"),
          round(col("inter") /
            (col("sz_a") + col("sz_b") - col("inter")).cast("double"), 6)
            .as("jaccard"),
          col("w0.pa").as("witness_pos_a"), col("w0.pb").as("witness_pos_b"),
          graft.text.SuffixArray.lcpCol(
            expr(s"substring(s_a, cast(w0.pa as int), 256)"),
            expr(s"substring(s_b, cast(w0.pb as int), 256)"))
            .as("witness_lcp")))
    }
    time("D witness via separate narrow join") {
      val core = pairs
        .join(ga.select(col("doc_id").as("doc_a"), col("gs").as("gs_a"),
          size(col("gs")).cast("long").as("sz_a")), Seq("doc_a"))
        .join(ga.select(col("doc_id").as("doc_b"), col("gs").as("gs_b"),
          size(col("gs")).cast("long").as("sz_b")), Seq("doc_b"))
        .withColumn("inter",
          size(array_intersect(col("gs_a"), col("gs_b"))).cast("long"))
        .filter(col("inter") >= 1)
        .select(col("doc_a"), col("doc_b"), col("n_shared_fps"),
          col("inter"), col("sz_a"), col("sz_b"),
          col("w0.pa").as("pa"), col("w0.pb").as("pb"))
      val wit = pairs
        .join(ga.select(col("doc_id").as("doc_a"), col("s").as("s_a")), Seq("doc_a"))
        .join(ga.select(col("doc_id").as("doc_b"), col("s").as("s_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          expr(s"substring(s_a, cast(w0.pa as int), 256)").as("wa"),
          expr(s"substring(s_b, cast(w0.pb as int), 256)").as("wb"))
      noop(core.join(wit, Seq("doc_a", "doc_b")))
    }
    spark.stop()
  }
}
