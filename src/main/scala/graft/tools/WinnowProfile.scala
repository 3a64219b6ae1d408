package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-by-stage timing of the q241/q244 winnowing-pair pipeline
  * (guide §1.1/§1.4: find WHERE the 17 s of task CPU goes before
  * touching anything). Each stage is timed with a noop sink over the
  * stage's own output, built on a FRESH copy of the pipeline up to
  * that point (checkpoints released between runs), so stage N's time
  * includes its inputs' cached reads but not their recompute.
  *
  * Usage: runMain graft.tools.WinnowProfile <sfDir> [reps]
  */
object WinnowProfile {
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
      println(f"$name%-28s ${ts.min}%6.2f s (min of $reps: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    val d = graft.Checkpoints.cut(graft.text.TextOps.docs(spark, sfDir))

    // stage 1: positioned grams (scan + explode), materialized
    time("1 grams cut") {
      val grams = d.filter(length(col("s")) >= k + w - 1)
        .select(col("doc_id"),
          explode(graft.functions.PositionedGrams(col("s"), k)).as("pg"))
        .select(col("doc_id"), col("pg.pos").as("pos"),
          col("pg.gram").as("gram"))
      noop(grams)
    }
    val grams = graft.Checkpoints.cut(
      d.filter(length(col("s")) >= k + w - 1)
        .select(col("doc_id"),
          explode(graft.functions.PositionedGrams(col("s"), k)).as("pg"))
        .select(col("doc_id"), col("pg.pos").as("pos"),
          col("pg.gram").as("gram")))

    // stage 2a: md5 composite value only
    time("2a md5 composite") {
      noop(grams.select(col("doc_id"), col("pos"),
        (conv(substring(md5(col("gram")), 1, 10), 16, 10).cast("long")
          * lit(1048576L) + (lit(1048575L) - col("pos"))).as("v")))
    }
    // stage 2b: window min + distinct + groupBy → fps
    val win = Window.partitionBy("doc_id").orderBy("pos")
      .rangeBetween(-(w - 1), 0)
    def vCol = when(col("pos") <= lit(1048575L),
      conv(substring(md5(col("gram")), 1, 10), 16, 10).cast("long")
        * lit(1048576L) + (lit(1048575L) - col("pos")))
      .otherwise(lit(null).cast("long"))
    time("2b window+distinct+fps") {
      noop(grams.select(col("doc_id"), col("pos"), vCol.as("v"))
        .withColumn("mv", min(col("v")).over(win))
        .filter(col("pos") >= w)
        .select(col("doc_id"), col("mv")).distinct()
        .select(col("doc_id"), expr("mv div 1048576").as("h"),
          (lit(1048575L) - expr("mv % 1048576")).as("pos"))
        .groupBy("doc_id", "h").agg(min(col("pos")).as("pos")))
    }
    val fps = graft.Checkpoints.cut(
      grams.select(col("doc_id"), col("pos"), vCol.as("v"))
        .withColumn("mv", min(col("v")).over(win))
        .filter(col("pos") >= w)
        .select(col("doc_id"), col("mv")).distinct()
        .select(col("doc_id"), expr("mv div 1048576").as("h"),
          (lit(1048575L) - expr("mv % 1048576")).as("pos"))
        .groupBy("doc_id", "h").agg(min(col("pos")).as("pos")))
    println(s"  fps rows: ${fps.count()}")

    // stage 3: pair join + agg
    time("3 pair join+agg") {
      noop(fps.select(col("h"), col("doc_id").as("doc_a"), col("pos").as("pa"))
        .join(fps.select(col("h"), col("doc_id").as("doc_b"),
          col("pos").as("pb")), Seq("h"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("n_shared_fps"),
          min(struct(col("h"), col("pa"), col("pb"))).as("w0")))
    }
    val pairs = graft.Checkpoints.cut(
      fps.select(col("h"), col("doc_id").as("doc_a"), col("pos").as("pa"))
        .join(fps.select(col("h"), col("doc_id").as("doc_b"),
          col("pos").as("pb")), Seq("h"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("n_shared_fps"),
          min(struct(col("h"), col("pa"), col("pb"))).as("w0")))
    println(s"  pairs rows: ${pairs.count()}")
    // pair-fanout profile: how many pairs does each doc ride?
    val fan = pairs.select(col("doc_a").as("d")).union(
      pairs.select(col("doc_b").as("d"))).groupBy("d").count()
      .agg(max("count").as("mx"), avg("count").as("av"),
        count(lit(1)).as("docs")).first()
    println(s"  pair fanout: max=${fan.getLong(0)} avg=${fan.getDouble(1)}%.1f over ${fan.getLong(2)} docs")

    // stage 4: per-doc distinct gram arrays + text
    time("4 ga arrays") {
      noop(grams.select(col("doc_id"), col("gram")).distinct()
        .groupBy("doc_id")
        .agg(collect_list(col("gram")).as("gs"), count(lit(1)).as("sz"))
        .join(d.select(col("doc_id"), col("s")), Seq("doc_id")))
    }
    val ga = graft.Checkpoints.cut(
      grams.select(col("doc_id"), col("gram")).distinct()
        .groupBy("doc_id")
        .agg(collect_list(col("gram")).as("gs"), count(lit(1)).as("sz"))
        .join(d.select(col("doc_id"), col("s")), Seq("doc_id")))

    // stage 5: in-row verify
    time("5 verify in-row") {
      noop(pairs
        .join(ga.select(col("doc_id").as("doc_a"), col("gs").as("gs_a"),
          col("sz").as("sz_a"), col("s").as("s_a")), Seq("doc_a"))
        .join(ga.select(col("doc_id").as("doc_b"), col("gs").as("gs_b"),
          col("sz").as("sz_b"), col("s").as("s_b")), Seq("doc_b"))
        .withColumn("inter",
          size(array_intersect(col("gs_a"), col("gs_b"))).cast("long"))
        .filter(col("inter") >= 1)
        .select(col("doc_a"), col("doc_b"), col("n_shared_fps"),
          round(col("inter") /
            (col("sz_a") + col("sz_b") - col("inter")).cast("double"), 6)
            .as("jaccard"),
          col("w0.pa").as("witness_pos_a"), col("w0.pb").as("witness_pos_b"),
          graft.text.SuffixArray.lcpCol(
            expr(s"substring(s_a, cast(w0.pa as int), ${graft.text.SpanOps.WitnessCap})"),
            expr(s"substring(s_b, cast(w0.pb as int), ${graft.text.SpanOps.WitnessCap})"))
            .as("witness_lcp")))
    }
    spark.stop()
  }
}
