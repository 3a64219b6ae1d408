package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level probe for q164 (duplicate-span detection): times the
  * gram explode/agg, the dup filter, the join-back, and the islands
  * merge separately so a regression can be attributed. Dev tool. */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
        .appName("span-probe").master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = graft.text.SpanOps.SpanGram

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val v = f
      println(f"PROBE $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.1f s")
      v
    }

    val d = graft.Tables(spark, dir).documents
      .withColumn("s", lower(trim(regexp_replace(col("text"), "\\s+", " "))))
    val pos = d.filter(length(col("s")) >= k)
      .select(col("doc_id"),
        explode(expr(s"sequence(1, length(s) - $k + 1)")).as("pos"),
        col("s"))
      .select(col("doc_id"), col("pos"),
        expr(s"substring(s, cast(pos as int), $k)").as("gram"))
    time("explode")(pos.count())
    val posC = time("cache")(graft.Checkpoints.cut(pos))
    val dup = posC.groupBy("gram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select("gram")
    time("dup_agg")(dup.count())
    val dupPos = posC.join(dup, "gram").select("doc_id", "pos")
    time("joinback")(dupPos.count())
    time("full_q164")(
      graft.text.SpanOps.q164SubstringDedup(spark, dir).count())
    time("full_again")(
      graft.text.SpanOps.q164SubstringDedup(spark, dir).count())
    spark.stop()
  }
}
