package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B the r15 in-row winnowing pieces: spread vs no-spread, and the
  * DistinctGrams single vs collapsed-double evaluation. */
object WinnowProfile2 {
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

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time(name: String)(body: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime(); body
        ((System.nanoTime() - t0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9)
      }
      val best = ts.minBy(_._1)
      println(f"$name%-34s wall ${best._1}%6.2f s cpu ${best._2}%6.2f s (${ts.map(t => f"${t._1}%.2f/${t._2}%.2f").mkString(", ")})")
    }

    val d = graft.Checkpoints.cut(graft.text.TextOps.docs(spark, sfDir))
    println(s"d partitions: ${d.rdd.getNumPartitions}")

    val base = d.filter(length(col("s")) >= k + w - 1)
    time("picks no spread") {
      noop(base.select(col("doc_id"),
        explode(graft.functions.WinnowingPicks(col("s"), k, w)).as("mv")))
    }
    time("picks spread") {
      noop(graft.Partitioning.spread(base).select(col("doc_id"),
        explode(graft.functions.WinnowingPicks(col("s"), k, w)).as("mv")))
    }
    time("distinctgrams single") {
      noop(base.select(col("doc_id"),
        graft.functions.DistinctGrams(col("s"), k).as("gs")))
    }
    time("distinctgrams gs+size collapsed") {
      noop(base.select(col("doc_id"),
        graft.functions.DistinctGrams(col("s"), k).as("gs"))
        .select(col("doc_id"), col("gs"), size(col("gs")).as("sz")))
    }
    time("distinctgrams spread") {
      noop(graft.Partitioning.spread(base).select(col("doc_id"),
        graft.functions.DistinctGrams(col("s"), k).as("gs")))
    }
    spark.stop()
  }
}
