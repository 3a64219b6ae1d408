package graft.tools

import org.apache.spark.sql.SparkSession

/** Wall-clock A/B for q164's exact vs xxhash64 gram-key forms at a
  * given corpus (BENCH_SCALING Part 6). Two timed passes per form in
  * one JVM, exact first, after a small warmup — report the second
  * pass of each (code + page cache warm, the ScalingSweep
  * discipline).
  *
  * Usage: sbt "runMain graft.tools.SpanHashBench /tmp/scale10"
  */
object SpanHashBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
        .appName("span-hash-bench").master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup on the tiny corpus: load codegen + classes
    graft.text.SpanOps.duplicateSpans(
      graft.text.TextOps.docs(spark, "/root/testdata/sf0.001"),
      graft.text.SpanOps.SpanGram).count()
    graft.Checkpoints.releaseAll(spark)
    val d = graft.text.TextOps.docs(spark, dir)
    def time(name: String, f: => Long): Unit = {
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = f
        println(f"SPAN $name pass$pass rows=$n%d ${(System.nanoTime() - t0) / 1e9}%.1f s")
        graft.Checkpoints.releaseAll(spark)
      }
    }
    time("exact",
      graft.text.SpanOps.duplicateSpans(d, graft.text.SpanOps.SpanGram).count())
    time("hashed",
      graft.text.SpanOps.duplicateSpansHashed(d, graft.text.SpanOps.SpanGram).count())
    spark.stop()
  }
}
