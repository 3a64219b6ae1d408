package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Dump `.explain("formatted")` for the named queries (or all) to
  * outDir/QUERY_TAG.txt — the plan evidence OPTIMIZATION_r14.md
  * cites (the plans/r14 before/after files).
  *
  * Usage: runMain graft.tools.ExplainDump sfDir outDir tag [q...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = new java.io.File(args(1)); outDir.mkdirs()
    val tag = args(2)
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val f = new java.io.File(outDir, s"${n}_$tag.txt")
      try {
        val plan = SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(f.toPath, plan.getBytes("UTF-8"))
        println(s"wrote $f")
      } catch {
        case e: Throwable => println(s"FAILED $n: ${e.getMessage}")
      } finally graft.Checkpoints.releaseAll(spark)
    }
    spark.stop()
  }
}
