package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling diagnostic for the prefix-doubling suffix array
  * (BENCH_SCALING.md part 16): the oracled q236 runs on a bounded
  * universe (100 docs × 256 chars ≈ 21k suffixes) because the DuckDB
  * mirror materializes suffix STRINGS; this measures the Spark path
  * itself as suffix count and comparison horizon grow:
  *
  *  A. the q236 universe (baseline),
  *  B. every sf document at the same 256-char horizon (~50× the
  *     suffix rows — tests row scaling at constant rounds),
  *  C. every document with its text self-concatenated ×4 and a
  *     2048-char horizon (~16× chars per doc — tests the ⌈log₂ h⌉
  *     round growth; repetition also makes ranks collide longer, the
  *     adversarial case for early exit).
  *
  * Usage: sbt "runMain graft.tools.SuffixScale [sfDir]"
  */
object SuffixScale {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
        .appName("suffix-scale").master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def arm(name: String, docCap: Option[Long], repeat: Int, maxLen: Int): Unit = {
      val base0 = graft.text.TextOps.docs(spark, dir)
      val capped = docCap.map(c => base0.filter(col("doc_id") < c))
        .getOrElse(base0)
      val rep = (1 to repeat).map(_ => col("s"))
      val d = capped.select(col("doc_id"),
        substring(concat(rep: _*), 1, maxLen).as("s"))
      val t0 = System.nanoTime()
      val (sa, rounds) = graft.text.SuffixArray.suffixArrayWithRounds(d)
      val n = sa.count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"SUFSCALE $name%-22s suffixes=$n%9d rounds=$rounds wall=$wall%.1fs")
      graft.Checkpoints.releaseAll(spark)
    }

    arm("A_q236_universe", Some(100L), 1, 256)
    arm("B_all_docs_256", None, 1, 256)
    arm("C_all_docs_x4_2048", None, 4, 2048)
    spark.stop()
  }
}
