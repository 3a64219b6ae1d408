package graft.tools

import org.apache.spark.sql.SparkSession

/** Recall companion to ScalingSweep's auto-band volume rows: at a
  * given corpus, compares the VERIFIED pair sets (exact Jaccard ≥ 0.5
  * after candidates) of the fixed q21/q22 geometries vs the
  * corpus-derived auto forms. Both sides verify exactly, so the only
  * possible difference is banding recall — the number this prints is
  * the price paid for the auto forms' linear candidate volume.
  *
  * Usage: sbt "runMain graft.tools.AutoBandRecall /tmp/scale10"
  */
object AutoBandRecall {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
        .appName("auto-band-recall").master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = graft.text.TextOps.docs(spark, dir)

    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val t0 = System.nanoTime()
      val s = df.select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"  (pairSet ${(System.nanoTime() - t0) / 1e9}%.1f s)")
      s
    }

    def report(name: String, fixed: Set[(Long, Long)],
        auto: Set[(Long, Long)]): Unit = {
      val inter = (fixed & auto).size
      println(f"RECALL $name fixed=${fixed.size}%d auto=${auto.size}%d " +
        f"inter=$inter%d recall=${inter.toDouble / fixed.size.max(1)}%.4f")
      graft.Checkpoints.releaseAll(spark)
    }

    report("q21",
      pairSet(graft.text.TextOps.ngramJaccardPairs(d, 3, 5)),
      pairSet(graft.text.TextOps.ngramJaccardAuto(d)))
    report("q22",
      pairSet(graft.text.TextOps.minhashPairs(d, 2, 4)),
      pairSet(graft.text.TextOps.minhashAuto(d)))
    // the documented recall knob: one extra band per auto form
    report("q21_bands4",
      pairSet(graft.text.TextOps.ngramJaccardPairs(d, 3, 5)),
      pairSet(graft.text.TextOps.ngramJaccardAuto(d, bands = 4)))
    report("q22_bands3",
      pairSet(graft.text.TextOps.minhashPairs(d, 2, 4)),
      pairSet(graft.text.TextOps.minhashAuto(d, bands = 3)))
    spark.stop()
  }
}
