package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale curve for the r13 ordinal rewrites: dense rank and exact
  * ntile over a growing relation, unpartitioned-Window form vs the
  * distributed [[graft.Ordinals]] form (range-partitioned sort +
  * zipWithIndex). The window moves ALL rows to one task by
  * construction (Spark warns exactly that), so its wall is a
  * single-core sort; the Ordinals form keeps every partition busy.
  * Rows are (key, payload) with key = a 64-bit mix of the id —
  * distinct, unsorted on disk, no pre-existing order to exploit.
  *
  * Usage: `graft.tools.OrdinalScale [maxExp]` — measures n =
  * 10^6 … 10^maxExp (default 8). Walls printed per arm; outputs
  * cross-checked (window rank == Ordinals rank on a 10^6 sample).
  */
object OrdinalScale {
  def main(args: Array[String]): Unit = {
    val maxExp = if (args.nonEmpty) args(0).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def corpus(n: Long) = spark.range(n)
      .select((col("id") * 2654435761L % 1000000007L).as("key"),
        col("id").as("payload"))

    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // correctness cross-check at 10^6: identical ranks
    val small = corpus(1000000L).cache(); small.count()
    val viaWin = small.withColumn("rk",
      row_number().over(Window.orderBy("key")).cast("long"))
    val viaOrd = graft.Ordinals.dense(small, Seq("key"), "rk")
    val diff = viaWin.join(viaOrd.withColumnRenamed("rk", "rk2"),
      Seq("key", "payload")).filter(col("rk") =!= col("rk2")).count()
    println(s"ORDSCALE crosscheck diff_rows=$diff (must be 0)")
    small.unpersist()

    for (e <- 6 to maxExp; n = math.pow(10, e).toLong) {
      val (c1, w1) = timed {
        graft.Ordinals.dense(corpus(n), Seq("key"), "rk")
          .filter(col("rk") === n).count()
      }
      println(f"ORDSCALE n=1e$e ordinals wall=$w1%7.1fs sanity=$c1")
      val (c2, w2) = timed {
        corpus(n).withColumn("rk",
            row_number().over(Window.orderBy("key")).cast("long"))
          .filter(col("rk") === n).count()
      }
      println(f"ORDSCALE n=1e$e window   wall=$w2%7.1fs sanity=$c2")
      val (c3, w3) = timed {
        graft.Ordinals.ntileBy(corpus(n), Seq(col("key").asc), 100, "b")
          .groupBy("b").count().count()
      }
      println(f"ORDSCALE n=1e$e ntileBy  wall=$w3%7.1fs buckets=$c3")
      val (c4, w4) = timed {
        corpus(n).withColumn("b",
            ntile(100).over(Window.orderBy("key")).cast("long"))
          .groupBy("b").count().count()
      }
      println(f"ORDSCALE n=1e$e ntileWin wall=$w4%7.1fs buckets=$c4")
    }
    spark.stop()
  }
}
