package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B for the two connected-components paths (BENCH_SCALING.md
  * part 15): min-label propagation ([[graft.graph.Algorithms
  * .connectedComponents]], rounds = diameter) vs star contraction
  * ([[graft.graph.StarContraction]], rounds = O(log n)) on
  *
  *  1. the sf co-purchase graph (dense, small diameter — the shape
  *     where min-label is fine and star pays per-round overhead), and
  *  2. path graphs of growing length (the diameter-adversarial shape
  *     that motivates A43) — min-label only at sizes where diameter
  *     rounds stay affordable, star across the full range.
  *
  * Prints one line per run: algorithm, n, rounds (star), wall,
  * label-agreement with the other path where both ran.
  *
  * Usage: sbt "runMain graft.tools.StarCcAB [sfDir]"
  */
object StarCcAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
        .appName("star-cc-ab").master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val v = body
      (v, (System.nanoTime() - t0) / 1e9)
    }

    // -- 1. co-purchase graph ------------------------------------------
    val t = graft.Tables(spark, dir)
    val e = graft.Checkpoints.cut(graft.graph.CoPurchase.edges(t))
    val und = graft.Checkpoints.cut(
      e.union(e.select(col("dst").as("src"), col("src").as("dst"))))
    val nodes = graft.Checkpoints.cut(
      t.part.select(col("p_partkey").cast("long").as("node")))
    println(s"== copurchase $dir nodes=${nodes.count()} edges=${e.count()}")

    val (ccLbl, ccW) = timed {
      graft.Checkpoints.cut(
        graft.graph.Algorithms.connectedComponents(nodes, und))
    }
    println(f"STARAB copurchase minlabel wall=$ccW%.1fs")
    val ((starLbl, rounds), starW) = timed {
      val (c, r) = graft.graph.StarContraction.componentsWithRounds(
        nodes, e.select(col("src").as("u"), col("dst").as("v")))
      (graft.Checkpoints.cut(c), r)
    }
    println(f"STARAB copurchase star     wall=$starW%.1fs rounds=$rounds")
    val disagree = ccLbl.join(starLbl.select(col("node").as("n2"),
        col("component").as("c2")), col("node") === col("n2"))
      .filter(col("component") =!= col("c2")).count()
    println(s"STARAB copurchase agreement disagree_rows=$disagree")

    // -- 2. path graphs ------------------------------------------------
    def path(n: Long) = {
      val pn = spark.range(n).select(col("id").as("node"))
      val pe = spark.range(n - 1)
        .select(col("id").as("u"), (col("id") + 1).as("v"))
      (graft.Checkpoints.cut(pn), graft.Checkpoints.cut(pe))
    }
    for (n <- Seq(64L, 256L, 1024L)) {
      val (pn, pe) = path(n)
      val pu = pe.select(col("u").as("src"), col("v").as("dst"))
        .union(pe.select(col("v").as("src"), col("u").as("dst")))
      val (lbl, w) = timed {
        graft.graph.Algorithms.connectedComponents(pn, pu).count()
      }
      println(f"STARAB path n=$n%-7d minlabel wall=$w%.1fs (rounds=diameter=${n - 1})")
    }
    for (n <- Seq(64L, 256L, 1024L, 16384L, 262144L)) {
      val (pn, pe) = path(n)
      val ((c, r), w) = timed {
        val (cc, rr) = graft.graph.StarContraction.componentsWithRounds(pn, pe)
        (cc.filter(col("component") =!= 0L).count(), rr)
      }
      println(f"STARAB path n=$n%-7d star     wall=$w%.1fs rounds=$r nonroot_label_errors=$c")
    }

    // -- 3. ccAuto routing (round 12, BENCH_SCALING part 17) -----------
    // dense graph: the probe must converge and match min-label's wall
    // class; paths: the probe must hand off and match star's class.
    val (autoDense, autoDenseW) = timed {
      graft.Checkpoints.cut(graft.graph.StarContraction.ccAuto(
        nodes, e.select(col("src").as("u"), col("dst").as("v"))))
    }
    val adDis = ccLbl.join(autoDense.select(col("node").as("n2"),
        col("component").as("c2")), col("node") === col("n2"))
      .filter(col("component") =!= col("c2")).count()
    println(f"STARAB copurchase ccAuto   wall=$autoDenseW%.1fs disagree_rows=$adDis")
    for (n <- Seq(1024L, 16384L, 262144L)) {
      val (pn, pe) = path(n)
      val (c, w) = timed {
        graft.graph.StarContraction.ccAuto(pn, pe)
          .filter(col("component") =!= 0L).count()
      }
      println(f"STARAB path n=$n%-7d ccAuto   wall=$w%.1fs nonroot_label_errors=$c")
    }
    spark.stop()
  }
}
