package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale profile of the E12 survivorship guard on the GLOBAL
  * resolution — the form whose transitive chaining the guard exists
  * for. At 10× (tools/MakeScaleData, 20k parts on the same attribute
  * vocabulary) the unguarded match graph chains into one ~19k-record
  * component (EntityResolution.ErBatch's scaladoc); this tool runs
  * both forms over the same corpus and prints the structural
  * comparison a production owner would ask for: component census
  * (count / max size) unguarded vs cluster census + refinement rounds
  * guarded, plus both walls.
  *
  * Usage: java ... graft.tools.ErGuardProfile [scaleDir] [maxKey]
  * (maxKey bounds p_partkey; 0 = whole corpus — the chained regime).
  */
object ErGuardProfile {

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/scale10"
    val maxKey = if (args.length > 1) args(1).toLong else 0L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
        .appName("er-guard-profile").master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val part0 = graft.Tables(spark, dir).part
    val part = if (maxKey > 0) part0.filter(col("p_partkey") < maxKey)
               else part0
    val nParts = part.count()
    println(s"ERG corpus=$dir maxKey=$maxKey parts=$nParts")

    def census(df: org.apache.spark.sql.DataFrame, label: String,
        wall: Double): Unit = {
      // (entity, n_records, ...) → census over the resolved registry
      val c = df.agg(count(lit(1)).as("n_entities"),
          max(col("n_records")).as("max_cluster"),
          sum(col("n_records")).as("n_records"),
          sum(when(col("n_records") > 1, 1).otherwise(0)).as("n_merged"))
        .collect()(0)
      println(f"ERG $label%-9s wall=$wall%7.1fs entities=${c.getLong(0)}%8d " +
        f"max_cluster=${c.getLong(1)}%6d records=${c.getLong(2)}%8d " +
        f"merged_clusters=${c.getLong(3)}%7d")
    }

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val v = body
      (v, (System.nanoTime() - t0) / 1e9)
    }

    val tau = graft.operators.EntityResolution.ErTau
    // ERG_SKIP_SINGLE=1 skips the unguarded arm (its corpus-diameter
    // CC dominates the tool's wall at scale; skip it when only the
    // guarded reading is under test)
    if (!sys.env.get("ERG_SKIP_SINGLE").contains("1")) {
      val (un, wUn) = timed {
        val d = graft.Checkpoints.cut(
          graft.operators.EntityResolution.resolveEntities(part, tau))
        d.count(); d
      }
      census(un, "single", wUn)
      graft.Checkpoints.releaseAll(spark)
    }

    // ERG_HASH_PRIORITY=1 measures the md5 peeling order instead of
    // min-id (the opt-in for id-order-adversarial corpora) — on the
    // benign scale corpora the two should cost the same
    val hashPrio = sys.env.get("ERG_HASH_PRIORITY").contains("1")
    val rounds = new java.util.concurrent.atomic.AtomicInteger(0)
    val (gd, wGd) = timed {
      val d = graft.Checkpoints.cut(
        graft.operators.EntityResolution.resolveEntitiesGuarded(
          part, tau, Some(rounds), hashPrio))
      d.count(); d
    }
    census(gd, if (hashPrio) "guardedH" else "guarded", wGd)
    println(s"ERG guarded refinement rounds=${rounds.get()}" +
      (if (hashPrio) " (hash priority)" else ""))
    spark.stop()
  }
}
