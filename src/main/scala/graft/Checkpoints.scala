package graft

import org.apache.spark.sql.DataFrame

/** Lineage cutting for iterative plans and reused intermediates.
  *
  * On a real cluster `localCheckpoint` is not fault-tolerant: blocks
  * live only in executor storage, so losing one executor kills the
  * lineage-truncated job. Setting `spark.graft.checkpoint.dir` to a
  * reliable path (HDFS/S3) switches every cut to a reliable
  * `checkpoint`; unset (the local default) it stays the cheap
  * `localCheckpoint`.
  */
object Checkpoints {

  val ConfKey = "spark.graft.checkpoint.dir"

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Materialize `df` and cut its lineage, honoring [[ConfKey]]. If
    * the context already has a different checkpoint dir, the
    * configured one wins (with a warning) — never silently write
    * checkpoints somewhere other than where [[ConfKey]] says. */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey) match {
      case Some(dir) if dir.nonEmpty =>
        val existing = spark.sparkContext.getCheckpointDir
        // setCheckpointDir appends a UUID; match on the parent prefix.
        if (existing.exists(e => !e.startsWith(dir))) {
          log.warn(s"$ConfKey=$dir overrides existing checkpoint dir " +
            s"${existing.get}; resetting to $dir")
          spark.sparkContext.setCheckpointDir(dir)
        } else if (existing.isEmpty) {
          spark.sparkContext.setCheckpointDir(dir)
        }
        df.checkpoint()
      case _ => df.localCheckpoint()
    }
  }

  /** Free the cached blocks behind checkpointed DataFrames that are no
    * longer reachable (superseded loop iterations). Without this an
    * iterative algorithm retains every iteration's blocks for the
    * lifetime of the session — at cluster scale that is a memory leak
    * proportional to iterations × frontier size, and even locally the
    * accumulated deserialized blocks degrade GC across a long session.
    * Safe on aliased/released inputs: unpersist is idempotent. */
  def release(dfs: DataFrame*): Unit =
    dfs.filter(_ != null).foreach { df =>
      df.queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
    }

  /** Drop every persisted RDD and SQL-cached plan in the session —
    * end-of-query hygiene for Verify/Bench, where queries are
    * independent and nothing may carry blocks into the next one. */
  def releaseAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sqlContext.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
