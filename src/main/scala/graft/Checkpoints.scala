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
        val sc = spark.sparkContext
        // setCheckpointDir stores a fully-qualified URI (scheme added,
        // UUID subdir appended), so raw-string prefix matching against
        // the conf value misfires on scheme-less paths and on sibling
        // dirs sharing a prefix (/a/b vs /a/bc). Qualify the conf path
        // the same way and compare the UUID dir's PARENT component.
        val confPath = new org.apache.hadoop.fs.Path(dir)
        val qualified = confPath
          .getFileSystem(sc.hadoopConfiguration).makeQualified(confPath)
        val existing = sc.getCheckpointDir
        val matches = existing.exists { e =>
          new org.apache.hadoop.fs.Path(e).getParent == qualified
        }
        if (!matches) {
          existing.foreach(e => log.warn(
            s"$ConfKey=$dir overrides existing checkpoint dir $e; " +
              s"resetting to $qualified"))
          sc.setCheckpointDir(dir)
        }
        df.checkpoint()
      case _ => df.localCheckpoint()
    }
  }

  /** [[cut]] unless `df` is ALREADY a cut root (its plan root is the
    * LogicalRDD of a checkpointed RDD) — the idempotent form for call
    * chains where both a composer and its component defensively cut
    * the same relation: q244/winnowingDedupAuto cut the corpus and
    * then call fingerprintPairs, which cuts its input again — a
    * redundant second materialization + storage of an identical
    * relation per query (ADVICE r12). A NON-checkpoint LogicalRDD
    * (e.g. a createDataFrame/zipWithIndex result) still cuts: its RDD
    * lineage would otherwise re-execute per action. */
  def cutOnce(df: DataFrame): DataFrame =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD
          if lr.rdd.isCheckpointed => df
      case _ => cut(df)
    }

  /** Free the cached blocks behind checkpointed DataFrames that are no
    * longer reachable (superseded loop iterations). Without this an
    * iterative algorithm retains every iteration's blocks for the
    * lifetime of the session — at cluster scale that is a memory leak
    * proportional to iterations × frontier size, and even locally the
    * accumulated deserialized blocks degrade GC across a long session.
    * Safe on aliased/released inputs: unpersist is idempotent.
    *
    * Only the frame's OWN checkpoint (the plan root) is freed: a frame
    * merely derived from a checkpoint does not own its ancestor's
    * blocks, and unpersisting every LogicalRDD reachable in the plan
    * would silently free still-needed ancestors (for localCheckpoint,
    * destroying the only copy). Passing a derived frame is a no-op
    * with a warning — release the cut frame itself instead. */
  def release(dfs: DataFrame*): Unit =
    dfs.filter(_ != null).foreach { df =>
      df.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case other => log.warn(
          s"release() called on a non-checkpoint plan root " +
            s"(${other.nodeName}); nothing freed — pass the cut frame")
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
