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
}
