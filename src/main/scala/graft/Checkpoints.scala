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

  /** Materialize `df` and cut its lineage, honoring [[ConfKey]]. */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey) match {
      case Some(dir) if dir.nonEmpty =>
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.sparkContext.setCheckpointDir(dir)
        df.checkpoint()
      case _ => df.localCheckpoint()
    }
  }
}
