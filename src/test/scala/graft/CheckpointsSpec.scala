package graft

import org.apache.spark.sql.functions._

class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  test("cutOnce is a no-op on an already-cut frame, a cut otherwise") {
    val df = (1L to 100L).toDF("x").filter(col("x") % 2 === 0)
    val once = Checkpoints.cutOnce(df)
    // a live plan gets cut: the result's root is a checkpointed RDD
    assert(once.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD])
    // cutting the cut frame again returns the SAME frame — no second
    // materialization of an identical relation (ADVICE r12, the
    // q244/fingerprintPairs double-cut)
    assert(Checkpoints.cutOnce(once) eq once)
    assert(once.count() == 50)
  }

  test("cutOnce still cuts a non-checkpoint LogicalRDD (RDD lineage replays)") {
    // a createDataFrame/zipWithIndex frame has a LogicalRDD root but
    // NO materialized blocks — skipping its cut would re-execute the
    // RDD lineage once per consumer
    val viaRdd = Ordinals.dense((1L to 10L).toDF("x"), Seq("x"), "rk")
    val cut = Checkpoints.cutOnce(viaRdd)
    assert(cut ne viaRdd)
    assert(cut.count() == 10)
  }
}
