package graft

import org.apache.spark.sql.functions._
import graft.operators.JsonOps

class JsonOpsSpec extends SparkSpec {
  import spark.implicits._

  test("get_json_object semantics the rollup relies on: missing/null → NULL") {
    val d = Seq(
      (1L, """{"k": 87}"""),
      (2L, """{"j": 1}"""),   // key absent
      (3L, """{"k": null}"""),
      (4L, "not json"))
      .toDF("id", "props")
      .select(col("id"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(d(1L).contains(87L))
    assert(d(2L).isEmpty && d(3L).isEmpty && d(4L).isEmpty)
  }

  test("q79: every event counted once, coverage bounded by volume") {
    val out = JsonOps.q79JsonExtract(spark, sfDir()).collect()
    assert(out.map(_.getLong(1)).sum == 1000L, "sf0.001 events row count")
    assert(out.forall(r => r.getLong(2) <= r.getLong(1)))
    assert(out.forall(r => r.getLong(2) > 0), "props.k extracts across types")
  }
}
