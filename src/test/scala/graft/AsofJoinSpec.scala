package graft

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks the latest right row at or before each left time") {
    val left = Seq((1L, 100L), (1L, 50L), (2L, 10L)).toDF("k", "t")
    val right = Seq((1L, 40L, "a"), (1L, 100L, "b"), (1L, 100L, "c"),
      (2L, 20L, "z")).toDF("k", "t", "v")
    val out = AsofJoin.asof(left, right, "k", "t", "t", Seq("t", "v"),
        tieCol = "v", prefix = "r_")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getString(3))).toSet
    // equal-time rows match (≤); among ties the greatest tieCol wins;
    // no prior right row → nulls
    assert(out == Set(
      (1L, 100L, Some(100L), "c"),
      (1L, 50L, Some(40L), "a"),
      (2L, 10L, None, null)))
  }

  test("q39 matches each purchase to at most one prior click per user") {
    val rows = AsofJoin.q39AsofJoin(spark, sfDir()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("c_ts_us")))
        assert(r.getAs[Long]("gap_us") >= 0L,
          "matched click must not be after the purchase")
    }
    val ids = rows.map(_.getAs[Long]("p_event_id"))
    assert(ids.distinct.length == ids.length, "one output row per purchase")
  }
}
