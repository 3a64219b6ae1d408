package graft

import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts nulls and exact distincts per column in one frame") {
    val d = Seq(
      (Some(1L), Some("a")), (Some(1L), None),
      (Some(2L), Some("b")), (None, Some("a")))
      .toDF("x", "y")
    val out = Profile.profile(d, Seq("x", "y")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("x") == ((4L, 1L, 2L)))
    assert(out("y") == ((4L, 1L, 2L)))
  }

  test("q83: keys are unique, statuses are low-cardinality") {
    val out = Profile.q83TableProfile(spark, sfDir()).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (rows, _, distinctKeys) = out("o_orderkey")
    assert(distinctKeys == rows, "order keys must be unique")
    assert(out("o_orderstatus")._3 <= 3)
    assert(out.values.forall(_._2 == 0L), "TPC-H columns are non-null")
  }
}
