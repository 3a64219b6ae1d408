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

  test("q93: bins tile the range, counts sum to the table size") {
    val rows = Profile.q93ValueHistogram(spark, sfDir()).collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until Profile.HistBins).toSeq)
    val total = Tables(spark, sfDir()).orders.count()
    assert(rows.map(_.getLong(1)).sum == total)
    // per-bin extrema nest inside their neighbors' boundaries
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2) + 1e-9,
        s"bins overlap: ${a.getLong(0)} max ${a.getDouble(3)} vs " +
          s"${b.getLong(0)} min ${b.getDouble(2)}")
    }
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
