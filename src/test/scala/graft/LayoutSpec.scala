package graft

import graft.operators.Layout
import org.apache.spark.sql.functions.col

class LayoutSpec extends SparkSpec {

  test("zorder: on a full grid the probe box is exactly one morton block") {
    import spark.implicits._
    // one row per (x, y) cell of the 16x16 bucket grid — bounds make
    // bucketization the identity, so file geometry is exact: each
    // zorder file is a 4x4 square, each linear file a 16-cell column
    val fact = (0 until 256).map(i => (i / 16, i % 16))
      .toDF("x", "y")
      .select(col("x").cast("long").as("x"), col("y").cast("long").as("y"))
    val out = Layout.pruningReport(fact).collect()
      .map(r => r.getString(0) -> r).toMap
    val zo = out("zorder"); val li = out("linear")
    assert(zo.getLong(1) == 16 && li.getLong(1) == 16) // 16 files each
    // probe box bx in [4,7], by in [8,11] is one 4x4 morton square:
    // zorder touches 1 file / 16 rows; linear needs every bx column
    // in range: 4 files / 64 rows — for the same 16 matching rows
    assert(zo.getLong(2) == 1 && zo.getLong(3) == 16)
    assert(li.getLong(2) == 4 && li.getLong(3) == 64)
    assert(zo.getLong(4) == 16 && li.getLong(4) == 16)
    assert(zo.getLong(5) == 256 && li.getLong(5) == 256)
  }

  test("zorder on lineitem: never scans more rows than linear, both find the same matches") {
    val out = Layout.q139ZorderLayout(spark, sfDir()).collect()
      .map(r => r.getString(0) -> r).toMap
    val zo = out("zorder"); val li = out("linear")
    assert(zo.getLong(4) == li.getLong(4), "same true matches")
    assert(zo.getLong(5) == li.getLong(5), "same total rows")
    assert(zo.getLong(3) <= li.getLong(3), "zorder prunes at least as hard")
    assert(zo.getLong(3) >= zo.getLong(4), "scan covers all matches")
  }
}
