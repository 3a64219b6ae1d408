package graft

import graft.operators.Association

class AssociationSpec extends SparkSpec {
  import spark.implicits._

  test("rules: hand-computed support, confidence and lift") {
    // A,B together in 3 of 4 baskets; A alone in the 4th with C
    val bi = Seq(
      (1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L),
      (4L, 10L), (4L, 30L))
      .toDF("o", "item")
    val out = Association.rules(bi, 3L, 10).collect()
    assert(out.length == 1, "only (10,20) clears min support 3")
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((10L, 20L, 3L)))
    assert(r.getLong(3) == 4L && r.getLong(4) == 3L)
    assert(math.abs(r.getDouble(5) - 0.75) < 1e-9)  // conf A→B
    assert(math.abs(r.getDouble(6) - 1.0) < 1e-9)   // conf B→A
    assert(math.abs(r.getDouble(7) - 1.0) < 1e-9)   // lift 3·4/(4·3)
  }

  test("rules: duplicate lineitem rows do not inflate support") {
    val bi = Seq((1L, 10L), (1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L)).toDF("o", "item")
    val out = Association.rules(bi, 3L, 10).collect()
    assert(out.length == 1 && out.head.getLong(2) == 3L)
  }

  test("q89: lift-ranked rules come out deterministic and bounded") {
    val out = Association.q89AssociationRules(spark, sfDir()).collect()
    assert(out.length <= Association.TopRules)
    assert(out.forall(_.getLong(2) >= Association.MinSupport))
    val lifts = out.map(_.getDouble(7))
    assert(lifts.zip(lifts.tail).forall { case (x, y) => x >= y })
  }
}
