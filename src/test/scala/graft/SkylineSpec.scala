package graft

import org.apache.spark.sql.functions._
import graft.operators.Skyline

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Double, Double)]): Set[Long] =
    pts.filter { case (_, ax, ay) =>
      !pts.exists { case (_, bx, by) =>
        bx <= ax && by >= ay && (bx < ax || by > ay)
      }
    }.map(_._1).toSet

  test("skyline equals brute force on real part data") {
    val p = Tables(spark, sfDir()).part.select(
      col("p_partkey").cast("long").as("id"),
      col("p_retailprice").as("x"), col("p_size").cast("double").as("y"))
    val got = Skyline.skyline(p).collect().map(_.getLong(0)).toSet
    val pts = p.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got == brute(pts.toSeq))
    assert(got.nonEmpty)
  }

  test("output is a set property: partition layout cannot change it") {
    val pts = Seq(
      (1L, 1.0, 1.0), (2L, 1.0, 5.0), (3L, 2.0, 5.0), (4L, 2.0, 7.0),
      (5L, 3.0, 7.0), (6L, 0.5, 0.1), (7L, 9.0, 9.0), (8L, 9.0, 9.0))
    val expect = brute(pts)
    // ties: (7,8) are identical maximal points — both must survive
    assert(Set(7L, 8L).subsetOf(expect))
    Seq(1, 3, 7).foreach { n =>
      val df = pts.toDF("id", "x", "y").repartition(n)
      val got = Skyline.skyline(df).collect().map(_.getLong(0)).toSet
      assert(got == expect, s"differs at $n partitions")
    }
  }

  test("every excluded row is dominated by some skyline row") {
    val p = Tables(spark, sfDir()).part.select(
      col("p_partkey").cast("long").as("id"),
      col("p_retailprice").as("x"), col("p_size").cast("double").as("y"))
    val sky = Skyline.skyline(p).collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    val skyIds = Skyline.skyline(p).collect().map(_.getLong(0)).toSet
    p.collect().foreach { r =>
      if (!skyIds.contains(r.getLong(0))) {
        val (ax, ay) = (r.getDouble(1), r.getDouble(2))
        assert(sky.exists { case (bx, by) =>
          bx <= ax && by >= ay && (bx < ax || by > ay)
        }, s"row ${r.getLong(0)} excluded but undominated")
      }
    }
  }
}
