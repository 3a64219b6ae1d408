package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomJoin

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloom probe has zero false negatives and consistent flags") {
    val dim = (0L until 40L).filter(_ % 4 == 0).toDF("k")
    val probe = (0L until 200L).map(k => (k, s"g${k % 3}"))
      .toDF("k", "o_orderpriority")
    val rows = BloomJoin.bloomFlags(dim, probe).collect()
    assert(rows.length == 200, "probe rows must survive 1:1")
    rows.foreach { r =>
      val (k, pass, member) = (r.getAs[Long]("k"),
        r.getAs[Boolean]("pass"), r.getAs[Boolean]("member"))
      assert(member == (k % 4 == 0 && k < 40), s"membership wrong for $k")
      if (member) assert(pass, s"false negative for member $k")
    }
  }

  test("bloom prune report reconciles against the flag frame at sf") {
    val out = BloomJoin.q133BloomPrune(spark, sfDir()).collect()
    val n = Tables(spark, sfDir()).orders.count()
    assert(out.map(_.getAs[Long]("n_orders")).sum == n)
    out.foreach { r =>
      assert(r.getAs[Long]("n_pass") >= r.getAs[Long]("n_member"),
        "bloom pass set must contain every member")
      assert(r.getAs[Long]("n_false_pos") ==
        r.getAs[Long]("n_pass") - r.getAs[Long]("n_member"))
    }
  }
}
