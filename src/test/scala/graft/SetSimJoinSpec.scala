package graft

import org.apache.spark.sql.functions._
import graft.operators.SetSimJoin

class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  test("prefix-filtered join equals brute force exactly (completeness proof)") {
    // real sf0.001 part names: 200 items → 19 900 brute-force pairs,
    // small enough to enumerate and still drawn from the target data
    val items = Tables(spark, sfDir()).part
      .select(col("p_partkey").cast("long").as("id"), col("p_name").as("name"))
    val filtered = SetSimJoin.setSimJoin(items, SetSimJoin.Theta).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val toks = items.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
    val ids = toks.keys.toSeq.sorted
    val brute = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      inter = (toks(a) & toks(b)).size
      jac = inter.toDouble / (toks(a) ++ toks(b)).size
      if jac >= SetSimJoin.Theta
    } yield (a, b) -> (math.rint(jac * 1e6) / 1e6)).toMap
    assert(filtered.keySet == brute.keySet,
      s"missed: ${(brute.keySet -- filtered.keySet).take(5)}; " +
        s"extra: ${(filtered.keySet -- brute.keySet).take(5)}")
    filtered.foreach { case (k, v) =>
      assert(math.abs(v - brute(k)) < 1e-9, s"jac differs at $k") }
  }

  test("a frequent shared token outside both prefixes still can't lose a pair") {
    // A and B share 4 of 5 tokens; 'zz'/'yy' are globally rare so the
    // COMMON tokens are pushed to the prefix tail — the adversarial
    // case for prefix pruning. jac = 4/6 ≈ 0.667 ≥ 0.6 must survive.
    val items = Seq(
      (1L, "red blue green white zz"),
      (2L, "red blue green white yy"),
      (3L, "red red red red red"), // repeats collapse to one token
      (4L, "black olive plum tan snow"))
      .toDF("id", "name")
    val out = SetSimJoin.setSimJoin(items, 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.contains((1L, 2L)), "the 4/6 pair must be found")
    assert(math.abs(out((1L, 2L)) - 4.0 / 6.0) < 1e-6)
    assert(!out.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      "the single-token item matches nothing at 0.6")
  }
}
