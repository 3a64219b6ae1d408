package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("q01 exports exactly the projected part properties") {
    val df = Relational.q01PropertyExport(spark, sfDir())
    assert(df.columns.toSeq ==
      Seq("p_partkey", "p_name", "p_brand", "p_retailprice"))
    assert(df.count() == Tables(spark, sfDir()).part.count())
  }

  test("q02 filter predicates reach the parquet scan (pushdown)") {
    val plan = Relational.q02ThresholdFilter(spark, sfDir())
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("o_totalprice"), "price filter not pushed")
  }

  test("q03 yields a descending top-10 with deterministic tie-break") {
    val rows = Relational.q03TopIndegree(spark, sfDir()).collect()
    assert(rows.length == 10)
    val degs = rows.map(_.getAs[Long]("indegree")).toSeq
    assert(degs == degs.sorted.reverse)
  }

  test("q06 node counts match the raw tables") {
    val t = Tables(spark, sfDir())
    val counts = Relational.q06NodeCounts(spark, sfDir()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("customer") == t.customer.count())
    assert(counts("part") == t.part.count())
    assert(counts("nation") == 25L)
  }

  test("q10 breakdown partitions the part table") {
    val t = Tables(spark, sfDir())
    val m = Relational.q10HostedBreakdown(spark, sfDir()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("hosted") + m("not_hosted") == t.part.count())
  }
}
