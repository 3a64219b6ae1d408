package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketized range join equals the naive theta join on random data") {
    val rnd = new scala.util.Random(11)
    val horizon = 30L * 24 * 3600 // seconds
    val points = (1 to 300).map { i =>
      (i.toLong, rnd.nextLong(horizon) * 1000000L + rnd.nextLong(1000000L))
    }.toDF("pid", "ts_us")
    val intervals = (1 to 40).map { i =>
      val start = rnd.nextLong(horizon - 90 * 3600) * 1000000L
      val len = (1 + rnd.nextInt(90)).toLong * 3600 * 1000000L // 1..90 h
      (i.toLong, start, start + len)
    }.toDF("iid", "start_us", "end_us")
    val got = RangeJoin.rangeJoin(points, "ts_us", intervals,
        "start_us", "end_us", RangeJoin.BucketUs)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = points.join(intervals,
        col("ts_us") >= col("start_us") && col("ts_us") < col("end_us"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture should produce matches")
  }

  test("a point on an interval boundary joins start-inclusive, end-exclusive") {
    val h = 3600L * 1000000
    val points = Seq((1L, 24 * h)).toDF("pid", "ts_us")
    val intervals = Seq(
      (1L, 0L, 24 * h),      // ends AT the point
      (2L, 24 * h, 48 * h))  // starts AT the point
      .toDF("iid", "start_us", "end_us")
    val got = RangeJoin.rangeJoin(points, "ts_us", intervals,
        "start_us", "end_us", RangeJoin.BucketUs)
      .select("iid").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L))
  }

  test("the executed range-join plan is an equi-join, not a nested loop") {
    val ev = Tables(spark, sfDir()).events.select(col("ts_us"), col("user_id"))
    val joined = RangeJoin.rangeJoin(ev, "ts_us", RangeJoin.campaigns(spark),
      "start_us", "end_us", RangeJoin.BucketUs)
    joined.count() // execute so AQE finalizes
    def collectNodes(p: SparkPlan): Seq[String] = p match {
      case a: AdaptiveSparkPlanExec => collectNodes(a.executedPlan)
      case other => Seq(other.nodeName) ++ other.children.flatMap(collectNodes) ++
        other.subqueries.flatMap(collectNodes)
    }
    val nodes = collectNodes(joined.queryExecution.executedPlan)
    assert(!nodes.exists(n =>
      n.contains("BroadcastNestedLoopJoin") || n.contains("CartesianProduct")),
      s"range join fell back to a nested loop: $nodes")
  }

  test("RangeJoinRewrite: a naive BETWEEN join plans as an equi-join under the rule") {
    val rnd = new scala.util.Random(13)
    val points = (1 to 200).map { i =>
      (i.toLong, rnd.nextLong(200L * 3600) * 1000000L)
    }.toDF("pid", "ts_us")
    val intervals = (1 to 30).map { i =>
      val start = rnd.nextLong(150L * 3600) * 1000000L
      (i.toLong, start, start + (1 + rnd.nextInt(20)).toLong * 3600 * 1000000L)
    }.toDF("iid", "start_us", "end_us")
    def naive() = points.join(intervals,
      col("ts_us") >= col("start_us") && col("ts_us") < col("end_us"))
    val want = naive().select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ graft.plans.RangeJoinRewrite
    try {
      val rewritten = naive()
      val got = rewritten.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, "rewrite must not change the join's result")
      def collectNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
        p match {
          case a: AdaptiveSparkPlanExec => collectNodes(a.executedPlan)
          case other => Seq(other.nodeName) ++
            other.children.flatMap(collectNodes) ++
            other.subqueries.flatMap(collectNodes)
        }
      val nodes = collectNodes(rewritten.queryExecution.executedPlan)
      assert(!nodes.exists(n => n.contains("BroadcastNestedLoopJoin") ||
        n.contains("CartesianProduct")),
        s"rule did not eliminate the nested loop: $nodes")
    } finally spark.experimental.extraOptimizations = before
  }

  test("RangeJoinRewrite leaves non-matching joins alone") {
    val a = Seq((1L, 2L)).toDF("k", "v")
    val b = Seq((1L, 3L)).toDF("k2", "w")
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ graft.plans.RangeJoinRewrite
    try {
      // equi join: untouched semantics and result
      assert(a.join(b, col("k") === col("k2")).count() == 1)
      // one-sided inequality: not the pattern, must stay a working BNLJ
      assert(a.join(b, col("v") < col("w")).count() == 1)
    } finally spark.experimental.extraOptimizations = before
  }

  test("q77 campaign attribution: all campaigns reported, events attributed") {
    val out = RangeJoin.q77RangeJoin(spark, sfDir()).collect()
    assert(out.length == RangeJoin.Campaigns)
    assert(out.map(_.getLong(1)).sum > 0)
    val w = RangeJoin.campaigns(spark).collect()
    assert(w.forall(r => r.getLong(1) < r.getLong(2)))
  }
}
