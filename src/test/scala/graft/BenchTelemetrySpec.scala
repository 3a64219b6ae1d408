package graft

/** Pins the per-query bench telemetry (VERDICT r10 #1): the capture
  * must (a) see real work — a shuffling aggregate registers stages,
  * tasks and shuffle rows/bytes; (b) reset cleanly between queries;
  * (c) emit the exact JSON schema BENCH_NOTES attribution keys off.
  * A drift in either the capture or the key set fails the build, not
  * the round's flagged-run adjudication. */
class BenchTelemetrySpec extends SparkSpec {

  test("a shuffling aggregate registers stages, tasks and shuffle rows") {
    val t = new BenchTelemetry
    spark.sparkContext.addSparkListener(t)
    try {
      t.reset()
      // two-stage plan: partial agg → exchange → final agg
      spark.range(0, 10000, 1, 4)
        .selectExpr("id % 97 AS k")
        .groupBy("k").count()
        .count()
      org.apache.spark.graft.ListenerBridge.waitUntilEmpty(spark.sparkContext)
      val s = t.snapshot()
      assert(s.stages >= 2, s"expected >=2 stages, got ${s.stages}")
      assert(s.tasks >= s.stages, s"tasks ${s.tasks} < stages ${s.stages}")
      assert(s.maxStageTasks >= 1 && s.maxStageTasks <= s.tasks)
      assert(s.failedTasks == 0)
      // map-side combine emits up to 97 keys per input partition, so
      // the exchange carries [97, 4*97+ε] rows; every written row is
      // read back (single JVM — no lost fetches)
      assert(s.swRows >= 97, s"shuffle write rows ${s.swRows}")
      assert(s.srRows == s.swRows,
        s"read ${s.srRows} != written ${s.swRows}")
      assert(s.swBytes > 0 && s.srBytes > 0)
      assert(s.memSpill == 0 && s.diskSpill == 0)
      assert(s.gcMs >= 0 && s.runMs > 0 && s.cpuMs >= 0)
      assert(s.peakExecMem > 0)
      // box context: load average present on linux; cpu loads in [0,1]
      assert(s.loadAvg >= 0.0)
      assert(s.sysCpu >= 0.0 && s.sysCpu <= 1.0)
      assert(s.procCpu >= 0.0 && s.procCpu <= 1.0)
      // reset() zeroes everything
      t.reset()
      org.apache.spark.graft.ListenerBridge.waitUntilEmpty(spark.sparkContext)
      val z = t.snapshot()
      assert(z.stages == 0 && z.tasks == 0 && z.srRows == 0 &&
        z.swBytes == 0 && z.runMs == 0 && z.peakExecMem == 0)
    } finally spark.sparkContext.removeSparkListener(t)
  }

  test("snapshot json carries exactly the pinned key set, in order") {
    val s = BenchTelemetry.Snap(2, 8, 0, 4, 97, 4096, 97, 4096, 0, 0,
      3, 120, 110, 65536, 1.25, 0.5, 0.25, 512)
    val keys = """"([a-z_]+)":""".r
      .findAllMatchIn(s.json).map(_.group(1)).toSeq
    assert(keys == BenchTelemetry.JsonKeys,
      s"telemetry JSON keys drifted: $keys")
    // doubles are locale-stable 2-decimal (never comma-decimal);
    // longs unquoted
    assert(s.json.contains(""""load_avg":1.25"""))
    assert(!s.json.contains("1,25"), "locale-dependent decimal comma")
    assert(s.json.contains(""""sys_cpu":0.50"""))
    assert(s.json.contains(""""heap_mb":512}"""))
  }

  test("fullLine embeds telemetry and the filtered stamp") {
    val results = Seq(("q01_x", 1.5, true), ("q02_y", 0.5, false))
    val tele = Map("q01_x" -> """{"stages":2}""")
    val line = Bench.fullLine(results, "/x", tele, Some(Seq("q01_x", "q02_y")))
    assert(line.contains(""""telemetry":{"q01_x":{"stages":2}}"""))
    assert(line.contains(""""filtered":["q01_x","q02_y"]"""))
    assert(line.endsWith(""","sf":"/x"}"""))
    // unfiltered, no-telemetry form is byte-identical to the r10 schema
    val plain = Bench.fullLine(results, "/x")
    assert(!plain.contains("telemetry") && !plain.contains("filtered"))
  }
}
