package graft

import graft.text.SuffixArray

class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  private def sa(docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] =
    SuffixArray.suffixArray(docs.toDF("doc_id", "s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("banana: the textbook suffix array") {
    // suffixes sorted: a(6) ana(4) anana(2) banana(1) na(5) nana(3)
    val got = sa(Seq((7L, "banana")))
    assert(got.map(_._3) == Seq(6L, 4L, 2L, 1L, 5L, 3L))
    assert(got.map(_._1) == (1L to 6L))
  }

  test("byte-identical suffixes across docs tie-break by (doc_id, pos)") {
    val got = sa(Seq((1L, "ab"), (2L, "ab")))
    // sorted: ab@(1,1), ab@(2,1), b@(1,2), b@(2,2)
    assert(got.map(t => (t._2, t._3)) ==
      Seq((1L, 1L), (2L, 1L), (1L, 2L), (2L, 2L)))
  }

  test("prefix rule: shorter suffix sorts before its extensions") {
    // "aaaa": suffixes a, aa, aaa, aaaa — ascending length
    val got = sa(Seq((1L, "aaaa")))
    assert(got.map(_._3) == Seq(4L, 3L, 2L, 1L))
  }

  test("matches the scalar suffix sort on a deterministic mixed string") {
    // 60 chars from a 4-letter alphabet via an affine hash — enough
    // repeated substructure to exercise several doubling rounds
    val s = (0 until 60)
      .map(i => "abcd".charAt(((i * 2654435761L + 17) % 4).toInt))
      .mkString
    val expect = (1 to s.length).map(p => (s.substring(p - 1), p.toLong))
      .sortBy(_._1).map(_._2)
    val got = sa(Seq((1L, s))).map(_._3)
    assert(got == expect)
  }

  test("lcp column: mismatch, prefix, disjoint, identical") {
    import org.apache.spark.sql.functions.col
    val got = Seq(("abc", "abd"), ("ab", "abc"), ("x", "y"),
        ("same", "same"), ("", "a"))
      .toDF("a", "b")
      .select(SuffixArray.lcpCol(col("a"), col("b")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L, 2L, 0L, 4L, 0L))
  }

  test("longest repeated substring: planted duplicate run wins") {
    import org.apache.spark.sql.functions.col
    // the 20-char run is planted twice across docs; everything else
    // is unique filler, so the top adjacent-LCP pair must recover it
    val run = "the quick brown fox!"
    val docs = Seq((1L, s"aaa $run bbb"), (2L, s"ccc $run ddd"))
      .toDF("doc_id", "s")
    val sa = SuffixArray.suffixArray(docs)
    val withSuf = sa.join(docs.withColumnRenamed("doc_id", "sd"),
        col("doc_id") === col("sd"))
      .selectExpr("sa_rank", "substring(s, pos, 1000) AS suffix")
    val nxt = withSuf.selectExpr("sa_rank - 1 AS r2", "suffix AS suffix2")
    val best = withSuf.join(nxt, col("sa_rank") === col("r2"))
      .withColumn("lcp", SuffixArray.lcpCol(col("suffix"), col("suffix2")))
      .orderBy(col("lcp").desc).limit(1)
      .selectExpr("lcp", "substring(suffix, 1, lcp) AS repeated")
      .collect()(0)
    // longest common run is " <run> " (the spaces flank it in both docs)
    assert(best.getLong(0) == run.length + 2L,
      s"lcp ${best.getLong(0)} must be the planted run plus flanking spaces")
    assert(best.getString(1) == s" $run ")
  }

  test("empty and null docs are skipped, multiple docs interleave") {
    val got = sa(Seq((1L, "ba"), (2L, ""), (3L, "ab")))
    // suffixes: a@(1,2)? no — "ba": b(1) a(2); "ab": a(1) b(2)
    // sorted: a@(1,2), ab@(3,1), b@(3,2), ba@(1,1)
    assert(got.map(t => (t._2, t._3)) ==
      Seq((1L, 2L), (3L, 1L), (3L, 2L), (1L, 1L)))
  }

  // ------------------------------------------------- rank-table LCPs
  import org.apache.spark.sql.functions.{col, expr, length}

  /** adjacentLcps vs the string-materializing lcpCol probe on the
    * same index — the rank tables must reproduce every adjacent LCP
    * exactly, including byte-identical (short) suffixes whose ranks
    * agree at every horizon. */
  private def lcpAgreement(docs: Seq[(Long, String)]): Unit = {
    val d = docs.toDF("doc_id", "s")
    val idx = SuffixArray.buildIndex(d, retainTables = true)
    val lens = d.select(col("doc_id"), length(col("s")).cast("long").as("len"))
    val got = SuffixArray.adjacentLcps(idx, lens)
      .collect().map(r => (r.getLong(0), r.getLong(5))).toMap
    val withSuf = idx.sa.join(d.withColumnRenamed("doc_id", "sd"),
        col("doc_id") === col("sd"))
      .selectExpr("sa_rank", "substring(s, pos, 100000) AS suffix")
    val nxt = withSuf.selectExpr("sa_rank - 1 AS r2", "suffix AS suffix2")
    val want = withSuf.join(nxt, col("sa_rank") === col("r2"))
      .select(col("sa_rank"),
        SuffixArray.lcpCol(col("suffix"), col("suffix2")).as("lcp"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want, s"rank-table LCPs diverge from string LCPs")
  }

  test("adjacent LCPs from rank tables equal string LCPs (banana)") {
    lcpAgreement(Seq((7L, "banana")))
  }

  test("adjacent LCPs: identical docs (all-equal suffixes, length cap)") {
    lcpAgreement(Seq((1L, "abab"), (2L, "abab"), (3L, "ab")))
  }

  test("adjacent LCPs on a mixed multi-doc corpus with planted runs") {
    val run = "the quick brown fox!"
    lcpAgreement(Seq((1L, s"aaa $run bbb"), (2L, s"ccc $run ddd"),
      (3L, "aaaa"), (4L, "zq")))
  }

  // ------------------------------------------------- q240 search
  test("SA substring search equals brute-force positions and is rank-contiguous") {
    val docs = Seq((1L, "xx hash value yy hash value zz"),
      (2L, "hash value starts here"), (3L, "no match at all"),
      (4L, "hash valuX near miss"))
    val d = docs.toDF("doc_id", "s")
    val sa = SuffixArray.suffixArray(d)
    val pat = "hash value"
    val hits = sa.join(d.withColumnRenamed("doc_id", "sd"),
        col("doc_id") === col("sd"))
      .filter(expr(s"substring(s, cast(pos as int), ${pat.length})") === pat)
      .select("sa_rank", "doc_id", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    // brute force: every (doc, pos) where the pattern occurs
    val brute = docs.flatMap { case (id, s) =>
      (1 to s.length).filter(p => s.startsWith(pat, p - 1)).map(p => (id, p.toLong))
    }.toSet
    assert(hits.map(t => (t._2, t._3)).toSet == brute)
    assert(brute.size == 3)
    // the SA interval property: matching ranks are contiguous
    val ranks = hits.map(_._1)
    assert(ranks == (ranks.min to ranks.max).toSeq,
      s"pattern hits must occupy one contiguous sa_rank interval: $ranks")
  }

  // ------------------------------------- persisted search index probe
  test("persisted index probe equals the in-plan q240 answer and prunes partitions") {
    import org.apache.spark.sql.functions.substring
    val d = text.TextOps.docs(spark, sfDir())
      .filter(col("doc_id") < SuffixArray.SaDocCap)
      .select(col("doc_id"),
        substring(col("s"), 1, SuffixArray.SaMaxLen).as("s"))
    val path = java.nio.file.Files
      .createTempDirectory("graft-sa-index").toString
    try {
      SuffixArray.writeSearchIndex(d, path, nParts = 8)
      // reference: the oracled q240 result on the same universe
      val want = SuffixArray.q240SaSubstringSearch(spark, sfDir())
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1).view
        .mapValues(_.map(t => (t._2, t._3, t._4)).toSeq.sorted).toMap
      var anyPruned = false
      for (pat <- SuffixArray.SearchPatterns) {
        val probe = SuffixArray.searchIndexProbe(spark, path, pat)
        val got = probe.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
        assert(got == want.getOrElse(pat, Seq.empty),
          s"probe('$pat') diverged from the in-plan answer")
        assert(got.nonEmpty, s"pattern '$pat' must occur at this SF")
        // the point probe must NOT scan the whole index: the part
        // selection reaches the scan as a PARTITION filter (directory
        // pruning at planning time), and the bounds table selects a
        // strict subset of the 8 directories for this pattern
        val planStr = probe.queryExecution.executedPlan.toString
        assert("PartitionFilters: \\[[^\\]]*part".r.findFirstIn(planStr).nonEmpty,
          s"part selection not a partition filter:\n$planStr")
        val sel = spark.read.parquet(s"$path/bounds")
          .collect()
          .count(r => r.getAs[String]("max_pref") >= pat &&
            r.getAs[String]("min_pref") <= pat + '\uFFFF')
        if (sel < 8) anyPruned = true
      }
      assert(anyPruned,
        "every probe straddled all 8 index partitions — the bounds " +
          "fence posts are not separating prefix ranges")
      // a pattern past every stored prefix probes zero partitions
      assert(SuffixArray.searchIndexProbe(spark, path, "~~~~").isEmpty)
      // wider-than-stored patterns are rejected loudly
      intercept[IllegalArgumentException] {
        SuffixArray.searchIndexProbe(spark, path,
          "x" * (SuffixArray.SearchPrefLen + 1))
      }
    } finally {
      graft.sources.ParquetSink.deleteRecursively(path)
    }
  }

  // ------------------------------------------------- q242 spans
  test("SA-derived duplicate spans equal the gram-derived q164 spans") {
    val run1 = "one shared duplicated run long enough!!"   // 39 + pad
    val run2 = "another different repeated block here ok"  // 40
    val docs = Seq(
      (1L, s"prefix-a $run1$run1 mid $run2 suffix-a"),
      (2L, s"prefix-b $run2 tail-b"),
      (3L, s"$run1$run1 and nothing else matching x"),
      (4L, "entirely unique content with no repeats anywhere at all"))
      .toDF("doc_id", "s")
    for (tau <- Seq(SuffixArray.SaSpanTau, 40)) {
      val gotSa = SuffixArray.saDuplicateSpans(docs, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val gotGram = text.SpanOps.duplicateSpans(docs, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(gotSa == gotGram,
        s"tau=$tau: SA spans $gotSa must equal gram spans $gotGram")
      assert(gotSa.nonEmpty, s"tau=$tau fixture must contain duplicate spans")
    }
  }
}
