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
}
