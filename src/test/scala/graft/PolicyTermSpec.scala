package graft

import org.apache.spark.sql.functions._
import graft.text.{PolicyOps, TermOps}

class PolicyTermSpec extends SparkSpec {
  import spark.implicits._

  // docs arrive normalized (lowercase, collapsed whitespace) — the
  // fixtures mirror TextOps.docs' contract
  private def frame(rows: (Long, String)*) = rows.toDF("doc_id", "s")

  test("policy report finds planted emails, IPs, phones and blocklist terms") {
    val d = frame(
      1L -> "contact bob@example.com or call 555-123-4567 now",
      2L -> "server at 192.168.0.1 and 10.0.0.2 is slow slow dup",
      3L -> "a perfectly clean document")
    val out = PolicyOps.policyReport(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(6)))).toMap
    assert(out(1L) == ((0L, 1L, 0L, 1L, true)))
    assert(out(2L) == ((3L, 0L, 2L, 0L, true)))
    assert(out(3L) == ((0L, 0L, 0L, 0L, false)))
  }

  test("redaction fingerprint equals md5 of the hand-redacted text") {
    val d = frame(1L -> "mail bob@example.com about the dup at 10.0.0.2")
    val fp = PolicyOps.policyReport(d).collect().head.getString(5)
    val expected = "mail <email> about the <term> at <ip>"
    val want = spark.range(1).select(md5(lit(expected))).collect().head.getString(0)
    assert(fp == want)
  }

  test("blocklist matches whole words only") {
    val d = frame(1L -> "duplicate slowly backups") // substrings, not words
    val r = PolicyOps.policyReport(d).collect().head
    assert(r.getLong(1) == 0L && !r.getBoolean(6))
  }

  test("tfidf: corpus-wide terms score zero, distinctive terms rank first") {
    val d = frame(1L -> "a b", 2L -> "a c")
    val rows = TermOps.tfidfTopTerms(d, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(5)))
    // 'a' is in every doc → idf = ln(1) = 0; the distinctive term wins
    assert(rows.toSeq == Seq(
      (1L, 1L, "b", math.BigDecimal(math.log(2)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble),
      (1L, 2L, "a", 0.0),
      (2L, 1L, "c", math.BigDecimal(math.log(2)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble),
      (2L, 2L, "a", 0.0)))
  }

  test("bm25: tf monotone at equal length, termless docs absent") {
    val d = frame(
      1L -> "spark spark spark pad pad",
      2L -> "spark pad pad pad pad",
      3L -> "pad pad pad pad pad",
      4L -> "spark hash window merge")
    val rows = TermOps.bm25(d, TermOps.Bm25Terms, TermOps.Bm25TopK)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(!rows.contains(3L), "doc without query terms never scores")
    assert(rows(1L)._2 > rows(2L)._2,
      "higher tf at equal length must outscore")
    assert(rows(4L)._1 == 4L, "all four query terms matched")
    assert(rows.values.forall(_._2 > 0.0), "BM25+ idf keeps scores positive")
  }

  test("bigram nll: hand-computed smoothed NLL, short docs absent") {
    // corpus: doc1 "a b a b", doc2 "a b", doc3 "c" (no bigram)
    // bigrams: (a,b)×3, (b,a)×1 ; unigrams: a=3, b=3, c=1 ; V=3
    val d = frame(1L -> "a b a b", 2L -> "a b", 3L -> "c")
    val out = TermOps.bigramNll(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(!out.contains(3L), "a one-token doc has no bigrams")
    val pAB = math.log((3.0 + 3) / (3 + 1.0)) // -ln((3+1)/(3+3))
    val pBA = math.log((3.0 + 3) / (1 + 1.0))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L)._1 == 3L)
    assert(math.abs(out(1L)._2 - r6((pAB + pBA + pAB) / 3)) < 1e-6)
    assert(out(2L) == ((1L, r6(pAB))))
    // the doc repeating the corpus's dominant bigram scores LOWER
    assert(out(1L)._2 < pBA, "frequent sequences must be cheaper")
  }

  test("unigram logprob: hand-computed NLL on a two-doc corpus") {
    val d = frame(1L -> "a b", 2L -> "a c")
    val out = TermOps.unigramLogprob(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // tokens: a=2, b=1, c=1, total=4
    val nll1 = (math.log(4.0 / 2) + math.log(4.0 / 1)) / 2
    assert(out(1L)._1 == 2L)
    assert(math.abs(out(1L)._2 - nll1) < 1e-6)
    assert(out(1L)._2 == out(2L)._2, "symmetric docs score identically")
  }

  test("rare-vocabulary documents score higher NLL than common-vocabulary ones") {
    val d = frame(
      1L -> "x x x x x x x x",
      2L -> "q w e r t y u i")
    val out = TermOps.unigramLogprob(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(2L) > out(1L))
  }

  test("tfidf cosine knn matches an in-memory reference ranking") {
    // 5 docs, every term's df < n so all idf weights are non-zero.
    // Reference recomputes tf-idf cosine in memory.
    val docs = Seq(
      0L -> "apple apple banana cherry",
      1L -> "banana banana cherry cherry date",
      2L -> "cherry cherry cherry banana date",
      3L -> "apple banana banana cherry",
      4L -> "date date date")
    val out = TermOps.tfidfCosineKnn(docs.toDF("doc_id", "s"), 25, 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank")) ->
        ((r.getAs[Long]("nbr"), r.getAs[Double]("sim")))).toMap
    val n = docs.length.toDouble
    val tf = docs.map { case (id, s) =>
      id -> s.split(" ").groupBy(identity).map { case (w, a) => w -> a.length }
    }.toMap
    val dfm = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (w, a) => w -> a.size }
    def vec(id: Long) = tf(id).map { case (w, t) =>
      w -> BigDecimal(t * math.log(n / dfm(w)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble }
    def cos(a: Long, b: Long): Double = {
      val (va, vb) = (vec(a), vec(b))
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val dot = va.keySet.intersect(vb.keySet).toSeq
        .map(w => r6(va(w) * vb(w))).sum
      val na = math.sqrt(va.values.map(x => r6(x * x)).sum)
      val nb = math.sqrt(vb.values.map(x => r6(x * x)).sum)
      dot / (na * nb)
    }
    for (id <- 0L to 4L) {
      val expect = (0L to 4L).filter(_ != id)
        .map(o => o -> cos(id, o))
        .sortBy { case (o, s) =>
          (-BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP), o) }
        .take(2)
      expect.zipWithIndex.foreach { case ((o, s), i) =>
        val (nbr, sim) = out((id, i + 1L))
        assert(nbr == o, s"doc $id rank ${i + 1}: got $nbr want $o")
        assert(math.abs(sim - s) < 1e-5)
      }
    }
  }

  test("bpe merges follow the hand-derived greedy schedule") {
    // types: abab ×3, aab ×2. Pair counts round 1 (positional,
    // weighted): (a,b) 3·2+2 = 8, (b,a) 3, (a,a) 2 → merge ab.
    // Round 2 over {|ab||ab| ×3, |a||ab| ×2}: (ab,ab) 3, (a,ab) 2
    // → merge abab. Round 3: only (a,ab) 2 remains.
    val wf = Seq(("abab", 3L), ("aab", 2L)).toDF("word", "freq")
    val rules = TermOps.bpeMerges(wf, 3)
    assert(rules == Seq(
      (1L, "a", "b", 8L),
      (2L, "ab", "ab", 3L),
      (3L, "a", "ab", 2L)))
  }

  test("bpe greedy merge scans left-to-right: aaa yields one aa, not two") {
    // word aaaa ×1: round 1 (a,a) counts 3 positionally; the merge
    // rewrites |a||a||a||a| → |aa||aa| (greedy non-overlap), so
    // round 2 must see (aa,aa)=1 — NOT (a,aa) or (aa,a), which would
    // betray an overlap-aware or right-to-left scan.
    val wf = Seq(("aaaa", 1L)).toDF("word", "freq")
    val rules = TermOps.bpeMerges(wf, 2)
    assert(rules == Seq((1L, "a", "a", 3L), (2L, "aa", "aa", 1L)))
  }

  test("lexical diversity: hand-counted tokens, types, hapax and ratios") {
    val d = Seq((1L, "a a b"), (2L, "x y z")).toDF("doc_id", "s")
    val out = TermOps.lexicalDiversity(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5)))).toMap
    assert(out(1L) == ((3L, 2L, 1L, 0.666667, 0.5)))
    assert(out(2L) == ((3L, 3L, 3L, 1.0, 1.0)))
  }

  test("zipf fit: an exact power-law corpus recovers slope -1 with r2 = 1") {
    // counts 6, 3, 2 at ranks 1, 2, 3: ln(cnt) = ln 6 - ln(rank)
    val d = Seq((1L, "x x x x x x y y y z z")).toDF("doc_id", "s")
    val r = TermOps.zipfFit(d, 100).collect().head
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == -1.0, s"slope ${r.getDouble(1)}")
    assert(r.getDouble(2) == 1.791759, s"intercept ${r.getDouble(2)}")
    assert(r.getDouble(3) == 1.0, s"r2 ${r.getDouble(3)}")
  }

  test("q168 applyMerges: rule-order literal replace, chars conserved") {
    val wf = Seq(("lower", 5L), ("low", 3L), ("aaaa", 2L), ("x", 1L))
      .toDF("word", "freq")
    val rules = Seq((1L, "l", "o", 9L), (2L, "lo", "w", 8L), (3L, "a", "a", 2L))
    val enc = TermOps.applyMerges(wf, rules)
      .selectExpr("word", "trim(BOTH '|' FROM sym) AS t")
      .as[(String, String)].collect().toMap
    // merges compose in order: l+o -> lo, lo+w -> low
    assert(enc("low") == "low")
    assert(enc("lower") == "low||e||r")
    // one replace pass per rule merges all non-overlapping pairs
    assert(enc("aaaa") == "aa||aa")
    assert(enc("x") == "x")
    // character conservation: concatenated symbols == the word
    enc.foreach { case (w, t) => assert(t.split("\\|\\|").mkString == w) }
  }

  test("q168 per-doc costing: token counts bounded and consistent") {
    val docs = Seq(
      (1L, "aa aa bb Nope!"), // one skipped word
      (2L, "aa bb aa bb aa"),
      (3L, "???"),            // nothing encodable
    ).toDF("doc_id", "s")
    val out = TermOps.bpeEncodeCost(docs)
      .as[(Long, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    val (_, w1, t1, s1, c1) = out(1L)
    assert(w1 == 3L && s1 == 1L)
    assert(t1 >= w1 && t1 <= 6L) // between word count and char count
    assert(c1.isDefined)
    val (_, w3, t3, s3, c3) = out(3L)
    assert(w3 == 0L && t3 == 0L && s3 == 1L && c3.isEmpty)
  }

  test("kneser-ney: hand-computed interpolated probabilities, continuation penalty") {
    // corpus: doc1 "a b a b", doc2 "a b", doc3 "a c"
    // bigram tokens: (a,b)x3, (b,a)x1, (a,c)x1  -> types T=3
    // c(a.)=4, c(b.)=1 ; N1+(a,.)=2, N1+(b,.)=1
    // N1+(.,b)=1, N1+(.,a)=1, N1+(.,c)=1
    val d = frame(1L -> "a b a b", 2L -> "a b", 3L -> "a c")
    val D = TermOps.KnDiscount
    def p(cb: Long, cx: Long, n1u: Long, ncw: Long, t: Long): Double =
      (cb - D) / cx + (D * n1u / cx) * (ncw.toDouble / t)
    val pAB = p(3, 4, 2, 1, 3)
    val pBA = p(1, 1, 1, 1, 3)
    val pAC = p(1, 4, 2, 1, 3)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = TermOps.kneserNeyNll(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out(1L)._1 == 3L)
    assert(math.abs(out(1L)._2 - r6((-math.log(pAB) - math.log(pBA) - math.log(pAB)) / 3)) < 1e-6)
    assert(out(2L) == ((1L, r6(-math.log(pAB)),
      BigDecimal(math.exp(r6(-math.log(pAB)))).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(math.abs(out(3L)._2 - r6(-math.log(pAC))) < 1e-6)
    // KN's point: the common continuation (a,b) is cheaper than the
    // single-collocation bigram (a,c) sharing the same context
    assert(pAB > pAC && out(3L)._2 > out(1L)._2)
    // perplexity is exp of the mean NLL
    out.values.foreach { case (_, nll, ppl) =>
      assert(math.abs(ppl - math.exp(nll)) < 1e-3)
    }
    // probabilities are a proper partial distribution: sum over seen
    // continuations of each context is <= 1
    assert(pAB + pAC <= 1.0 + 1e-9 && pBA <= 1.0 + 1e-9)
  }

  // ------------------------------------------------------------- q220

  private def scan(phrases: Seq[String], rows: (Long, String)*) =
    PolicyOps.phraseScan(frame(rows: _*), phrases).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap

  test("duplicate phrases rejected; empty blocklist short-circuits to the zero report") {
    // PhraseHits counts per phrase, so a duplicate would double-count
    // silently — construction must fail there. PhraseRedact coverage
    // is idempotent under duplicates, so it deduplicates instead
    // (ADVICE r10): the duplicated list must behave as the set.
    intercept[IllegalArgumentException] {
      graft.functions.PhraseHits(col("s"), Seq("a b", "a b"))
    }
    val d2 = frame(1L -> "a b c")
    val dup = d2.select(graft.functions.PhraseRedact(col("s"),
      Seq("a b", "a b")).as("r")).selectExpr("r.red", "r.n_covered")
      .collect().head
    val set = d2.select(graft.functions.PhraseRedact(col("s"),
      Seq("a b")).as("r")).selectExpr("r.red", "r.n_covered")
      .collect().head
    assert(dup == set)
    // empty derived list (a corpus with no '0'-'3' md5-class bigram)
    // must yield the oracle's LEFT JOIN all-zero rows, not a crash
    val d = frame(1L -> "a b", 2L -> "c")
    val s0 = PolicyOps.phraseScan(d, Nil).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(s0.toSeq == Seq((1L, 0L, 0L, false), (2L, 0L, 0L, false)))
    val r0 = PolicyOps.phraseRedact(d, Nil).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
    val fp = d.sparkSession.range(1)
      .select(md5(lit("a b")), md5(lit("c"))).collect().head
    assert(r0.toSeq == Seq((1L, 0L, fp.getString(0), false),
      (2L, 0L, fp.getString(1), false)))
  }

  test("derivedBlocklist cap: bounded collect, clear error when exceeded") {
    val d = frame(1L -> "aa bb cc dd ee ff gg hh ii jj kk ll mm nn")
    val full = PolicyOps.derivedBlocklist(d)
    assert(full.nonEmpty && full == full.distinct.sorted)
    // a cap below the derived size must error (never a silent trim —
    // results would drift from the uncapped oracle)
    val e = intercept[IllegalArgumentException] {
      PolicyOps.derivedBlocklist(d, maxPhrases = full.size - 1)
    }
    assert(e.getMessage.contains("curated list"))
    // at exactly the cap, the list is unchanged
    assert(PolicyOps.derivedBlocklist(d, maxPhrases = full.size) == full)
  }

  test("phrase scan counts whole-word-aligned occurrences incl. overlaps") {
    val out = scan(Seq("a b", "b a", "x"),
      1L -> "a b a b a",   // "a b" twice, "b a" twice (shared spaces)
      2L -> "xa b xx ax",  // no whole-word match anywhere
      3L -> "x",           // single word, at both string edges
      4L -> "c x c x c")
    assert(out(1L) == ((4L, 2L, true)), s"got ${out(1L)}")
    assert(out(2L) == ((0L, 0L, false)))
    assert(out(3L) == ((1L, 1L, true)))
    assert(out(4L) == ((2L, 1L, true)))
  }

  test("phrase scan handles nested/suffix phrases via the output chain") {
    // "b c" is a suffix of "a b c" — one pass must report both
    val out = scan(Seq("a b c", "b c", "c"),
      1L -> "a b c d",
      2L -> "b c")
    assert(out(1L) == ((3L, 3L, true)), s"got ${out(1L)}")
    assert(out(2L) == ((2L, 2L, true)))
  }

  private def redact(phrases: Seq[String], s: String): (String, Long) = {
    val row = frame(1L -> s).select(
      graft.functions.PhraseRedact(col("s"), phrases).as("r"))
      .select("r.red", "r.n_covered").collect().head
    // the query-shape fingerprint agrees with md5 of the raw text
    val fp = PolicyOps.phraseRedact(frame(1L -> s), phrases)
      .collect().head.getString(2)
    val want = frame(1L -> s).sparkSession.range(1)
      .select(md5(lit(row.getString(0)))).collect().head.getString(0)
    assert(fp == want)
    (row.getString(0), row.getInt(1).toLong)
  }

  test("phrase redaction covers every word of every occurrence, overlaps union") {
    assert(redact(Seq("a b", "b a"), "a b a b a") ==
      (("<term> <term> <term> <term> <term>", 5L)))
    assert(redact(Seq("a b"), "x a b y a b") ==
      (("x <term> <term> y <term> <term>", 4L)))
    assert(redact(Seq("a b c", "c"), "z a b c z") ==
      (("z <term> <term> <term> z", 3L)))
    assert(redact(Seq("q r"), "no match here") == (("no match here", 0L)))
    // boundary: phrase words must match whole words
    assert(redact(Seq("a b"), "xa b a bx") == (("xa b a bx", 0L)))
  }

  test("q221 equals the positions-join coverage formulation on the corpus") {
    for (sf <- Seq("0.001", "0.01")) {
      val d = graft.text.TextOps.docs(spark, sfDir(sf))
      val phrases = PolicyOps.derivedBlocklist(d)
      val got = PolicyOps.phraseRedact(d, phrases).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      // positions-join reference: covered = member of a blocklisted
      // adjacent pair (the harness list is all bigrams)
      val wp = d.withColumn("ws", split(col("s"), " "))
        .select(col("doc_id"), col("ws"),
          explode(expr("sequence(1, size(ws))")).as("i"))
        .select(col("doc_id"), col("i"), expr("ws[i-1]").as("word"),
          expr("""i < size(ws) AND
            substring(md5(concat(ws[i-1], ' ', ws[i])), 1, 1) <= '3'""")
            .as("left_hit"),
          expr("""i > 1 AND
            substring(md5(concat(ws[i-2], ' ', ws[i-1])), 1, 1) <= '3'""")
            .as("right_hit"))
        .withColumn("cov", col("left_hit") || col("right_hit"))
      val want = wp.select(col("doc_id"), col("cov"),
          struct(col("i"), when(col("cov"), "<term>")
            .otherwise(col("word")).as("w")).as("p"))
        .groupBy("doc_id")
        .agg(sum(when(col("cov"), 1L).otherwise(0L)).as("n_covered"),
          collect_list("p").as("ps"))
        .select(col("doc_id"), col("n_covered"),
          md5(array_join(expr("transform(sort_array(ps), x -> x.w)"), " "))
            .as("fp"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got == want)
      assert(got.exists(_._2 > 0), "degenerate: nothing redacted")
    }
  }

  test("q220 equals the bigram explode + join formulation on the corpus") {
    for (sf <- Seq("0.001", "0.01")) {
      val d = graft.text.TextOps.docs(spark, sfDir(sf))
      val phrases = PolicyOps.derivedBlocklist(d)
      assert(phrases.nonEmpty && phrases == phrases.sorted)
      val got = PolicyOps.phraseScan(d, phrases).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val bg = d.withColumn("words", split(col("s"), " "))
        .filter(size(col("words")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(words) - 1), " +
            "i -> concat(words[i-1], ' ', words[i]))")).as("bigram"))
        .filter(substring(md5(col("bigram")), 1, 1) <= PolicyOps.PhraseClassMax)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_hits"),
          countDistinct(col("bigram")).as("n_terms"))
      val hits = bg.collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val want = d.select("doc_id").collect().map(_.getLong(0)).toSet
        .map((id: Long) => hits.get(id) match {
          case Some((h, t)) => (id, h, t)
          case None => (id, 0L, 0L)
        })
      assert(got == want)
      assert(got.exists(_._2 > 0), "degenerate: no blocklist hit at all")
    }
  }
}
