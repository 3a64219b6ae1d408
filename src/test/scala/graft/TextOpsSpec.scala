package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force ground truth: all pairs with exact 5-gram Jaccard ≥
    * thresh (every such pair shares ≥1 gram, so the gram join is a
    * complete pair generator). */
  private def bruteForceJaccardPairs(thresh: Double, dir: String): Set[(Long, Long)] = {
    val g = TextOps.grams(TextOps.docs(spark, dir))
    val inter = g.as("ga").join(g.as("gb"),
        col("ga.gram") === col("gb.gram") && col("ga.doc_id") < col("gb.doc_id"))
      .groupBy(col("ga.doc_id").as("a"), col("gb.doc_id").as("b"))
      .agg(count(lit(1)).as("c"))
    val sz = g.groupBy("doc_id").agg(count(lit(1)).as("nn"))
    inter
      .join(sz.select(col("doc_id").as("da"), col("nn").as("na")), col("a") === col("da"))
      .join(sz.select(col("doc_id").as("db"), col("nn").as("nb")), col("b") === col("db"))
      .filter(col("c").cast("double") / (col("na") + col("nb") - col("c")) >= thresh)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("q21/q22 band blocking recall vs brute-force ground truth ≥ 0.9") {
    for (sf <- Seq("0.001", "0.01")) {
      val dir = sfDir(sf)
      val truth = bruteForceJaccardPairs(0.5, dir)
      assert(truth.nonEmpty, s"planted near-dups expected at sf$sf")
      val d = TextOps.docs(spark, dir)
      for ((nMd5, nBands, r) <- Seq((2, 3, 5), (1, 2, 4))) {
        val cand = TextOps.candidates(
            TextOps.bandRelation(TextOps.laneSigs(d, nMd5), nBands, r))
          .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = (truth & cand).size.toDouble / truth.size
        assert(recall >= 0.9,
          s"sf$sf recall $recall with $nMd5 md5s / $nBands bands of $r (truth ${truth.size})")
      }
    }
  }

  test("q21/q22 auto banding: suite-scale collapse + derived-r recall") {
    import TextOps.{autoRank, AutoBgJ}
    // calibration: at the suite's sf0.1 corpus (n = 5000) the derived
    // geometry IS the oracled fixed geometry — the auto forms
    // collapse to q21/q22 exactly there (oracle rows unchanged)
    assert(autoRank(5000, 25, AutoBgJ) == 5, "q21 auto must collapse at sf0.1")
    assert(autoRank(5000, 100, AutoBgJ) == 4, "q22 auto must collapse at sf0.1")
    // each ÷jBg growth in n adds ~one lane (the linear-candidates
    // invariant); 10× the sf0.1 corpus → +2 lanes for jBg = 0.3
    assert(autoRank(50000, 25, AutoBgJ) == 7)
    assert(autoRank(50000, 100, AutoBgJ) == 6)
    assert(autoRank(1, 25, AutoBgJ) == 1, "degenerate corpora floor at r = 1")
    // behavioral collapse: with perDoc calibrated so THIS corpus
    // (n = 500) derives the fixed r, auto == fixed bit-for-bit
    val d = TextOps.docs(spark, sfDir())
    assert(autoRank(500, 3, AutoBgJ) == 5)
    assert(TextOps.ngramJaccardAuto(d, perDoc = 3).collect().toSeq ==
      TextOps.q21NgramJaccard(spark, sfDir()).collect().toSeq)
    assert(autoRank(500, 10, AutoBgJ) == 4)
    assert(TextOps.minhashAuto(d, perDoc = 10).collect().toSeq ==
      TextOps.q22DedupMinhash(spark, sfDir()).collect().toSeq)
    // at default calibration the small corpus derives a SHORTER band
    // (more candidates); verification is exact either way, so the
    // auto forms must still clear the brute-force recall bar
    val truth = bruteForceJaccardPairs(0.5, sfDir())
    for (auto <- Seq(TextOps.ngramJaccardAuto(d), TextOps.minhashAuto(d))) {
      val got = auto.select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert((truth & got).size.toDouble / truth.size >= 0.9)
    }
  }

  test("q20 exact-dedup groups cover every document") {
    val total = TextOps.q20DedupExact(spark, sfDir()).agg(
      org.apache.spark.sql.functions.sum("dup_count")).first().getLong(0)
    assert(total == Tables(spark, sfDir()).documents.count())
  }

  test("q21/q22 near-dup pairs respect the jaccard threshold") {
    for (q <- Seq(TextOps.q21NgramJaccard _, TextOps.q22DedupMinhash _)) {
      val rows = q(spark, sfDir()).collect()
      assert(rows.nonEmpty, "planted near-dups should be found")
      rows.foreach { r =>
        val j = r.getAs[Double]("jaccard")
        assert(j >= 0.5 && j <= 1.0)
        assert(r.getAs[Long]("a") < r.getAs[Long]("b"))
      }
    }
  }

  test("simhash 15-bit banding is exact for hamming ≤ 3 (pigeonhole)") {
    // brute-force all signature pairs and compare against the banded op
    val sigs = TextOps.simhashSignatures(
        Tables(spark, sfDir()).documents.selectExpr("doc_id",
          "lower(trim(regexp_replace(text, '\\\\s+', ' '))) AS s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    val banded = TextOps.q23DedupSimhash(spark, sfDir())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute)
  }

  test("q27 predicts only known languages with scores in [0,1]") {
    val langs = TextOps.langLexicon.map(_._1).toSet
    TextOps.q27LangId(spark, sfDir()).collect().foreach { r =>
      assert(langs.contains(r.getAs[String]("lang_pred")))
      val s = r.getAs[Double]("score")
      assert(s >= 0.0 && s <= 1.0)
    }
  }

  test("q28 quality components stay in range") {
    TextOps.q28QualityScore(spark, sfDir()).collect().foreach { r =>
      assert(r.getAs[Double]("punct_ratio") >= 0.0)
      assert(r.getAs[Double]("quality") >= 0.0 &&
        r.getAs[Double]("quality") <= 1.0)
    }
  }

  test("q30 rolling hash lands in [0, 2^31)") {
    TextOps.q30Fingerprint(spark, sfDir()).collect().foreach { r =>
      val h = r.getAs[Long]("rolling")
      assert(h >= 0L && h < 2147483647L)
    }
  }

  test("incremental dedup: exact matches are textual, kept docs truly new") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (10L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (11L, "a totally fresh document nothing matches"),
      (12L, "one two three four five six seven")) // exact dup of 2
      .toDF("doc_id", "s")
    val out = TextOps.incrementalDedup(d, col("doc_id") < 10L)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(10L) == (("exact_dup", 1L)))
    assert(out(12L) == (("exact_dup", 2L)))
    assert(out(11L) == (("kept", -1L)))
    assert(!out.contains(1L) && !out.contains(2L), "corpus docs are not reported")
  }

  test("incremental dedup: near-dup of a corpus doc is flagged with its match") {
    // append-only edit of a long template: jaccard ~0.98 to doc 1
    // (well inside the 2x4 banding's deterministic catch range), no
    // exact match
    val base = (1 to 100).map(i => s"word$i").mkString(" ")
    val edited = base + " trailing addition"
    val d = Seq((1L, base), (10L, edited)).toDF("doc_id", "s")
    val out = TextOps.incrementalDedup(d, col("doc_id") < 10L)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(10L) == (("near_dup", 1L)))
  }

  test("q124 CDC chunks survive a prefix insertion (the point of CDC)") {
    // B = A with three words bolted on the front. Content-defined
    // boundaries depend only on the words themselves, so every chunk
    // of A after its FIRST boundary reappears verbatim in B — a
    // fixed-size chunker would shift and miss all of them.
    val base = (1 to 120).map(i => s"tok$i").mkString(" ")
    val shifted = "inserted prefix words " + base
    val d = Seq((1L, base), (2L, shifted)).toDF("doc_id", "s")
    val chunks = TextOps.cdcChunks(d).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[String]("chunk_hash")).toSet).toMap
    val a = chunks(1L); val b = chunks(2L)
    assert(a.size >= 3, s"divisor too coarse for the fixture (${a.size} chunks)")
    val shared = (a & b).size
    info(s"q124 fixture: ${a.size} chunks in A, $shared survive the shift")
    assert(shared >= a.size - 1,
      s"only $shared of ${a.size} chunks survived a prefix insertion")
  }

  test("q124 per-doc counters reconcile and find real corpus dups") {
    val rows = TextOps.q124CdcChunkDedup(spark, sfDir()).collect()
    val nDocs = Tables(spark, sfDir()).documents.count()
    assert(rows.length == nDocs, "every document is profiled")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dup_chunks") <= r.getAs[Long]("n_chunks"))
      assert(r.getAs[Long]("dup_words") <= r.getAs[Long]("n_words"))
    }
    // the corpus has exact duplicates (q20's signal), and an exact dup
    // duplicates EVERY chunk — so full-dup docs must exist
    val fullDup = rows.count(r =>
      r.getAs[Long]("n_dup_chunks") == r.getAs[Long]("n_chunks"))
    info(s"q124: $fullDup fully-duplicated docs")
    assert(fullDup > 0, "no chunk-level dup signal in a corpus with exact dups")
    // n_words reconciles with the corpus token count convention
    val totalWords = TextOps.docs(spark, sfDir())
      .select(sum(size(split(col("s"), " ")).cast("long"))).first().getLong(0)
    assert(rows.map(_.getAs[Long]("n_words")).sum == totalWords)
  }

  test("q98 split is cluster-atomic: near-dups can never straddle train/eval") {
    val rows = TextOps.q98LeakSafeSplit(spark, sfDir()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // one split per cluster — the leakage guarantee
    rows.groupBy(_._2).foreach { case (c, rs) =>
      assert(rs.map(_._3).distinct.length == 1, s"cluster $c straddles splits")
    }
    // split agrees with q44's clustering doc-for-doc
    val clusters = TextOps.q44NeardupClusters(spark, sfDir()).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (d, c, _) => assert(clusters(d) == c) }
    // the fixed md5 assignment yields both sides at this SF
    val bySplit = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "eval"), s"splits: $bySplit")
    assert(bySplit("train") > bySplit("eval"), "eval rate is the minority")
  }

  test("q44 pipeline on planted chains of near-dups: ccAuto labels == pair-graph components") {
    import spark.implicits._
    // 40 chains × 8 docs; doc i = sliding window of 4 unique blocks,
    // so ADJACENT docs share 3/4 blocks (exact 5-gram J ≈ 0.64 ≥ θ=0.5)
    // and distance-2 docs share 2/4 (J ≈ 0.35 < θ): every verified
    // component is a PATH — min-label propagation's high-diameter
    // hazard, the exact structure the ccAuto routing exists for
    // (VERDICT r12 next-round #2; BENCH_SCALING Parts 14/18).
    // hashed tokens: every 5-gram depends on the whole (chain, block)
    // identity, so cross-chain/cross-block gram collisions vanish
    // (indexed tokens like "w13b000y00" share their suffix grams
    // across chains and broke the disjointness this corpus plants)
    def block(c: Int, i: Int): String =
      (0 until 6).map { j =>
        val md = java.security.MessageDigest.getInstance("MD5")
        md.digest(s"chain$c block$i tok$j".getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
      }.mkString(" ")
    val corpus = (for { c <- 0 until 40; i <- 0 until 8 } yield
      ((c * 100 + i).toLong, (i until i + 4).map(block(c, _)).mkString(" "))
    ).toDF("doc_id", "s")
    val labels = TextOps.neardupClustersFromDocs(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // Ground truth: union-find over the pipeline's own verified pair
    // relation, recomputed from the engine's gram sets + candidate set
    // at the pipeline's θ (jaccardVerified is banding-bounded, so the
    // truth must be too — recall gaps are the q21/q22 recall spec's
    // concern, not this one's).
    val gramSets = TextOps.grams(corpus).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    val cand = TextOps.candidates(
        TextOps.bandRelation(TextOps.laneSigs(corpus, 2), 3, 5))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = cand.filter { case (a, b) =>
      val (ga, gb) = (gramSets(a), gramSets(b))
      val c = (ga & gb).size.toDouble
      c / (ga.size + gb.size - c) >= 0.5
    }
    assert(verified.nonEmpty, "banding caught no planted adjacent pair")
    // only same-chain adjacent pairs can verify (cross-chain grams are
    // disjoint; distance ≥ 2 is below θ by construction)
    verified.foreach { case (a, b) =>
      assert(a / 100 == b / 100 && (b - a) == 1, s"unexpected edge ($a,$b)")
    }
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    verified.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    labels.foreach { case (doc, got) =>
      assert(got == find(doc), s"doc $doc: cluster $got != component ${find(doc)}")
    }
    // at least one verified component is a path of ≥ 3 docs (diameter
    // ≥ 2): the transitive case A≈B≈C with no direct A–C edge
    val sizes = labels.keys.toSeq.map(find).groupBy(identity).view.mapValues(_.size)
    assert(sizes.exists(_._2 >= 3),
      s"no ≥3-doc chain survived banding (edges: ${verified.size})")
  }
}
