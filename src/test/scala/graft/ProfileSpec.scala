package graft

import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts nulls and exact distincts per column in one frame") {
    val d = Seq(
      (Some(1L), Some("a")), (Some(1L), None),
      (Some(2L), Some("b")), (None, Some("a")))
      .toDF("x", "y")
    val out = Profile.profile(d, Seq("x", "y")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("x") == ((4L, 1L, 2L)))
    assert(out("y") == ((4L, 1L, 2L)))
  }

  test("q93: bins tile the range, counts sum to the table size") {
    val rows = Profile.q93ValueHistogram(spark, sfDir()).collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until Profile.HistBins).toSeq)
    val total = Tables(spark, sfDir()).orders.count()
    assert(rows.map(_.getLong(1)).sum == total)
    // per-bin extrema nest inside their neighbors' boundaries
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2) + 1e-9,
        s"bins overlap: ${a.getLong(0)} max ${a.getDouble(3)} vs " +
          s"${b.getLong(0)} min ${b.getDouble(2)}")
    }
  }

  test("q83: keys are unique, statuses are low-cardinality") {
    val out = Profile.q83TableProfile(spark, sfDir()).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (rows, _, distinctKeys) = out("o_orderkey")
    assert(distinctKeys == rows, "order keys must be unique")
    assert(out("o_orderstatus")._3 <= 3)
    assert(out.values.forall(_._2 == 0L), "TPC-H columns are non-null")
  }

  test("equi-depth histogram: near-equal populations, ordered disjoint ranges") {
    val rows = Profile.q105EquidepthHistogram(spark, sfDir()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == (1L to Profile.HistBins).toSeq)
    val ns = rows.map(_._2)
    assert(ns.max - ns.min <= 1, "ntile buckets must be near-equal")
    assert(ns.sum == Tables(spark, sfDir()).orders.count())
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3 + 1e-9, "ranges must ascend")
      case _ =>
    }
    rows.foreach { case (_, _, lo, hi) => assert(lo <= hi) }
  }

  test("skew profile: ranked hot keys with exact shares and multiples") {
    import org.apache.spark.sql.functions._
    val rows = Profile.q102SkewProfile(spark, sfDir()).collect()
    assert(rows.nonEmpty && rows.length <= Profile.SkewTopK)
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq,
      "ranks are dense from 1")
    val cnts = rows.map(_.getLong(2))
    cnts.sliding(2).foreach { case Array(hi, lo) => assert(hi >= lo); case _ => }
    // the rank-1 key really is the hottest, verified independently
    val li = Tables(spark, sfDir()).lineitem
      .groupBy(col("l_partkey").cast("long").as("k"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val maxC = li.map(_._2).max
    val expectTop = li.filter(_._2 == maxC).map(_._1).min
    assert(rows.head.getLong(1) == expectTop && rows.head.getLong(2) == maxC)
    // shares and multiples are consistent with the full relation
    val n = li.map(_._2).sum.toDouble
    val d = li.length.toDouble
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3) - r.getLong(2) / n) < 1e-6)
      assert(math.abs(r.getDouble(4) - r.getLong(2) * d / n) < 1e-5)
    }
  }

  test("cms: estimates never undercount and are exact sans collisions") {
    import spark.implicits._
    // 3 distinct words ≪ 64 buckets; collisions possible only if two
    // of the three md5 buckets coincide in EVERY row — verify none do
    // so the estimates must be exact
    val words = (Seq.fill(7)("alpha") ++ Seq.fill(4)("beta") ++
      Seq.fill(2)("gamma")).toDF("word")
    val out = Profile.countMinSketch(words, 3).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet == Set("alpha", "beta", "gamma"))
    out.values.foreach { case (t, e, over) =>
      assert(e >= t, "CMS may never undercount")
      assert(over == e - t)
    }
    // in-memory CMS reference with the same md5 bucket math: the
    // estimate is exact for a word iff SOME row holds it alone
    val freq = Map("alpha" -> 7L, "beta" -> 4L, "gamma" -> 2L)
    def bucket(r: Int, w: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$r:$w".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % Profile.CmsW
    }
    val counter = freq.toSeq
      .flatMap { case (w, c) => (0 until Profile.CmsD).map(r => (r, bucket(r, w)) -> c) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    freq.foreach { case (w, t) =>
      val est = (0 until Profile.CmsD).map(r => counter((r, bucket(r, w)))).min
      assert(out(w) == ((t, est, est - t)), s"$w mismatch vs reference")
    }
  }

  test("mad outliers: medians ignore the spike the mean would chase") {
    import spark.implicits._
    val e = ((1 to 9).map(v => ("a", v.toDouble)) :+ (("a", 1000.0)))
      .toDF("event_type", "value")
    val r = graft.operators.Profile.madOutliers(e).collect().head
    assert(r.getLong(1) == 10L)
    assert(r.getDouble(2) == 5.5)   // median unmoved by the spike
    assert(r.getDouble(3) == 2.5)   // MAD of |x - 5.5|
    assert(r.getLong(4) == 1L, "exactly the spike flags")
  }

  test("winsorize: clipping tames the outlier, bounds and counts are exact") {
    import spark.implicits._
    // 19 values 1..19 plus one 1000x outlier: p95 clips the outlier,
    // p05 clips the low tail; the winsorized mean falls, raw doesn't
    val e = ((1 to 19).map(v => ("a", v.toDouble)) :+ (("a", 19000.0)))
      .toDF("event_type", "value")
    val r = graft.operators.Profile.winsorize(e).collect().head
    assert(r.getLong(1) == 20L)
    assert(r.getLong(2) >= 1L, "low tail clipped")     // clipped_lo
    assert(r.getLong(3) >= 1L, "outlier clipped")      // clipped_hi
    assert(r.getDouble(7) < r.getDouble(6),
      s"winsorized mean ${r.getDouble(7)} must undercut raw ${r.getDouble(6)}")
    // every retained value is inside [p05, p95] by construction
    assert(r.getDouble(4) < r.getDouble(5))
  }

  test("q181 k-anonymity: fixture groups, thresholds, negative-band floor") {
    import spark.implicits._
    val c = Seq(
      // six records in one QI cell -> k=6, safe
      (1L, "AUTO", 100.0), (1L, "AUTO", 150.0), (1L, "AUTO", 1999.0),
      (1L, "AUTO", 0.0), (1L, "AUTO", 500.0), (1L, "AUTO", 900.0),
      // lone record -> k=1, re-identifiable
      (2L, "HOUSE", 2500.0),
      // negative balance: floor(-994/2000) = -1, not 0
      (3L, "AUTO", -994.0), (3L, "AUTO", -5.0),
    ).toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val got = graft.operators.Profile.kAnonymity(c)
      .as[(Long, String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, "AUTO", 0L, 6L, false),
      (2L, "HOUSE", 1L, 1L, true),
      (3L, "AUTO", -1L, 2L, true)))
  }

  test("l-diversity: scalar reference, entropy bounded by distinct-l, flags exact") {
    import org.apache.spark.sql.functions._
    val rows = Tables(spark, sfDir()).customer
      .select(col("c_nationkey"),
        floor(col("c_acctbal") / Profile.KAnonBand).cast("long").as("b"),
        col("c_mktsegment")).collect()
    val ref = rows.groupBy(r => (r.getInt(0), r.getLong(1))).map {
      case (qi, members) =>
        val bySeg = members.groupBy(_.getString(2)).view.mapValues(_.length)
        val k = members.length
        val h = -bySeg.values.map { c =>
          val p = c.toDouble / k
          BigDecimal(p * math.log(p))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }.sum
        qi -> (k.toLong, bySeg.size.toLong,
          BigDecimal(math.exp(h)).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = Profile.q188LDiversity(spark, sfDir()).collect()
    assert(got.length == ref.size)
    got.foreach { r =>
      val (k, l, e) = ref((r.getInt(0), r.getLong(1)))
      assert(r.getLong(2) == k && r.getLong(3) == l, s"qi ${(r.getInt(0), r.getLong(1))}")
      assert(math.abs(r.getDouble(4) - e) < 1e-9, s"entropy ${(r.getInt(0), r.getLong(1))}")
      // entropy-l can never exceed distinct-l (Jensen) and is >= 1
      assert(r.getDouble(4) <= l + 1e-9 && r.getDouble(4) >= 1.0 - 1e-9)
      assert(r.getBoolean(5) == (l < Profile.LDivThreshold))
    }
  }

  test("q194: nearest-rank quantiles match a scalar sort, sample is the md5 stratum") {
    import org.apache.spark.sql.functions._
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(s: String): Long =
      java.lang.Long.parseLong(md.digest(s.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString, 16)
    val rows = Tables(spark, sfDir()).events
      .select(col("event_type"), col("value"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    def nearestRank(xs: Seq[(Double, Long)], q: Double): Double = {
      val sorted = xs.sortBy(identity)
      sorted(math.ceil(q * sorted.length).toLong.toInt - 1)._1
    }
    val got = Profile.q194SampleQuantileAudit(spark, sfDir()).collect()
    assert(got.length == 5 * Profile.QAuditProbes.length)
    got.foreach { r =>
      val t = r.getString(0); val q = r.getDouble(1)
      val all = rows.filter(_._1 == t).map(x => (x._2, x._3)).toSeq
      val samp = rows.filter(x => x._1 == t &&
        h32(x._3.toString) % Profile.QAuditMod == 0).map(x => (x._2, x._3)).toSeq
      assert(r.getLong(2) == all.length && r.getLong(3) == samp.length, s"$t n")
      assert(r.getDouble(4) == nearestRank(all, q), s"$t/$q exact")
      assert(r.getDouble(5) == nearestRank(samp, q), s"$t/$q sample")
    }
    // gross-sanity band only: at sf0.001 a type's sample is ~20 rows,
    // so the medians can legitimately drift tens of percent — the
    // operator's JOB is to report exactly that error
    val medians = got.filter(_.getDouble(1) == 0.5)
    medians.foreach { r =>
      assert(math.abs(r.getDouble(6)) < 150.0, s"${r.getString(0)} sampler broken")
    }
  }

  test("q198: clean data passes every contract; corrupted frames are detected") {
    import spark.implicits._
    // the real tables satisfy every declared contract
    val got = Profile.q198DataContractAudit(spark, sfDir()).collect()
    assert(got.length == 13)
    got.foreach { r =>
      assert(r.getBoolean(3) && r.getLong(2) == 0L,
        s"${r.getString(0)}/${r.getString(1)} flagged on clean data")
    }
    // detection: the same builders must CATCH planted violations
    val dup = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    assert(Profile.dupKeys(dup, "k").collect().map(_.getLong(0)).toSeq == Seq(1L))
    val child = Seq((1L, 10L), (2L, 99L)).toDF("id", "fk")
    val parent = Seq((10L, "x")).toDF("pk", "p")
    val orphans = Profile.fkOrphans(child, "fk", parent, "pk").collect()
    assert(orphans.map(_.getLong(0)).toSeq == Seq(99L))
    val rep = Profile.check("t", "pk_unique(k)", Profile.dupKeys(dup, "k"))
      .collect()(0)
    assert(rep.getLong(2) == 1L && !rep.getBoolean(3),
      "violation count must fail the contract row")
  }

  test("q200: noise is the scalar inverse-CDF Laplace draw, calibrated to b=1/eps") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long =
      java.lang.Long.parseLong(md.digest(s.getBytes("UTF-8"))
        .take(8).map("%02x".format(_)).mkString.take(15), 16)
    val got = Profile.q200DpNoisedRelease(spark, sfDir()).collect()
    assert(got.nonEmpty)
    var absSum = 0.0
    got.foreach { r =>
      val key = s"${r.getInt(0)}:${r.getString(1)}:${r.getLong(2)}"
      val u = (h60(key) + 0.5) / math.pow(2, 60)
      val noise = (if (u < 0.5) math.log(u * 2.0)
        else -math.log((1.0 - u) * 2.0)) / Profile.DpEpsilon
      val refNoised = BigDecimal(r.getLong(3) + noise)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(4) == refNoised, s"$key noised")
      val refReleased = math.max(0L,
        BigDecimal(r.getLong(3) + noise)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      assert(r.getLong(5) == refReleased, s"$key released")
      assert(r.getLong(5) >= 0L)
      absSum += math.abs(r.getDouble(4) - r.getLong(3))
    }
    // Laplace(b=1) has E|noise| = b: the empirical mean must sit near 1
    val meanAbs = absSum / got.length
    assert(meanAbs > 0.5 && meanAbs < 1.6,
      s"mean |noise| $meanAbs implausible for Laplace(1)")
  }

  test("join-size estimate: per-row est >= exact, matches sketch reference") {
    import spark.implicits._
    val a = (Seq.fill(3)("k1") ++ Seq.fill(2)("k2") ++ Seq("k4")).toDF("word")
    val b = (Seq.fill(2)("k1") ++ Seq.fill(5)("k2") ++ Seq("k3")).toDF("word")
    // exact |a ⋈ b| = 3·2 + 2·5 = 16 (k3/k4 unmatched)
    val rows = Profile.joinSizeEstimate(a, b).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
    assert(rows.map(_._1).toSeq == (0L until Profile.JsD.toLong))
    rows.foreach { case (r, (est, exact, over)) =>
      assert(exact == 16L, s"row $r exact")
      assert(est >= exact, s"row $r: inner-product estimate may never undercount")
      assert(over == est - exact)
    }
    // in-memory reference with the same md5 bucket math
    def bucket(r: Int, w: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$r:$w".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % Profile.JsW
    }
    val fa = Map("k1" -> 3L, "k2" -> 2L, "k4" -> 1L)
    val fb = Map("k1" -> 2L, "k2" -> 5L, "k3" -> 1L)
    def cms(f: Map[String, Long], r: Int): Map[Long, Long] =
      f.toSeq.groupMapReduce { case (w, _) => bucket(r, w) }(_._2)(_ + _)
    val refEst = (0 until Profile.JsD).map { r =>
      val ca = cms(fa, r); val cb = cms(fb, r)
      r.toLong -> ca.map { case (bk, c) => c * cb.getOrElse(bk, 0L) }.sum
    }.toMap
    rows.foreach { case (r, (est, _, _)) =>
      assert(est == refEst(r), s"row $r vs reference")
    }
  }
}
