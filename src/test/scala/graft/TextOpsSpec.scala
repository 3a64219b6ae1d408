package graft

import graft.text.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

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

  test("simhash byte-banding is exact for hamming ≤ 3 (pigeonhole)") {
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
}
