package graft

import graft.text.Classify

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  /** Scalar multinomial-NB reference with the same 6dp-round-then-sum
    * float contract as the operator. */
  private def refConfusion(docs: Seq[(Long, String, String)]): Seq[(String, String, Long)] = {
    val words = docs.flatMap { case (id, lang, s) =>
      s.split(" ").map(w => (id, lang, w)) }
    val vocabV = words.map(_._3).distinct.size
    val classes = docs.map(_._2).distinct.sorted
    val wc = words.groupBy(t => (t._2, t._3)).view.mapValues(_.size).toMap
    val tot = words.groupBy(_._2).view.mapValues(_.size).toMap
    val nDocs = docs.size
    val nCls = docs.groupBy(_._2).view.mapValues(_.size).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val preds = docs.map { case (id, lang, s) =>
      val tf = s.split(" ").groupBy(identity).view.mapValues(_.length).toMap
      val best = classes.map { c =>
        val lp = tf.map { case (w, n) =>
          r6(math.log((wc.getOrElse((c, w), 0) + 1).toDouble /
            (tot(c) + vocabV))) * n
        }.sum + r6(math.log(nCls(c).toDouble / nDocs))
        (c, lp)
      }.minBy { case (c, sc) => (-sc, c) }._1
      (lang, best)
    }
    preds.groupBy(identity).toSeq
      .map { case ((a, p), xs) => (a, p, xs.size.toLong) }
      .sortBy(t => (t._1, t._2))
  }

  private val corpus = Seq(
    // two classes with mostly-disjoint vocabulary, one ambiguous doc
    (1L, "en", "the cat sat on the mat"),
    (2L, "en", "the dog ate the bone"),
    (3L, "en", "cat and dog and mat"),
    (4L, "de", "der hund und die katze"),
    (5L, "de", "die katze auf der matte"),
    (6L, "de", "der hund frisst den knochen"),
    (7L, "en", "the cat und the dog"), // mixed tokens
  )

  test("q165 confusion matrix == scalar NB reference") {
    val d = corpus.map { case (id, l, s) => (id, l, s) }
      .toDF("doc_id", "lang", "s")
    val got = Classify.nbConfusion(d)
      .as[(String, String, Long)].collect().toSeq
      .sortBy(t => (t._1, t._2))
    assert(got == refConfusion(corpus))
  }

  test("q165 separates disjoint-vocabulary classes perfectly") {
    val clean = corpus.filterNot(_._1 == 7L)
    val d = clean.toDF("doc_id", "lang", "s")
    val got = Classify.nbConfusion(d)
      .as[(String, String, Long)].collect().toSeq
    // all mass on the diagonal
    assert(got.forall { case (a, p, _) => a == p })
    assert(got.map(_._3).sum == clean.size.toLong)
  }

  test("q165 counts every document exactly once") {
    val d = corpus.toDF("doc_id", "lang", "s")
    val total = Classify.nbConfusion(d)
      .as[(String, String, Long)].collect().map(_._3).sum
    assert(total == corpus.size.toLong)
  }
}
