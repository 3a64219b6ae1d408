package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Trained document classification — the model-based quality/domain
  * filter of a curation pipeline (CCNet's fastText stage, the GPT-3
  * quality classifier): a multinomial Naive Bayes over the corpus's
  * own token counts. NB is chosen deliberately: its training IS a
  * word-count aggregation (closed form, no gradient loop), so both
  * training and scoring stay inside one declarative plan that an ANSI
  * oracle can mirror exactly — and at 100 TB the trainer costs the
  * same as a wordcount.
  *
  * Complement of q27 (`TextOps`): q27 is the HEURISTIC language ID
  * (n-gram rules); this is the TRAINED one (labels → model → audit).
  */
object Classify {

  // ---------------------------------------------------------------- q165
  /** Self-classification audit of the `lang` label: train multinomial
    * NB with Laplace α=1 on the full corpus, score every document,
    * and report the confusion matrix (actual, predicted, n_docs).
    *
    * score(d, c) = ln P(c) + Σ_w tf(d,w) · ln((cnt(w,c)+1)/(tot_c+V))
    *
    * Scale shape: the model is two wordcount-family aggregations —
    * per-class token counts (vocab × C rows, partial-agg friendly)
    * and per-class totals/priors (C rows, broadcast). Scoring is ONE
    * word-keyed join of the per-doc tf relation against the
    * (vocab × C) log-likelihood grid — fanout bounded by the class
    * count — then a per-doc sum and a C-row argmax window. Nothing is
    * collected; the only driver-known quantity is the class list's
    * cardinality. Float discipline: each ln is rounded 6dp and
    * tf-weighted into a DECIMAL(18,6) sum (accumulation-order-free);
    * the argmax tie-breaks on class name.
    */
  private[graft] def nbConfusion(d: DataFrame): DataFrame = {
    val docs = d.select(col("doc_id"), col("lang"), col("s"))
    val words = docs.select(col("doc_id"), col("lang"),
      explode(split(col("s"), " ")).as("word"))
    val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val wc = words.groupBy("lang", "word").agg(count(lit(1)).as("cnt"))
    val tot = wc.groupBy("lang").agg(sum(col("cnt")).as("tot"))
    val vocab = words.select("word").distinct()
    val vsize = vocab.agg(count(lit(1)).as("v"))
    val classes = docs.groupBy(col("lang").as("cls"))
      .agg(count(lit(1)).as("n_cls"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // log-likelihood grid over vocab x classes, zeros included via the
    // left join (unseen (word, class) pairs get the Laplace floor)
    val grid = vocab.crossJoin(classes.select("cls"))
      .join(wc.withColumnRenamed("lang", "cls"), Seq("cls", "word"), "left")
      .join(tot.withColumnRenamed("lang", "cls"), "cls")
      .crossJoin(broadcast(vsize))
      .select(col("cls"), col("word"),
        round(log((coalesce(col("cnt"), lit(0L)) + lit(1)).cast("double") /
          (col("tot") + col("v")).cast("double")), 6)
          .cast("decimal(18,6)").as("lp"))
    val prior = classes.crossJoin(broadcast(nDocs))
      .select(col("cls"),
        round(log(col("n_cls").cast("double") / col("n_docs").cast("double")), 6)
          .cast("decimal(18,6)").as("lprior"))
    val scores = tf.join(grid, "word") // word-keyed shuffle; x C fanout
      .groupBy("doc_id", "cls")
      .agg(sum(col("tf") * col("lp")).as("ll"))
      .join(broadcast(prior), "cls")
      .select(col("doc_id"), col("cls"),
        (col("ll") + col("lprior")).as("score"))
    val byDoc = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("cls").asc)
    val pred = scores.withColumn("rk", row_number().over(byDoc))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("cls").as("pred"))
    docs.select("doc_id", "lang").join(pred, "doc_id")
      .groupBy(col("lang").as("actual"), col("pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("actual", "pred")
  }

  def q165NbLangConfusion(spark: SparkSession, dir: String): DataFrame =
    nbConfusion(TextOps.docs(spark, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q165_nb_lang_confusion" -> (q165NbLangConfusion _),
  )

  val oracleSql: Map[String, String] = Map(
    "q165_nb_lang_confusion" ->
      s"""WITH ${TextOps.normCte},
         |d AS (SELECT n.doc_id, documents.lang, n.s
         |      FROM n JOIN documents USING (doc_id)),
         |wu AS (SELECT doc_id, lang, unnest(string_split(s, ' ')) AS word
         |       FROM d),
         |tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
         |       FROM wu GROUP BY 1, 2),
         |wc AS (SELECT lang AS cls, word, CAST(count(*) AS BIGINT) AS cnt
         |       FROM wu GROUP BY 1, 2),
         |tot AS (SELECT cls, CAST(sum(cnt) AS BIGINT) AS tot
         |        FROM wc GROUP BY 1),
         |vocab AS (SELECT DISTINCT word FROM wu),
         |vs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
         |cl AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS n_cls
         |       FROM d GROUP BY 1),
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM d),
         |grid AS (
         |  SELECT c.cls, vb.word,
         |         CAST(round(ln(CAST(coalesce(w.cnt, 0) + 1 AS DOUBLE) /
         |                       (t.tot + vs.v)), 6) AS DECIMAL(18,6)) AS lp
         |  FROM vocab vb CROSS JOIN (SELECT cls FROM cl) c
         |  LEFT JOIN wc w ON w.cls = c.cls AND w.word = vb.word
         |  JOIN tot t ON t.cls = c.cls, vs),
         |prior AS (
         |  SELECT cls,
         |         CAST(round(ln(CAST(n_cls AS DOUBLE) / nd.n_docs), 6)
         |              AS DECIMAL(18,6)) AS lprior
         |  FROM cl, nd),
         |scores AS (
         |  SELECT tf.doc_id, g.cls,
         |         sum(tf.tf * g.lp) + any_value(p.lprior) AS score
         |  FROM tf JOIN grid g USING (word)
         |  JOIN prior p ON p.cls = g.cls
         |  GROUP BY 1, 2),
         |pred AS (
         |  SELECT doc_id, cls AS pred
         |  FROM (SELECT doc_id, cls,
         |               row_number() OVER (PARTITION BY doc_id
         |                 ORDER BY score DESC, cls ASC) AS rk
         |        FROM scores)
         |  WHERE rk = 1)
         |SELECT d.lang AS actual, pred.pred,
         |       CAST(count(*) AS BIGINT) AS n_docs
         |FROM d JOIN pred USING (doc_id)
         |GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin,
  )
}
