package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus term statistics — the signal extractors a training-data
  * pipeline derives from its own token distribution: TF-IDF keyword
  * extraction (topic/domain signals per document) and the CCNet-style
  * unigram language-model score (documents whose tokens are
  * improbable under the corpus distribution are noise or off-domain —
  * the cheap stand-in for the KenLM perplexity filter).
  *
  * Scale shape: both are wordcount-family plans — explode to
  * (doc, word), partial-agg counts, one join keyed by word (left to
  * AQE — a corpus vocabulary is not small by construction), then a
  * per-doc agg or a window
  * over per-doc term lists whose width is bounded by document length.
  * No collected sets, no driver loops; the float steps (ln, avg) are
  * rounded to 6dp under the same contract as PageRank/quality.
  */
object TermOps {

  // ---------------------------------------------------------------- q74
  /** Top-[[TfidfTopK]] TF-IDF terms per document: tf = in-doc count,
    * idf = ln(N/df), ranked per doc by (rounded score desc, word asc)
    * — deterministic at every scale factor. */
  val TfidfTopK = 3

  def tfidfTopTerms(docs: DataFrame, topK: Int): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(split(col("s"), " ")).as("word"))
    val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("word").asc)
    // the term dictionary is NOT broadcast-hinted: a corpus vocabulary
    // grows with the data (Zipf tail) — the word-keyed shuffle join is
    // the scale-safe default and AQE still broadcast-converts it when
    // the dictionary actually is small
    tf.join(df, "word")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("rank"), col("word"),
        col("tf"), col("df"), col("score"))
      .orderBy("doc_id", "rank")
  }

  def q74TfidfTerms(spark: SparkSession, dir: String): DataFrame =
    tfidfTopTerms(TextOps.docs(spark, dir), TfidfTopK)

  // ---------------------------------------------------------------- q75
  /** Unigram negative log-likelihood per document: p(w) = corpus
    * token frequency, score = mean over the document's tokens of
    * −ln p(w) = ln(total/cnt(w)). High scores mark documents whose
    * vocabulary is rare under the corpus model — the filter
    * direction CCNet applies with a real LM. */
  def unigramLogprob(docs: DataFrame): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(split(col("s"), " ")).as("word"))
    val freq = words.groupBy("word").agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("total"))
    words.join(freq, "word") // word-keyed shuffle join; see q74's note
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log(col("total").cast("double") / col("cnt"))), 6)
          .as("avg_nll"))
      .orderBy("doc_id")
  }

  def q75UnigramLogprob(spark: SparkSession, dir: String): DataFrame =
    unigramLogprob(TextOps.docs(spark, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q74_tfidf_terms" -> (q74TfidfTerms _),
    "q75_unigram_logprob" -> (q75UnigramLogprob _),
  )

  val oracleSql: Map[String, String] = Map(
    "q74_tfidf_terms" ->
      s"""WITH ${TextOps.normCte},
         |wu AS (SELECT doc_id, unnest(string_split(s, ' ')) AS word FROM n),
         |tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
         |       FROM wu GROUP BY 1, 2),
         |df AS (SELECT word, CAST(count(*) AS BIGINT) AS df
         |       FROM tf GROUP BY 1),
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM n),
         |sc AS (
         |  SELECT t.doc_id, t.word, t.tf, d.df,
         |         round(t.tf * ln(CAST(nd.n_docs AS DOUBLE) / d.df), 6) AS score
         |  FROM tf t JOIN df d USING (word), nd),
         |r AS (
         |  SELECT doc_id, word, tf, df, score,
         |         CAST(row_number() OVER (PARTITION BY doc_id
         |             ORDER BY score DESC, word ASC) AS BIGINT) AS rank
         |  FROM sc)
         |SELECT doc_id, rank, word, tf, df, score
         |FROM r WHERE rank <= $TfidfTopK
         |ORDER BY doc_id, rank""".stripMargin,

    "q75_unigram_logprob" ->
      s"""WITH ${TextOps.normCte},
         |wu AS (SELECT doc_id, unnest(string_split(s, ' ')) AS word FROM n),
         |freq AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt
         |         FROM wu GROUP BY 1),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM freq)
         |SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |       round(avg(ln(CAST(tot.total AS DOUBLE) / f.cnt)), 6) AS avg_nll
         |FROM wu w JOIN freq f USING (word), tot
         |GROUP BY w.doc_id
         |ORDER BY w.doc_id""".stripMargin,
  )
}
