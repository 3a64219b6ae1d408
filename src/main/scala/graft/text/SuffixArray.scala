package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.chaining._
import graft.Checkpoints

/** Distributed suffix-array construction by prefix doubling
  * (Manber & Myers 1990; the MapReduce adaptation is folklore —
  * each round sorts fixed-size (rank, rank@+h) pairs, never strings).
  *
  * WHY this operator: L48's duplicate-span detection (Lee et al.
  * 2022) is the window-gram VIEW of substring dedup; the suffix
  * array is the INDEX the paper actually builds — the structure that
  * answers "longest repeated substring", arbitrary-length substring
  * search, and exact-match positional queries, none of which a
  * fixed-k gram relation can. At 100 TB the defining constraint is
  * that suffix COMPARISON by string is unbounded (two suffixes can
  * share megabytes of prefix); prefix doubling replaces every string
  * comparison with a pair of fixed-width integer ranks, doubling the
  * compared prefix each round — ⌈log₂ maxlen⌉ rounds of sort + join
  * over rows of constant width.
  *
  * Scale decisions:
  *  - Ordinal assignment (dense rank over distinct keys) is
  *    sort + `zipWithIndex`, NOT a global `Window.orderBy` — an
  *    un-partitioned window funnels the relation through ONE task,
  *    the exact anti-pattern the grouped Mann–Whitney rank (A41)
  *    exists to avoid. `zipWithIndex` is the distributed contiguous-
  *    ordinal primitive the DataFrame API lacks (one extra job to
  *    count per-partition sizes; indices follow the range-sorted
  *    partition order, so the result is the global sorted position —
  *    deterministic because the keyed rows are distinct).
  *  - Each round's rank relation is lineage-cut ([[Checkpoints.cut]])
  *    and the superseded round released, the iterative-algorithm
  *    discipline shared with CC/Louvain/k-core.
  *  - Early exit when every suffix's rank is already unique (the
  *    common case long before h reaches maxlen on natural text).
  *
  * The oracled query bounds the corpus (doc_id < [[SaDocCap]],
  * suffixes of the first [[SaMaxLen]] normalized chars) because the
  * DuckDB mirror materializes every suffix STRING for its ORDER BY —
  * Σ len²/2 chars, quadratic in document length. The bound caps the
  * oracle, not the Spark path, which never materializes a suffix.
  */
object SuffixArray {

  /** Oracle-universe bounds (see scaladoc above). */
  val SaDocCap = 100
  val SaMaxLen = 256

  /** Order-preserving dense ordinal over the distinct (k1, k2) key
    * pairs of `pairs`: (k1, k2, rank) with rank = position in the
    * sorted distinct-key order. */
  private def keyRanks(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.select(col("k1"), col("k2")).distinct()
      .sort("k1", "k2")
      .rdd.zipWithIndex()
      .map { case (r, i) => (r.getLong(0), r.getLong(1), i) }
      .toDF("k1", "k2", "nrank")
  }

  /** Suffix array of every suffix of `docs` (columns: doc_id LONG,
    * s STRING; s is indexed as-is — truncate upstream if the
    * comparison horizon must be bounded). Output: (sa_rank, doc_id,
    * pos), pos 1-based, ordered lexicographically by suffix with
    * (doc_id, pos) breaking ties between byte-identical suffixes. */
  def suffixArray(docs: DataFrame): DataFrame =
    suffixArrayWithRounds(docs)._1

  /** [[suffixArray]] plus the doubling-round count, for specs and the
    * part-16 scale curve. */
  private[graft] def suffixArrayWithRounds(docs: DataFrame): (DataFrame, Int) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col("doc_id"), col("s"))
      .filter(col("s").isNotNull && length(col("s")) >= 1)
    val maxLen = base.agg(coalesce(max(length(col("s"))), lit(0)))
      .collect()(0).getInt(0).toLong // scalar: the doubling horizon
    val chars = base
      .select(col("doc_id"), posexplode(split(col("s"), "")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("ch"))
    // round 0: rank of the single lead character (string sort order
    // of one char == byte order of the suffix's first byte)
    val charRank = chars.select("ch").distinct().sort("ch")
      .rdd.zipWithIndex()
      .map { case (r, i) => (r.getString(0), i) }.toDF("ch", "r0")
    var ranks = chars.join(charRank, "ch")
      .select(col("doc_id"), col("pos"), col("r0").as("rank"))
      .pipe(Checkpoints.cut)
    val total = ranks.count()
    var distinctRanks = ranks.select("rank").distinct().count()
    var h = 1L
    var rounds = 0
    while (h < maxLen && distinctRanks < total) {
      rounds += 1
      val right = ranks.select(col("doc_id").as("d2"),
        (col("pos") - h).as("p2"), col("rank").as("rank2"))
      val paired = ranks.join(right,
          col("doc_id") === col("d2") && col("pos") === col("p2"), "left")
        .select(col("doc_id"), col("pos"), col("rank").as("k1"),
          coalesce(col("rank2"), lit(-1L)).as("k2"))
      // cut the key-rank relation: consumed twice (join + the
      // convergence count — |distinct keys| IS next round's distinct
      // rank count, so no extra distinct pass over `next`)
      val rk = keyRanks(paired).pipe(Checkpoints.cut)
      val next = paired.join(rk, Seq("k1", "k2"))
        .select(col("doc_id"), col("pos"), col("nrank").as("rank"))
        .pipe(Checkpoints.cut)
      distinctRanks = rk.count()
      Checkpoints.release(ranks, rk)
      ranks = next
      h *= 2
    }
    val sa = ranks.sort("rank", "doc_id", "pos")
      .rdd.zipWithIndex()
      .map { case (r, i) => (i + 1, r.getLong(0), r.getLong(1)) }
      .toDF("sa_rank", "doc_id", "pos")
      .sort("sa_rank")
    (sa, rounds)
  }

  // ---------------------------------------------------------------- q236
  /** q236: the suffix array of the bounded document universe
    * (normalized text, first [[SaMaxLen]] chars of docs with
    * doc_id < [[SaDocCap]]). */
  def q236SuffixArray(spark: SparkSession, dir: String): DataFrame = {
    val d = TextOps.docs(spark, dir)
      .filter(col("doc_id") < SaDocCap)
      .select(col("doc_id"), substring(col("s"), 1, SaMaxLen).as("s"))
    suffixArray(d)
  }

  // ---------------------------------------------------------------- q237
  /** Pairs reported by the repeated-substring query. */
  val LrsTopK = 10

  /** q237: longest repeated substrings — THE suffix-array deliverable
    * (Lee et al. 2022 §3 use exactly this index+LCP reading to find
    * dedup-worthy runs). A substring repeats iff two suffixes share a
    * prefix, and the longest shared prefix between ANY two suffixes is
    * realized by two suffixes ADJACENT in suffix-array order — so the
    * corpus-wide answer needs only the n−1 adjacent-rank LCPs, never a
    * pairwise comparison. LCP is computed by built-in array functions
    * (zip_with equality + array_position of the first false — null
    * padding past the shorter string never precedes a mismatch), on
    * the two suffix strings re-extracted by position; only the
    * [[LrsTopK]] report rows carry strings to the driver.
    *
    * Output: top-[[LrsTopK]] adjacent pairs by LCP (ties broken by
    * sa_rank), with both occurrences' coordinates and the repeated
    * prefix itself. */
  /** Common-prefix length of two strings, built-ins only: zip the
    * char arrays with equality, take the position of the first
    * `false`; if none, the shorter length is the LCP (zip_with's null
    * padding past the shorter string never precedes a mismatch). */
  private[graft] def lcpCol(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val eq = zip_with(split(a, ""), split(b, ""), (x, y) => x === y)
    val firstFalse = array_position(eq, false)
    when(firstFalse === 0L, least(length(a), length(b)))
      .otherwise(firstFalse - 1).cast("long")
  }

  def q237LongestRepeatedSubstrings(spark: SparkSession,
      dir: String): DataFrame = {
    val d = TextOps.docs(spark, dir)
      .filter(col("doc_id") < SaDocCap)
      .select(col("doc_id"), substring(col("s"), 1, SaMaxLen).as("s"))
      .pipe(Checkpoints.cut)
    val sa = suffixArray(d)
    val withSuf = sa
      .join(d.withColumnRenamed("doc_id", "sd"), col("doc_id") === col("sd"))
      .select(col("sa_rank"), col("doc_id"), col("pos"),
        expr(s"substring(s, pos, $SaMaxLen)").as("suffix"))
    val nxt = withSuf.select((col("sa_rank") - 1).as("r2"),
      col("doc_id").as("doc_id2"), col("pos").as("pos2"),
      col("suffix").as("suffix2"))
    val pairs = withSuf.join(nxt, col("sa_rank") === col("r2"))
      .withColumn("lcp", lcpCol(col("suffix"), col("suffix2")))
    pairs
      .orderBy(col("lcp").desc, col("sa_rank").asc)
      .limit(LrsTopK)
      .select(col("sa_rank"), col("doc_id"), col("pos"),
        col("doc_id2"), col("pos2"), col("lcp"),
        expr("substring(suffix, 1, lcp)").as("repeated"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q236_suffix_array" -> (q236SuffixArray _),
    "q237_longest_repeated_substrings" -> (q237LongestRepeatedSubstrings _),
  )

  /** Shared oracle CTE chain: the bounded universe and its ranked
    * suffix relation. */
  private def saCtes: String =
    s"""${TextOps.normCte},
       |b AS (SELECT doc_id, substr(s, 1, $SaMaxLen) AS s FROM n
       |      WHERE doc_id < $SaDocCap AND length(s) >= 1),
       |ex AS (SELECT doc_id, s,
       |              unnest(generate_series(1, length(s))) AS pos
       |       FROM b),
       |suf AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |               substr(s, pos) AS suffix
       |        FROM ex),
       |sa AS (SELECT CAST(row_number() OVER (ORDER BY suffix, doc_id, pos)
       |              AS BIGINT) AS sa_rank,
       |              doc_id, pos, suffix
       |       FROM suf)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q236_suffix_array" ->
      s"""WITH $saCtes
         |SELECT sa_rank, doc_id, pos FROM sa ORDER BY sa_rank""".stripMargin,

    "q237_longest_repeated_substrings" ->
      s"""WITH $saCtes,
         |adj AS (SELECT a.sa_rank, a.doc_id, a.pos,
         |               b.doc_id AS doc_id2, b.pos AS pos2,
         |               a.suffix AS s1, b.suffix AS s2
         |        FROM sa a JOIN sa b ON b.sa_rank = a.sa_rank + 1),
         |lj AS (SELECT sa_rank, doc_id, pos, doc_id2, pos2, s1, s2,
         |              unnest(generate_series(
         |                1, LEAST(length(s1), length(s2)))) AS j
         |       FROM adj),
         |-- prefix equality is monotone in j, so max matching j = LCP
         |l AS (SELECT sa_rank, doc_id, pos, doc_id2, pos2,
         |             max(s1) AS s1,
         |             CAST(max(CASE WHEN substr(s1, 1, CAST(j AS INT)) =
         |                               substr(s2, 1, CAST(j AS INT))
         |                          THEN j ELSE 0 END) AS BIGINT) AS lcp
         |      FROM lj GROUP BY 1, 2, 3, 4, 5)
         |SELECT sa_rank, doc_id, pos, doc_id2, pos2, lcp,
         |       substr(s1, 1, CAST(lcp AS INT)) AS repeated
         |FROM l ORDER BY lcp DESC, sa_rank ASC LIMIT $LrsTopK""".stripMargin,
  )
}
