package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** LLM-training-pipeline text operators over the `documents` table:
  * exact + near dedup (n-gram Jaccard, MinHash+LSH, SimHash),
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * Design rules for 100 TB:
  *  - signatures (minhash perms, simhash bits, fingerprints) are
  *    computed with codegen'd higher-order functions *inside the row*
  *    — zero shuffle until the tiny signature relation exists;
  *  - candidate-pair generation is always blocked (min-gram block,
  *    LSH bands, simhash byte-bands) — never an O(n²) cross join;
  *  - the simhash band width (4 bands × 8 bits) makes banding *exact*
  *    for hamming ≤ 3 (pigeonhole), so the blocked plan returns the
  *    same pairs a brute-force scan would.
  *
  * Hash family: md5 hex strings (identical in Spark and DuckDB), with
  * hex→int via base-16 `conv` (Spark) / nibble positional sums
  * (DuckDB oracle) — bit-identical across engines.
  */
object TextOps {

  /** Whitespace-collapsed lowercase normalization, shared by all ops. */
  private def withNorm(docs: DataFrame): DataFrame =
    docs.withColumn("s",
      lower(trim(regexp_replace(col("text"), "\\s+", " "))))

  private def docs(spark: SparkSession, dir: String): DataFrame =
    withNorm(Tables(spark, dir).documents)

  /** (doc_id, gram) — distinct char-5-gram relation. */
  private def grams(d: DataFrame): DataFrame =
    d.filter(length(col("s")) >= 5)
      .selectExpr("doc_id",
        "explode(array_distinct(transform(sequence(1, length(s) - 4), i -> substring(s, i, 5)))) AS gram")

  /** Per-doc gram set + 8 minhash values, all computed in-row
    * (array_min over per-perm md5s) — no shuffle, no explode. The
    * gram universe here is tiny-vocab synthetic text, so any blocking
    * on a SINGLE min-gram collapses (one block held 22% of the corpus
    * at sf0.1); 4-perm concatenated keys push background collision
    * down to ~j⁴. */
  private def sigDocs(d: DataFrame): DataFrame = {
    val hs = (0 to 7).map(k =>
      s"array_min(transform(grams, g -> md5(concat('$k:', g)))) AS h$k")
    d.filter(length(col("s")) >= 5)
      .selectExpr("doc_id",
        "array_distinct(transform(sequence(1, length(s) - 4), i -> substring(s, i, 5))) AS grams")
      .selectExpr(Seq("doc_id", "grams") ++ hs: _*)
  }

  /** Add exact in-row Jaccard between gram arrays `ga`/`gb`, filter to
    * `>= thresh`, emit rounded `jaccard`. */
  private def verifyJaccard(pairs: DataFrame, thresh: Double): DataFrame =
    pairs
      .withColumn("c", size(array_intersect(col("ga"), col("gb"))).cast("double"))
      .withColumn("j", col("c") / (size(col("ga")) + size(col("gb")) - col("c")))
      .filter(col("j") >= thresh)
      .withColumn("jaccard", round(col("j"), 6))

  // ---------------------------------------------------------------- q20
  /** Exact dedup: group by md5 of normalized text, keep min doc_id.
    * (The reference's Redis set-membership dedup, as a hash groupBy —
    * GitHubMinerHelper.ts:48-56 semantics.) */
  def q20DedupExact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), md5(col("s")).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("dup_count"))
      .orderBy("keep_id")

  // ---------------------------------------------------------------- q21
  /** N-gram Jaccard near-dup: distinct 5-gram sets, single-band
    * 4-perm minhash blocking (background collision ∝ j⁴), exact
    * in-row Jaccard ≥ 0.5 on candidates. */
  def q21NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sig = sigDocs(docs(spark, dir))
      .select(col("doc_id"), col("grams"),
        concat(col("h0"), col("h1"), col("h2"), col("h3")).as("blk"))
      .localCheckpoint()
    val pairs = sig.as("x").join(sig.as("y"),
        col("x.blk") === col("y.blk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.grams").as("ga"), col("y.grams").as("gb"))
    verifyJaccard(pairs, 0.5)
      .select(col("a"), col("b"), col("jaccard"))
      .orderBy("a", "b")
  }

  // ---------------------------------------------------------------- q22
  /** MinHash + LSH near-dup, full pipeline: 8 permutations computed
    * in-row (array_min over per-perm md5s — zero shuffle), 2 bands of
    * 4 rows generate candidate pairs (the only pair join is
    * bucket-blocked), then exact in-row Jaccard ≥ 0.5 verification. */
  def q22DedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val sig = sigDocs(docs(spark, dir)).localCheckpoint()
    val bands = sig.selectExpr("doc_id",
      """stack(2,
        |  0, md5(concat(h0, h1, h2, h3)),
        |  1, md5(concat(h4, h5, h6, h7))) AS (j, k)""".stripMargin)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.j") === col("y.j") && col("x.k") === col("y.k") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(countDistinct(col("x.j")).as("n_shared_bands"))
    val ga = sig.select(col("doc_id").as("da"), col("grams").as("ga"))
    val gb = sig.select(col("doc_id").as("db"), col("grams").as("gb"))
    val pairs = cand.join(ga, col("a") === col("da")).join(gb, col("b") === col("db"))
    verifyJaccard(pairs, 0.5)
      .select(col("a"), col("b"), col("n_shared_bands"), col("jaccard"))
      .orderBy("a", "b")
  }

  // ---------------------------------------------------------------- q23
  /** SimHash: 32-bit signature from per-word md5 bits (frequency
    * weighted), computed shuffle-free via aggregate/zip_with; pairs
    * via 4×8-bit byte-banding, which is EXACT for hamming ≤ 3. */
  private val simhashCountsExpr: String =
    """aggregate(
      |  transform(split(s, ' '),
      |            w -> cast(conv(substring(md5(w), 1, 8), 16, 10) as bigint)),
      |  array_repeat(cast(0 as bigint), 32),
      |  (cnt, h) -> zip_with(cnt,
      |    transform(sequence(0, 31),
      |              b -> if(shiftright(h, b) % 2 = 1, cast(1 as bigint), cast(-1 as bigint))),
      |    (x, y) -> x + y)
      |)""".stripMargin

  def simhashSignatures(d: DataFrame): DataFrame =
    // the bit-count array is bound to a lambda variable so it is
    // evaluated once per row — an attribute reference would be inlined
    // by CollapseProject and re-evaluated on every output bit
    d.selectExpr("doc_id",
      s"""element_at(transform(array($simhashCountsExpr),
         |  c -> aggregate(sequence(0, 31), cast(0 as bigint),
         |    (acc, j) -> acc + if(element_at(c, j + 1) > 0,
         |      shiftleft(cast(1 as bigint), j), cast(0 as bigint)))), 1) AS sig""".stripMargin)

  def q23DedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val sig = simhashSignatures(docs(spark, dir)).localCheckpoint()
    val bands = sig.selectExpr("doc_id", "sig",
      """stack(4,
        |  0, shiftright(sig, 0) % 256,
        |  1, shiftright(sig, 8) % 256,
        |  2, shiftright(sig, 16) % 256,
        |  3, shiftright(sig, 24) % 256) AS (j, bv)""".stripMargin)
    bands.as("x").join(bands.as("y"),
        col("x.j") === col("y.j") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.sig").as("sa"), col("y.sig").as("sb"))
      .distinct()
      .withColumn("hamming",
        expr("cast(bit_count(sa ^ sb) as bigint)"))
      .filter(col("hamming") <= 3)
      .select("a", "b", "hamming")
      .orderBy("a", "b")
  }

  // ---------------------------------------------------------------- q27
  /** Language ID: stopword-hit-ratio argmax over a fixed per-language
    * lexicon (deterministic tie-break: lang ascending). The per-lang
    * match counts are computed in-row with array filters (codegen) —
    * the only row amplification is ×|langs| for the argmax window. */
  val langLexicon: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ein", "zu", "data"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un"),
    "fr" -> Seq("le", "la", "de", "et", "table", "pour", "dans"),
    "zh" -> Seq("de5", "shi4", "bu4", "le5", "zai4", "ren2", "you3"),
  )

  def q27LangId(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).withColumn("words", split(col("s"), " "))
    val scored = d.select(
      col("doc_id") +: size(col("words")).cast("long").as("nw") +:
        langLexicon.map { case (lang, sw) =>
          val lst = sw.map(w => s"'$w'").mkString(", ")
          expr(s"cast(size(filter(words, w -> array_contains(array($lst), w))) as bigint)")
            .as(s"m_$lang")
        }: _*)
    val stacked = scored.selectExpr("doc_id", "nw",
      s"stack(${langLexicon.size}, " +
        langLexicon.map { case (lang, _) => s"'$lang', m_$lang" }.mkString(", ") +
        ") AS (lang, m)")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy(col("m").desc, col("lang").asc)
    stacked.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("doc_id"), col("lang").as("lang_pred"),
        round(col("m").cast("double") / col("nw"), 6).as("score"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q28
  /** Quality scoring: length / punctuation / stopword-ratio features
    * combined into one score — pure column math, fully codegen'd. */
  def q28QualityScore(spark: SparkSession, dir: String): DataFrame = {
    val en = langLexicon.toMap.apply("en").map(w => s"'$w'").mkString(", ")
    docs(spark, dir)
      .withColumn("words", split(col("s"), " "))
      .withColumn("nw", size(col("words")).cast("long"))
      .withColumn("pr",
        (length(col("s")) - length(regexp_replace(col("s"), "[^a-z0-9 ]", "")))
          .cast("double") / length(col("s")))
      .withColumn("sr",
        expr(s"cast(size(filter(words, w -> array_contains(array($en), w))) as bigint)")
          .cast("double") / col("nw"))
      .withColumn("quality",
        lit(0.3) * least(lit(1.0), col("nw").cast("double") / 100.0) +
          lit(0.3) * (lit(1.0) - col("pr")) + lit(0.4) * col("sr"))
      .select(col("doc_id"), col("nw").as("n_words"),
        round(col("pr"), 6).as("punct_ratio"),
        round(col("sr"), 6).as("stop_ratio"),
        round(col("quality"), 6).as("quality"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q29
  /** Token counting: whitespace tokens + a BPE-ish regex tokenizer
    * (letter runs / digit runs / single symbols). */
  def q29TokenCount(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        size(split(col("s"), " ")).cast("long").as("ws_tokens"),
        expr("cast(regexp_count(s, '[a-z]+|[0-9]+|[^a-z0-9 ]') as bigint)")
          .as("bpe_tokens"),
        length(col("s")).cast("long").as("chars"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------- q30
  /** Document fingerprint: md5 of normalized text + a positional
    * polynomial hash (Σ ascii(cᵢ)·31^(i mod 8) mod 2^31-1) evaluated
    * in-row via aggregate/transform — no shuffle, no UDF. */
  def q30Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val pows = (0 to 7).map(k => math.pow(31, k).toLong + "L").mkString(", ")
    docs(spark, dir)
      .selectExpr("doc_id", "md5(s) AS fp_md5",
        s"""aggregate(
           |  transform(sequence(1, length(s)),
           |    i -> cast(ascii(substring(s, i, 1)) as bigint)
           |         * element_at(array($pows), cast((i - 1) % 8 as int) + 1)),
           |  cast(0 as bigint), (acc, x) -> acc + x) % 2147483647 AS rolling""".stripMargin)
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q31
  /** Multimodal metadata: documents as opaque binary payloads with
    * md5-derived fake decode dims (width/height/frames). The typed
    * decode plumbing (binary schema, partition-batched fake decoder)
    * lives in graft.multimodal.Multimodal; this is the metadata
    * extraction query over the same columns. */
  def q31MultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .withColumn("data", col("text").cast("binary"))
      .withColumn("h", md5(col("data")))
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        (expr("cast(conv(substring(h, 1, 4), 16, 10) as bigint)") % 512 + 1).as("width"),
        (expr("cast(conv(substring(h, 5, 4), 16, 10) as bigint)") % 512 + 1).as("height"),
        (expr("cast(conv(substring(h, 9, 2), 16, 10) as bigint)") % 16 + 1).as("n_frames"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_dedup_exact" -> (q20DedupExact _),
    "q21_ngram_jaccard" -> (q21NgramJaccard _),
    "q22_dedup_minhash" -> (q22DedupMinhash _),
    "q23_dedup_simhash" -> (q23DedupSimhash _),
    "q27_lang_id" -> (q27LangId _),
    "q28_quality_score" -> (q28QualityScore _),
    "q29_token_count" -> (q29TokenCount _),
    "q30_fingerprint" -> (q30Fingerprint _),
    "q31_multimodal_meta" -> (q31MultimodalMeta _),
  )

  // ------------------------------------------------------------ oracles

  /** DuckDB hex→BIGINT: positional nibble sum over `len` hex chars of
    * `hexExpr` starting at 1-based `start` (mirror of Spark's conv). */
  private def hexToLongSql(hexExpr: String, start: Int, len: Int): String =
    (0 until len).map { p =>
      val mult = math.pow(16, len - 1 - p).toLong
      s"(strpos('0123456789abcdef', substr($hexExpr, ${start + p}, 1)) - 1) * CAST($mult AS BIGINT)"
    }.mkString("(", " + ", ")")

  private val normCte =
    """n AS (SELECT doc_id, text,
      |  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
      |FROM documents)""".stripMargin

  private val gramCtes =
    s"""$normCte,
       |pos AS (SELECT doc_id, s, unnest(generate_series(1, length(s) - 4)) AS i
       |        FROM n WHERE length(s) >= 5),
       |g AS (SELECT DISTINCT doc_id, substr(s, CAST(i AS INT), 5) AS gram FROM pos)""".stripMargin

  private val simhashSqlCtes: String = {
    val h = hexToLongSql("md5(w)", 1, 8)
    s"""$normCte,
       |w AS (SELECT doc_id, unnest(string_split(s, ' ')) AS w FROM n),
       |hh AS (SELECT doc_id, $h AS h FROM w),
       |bits AS (SELECT doc_id, j,
       |    sum(CASE WHEN (h // (CAST(1 AS BIGINT) << CAST(j AS INT))) % 2 = 1
       |             THEN 1 ELSE -1 END) AS c
       |  FROM hh, (SELECT unnest(generate_series(0, 31)) AS j) js
       |  GROUP BY 1, 2),
       |sig AS (SELECT doc_id,
       |    CAST(sum(CASE WHEN c > 0
       |         THEN CAST(1 AS BIGINT) << CAST(j AS INT) ELSE 0 END) AS BIGINT) AS sig
       |  FROM bits GROUP BY 1)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q20_dedup_exact" ->
      s"""WITH $normCte
         |SELECT md5(s) AS fp, CAST(min(doc_id) AS BIGINT) AS keep_id,
         |       CAST(count(*) AS BIGINT) AS dup_count
         |FROM n GROUP BY 1 ORDER BY keep_id""".stripMargin,

    "q21_ngram_jaccard" ->
      s"""WITH $gramCtes,
         |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nn FROM g GROUP BY 1),
         |blk AS (SELECT doc_id,
         |    min(md5('0:' || gram)) || min(md5('1:' || gram)) ||
         |    min(md5('2:' || gram)) || min(md5('3:' || gram)) AS b
         |  FROM g GROUP BY 1),
         |cand AS (SELECT x.doc_id AS a, y.doc_id AS b FROM blk x
         |         JOIN blk y ON x.b = y.b AND x.doc_id < y.doc_id),
         |inter AS (SELECT c.a, c.b, CAST(count(*) AS BIGINT) AS c
         |  FROM cand c
         |  JOIN g ga ON ga.doc_id = c.a
         |  JOIN g gb ON gb.doc_id = c.b AND ga.gram = gb.gram
         |  GROUP BY 1, 2)
         |SELECT i.a, i.b,
         |       round(CAST(i.c AS DOUBLE) / (sa.nn + sb.nn - i.c), 6) AS jaccard
         |FROM inter i
         |JOIN sz sa ON sa.doc_id = i.a
         |JOIN sz sb ON sb.doc_id = i.b
         |WHERE CAST(i.c AS DOUBLE) / (sa.nn + sb.nn - i.c) >= 0.5
         |ORDER BY a, b""".stripMargin,

    "q22_dedup_minhash" ->
      s"""WITH $gramCtes,
         |sig AS (SELECT doc_id,
         |${(0 to 7).map(k => s"    min(md5('$k:' || gram)) AS h$k").mkString(",\n")}
         |  FROM g GROUP BY 1),
         |bands AS (
         |  SELECT doc_id, 0 AS j, md5(h0 || h1 || h2 || h3) AS k FROM sig
         |  UNION ALL SELECT doc_id, 1, md5(h4 || h5 || h6 || h7) FROM sig),
         |cand AS (SELECT x.doc_id AS a, y.doc_id AS b,
         |    CAST(count(DISTINCT x.j) AS BIGINT) AS n_shared_bands
         |  FROM bands x JOIN bands y
         |    ON x.j = y.j AND x.k = y.k AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2),
         |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nn FROM g GROUP BY 1),
         |inter AS (SELECT c.a, c.b, c.n_shared_bands, CAST(count(*) AS BIGINT) AS c
         |  FROM cand c
         |  JOIN g ga ON ga.doc_id = c.a
         |  JOIN g gb ON gb.doc_id = c.b AND ga.gram = gb.gram
         |  GROUP BY 1, 2, 3)
         |SELECT i.a, i.b, i.n_shared_bands,
         |       round(CAST(i.c AS DOUBLE) / (sa.nn + sb.nn - i.c), 6) AS jaccard
         |FROM inter i
         |JOIN sz sa ON sa.doc_id = i.a
         |JOIN sz sb ON sb.doc_id = i.b
         |WHERE CAST(i.c AS DOUBLE) / (sa.nn + sb.nn - i.c) >= 0.5
         |ORDER BY a, b""".stripMargin,

    "q23_dedup_simhash" ->
      s"""WITH $simhashSqlCtes,
         |bands AS (SELECT doc_id, sig, j2,
         |    (sig // (CAST(1 AS BIGINT) << CAST(8 * j2 AS INT))) % 256 AS bv
         |  FROM sig, (SELECT unnest(generate_series(0, 3)) AS j2) js),
         |pairs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         |    x.sig AS sa, y.sig AS sb
         |  FROM bands x JOIN bands y
         |    ON x.j2 = y.j2 AND x.bv = y.bv AND x.doc_id < y.doc_id)
         |SELECT a, b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
         |FROM pairs WHERE bit_count(xor(sa, sb)) <= 3
         |ORDER BY a, b""".stripMargin,

    "q27_lang_id" -> {
      val langsValues = langLexicon.map { case (lang, sw) =>
        s"('$lang', [${sw.map(w => s"'$w'").mkString(", ")}])"
      }.mkString(",\n  ")
      s"""WITH $normCte,
         |langs(lang, sw) AS (VALUES
         |  $langsValues),
         |w AS (SELECT doc_id, unnest(string_split(s, ' ')) AS w FROM n),
         |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nw FROM w GROUP BY 1),
         |sc AS (SELECT w.doc_id, l.lang,
         |    CAST(sum(CASE WHEN list_contains(l.sw, w.w) THEN 1 ELSE 0 END) AS BIGINT) AS m
         |  FROM w, langs l GROUP BY 1, 2),
         |r AS (SELECT doc_id, lang, m,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY m DESC, lang ASC) AS rk
         |  FROM sc)
         |SELECT r.doc_id, r.lang AS lang_pred,
         |       round(CAST(r.m AS DOUBLE) / t.nw, 6) AS score
         |FROM r JOIN tot t ON t.doc_id = r.doc_id
         |WHERE rk = 1 ORDER BY 1""".stripMargin
    },

    "q28_quality_score" -> {
      val en = langLexicon.toMap.apply("en").map(w => s"'$w'").mkString(", ")
      s"""WITH $normCte,
         |f AS (SELECT doc_id,
         |    CAST(len(string_split(s, ' ')) AS BIGINT) AS nw,
         |    CAST(length(s) - length(regexp_replace(s, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
         |      / length(s) AS pr,
         |    CAST(len(list_filter(string_split(s, ' '),
         |        w -> list_contains([$en], w))) AS BIGINT) AS m
         |  FROM n)
         |SELECT doc_id, nw AS n_words,
         |       round(pr, 6) AS punct_ratio,
         |       round(CAST(m AS DOUBLE) / nw, 6) AS stop_ratio,
         |       round(0.3 * least(1.0, CAST(nw AS DOUBLE) / 100.0)
         |             + 0.3 * (1.0 - pr)
         |             + 0.4 * (CAST(m AS DOUBLE) / nw), 6) AS quality
         |FROM f ORDER BY doc_id""".stripMargin
    },

    "q29_token_count" ->
      s"""WITH $normCte
         |SELECT doc_id,
         |       CAST(len(string_split(s, ' ')) AS BIGINT) AS ws_tokens,
         |       CAST(len(regexp_extract_all(s, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens,
         |       CAST(length(s) AS BIGINT) AS chars
         |FROM n ORDER BY doc_id""".stripMargin,

    "q30_fingerprint" -> {
      val pows = (0 to 7).map(k => math.pow(31, k).toLong).mkString(", ")
      s"""WITH $normCte,
         |pos AS (SELECT doc_id, s, unnest(generate_series(1, length(s))) AS i FROM n),
         |terms AS (SELECT doc_id,
         |    CAST(ascii(substr(s, CAST(i AS INT), 1)) AS BIGINT)
         |      * ([$pows])[CAST((i - 1) % 8 AS INT) + 1] AS t
         |  FROM pos)
         |SELECT n.doc_id, md5(n.s) AS fp_md5,
         |       CAST(sum(t.t) AS BIGINT) % 2147483647 AS rolling
         |FROM n JOIN terms t ON t.doc_id = n.doc_id
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin
    },

    "q31_multimodal_meta" ->
      s"""WITH h AS (SELECT doc_id, text, md5(text) AS h FROM documents)
         |SELECT doc_id,
         |       CAST(strlen(text) AS BIGINT) AS n_bytes,
         |       ${hexToLongSql("h", 1, 4)} % 512 + 1 AS width,
         |       ${hexToLongSql("h", 5, 4)} % 512 + 1 AS height,
         |       ${hexToLongSql("h", 9, 2)} % 16 + 1 AS n_frames
         |FROM h ORDER BY doc_id""".stripMargin,
  )
}
