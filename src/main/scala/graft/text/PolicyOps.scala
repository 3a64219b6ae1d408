package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Content-policy filtering — the C4-style blocklist pass plus
  * regex PII detection/redaction every training-data pipeline runs
  * before release: count blocklisted terms and PII spans (emails,
  * IPv4 addresses, phone numbers) per document, emit the redacted
  * text's fingerprint and the drop verdict.
  *
  * Scale shape: pure per-row regex projections — zero shuffle, fully
  * codegen'd (`regexp_count`/`regexp_replace` are built-in
  * expressions), the cheapest possible corpus pass. Patterns are
  * written in the common Java-regex/RE2 dialect (character classes,
  * `\b`, bounded quantifiers only) so the DuckDB oracle runs the
  * SAME patterns; the synthetic corpus contains no PII by
  * construction, so PII semantics are additionally pinned by a
  * fixture spec with planted emails/IPs/phones (PolicyOpsSpec).
  */
object PolicyOps {

  /** Blocklisted terms (stand-in policy list; the real deployment
    * swaps in its own). Matched as whole words on the normalized
    * lowercase text. */
  val Blocklist: Seq[String] = Seq("dup", "slow")

  val EmailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Pat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePat = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  private def blockPat: String = s"\\b(${Blocklist.mkString("|")})\\b"

  /** Per-document policy report over a (doc_id, s) frame: blocklist
    * hits, PII hits by kind, redacted-text fingerprint, verdict. */
  def policyReport(docs: DataFrame): DataFrame = {
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(col("s"), EmailPat, "<email>"),
          Ipv4Pat, "<ip>"),
        PhonePat, "<phone>"),
      blockPat, "<term>")
    // NB: patterns go through the Column API only — an expr() SQL
    // literal would re-parse '\b' as a backspace escape
    docs.select(
      col("doc_id"),
      regexp_count(col("s"), lit(blockPat)).cast("long").as("n_blocked"),
      regexp_count(col("s"), lit(EmailPat)).cast("long").as("n_emails"),
      regexp_count(col("s"), lit(Ipv4Pat)).cast("long").as("n_ips"),
      regexp_count(col("s"), lit(PhonePat)).cast("long").as("n_phones"),
      md5(redacted).as("redacted_fp"))
      .withColumn("dropped",
        col("n_blocked") > 0 || col("n_emails") + col("n_ips") + col("n_phones") > 0)
  }

  def q73PolicyFilter(spark: SparkSession, dir: String): DataFrame =
    policyReport(TextOps.docs(spark, dir)).orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q73_policy_filter" -> (q73PolicyFilter _),
  )

  val oracleSql: Map[String, String] = Map(
    "q73_policy_filter" -> {
      val bp = blockPat
      s"""WITH ${TextOps.normCte},
         |r AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(s, '$bp')) AS BIGINT) AS n_blocked,
         |    CAST(len(regexp_extract_all(s, '$EmailPat')) AS BIGINT) AS n_emails,
         |    CAST(len(regexp_extract_all(s, '$Ipv4Pat')) AS BIGINT) AS n_ips,
         |    CAST(len(regexp_extract_all(s, '$PhonePat')) AS BIGINT) AS n_phones,
         |    md5(regexp_replace(
         |          regexp_replace(
         |            regexp_replace(
         |              regexp_replace(s, '$EmailPat', '<email>', 'g'),
         |              '$Ipv4Pat', '<ip>', 'g'),
         |            '$PhonePat', '<phone>', 'g'),
         |          '$bp', '<term>', 'g')) AS redacted_fp
         |  FROM n)
         |SELECT doc_id, n_blocked, n_emails, n_ips, n_phones, redacted_fp,
         |       (n_blocked > 0 OR n_emails + n_ips + n_phones > 0) AS dropped
         |FROM r ORDER BY doc_id""".stripMargin
    },
  )
}
