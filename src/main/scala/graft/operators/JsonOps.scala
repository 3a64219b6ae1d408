package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Semi-structured (JSON) column handling — the capability the whole
  * reference pipeline is built on (package.json manifests:
  * src/InsertDataHelper.ts parses dependency maps out of raw JSON;
  * sources.PackageJsonSource is the ingest-side equivalent). Here:
  * typed extraction from the events stream's `props` JSON column and
  * a per-type rollup, the "parse a JSON property bag inside the
  * engine" operator every event pipeline needs.
  *
  * Scale shape: `get_json_object` is a per-row codegen'd projection —
  * extraction adds zero shuffle to whatever plan consumes it; the
  * rollup is one partial-agg groupBy. At 100 TB prefer `from_json`
  * with an explicit schema once per pipeline (single parse, typed
  * struct reuse) — same plan shape. */
object JsonOps {

  /** Per-event-type rollup of the extracted `props.k` counter:
    * volume, extraction coverage, exact integer sum/max. */
  def q79JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q79_json_extract" -> (q79JsonExtract _),
  )

  val oracleSql: Map[String, String] = Map(
    "q79_json_extract" ->
      """WITH z AS (
        |  SELECT event_type,
        |         CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(count(k) AS BIGINT) AS n_with_k,
        |       CAST(sum(k) AS BIGINT) AS sum_k,
        |       CAST(max(k) AS BIGINT) AS max_k
        |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
