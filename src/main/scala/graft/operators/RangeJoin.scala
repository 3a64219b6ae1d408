package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Interval (range) join — "points falling inside intervals", an
  * operator Spark's joins don't cover natively: `ts BETWEEN start
  * AND end` against a non-trivial interval table degenerates to a
  * BroadcastNestedLoopJoin, O(|points|·|intervals|) compared pairs.
  *
  * Scale design — BUCKETIZED equi-join: intervals explode into the
  * fixed-width time buckets they overlap, points key by their own
  * bucket, and the theta condition shrinks to an equi-join on the
  * bucket plus an exact residual filter. Each point meets only the
  * intervals overlapping its bucket — work is
  * O(|points| + Σ interval_span/bucket) shuffled on the bucket key,
  * the standard range-join technique (what dedicated engines' range
  * join optimizations do under the hood). Bucket width is the knob:
  * ~the median interval length keeps the per-interval explosion a
  * small constant. A point matches an interval in exactly one bucket
  * (its own), so no post-join dedup is needed.
  *
  * Time travels as integer MICROSECONDS (the library's `ts_us`
  * convention, Tables.events) — engine-exact boundary semantics, no
  * timestamp-type coercion in the hot path.
  */
object RangeJoin {

  /** Generic bucketized range join: rows of `points` (long time
    * column `tsCol`, nonnegative) against rows of `intervals` with
    * [startCol, endCol) long bounds, end exclusive. Returns matched
    * pairs (all point columns + all interval columns). */
  def rangeJoin(points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    val exploded = intervals.withColumn("__bucket",
      explode(sequence(
        expr(s"$startCol div $bucketWidth"),
        expr(s"($endCol - 1) div $bucketWidth"))))
    val keyed = points.withColumn("__bucket", expr(s"$tsCol div $bucketWidth"))
    keyed.join(exploded, Seq("__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }

  // ---------------------------------------------------------------- q77
  /** Campaign attribution over the events stream: 20 deterministic
    * campaign windows (start = 2024-01-01 + i·33 h, width =
    * 6 + (i mod 5)·12 h — variable-length, overlapping) range-joined
    * to events, then per-campaign reach/volume (decimal-exact sums,
    * surfaced as double like q32).
    * The oracle states the SEMANTICS as a plain BETWEEN theta join —
    * algorithm-independent evidence that the bucketized plan computes
    * the same relation. */
  val Campaigns = 20
  val BucketUs: Long = 3600L * 1000000 // 1 hour
  val EpochUs: Long = 1704067200000000L // 2024-01-01 00:00:00 UTC
  private val HourUs = 3600L * 1000000

  def campaigns(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until Campaigns).map { i =>
      val start = EpochUs + i.toLong * 33 * HourUs
      (i.toLong, start, start + (6 + (i % 5) * 12).toLong * HourUs)
    }.toDF("campaign_id", "start_us", "end_us")
  }

  def q77RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("ts_us"), col("user_id"),
        col("value").cast("decimal(18,2)").as("v"))
    val matched = rangeJoin(ev, "ts_us", campaigns(spark),
      "start_us", "end_us", BucketUs)
    campaigns(spark).select("campaign_id")
      .join(matched.groupBy("campaign_id")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("v")).cast("double").as("total_value")),
        Seq("campaign_id"), "left")
      .select(col("campaign_id"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("n_users"), lit(0L)).as("n_users"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"))
      .orderBy("campaign_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q77_range_join" -> (q77RangeJoin _),
  )

  val oracleSql: Map[String, String] = Map(
    "q77_range_join" ->
      s"""WITH c AS (
         |  SELECT CAST(i AS BIGINT) AS campaign_id,
         |         $EpochUs + i * ${33 * HourUs} AS start_us,
         |         $EpochUs + i * ${33 * HourUs}
         |           + (6 + (i % 5) * 12) * $HourUs AS end_us
         |  FROM generate_series(0, ${Campaigns - 1}) AS t(i)),
         |e2 AS (
         |  SELECT epoch_us(ts) AS ts_us, user_id,
         |         CAST(value AS DECIMAL(18,2)) AS v
         |  FROM events),
         |m AS (
         |  SELECT c.campaign_id, e2.user_id, e2.v
         |  FROM c JOIN e2
         |    ON e2.ts_us >= c.start_us AND e2.ts_us < c.end_us)
         |SELECT c.campaign_id,
         |       CAST(COALESCE(g.n_events, 0) AS BIGINT) AS n_events,
         |       CAST(COALESCE(g.n_users, 0) AS BIGINT) AS n_users,
         |       CAST(COALESCE(g.total_value, 0) AS DOUBLE) AS total_value
         |FROM c
         |LEFT JOIN (
         |  SELECT campaign_id, count(*) AS n_events,
         |         count(DISTINCT user_id) AS n_users,
         |         sum(v) AS total_value
         |  FROM m GROUP BY 1) g USING (campaign_id)
         |ORDER BY c.campaign_id""".stripMargin,
  )
}
