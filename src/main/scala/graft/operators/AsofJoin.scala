package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** As-of (point-in-time) join — an operator Spark lacks natively:
  * for every left row, the latest right row with the same key and
  * time ≤ the left row's time.
  *
  * Spark-first design: instead of a per-row point-in-time subquery
  * (quadratic) or a range-condition join (broadcast-nested-loop), both
  * sides are UNIONed with a side tag and a single running
  * `last(..., ignoreNulls)` window per key carries the newest right
  * payload forward to each left row. One shuffle on the key, sort
  * within key partitions, linear in |left| + |right| — the classic
  * distributed as-of shape (same algorithm the oracle mirrors in ANSI
  * window SQL, so results hash-match by construction).
  *
  * Tie semantics: right rows at the same timestamp as a left row DO
  * match (≤), and among right ties the greatest `tieCol` wins —
  * deterministic across engines.
  */
object AsofJoin {

  /** As-of join `left` to `right` on `key` (times in `leftTime` /
    * `rightTime`), carrying `payload` columns from the right (emitted
    * with a `prefix`, null when no right row precedes). */
  def asof(left: DataFrame, right: DataFrame, key: String, leftTime: String,
      rightTime: String, payload: Seq[String], tieCol: String,
      prefix: String = "r_"): DataFrame = {
    val rStruct = struct(payload.map(col): _*)
    val rType = right.select(rStruct.as("r")).schema.head.dataType
    val lStruct = struct(left.columns.toIndexedSeq.map(col): _*)
    val lType = left.select(lStruct.as("l")).schema.head.dataType
    val lSide = left.select(col(key).as("__k"), col(leftTime).as("__t"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"), lit(1).as("__side"))
    val rSide = right.select(col(key).as("__k"), col(rightTime).as("__t"),
      lit(null).cast(lType).as("__l"), rStruct.as("__r"), lit(0).as("__side"))
    // right rows sort before left rows at equal time (≤ semantics);
    // among right ties the greatest tieCol ends up last, so the
    // running `last` picks it — deterministic
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").asc,
        col(s"__r.$tieCol").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lSide.unionByName(rSide)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val leftCols = left.columns.toIndexedSeq.map(c => col(s"__l.$c").as(c))
    val rightCols = payload.map(c => col(s"__m.$c").as(prefix + c))
    matched.select((leftCols ++ rightCols).toIndexedSeq: _*)
  }

  // ---------------------------------------------------------------- q39
  /** For each purchase event, the user's latest click at or before the
    * purchase (attribution-style point-in-time lookup) with the gap in
    * µs; purchases with no prior click keep nulls. */
  def q39AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id"),
        col("ts_us").as("p_ts_us"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts_us"))
    asof(purchases, clicks, "user_id", "p_ts_us", "ts_us",
        Seq("event_id", "ts_us"), tieCol = "event_id", prefix = "c_")
      .select(col("p_event_id"), col("user_id"), col("p_ts_us"),
        col("c_event_id"), col("c_ts_us"),
        (col("p_ts_us") - col("c_ts_us")).as("gap_us"))
      .orderBy("p_event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_asof_join" -> (q39AsofJoin _),
  )

  val oracleSql: Map[String, String] = Map(
    "q39_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t
        |           FROM events),
        |u AS (
        |  SELECT user_id, t, 0 AS side, event_id,
        |         CAST(NULL AS BIGINT) AS p_event_id
        |  FROM e WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, t, 1, CAST(NULL AS BIGINT), event_id
        |  FROM e WHERE event_type = 'purchase'),
        |w AS (SELECT user_id, t, side, p_event_id,
        |    last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
        |      OVER win AS c_event_id,
        |    last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS)
        |      OVER win AS c_ts_us
        |  FROM u
        |  WINDOW win AS (PARTITION BY user_id ORDER BY t, side, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT p_event_id, user_id, t AS p_ts_us, c_event_id, c_ts_us,
        |       t - c_ts_us AS gap_us
        |FROM w WHERE side = 1 ORDER BY p_event_id""".stripMargin,
  )
}
