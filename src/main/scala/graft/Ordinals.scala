package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed dense ordinals — the shared primitive for "rank every
  * row of a data-scale relation by a sort key".
  *
  * An unpartitioned `row_number().over(Window.orderBy(...))` funnels
  * the WHOLE relation through one task (Spark itself warns
  * `No Partition Defined for Window operation`): at suite scale it's
  * invisible, at a 100 TB vocabulary it is the stage that never
  * finishes. The scalable shape is the one the suffix-array build
  * uses (text/SuffixArray.scala `keyRanks`): a global `sort` — a
  * range-partitioned exchange, every partition sorted in parallel —
  * followed by `zipWithIndex`, which assigns contiguous per-partition
  * ids with one extra count job for the partition offsets. Over
  * DISTINCT sort keys the result is bit-identical to the
  * `row_number` it replaces, with no single-task stage.
  */
object Ordinals {

  /** `df` plus `rankCol` = `first` + position of the row in the
    * ascending `sortCols` order. Ranks are dense and deterministic
    * when the sort key is unique per row (callers pass distinct
    * keys); ties would otherwise order arbitrarily within equal keys.
    */
  def dense(df: DataFrame, sortCols: Seq[String], rankCol: String,
      first: Long = 1L): DataFrame =
    denseBy(df, sortCols.map(org.apache.spark.sql.functions.col), rankCol,
      first)

  /** [[dense]] over arbitrary sort Columns (mixed asc/desc). The sort
    * expression sequence must be a TOTAL order over `df`'s rows (end
    * with a unique tie-break column) or ranks within ties are
    * partition-order-dependent. */
  def denseBy(df: DataFrame, sortCols: Seq[org.apache.spark.sql.Column],
      rankCol: String, first: Long = 1L): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.sort(sortCols: _*)
    buildWithIndex(spark, sorted, rankCol, first)
  }

  /** Exact `ntile(n)` over a global total order WITHOUT the
    * unpartitioned Window (whose sort runs in ONE task): rank via
    * [[denseBy]], then Spark's own ntile arithmetic — the first
    * N mod n buckets take ⌈N/n⌉ rows, the rest ⌊N/n⌋ — as a
    * projection over the rank and the row-count scalar. Bit-identical
    * to `ntile(n).over(Window.orderBy(sortCols))` (spec-pinned), one
    * parallel range-sort instead of a single-task window sort. */
  /** `knownTotal`: pass the (already-known) row count to skip the
    * internal count job — chained calls over the same relation (q106's
    * three quintiles) would otherwise replay the input lineage once
    * per count. */
  def ntileBy(df: DataFrame, sortCols: Seq[org.apache.spark.sql.Column],
      n: Int, bucketCol: String, knownTotal: Long = -1L): DataFrame = {
    require(n >= 1, s"ntile needs n >= 1, got $n")
    import org.apache.spark.sql.functions._
    val rk = "__graft_ntile_rank"
    val ranked = denseBy(df, sortCols, rk)
    val total = // scalar: the bucket-size base
      if (knownTotal >= 0) knownTotal else ranked.count()
    val size = total / n
    val rem = total % n
    val cut = rem * (size + 1)
    // integer `div` keeps the bucket arithmetic exact at any N (a
    // double division could round across a bucket boundary)
    val bucket =
      if (size == 0) s"$rk" // N < n: one row per bucket, bucket = rank
      else s"""case when $rk <= $cut
              |  then ($rk - 1) div ${size + 1} + 1
              |  else $rem + ($rk - 1 - $cut) div $size + 1 end""".stripMargin
    ranked.withColumn(bucketCol, expr(bucket).cast("long")).drop(rk)
  }

  private def buildWithIndex(spark: org.apache.spark.sql.SparkSession,
      sorted: DataFrame, rankCol: String, first: Long): DataFrame = {
    val schema = StructType(sorted.schema.fields :+
      StructField(rankCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (first + i))
    }
    spark.createDataFrame(rdd, schema)
  }
}
