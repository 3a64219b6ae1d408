package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multi-dimensional data-layout clustering — the Z-order (Morton
  * curve) file assignment behind min/max-zone-map pruning, measured
  * against insertion-order layout on the same probe.
  *
  * This is the 100 TB operator par excellence: a scan engine prunes a
  * file when the predicate box misses the file's per-column [min, max]
  * zone map, and linear layouts give tight zones on ONE column only.
  * Interleaving the bits of two bucketized dimensions (Morton code)
  * bounds every file to a small rectangle in (x, y) space, so a
  * 2-D probe touches O(√files) instead of all of them. The operator
  * reports exactly that win: files/rows scanned for a fixed probe box
  * under both layouts, plus the true match count.
  *
  * Engine-exact and shuffle-free by design: bucketization is integer
  * range math from one global min/max agg (broadcast as a 1-row
  * dimension), the Morton code is bit arithmetic, and the FILE
  * assignment is `z div 16` — a projection, not a global sort, so the
  * plan is two partial-agg passes over the fact table and never moves
  * it. (A real writer would range-partition by z for equal file
  * sizes; the pruning measurement is identical, and sizing skew is
  * visible in the per-file rows this aggregates over.)
  */
object Layout {

  /** 2^BucketBits buckets per dimension; z has 2·BucketBits bits. */
  val BucketBits = 4
  val Buckets = 1 << BucketBits // 16
  /** Files = z-ranges of [[Buckets]] consecutive z values (so 16
    * files), mirrored by 16 equal key-ranges for the linear layout. */
  val Files = Buckets

  /** Probe box: the middle-left quarter × upper quarter — bx ∈ [4,7],
    * by ∈ [8,11] (1/16 of the space, like a where-clause on two
    * mid-selectivity predicates). */
  val ProbeXLo = 4; val ProbeXHi = 7
  val ProbeYLo = 8; val ProbeYHi = 11

  /** Morton interleave of two [[BucketBits]]-bit bucket ids:
    * x bits land at odd positions, y bits at even. */
  private def morton(bx: Column, by: Column): Column =
    (0 until BucketBits).map { i =>
      shiftleft(shiftright(bx, i).bitwiseAND(1), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(by, i).bitwiseAND(1), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** Pruning report: for each layout (zorder | linear), the files and
    * rows a zone-map scan of the probe box touches. `fact` must have
    * integer columns (x, y). */
  def pruningReport(fact: DataFrame): DataFrame = {
    val bounds = fact.agg(
      min(col("x")).as("xlo"), max(col("x")).as("xhi"),
      min(col("y")).as("ylo"), max(col("y")).as("yhi"))
    // `div` (not `/`): Column./ is double division — integer range
    // math must stay integer to hash-match the oracle at any scale
    val b = fact.crossJoin(broadcast(bounds))
      .selectExpr(
        s"(x - xlo) * $Buckets div (xhi - xlo + 1) AS bx",
        s"(y - ylo) * $Buckets div (yhi - ylo + 1) AS by")
    val z = morton(col("bx"), col("by"))
    val both = b.select(lit("zorder").as("layout"),
        shiftright(z, BucketBits).cast("long").as("file"), col("bx"), col("by"))
      .unionByName(b.select(lit("linear").as("layout"),
        col("bx").cast("long").as("file"), col("bx"), col("by")))
    val hit = col("bx").between(ProbeXLo, ProbeXHi) &&
      col("by").between(ProbeYLo, ProbeYHi)
    val perFile = both
      .groupBy("layout", "file")
      .agg(count(lit(1)).as("n"),
        min("bx").as("minx"), max("bx").as("maxx"),
        min("by").as("miny"), max("by").as("maxy"),
        sum(when(hit, 1L).otherwise(0L)).as("matched"))
    val overlaps = col("minx") <= ProbeXHi && col("maxx") >= ProbeXLo &&
      col("miny") <= ProbeYHi && col("maxy") >= ProbeYLo
    perFile.groupBy("layout").agg(
        count(lit(1)).as("n_files"),
        sum(when(overlaps, 1L).otherwise(0L)).as("files_scanned"),
        sum(when(overlaps, col("n")).otherwise(0L)).as("rows_scanned"),
        sum(col("matched")).as("rows_matching"),
        sum(col("n")).as("n_rows"))
      .orderBy("layout")
  }

  /** q139: lineitem laid out by Morton(orderkey-range, partkey-range)
    * vs by orderkey alone, probed with a 2-D box predicate. */
  def q139ZorderLayout(spark: SparkSession, dir: String): DataFrame =
    pruningReport(Tables(spark, dir).lineitem
      .select(col("l_orderkey").as("x"), col("l_partkey").as("y")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q139_zorder_layout" -> (q139ZorderLayout _))

  val oracleSql: Map[String, String] = Map(
    "q139_zorder_layout" -> {
      val zExpr = (0 until BucketBits).map(i =>
        s"(((bx >> $i) & 1) << ${2 * i + 1}) | (((by >> $i) & 1) << ${2 * i})")
        .mkString(" | ")
      s"""WITH bounds AS (
         |  SELECT min(l_orderkey) AS xlo, max(l_orderkey) AS xhi,
         |         min(l_partkey) AS ylo, max(l_partkey) AS yhi
         |  FROM lineitem),
         |b AS (
         |  SELECT (l_orderkey - xlo) * $Buckets // (xhi - xlo + 1) AS bx,
         |         (l_partkey - ylo) * $Buckets // (yhi - ylo + 1) AS by
         |  FROM lineitem, bounds),
         |lay AS (
         |  SELECT 'zorder' AS layout,
         |         CAST(($zExpr) >> $BucketBits AS BIGINT) AS file, bx, by
         |  FROM b
         |  UNION ALL
         |  SELECT 'linear', CAST(bx AS BIGINT), bx, by FROM b),
         |pf AS (
         |  SELECT layout, file, CAST(count(*) AS BIGINT) AS n,
         |         min(bx) AS minx, max(bx) AS maxx,
         |         min(by) AS miny, max(by) AS maxy,
         |         CAST(sum(CASE WHEN bx BETWEEN $ProbeXLo AND $ProbeXHi
         |                        AND by BETWEEN $ProbeYLo AND $ProbeYHi
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS matched
         |  FROM lay GROUP BY 1, 2)
         |SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
         |       CAST(sum(CASE WHEN minx <= $ProbeXHi AND maxx >= $ProbeXLo
         |                      AND miny <= $ProbeYHi AND maxy >= $ProbeYLo
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
         |       CAST(sum(CASE WHEN minx <= $ProbeXHi AND maxx >= $ProbeXLo
         |                      AND miny <= $ProbeYHi AND maxy >= $ProbeYLo
         |                     THEN n ELSE 0 END) AS BIGINT) AS rows_scanned,
         |       CAST(sum(matched) AS BIGINT) AS rows_matching,
         |       CAST(sum(n) AS BIGINT) AS n_rows
         |FROM pf GROUP BY 1 ORDER BY 1""".stripMargin
    })
}
