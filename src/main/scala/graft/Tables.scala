package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Every operator takes its inputs from here so the whole library is
  * parameterized by the scale-factor directory. All reads are plain
  * parquet scans — filters/projections applied downstream reach the
  * scan via Catalyst pushdown (verified in specs via explain).
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** `ts` is TIMESTAMP(NANOS) parquet, which Spark 4 cannot map to its
    * µs TimestampType — read it as a raw nanos BIGINT and let
    * operators do epoch math on longs; `ts_us` matches DuckDB's ns→µs
    * truncation exactly. Requires [[Tables.configure]] (the nanos
    * legacy conf) at session build time — set by Verify/Bench/specs
    * rather than mutated here, so read behavior never depends on
    * getter order. */
  def events: DataFrame = {
    require(spark.conf.getOption(Tables.NanosConf).contains("true"),
      s"set ${Tables.NanosConf}=true at session build (Tables.configure)")
    t("events").withColumn("ts_us", expr("ts div 1000"))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  /** Session prerequisite for [[Tables.events]]: map TIMESTAMP(NANOS)
    * parquet to BIGINT nanos instead of failing the µs conversion. */
  val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** Apply session-level settings every entry point (Verify, Bench,
    * test sessions) must set before reading the event table. */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config(NanosConf, "true")
}
