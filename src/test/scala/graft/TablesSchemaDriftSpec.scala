package graft

import java.nio.file.Files
import java.sql.Timestamp

/** Guards Tables.events against physical-schema drift in the driver's
  * testdata: `ts` has shipped both as TIMESTAMP(NANOS) (read as raw
  * BIGINT nanos under the legacy conf) and as timestamp[us] (read as
  * TIMESTAMP_NTZ). The loader must yield the identical `ts_us` epoch
  * microseconds for either physical layout, so a future regeneration
  * fails THIS named test instead of silently erroring 23 queries.
  */
class TablesSchemaDriftSpec extends SparkSpec {
  // epoch micros covering pre/post-1970 and sub-second precision
  private val micros = Seq(0L, 1700000000123456L, -86400000001L, 999999L)

  private def fixture(writeAs: String): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-events-drift").toString
    val df = writeAs match {
      case "bigint-nanos" =>
        micros.zipWithIndex
          .map { case (us, i) => (i.toLong, us * 1000L, s"e$i") }
          .toDF("user_id", "ts", "event_type")
      case "timestamp-us" =>
        micros.zipWithIndex
          .map { case (us, i) =>
            (i.toLong, new Timestamp(Math.floorDiv(us, 1000000L) * 1000L), us, s"e$i")
          }
          .toDF("user_id", "ts0", "us", "event_type")
          .selectExpr("user_id",
            "timestamp_micros(us) as ts", // TimestampType (LTZ), µs precision
            "event_type")
    }
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events ts_us identical for BIGINT-nanos and timestamp-µs physical schemas") {
    val a = Tables(spark, fixture("bigint-nanos")).events
      .selectExpr("user_id", "ts_us").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Tables(spark, fixture("timestamp-us")).events
      .selectExpr("user_id", "ts_us").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == micros.zipWithIndex.map { case (us, i) => i.toLong -> us }.toMap)
    assert(b == a)
  }

  test("events ts_us works on the driver's current sf0.001 fixture") {
    val e = Tables(spark, sfDir()).events
    // analysis must succeed and yield plausible epoch-µs magnitudes
    val row = e.selectExpr("min(ts_us) as lo", "max(ts_us) as hi", "count(*) as n").collect()(0)
    assert(row.getLong(2) > 0)
    assert(row.getLong(0) > 1000000000000000L, "ts_us should be epoch microseconds")
  }
}
