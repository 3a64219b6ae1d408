package graft

/** Contract checks on the driver-facing surface: every declared query
  * must run and return rows at sf0.001 (sf-dependent literals that
  * empty out at another scale factor are the classic silent failure),
  * column names must be unique (the driver's hash compare sorts by
  * name), and every oracle entry must describe a declared query. */
class SparkEntrySpec extends SparkSpec {

  test("every oracle key names a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs non-empty at sf0.001 with unique columns") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val df = fn(spark, sfDir())
          val cols = df.columns
          if (cols.distinct.length != cols.length)
            Some(s"$name: duplicate columns ${cols.mkString(",")}")
          else if (df.count() == 0) Some(s"$name: 0 rows")
          else None
        } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
