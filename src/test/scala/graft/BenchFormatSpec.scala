package graft

import org.scalatest.funsuite.AnyFunSuite

/** The harness keeps only the last ~2000 characters of Bench stdout
  * (the per-round tail capture), and sbt appends its own ~100-char
  * success footer after our output. The compact line is the one the
  * driver parses, so its worst-case length over the REAL query set
  * must stay well inside that window — this spec fails the build the
  * moment the query count grows past the budget, instead of silently
  * reverting to four rounds of `parsed: null`. */
class BenchFormatSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq.sorted

  test("compact keys (query numbers) are unique over the real query set") {
    val keys = names.map(Bench.compactKey)
    assert(keys.distinct.length == keys.length,
      "two query names share a number — compact line would drop one")
  }

  test("compact line fits the tail window at worst-case widths") {
    // worst cases both ways: every query slow (the map is capped at
    // the CompactTopK slowest so this no longer scales with the
    // suite), and every query FAILING (the errors array at its
    // widest — the systemic-regression case where the report matters
    // most; errors are NEVER truncated)
    val slow = names.map(n => (n, 123.456789, true))
    val allFail = names.map(n => (n, 0.0, false))
    Seq(slow, allFail).foreach { results =>
      val line = Bench.compactLine(results, "/root/testdata/sf0.1")
      assert(line.length <= 1800,
        s"compact bench line is ${line.length} chars; the ~2000-char " +
          "tail capture minus sbt footer leaves ~1900 — shrink the format")
    }
    // the cap keeps the slowest queries, not an arbitrary subset
    val mixed = names.zipWithIndex.map { case (n, i) => (n, i.toDouble, true) }
    val line = Bench.compactLine(mixed, "/x")
    val slowest = mixed.sortBy(-_._2).take(Bench.CompactTopK).map(_._1)
    slowest.foreach { n =>
      assert(line.contains("\"" + Bench.compactKey(n) + "\":"),
        s"slowest query $n missing from capped compact map")
    }
  }

  test("compact and full lines agree on totals and error lists") {
    val results = Seq(
      ("q01_property_export", 1.23456789, true),
      ("q38_louvain", 4.9999, true),
      ("q94_degree_distribution", 0.1, false))
    val compact = Bench.compactLine(results, "/x")
    val full = Bench.fullLine(results, "/x")
    assert(compact.contains(""""38":5.0"""))
    // the >=100s integer form keeps the line inside the tail window
    assert(Bench.compactValue(123.456789) == "123")
    assert(Bench.compactValue(99.96) == "100.0")
    // failed queries live only in errors (number form), never in the map
    assert(!compact.contains(""""94":"""))
    assert(compact.contains(""""errors":["94"]"""))
    assert(full.contains(""""q38_louvain":4.9999"""))
    assert(full.contains(""""errors":["q94_degree_distribution"]"""))
    // both are the driver's schema: metric/value/unit/queries/errors/sf
    Seq(compact, full).foreach { l =>
      assert(l.startsWith("""{"metric":"total","value":"""))
      assert(l.endsWith(""","sf":"/x"}"""))
    }
  }
}
