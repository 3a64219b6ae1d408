package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the generated OPERATORS.md index to the live registry: every
  * registered query appears exactly once with the right oracle
  * marker, and no stale rows survive a rename. Regenerate with
  * `python3 tools/gen_operator_index.py` when this fails. */
class OperatorIndexSpec extends AnyFunSuite {

  private val row = """\| (q\d+[a-z0-9_]*) \| `([^`]+):(\d+)` \| (yes|—) \|""".r

  test("OPERATORS.md matches SparkEntry.queries / oracleSql") {
    val lines = scala.io.Source.fromFile("OPERATORS.md", "UTF-8").getLines().toSeq
    val rows = lines.collect {
      case row(name, file, line, oracle) => (name, file, line.toInt, oracle)
    }
    assert(rows.map(_._1).distinct.size == rows.size, "duplicate index rows")
    assert(rows.map(_._1).toSet == SparkEntry.queries.keySet,
      "index rows must be exactly the registered queries")
    rows.foreach { case (name, file, line, oracle) =>
      assert((oracle == "yes") == SparkEntry.oracleSql.contains(name),
        s"$name oracle marker stale")
      val src = scala.io.Source.fromFile(file, "UTF-8").getLines().toSeq
      assert(line <= src.size && src(line - 1).contains("\"" + name + "\""),
        s"$name registration moved from $file:$line")
    }
  }
}
