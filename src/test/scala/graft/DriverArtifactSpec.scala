package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-open guard over the DRIVER-side correctness artifacts
  * (`CORRECTNESS_r*.json` at the repo root, written by the build
  * driver's DuckDB hash-compare after each round).
  *
  * WHY: round 11's driver artifact came back EMPTY (`{}`) and nothing
  * in the repo noticed — the round closed with no external oracle
  * signal and only self-checks to stand on (VERDICT r11, "What's
  * wrong" #1). This spec makes that failure mode LOUD at the next
  * `sbt test`: the newest driver artifact must be non-empty (unless
  * explicitly acknowledged in [[DriverArtifactSpec.knownEmpty]] with a
  * pointer to the round's VERDICT) and its rows must line up with the
  * live `SparkEntry.queries` registry (every driver-checked query must
  * still exist here; queries ADDED since the artifact are fine).
  *
  * Scope note: the guard pins STRUCTURE (non-empty, parseable, 1:1
  * with the registry modulo later additions), not row verdicts — a
  * red driver row is the judge's signal and gets fixed in code, not
  * allowlisted here.
  */
class DriverArtifactSpec extends AnyFunSuite {

  /** Rounds whose driver artifact is acknowledged empty/absent.
    * r11: driver pipeline produced `{}` while the same-session bench
    * ran the full surface green — adjudicated a harness artifact gap
    * (VERDICT r11), independently re-verified 238/238 in-session.
    * r12: driver wrote `{}` for the SECOND consecutive round while its
    * same-session bench ran all 243 queries with rc 0 — adjudicated
    * environmental again (VERDICT r12 "What's wrong" #1; the judge's
    * independent sweep passed 243/243). Acknowledged here per VERDICT
    * r12 "Next round" #1a.
    *
    * An acknowledgment is NOT a bare round number (ADVICE r13 — that
    * degrades the guard into an editable log): every acknowledged
    * round must ALSO carry corroborating committed evidence, a green
    * `CORRECTNESS_SELF_r{NN}.json` for that round (the builder's own
    * 3-SF DuckDB sweep: n_queries > 0 and n_all_green == n_queries),
    * asserted by [[selfCheckGreen]] below. And the LATEST round's
    * artifact can never be acknowledged away — an empty newest
    * artifact fails regardless, so the signal gets investigated the
    * round it happens. */
  private val knownEmpty = Set(11, 12)

  /** Corroboration: the builder's committed self-check artifact for
    * `round` exists, parses, and is all-green. */
  private def selfCheckGreen(round: Int): Boolean = {
    val f = new java.io.File(f"CORRECTNESS_SELF_r$round%02d.json")
    f.exists() && {
      val text = {
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try src.mkString finally src.close()
      }
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      JsonMethods.parse(text) match {
        case JObject(fields) =>
          val m = fields.toMap
          (m.get("n_queries"), m.get("n_all_green")) match {
            case (Some(JInt(nq)), Some(JInt(ng))) => nq > 0 && ng == nq
            case _ => false
          }
        case _ => false
      }
    }
  }

  private val artifactRe = """CORRECTNESS_r(\d+)\.json""".r

  private def artifacts: Seq[(Int, java.io.File)] =
    Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
      .toSeq
      .flatMap { f =>
        f.getName match {
          case artifactRe(n) => Some((n.toInt, f))
          case _ => None
        }
      }
      .sortBy(_._1)

  private def parseKeys(f: java.io.File): Set[String] = {
    val text = {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.mkString finally src.close()
    }
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(text) match {
      case JObject(fields) => fields.map(_._1).toSet
      case other => fail(s"${f.getName}: expected a JSON object, got $other")
    }
  }

  test("driver correctness artifacts exist") {
    assert(artifacts.nonEmpty, "no CORRECTNESS_r*.json at the repo root")
  }

  test("newest driver artifact is non-empty — never acknowledgeable") {
    val (round, file) = artifacts.last
    val keys = parseKeys(file)
    assert(keys.nonEmpty,
      s"${file.getName} is EMPTY — the driver oracle signal for the " +
        s"newest round ($round) is missing and the latest round can " +
        "never be allowlisted (ADVICE r13); investigate before closing " +
        "the round (VERDICT r11 failure mode)")
  }

  test("every acknowledged-empty round carries corroborating evidence") {
    knownEmpty.foreach { r =>
      assert(selfCheckGreen(r),
        f"round $r is acknowledged empty but CORRECTNESS_SELF_r$r%02d" +
          ".json is missing or not all-green — an acknowledgment " +
          "needs committed corroboration, not a bare round number")
    }
  }

  test("newest non-empty driver artifact matches the live registry") {
    val nonEmpty = artifacts.reverse.map { case (r, f) => (r, f, parseKeys(f)) }
      .find(_._3.nonEmpty)
    assert(nonEmpty.isDefined, "every driver artifact is empty")
    val (round, file, keys) = nonEmpty.get
    val registry = SparkEntry.queries.keySet
    val orphaned = keys -- registry
    assert(orphaned.isEmpty,
      s"${file.getName} (round $round) checked queries that no longer " +
        s"exist in SparkEntry.queries: ${orphaned.toSeq.sorted.mkString(", ")} — " +
        "renames must keep the driver artifact trail coherent")
  }

  test("acknowledged-empty rounds stay a closed list") {
    // Every round in knownEmpty must actually be empty on disk — a
    // stale acknowledgment (round later re-ran green) must be removed
    // so the allowlist never grows silently.
    knownEmpty.foreach { r =>
      artifacts.find(_._1 == r).foreach { case (_, f) =>
        assert(parseKeys(f).isEmpty,
          s"round $r is in knownEmpty but ${f.getName} is non-empty — " +
            "remove the stale acknowledgment")
      }
    }
  }
}
