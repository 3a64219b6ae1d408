package graft

import org.apache.spark.sql.functions._
import graft.graph.{Algorithms, StarContraction}

class StarContractionSpec extends SparkSpec {
  import spark.implicits._

  private def comps(nodes: Seq[Long], edges: Seq[(Long, Long)]) =
    StarContraction.components(nodes.toDF("node"),
        edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two components, isolated node, self-loop dropped") {
    val got = comps(Seq(1L, 2L, 3L, 4L, 5L, 9L),
      Seq((1L, 2L), (2L, 3L), (4L, 5L), (9L, 9L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 9L -> 9L))
  }

  test("edge orientation and duplicates don't matter") {
    val got = comps(Seq(1L, 2L, 3L),
      Seq((3L, 2L), (2L, 3L), (2L, 1L), (2L, 1L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("empty edge set: every node is its own component") {
    val got = comps(Seq(7L, 8L), Seq.empty)
    assert(got == Map(7L -> 7L, 8L -> 8L))
  }

  test("round count is logarithmic on a path (diameter-free claim)") {
    // 256-node path 0-1-...-255: min-label propagation needs 255
    // rounds (one hop per round); star contraction must land in
    // O(log n) — assert a generous ceiling far below the diameter.
    val n = 256
    val nodes = (0L until n.toLong).toDF("node")
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("u", "v")
    val (comp, rounds) =
      StarContraction.componentsWithRounds(nodes, edges)
    assert(rounds <= 12, s"expected O(log n) rounds on a path, got $rounds")
    val labels = comp.select("component").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(labels == Set(0L))
  }

  test("ccAuto: converges inside the probe on a shallow graph (min-label home turf)") {
    // diameter 2: the probe finishes and star contraction never runs
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("node")
    val edges = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("u", "v")
    val got = StarContraction.ccAuto(nodes, edges, probeRounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 9L -> 9L))
  }

  test("ccAuto: probe exceeded on a path routes to star contraction (star home turf)") {
    // 64-node path, probe 2 — forces the quotient path mid-propagation
    val n = 64
    val nodes = (0L until n.toLong).toDF("node")
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("u", "v")
    val got = StarContraction.ccAuto(nodes, edges, probeRounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(0L) && got.size == n)
  }

  test("ccAuto: probeRounds 0 is pure star contraction") {
    val nodes = Seq(1L, 2L, 3L, 7L).toDF("node")
    val edges = Seq((3L, 2L), (2L, 1L)).toDF("u", "v")
    val got = StarContraction.ccAuto(nodes, edges, probeRounds = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L))
  }

  test("ccAuto agrees with both engines on a deterministic random graph") {
    val n = 120L
    val edges = (0 until 90).map { i =>
      val a = (i * 2654435761L) % n
      val b = (i * 40503L + 7) % n
      (a, b)
    }.filter { case (a, b) => a != b }
    val nodes = (0L until n).toDF("node")
    val e = edges.toDF("u", "v")
    val star = StarContraction.components(nodes, e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // probe 1 forces the quotient path with propagation mid-flight
    val auto = StarContraction.ccAuto(nodes, e, probeRounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(auto == star)
  }

  test("agrees with label-propagation CC on a deterministic random graph") {
    // 120 nodes, 90 hash-derived edges: enough structure for multiple
    // non-trivial components plus isolated nodes.
    val n = 120L
    val edges = (0 until 90).map { i =>
      val a = (i * 2654435761L) % n
      val b = (i * 40503L + 7) % n
      (a, b)
    }.filter { case (a, b) => a != b }
    val nodes = (0L until n).toDF("node")
    val e = edges.toDF("u", "v")
    val star = StarContraction.components(nodes, e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val und = e.select(col("u").as("src"), col("v").as("dst"))
      .union(e.select(col("v").as("src"), col("u").as("dst"))).distinct()
    val ref = Algorithms.connectedComponents(nodes, und)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == ref)
  }
}
