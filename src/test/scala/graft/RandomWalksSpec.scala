package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.graph.RandomWalks

class RandomWalksSpec extends SparkSpec {
  import spark.implicits._

  /** The operator's hash choice, recomputed scalar-side: first 15
    * md5 hex nibbles of "walkId:step" as a long. */
  private def pick(walkId: Long, step: Long): Long = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$walkId:$step".getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("walk choices follow the hash rank on a designed graph") {
    // a -> {b, c, d} (ranks 1..3), b -> {a}, c -> {a}, d is a SINK
    val adj = Seq(
      (0L, 1L, 1L, 3L), (0L, 2L, 2L, 3L), (0L, 3L, 3L, 3L),
      (1L, 0L, 1L, 1L), (2L, 0L, 1L, 1L))
      .toDF("src", "dst", "rk", "od")
    val seeds = Seq((100L, 0L), (200L, 0L)).toDF("walk_id", "node")
    val len = 4
    val got = RandomWalks.walkTable(seeds, adj, len).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // scalar reference of the same contract
    val adjMap = Map(
      0L -> Seq(1L, 2L, 3L), 1L -> Seq(0L), 2L -> Seq(0L))
    def ref(id: Long): Seq[(Long, Long, Long)] = {
      var node = 0L
      var out = Seq((id, 0L, node))
      var step = 0L
      var alive = true
      while (alive && step < len) {
        adjMap.get(node) match {
          case Some(ns) =>
            node = ns((pick(id, step) % ns.length).toInt)
            step += 1
            out :+= ((id, step, node))
          case None => alive = false // sink: walk terminates
        }
      }
      out
    }
    val want = (ref(100L) ++ ref(200L)).sorted
    assert(got.sorted.toSeq == want)
    assert(got.nonEmpty)
  }

  test("q222 trajectories are valid walks with the full seed set") {
    val df = RandomWalks.q222RandomWalks(spark, sfDir())
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val t = Tables(spark, sfDir())
    val nNations = t.nation.count()
    // every (nation, w) seed appears at step 0 on its own node
    val step0 = rows.filter(_._2 == 0L)
    assert(step0.length == nNations * RandomWalks.WalksPerNode)
    assert(step0.forall { case (id, _, node) =>
      id / RandomWalks.WalksPerNode == node })
    // steps are contiguous per walk (a terminated walk just stops)
    rows.groupBy(_._1).foreach { case (id, ws) =>
      val steps = ws.map(_._2).sorted.toList
      assert(steps == (0L until steps.length).toList, s"gap in walk $id")
    }
    // every transition is an edge of the trade graph
    val edges = graph.TradeGraph.edges(t)
      .select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.groupBy(_._1).foreach { case (id, ws) =>
      ws.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, a), (_, _, b)) =>
          assert(edges.contains((a, b)), s"non-edge $a->$b in walk $id")
        case _ =>
      }
    }
    // walks from the same node diverge (the per-walk hash is live):
    // at least one node's 4 walks reach >1 distinct step-1 successor
    val byStart = rows.filter(_._2 == 1L)
      .groupBy(_._1 / RandomWalks.WalksPerNode)
      .map { case (_, ws) => ws.map(_._3).toSet.size }
    assert(byStart.exists(_ > 1), "all sibling walks identical")
  }
}
