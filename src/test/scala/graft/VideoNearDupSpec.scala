package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{ImageNearDup, Multimodal, Video, VideoNearDup}
import graft.tools.MakeAviFixture.encodeAvi
import graft.tools.MakeImageFixture.{encode, Img}

class VideoNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def frame(id: Long, k: Int, seed: Int): Img =
    Img(id, "png", 9, 9,
      (x, y) => { val v = (x * 37 + y * 53 + k * 101 + seed) % 240; (v, v, v) })

  private def avi(id: Long, frames: Seq[Img]): Multimodal.MediaRecord =
    Multimodal.MediaRecord(id, encodeAvi(frames.map(encode)), "avi")

  test("banded aligned pairs == brute force over frame hashes") {
    // 12 base videos + a brightness-shifted copy each
    val media = (0 until 12).flatMap { v =>
      val base = (0 until 6).map(k => frame(2L * v, k, v * 7 + 13))
      val shifted = (0 until 6).map(k => Img(2L * v + 1, "png", 9, 9,
        (x, y) => { val p = (x * 37 + y * 53 + k * 101 + v * 7 + 13) % 240 + 6
                    (p, p, p) }))
      Seq(avi(2L * v, base), avi(2L * v + 1, shifted))
    }.toDS()
    val fh = VideoNearDup.frameHashes(media)
    val rows = fh.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = rows.groupBy(_._1)
      .view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val brute = (for {
      a <- byDoc.keys.toSeq; b <- byDoc.keys.toSeq if a < b
      am = byDoc(a); bm = byDoc(b)
      if am.keySet == bm.keySet
      ds = am.keySet.toSeq.map(i => java.lang.Long.bitCount(am(i) ^ bm(i)))
      if ds.forall(_ <= ImageNearDup.Tau)
    } yield (a, b, am.size.toLong, ds.max.toLong)).toSet
    val got = VideoNearDup.neardupPairs(fh).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == brute,
      s"aligned banding must be exact: missed ${brute -- got}, " +
        s"extra ${got -- brute}")
    assert(brute.size >= 12, "every planted copy pair must be found")
  }

  test("sequence-awareness: reordered and truncated cuts never pair") {
    val base = (0 until 6).map(k => frame(1L, k, 13))
    val media = Seq(
      avi(1L, base),
      avi(2L, base.reverse),
      avi(3L, base.take(3)),
      avi(4L, base.map(im => Img(4L, im.format, im.w, im.h, im.rgb))))
      .toDS()
    val pairs = VideoNearDup.neardupPairs(VideoNearDup.frameHashes(media))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 4L)),
      s"only the exact copy may pair, got $pairs")
  }

  test("quarantine: corrupt containers yield no hashes") {
    val base = (0 until 4).map(k => frame(1L, k, 13))
    val good = avi(1L, base)
    val media = Seq(good,
      Multimodal.MediaRecord(2L, good.data.take(16), "avi"),
      Multimodal.MediaRecord(3L,
        Array.tabulate[Byte](64)(i => (i * 29 + 3).toByte), "avi")).toDS()
    val fh = VideoNearDup.frameHashes(media)
    assert(fh.select("doc_id").distinct().collect()
      .map(_.getLong(0)).toSet == Set(1L))
    // sampled frames only: 6 frames -> indices 0, 2 (sampleEvery = 2)
    assert(fh.count() ==
      (0 until 4).count(_ % Video.FrameSampleEvery == 0))
  }

  test("q247 matches the committed analytic expectation") {
    val got = VideoNearDup.q247VideoNeardup(spark, sfDir())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val exp = spark.read.parquet(VideoNearDup.ExpectedPath)
      .orderBy("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == exp.toSeq)
    assert(exp.exists(_._4 == 0L) && exp.exists(_._4 >= 1L))
  }

  test("candidate generation stays an equi join") {
    val base = (0 until 6).map(k => frame(1L, k, 13))
    val media = Seq(avi(1L, base), avi(2L, base)).toDS()
    val plan = VideoNearDup.neardupPairs(VideoNearDup.frameHashes(media))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"banding must stay an equi join:\n$plan")
  }
}
