package graft

import graft.multimodal.{Multimodal, Video}
import graft.multimodal.Multimodal.MediaRecord
import graft.tools.{MakeAviFixture, MakeImageFixture}
import graft.tools.MakeImageFixture.Img

class VideoSpec extends SparkSpec {
  import spark.implicits._

  private val extractor = new Video.AviFrameExtractor

  private def rec(id: Long, bytes: Array[Byte]) = MediaRecord(id, bytes, "avi")

  test("AviFrameExtractor yields every frame payload in order") {
    val frames = (0 until 4).map(i =>
      MakeImageFixture.encode(Img(1L, "png", 8, 8, (_, _) => (i, i, i))))
    val avi = MakeAviFixture.encodeAvi(frames)
    val got = extractor.frames(rec(1L, avi)).toSeq
    assert(got.map(_.frame_idx) == Seq(0, 1, 2, 3))
    got.zip(frames).foreach { case (g, f) =>
      assert(g.data.toSeq == f.toSeq, "payload not byte-identical")
    }
  }

  test("AviFrameExtractor handles odd-length payloads (word alignment)") {
    // raw odd-sized chunk bodies exercise the pad-byte walk
    val odd = Seq(Array[Byte](1, 2, 3), Array[Byte](4), Array[Byte](5, 6, 7, 8, 9))
    val avi = MakeAviFixture.encodeAvi(odd)
    val got = extractor.frames(rec(1L, avi)).toSeq
    assert(got.map(_.data.toSeq) == odd.map(_.toSeq))
  }

  test("AviFrameExtractor quarantines malformed containers without throwing") {
    val good = MakeAviFixture.encodeAvi(Seq(Array[Byte](1, 2, 3, 4)))
    val wrongForm = good.clone()
    System.arraycopy("WAVE".getBytes("US-ASCII"), 0, wrongForm, 8, 4)
    val lyingSize = good.clone()
    lyingSize(good.length - 10) = 0x7f // inflate an inner chunk size
    val cases = Seq[Array[Byte]](Array.empty, good.take(10), good.take(30),
      wrongForm, Array.tabulate[Byte](64)(i => (i * 91).toByte))
    cases.zipWithIndex.foreach { case (bytes, i) =>
      assert(extractor.frames(rec(i.toLong, bytes)).isEmpty, s"case $i")
    }
  }

  test("decodeVideoFrames samples frames and quarantines per-frame") {
    val imgs = (0 until 6).map(i =>
      MakeImageFixture.encode(Img(9L, "png", 8, 8, (_, _) => (i * 30, 0, 0))))
    // frame 2 (sampled in) corrupted; frame 4 stays good
    val payloads = imgs.updated(2, Array.tabulate[Byte](32)(_.toByte))
    val media = Seq(rec(9L, MakeAviFixture.encodeAvi(payloads))).toDS()
    val out = Video.decodeVideoFrames(media, Multimodal.FramePixels, 2)
      .collect().map(_.frame_idx).sorted.toSeq
    assert(out == Seq(0, 4), s"got $out") // 2 quarantined, odd frames sampled out
  }

  test("q171 fixture decodes to the committed expectations") {
    val media = spark.read.parquet(Video.AviFixturePath)
      .selectExpr("doc_id", "data", "format").as[MediaRecord]
    val got = Video.decodeVideoFrames(media, Multimodal.FramePixels,
      Video.FrameSampleEvery).collect()
    val exp = spark.read.parquet(Video.AviExpectedPath).collect()
      .map(e => (e.getLong(0), e.getLong(1))).toSet
    assert(got.map(f => (f.doc_id, f.frame_idx.toLong)).toSet == exp)
    assert(exp.nonEmpty && !exp.exists(_._1 >= 5L)) // corrupt containers absent
  }
}
