package graft

import graft.multimodal.Audio
import graft.multimodal.Audio.{AudioClip, AudioRecord}
import graft.tools.MakeWavFixture
import graft.tools.MakeWavFixture.Clip

class AudioSpec extends SparkSpec {
  import spark.implicits._

  private val codec = new Audio.WavPcmCodec

  private def rec(id: Long, bytes: Array[Byte]) = AudioRecord(id, bytes, "wav")

  test("WavPcmCodec roundtrips mono PCM16 exactly") {
    val design = Array.tabulate(777)(i => ((i * 131) % 30001) - 15000)
    val c = Clip(1L, 12000, 1, Array(design))
    val out = codec.decode(rec(1L, MakeWavFixture.encodeWav(c))).toSeq
    assert(out.size == 1)
    assert(out.head.sample_rate == 12000 && out.head.n_channels == 1)
    assert(out.head.samples.toSeq == design.toSeq)
  }

  test("WavPcmCodec stereo mixdown is (l+r) >> 1") {
    val l = Array.tabulate(300)(i => i * 100 - 15000)
    val r = Array.tabulate(300)(i => -i * 50 + 7000)
    val c = Clip(2L, 8000, 2, Array(l, r))
    val out = codec.decode(rec(2L, MakeWavFixture.encodeWav(c))).toSeq
    assert(out.size == 1 && out.head.n_channels == 2)
    assert(out.head.samples.toSeq ==
      l.zip(r).map { case (a, b) => (a + b) >> 1 }.toSeq)
  }

  test("WavPcmCodec quarantines malformed payloads without throwing") {
    val good = MakeWavFixture.encodeWav(
      Clip(1L, 8000, 1, Array(Array.tabulate(100)(_ * 3))))
    val floatFmt = good.clone(); floatFmt(20) = 3       // format tag 3
    val badBits = good.clone(); badBits(34) = 8         // 8-bit samples
    val threeCh = good.clone(); threeCh(22) = 3         // 3 channels
    val lyingSize = good.clone()                        // data size > payload
    lyingSize(43) = 0x7f
    val cases = Seq[Array[Byte]](
      Array.empty, good.take(8), good.take(30),
      "RIFFxxxxJUNK".getBytes("US-ASCII"),
      Array.tabulate[Byte](64)(i => (i * 37).toByte),
      floatFmt, badBits, threeCh, lyingSize)
    cases.zipWithIndex.foreach { case (bytes, i) =>
      assert(codec.decode(rec(i.toLong, bytes)).isEmpty, s"case $i decoded")
    }
  }

  test("frameFeatures: frame cap, tail length, and integer descriptors") {
    val samples = Array.tabulate(1050)(i => if (i % 2 == 0) 100 else -100)
    val clips = Seq(AudioClip(7L, 8000, 1, samples)).toDS()
    val rows = Audio.frameFeatures(clips, frameLen = 200, maxFrames = 4)
      .collect().sortBy(_.frame_idx)
    assert(rows.length == 4) // 1050/200 = 6 windows, capped at 4
    assert(rows.forall(_.n_frame == 200L))
    assert(rows.forall(_.abs_sum == 200L * 100))
    assert(rows.forall(_.peak == 100L))
    assert(rows.forall(_.zcr == 199L)) // alternating signs
    val tail = Audio.frameFeatures(
      Seq(AudioClip(8L, 8000, 1, samples.take(250))).toDS(),
      frameLen = 200, maxFrames = 8).collect().sortBy(_.frame_idx)
    assert(tail.map(_.n_frame).toSeq == Seq(200L, 50L))
  }

  test("q167 fixture: committed bytes decode to the committed expectations") {
    val media = spark.read.parquet(Audio.WavFixturePath)
      .selectExpr("audio_id", "data", "format").as[AudioRecord]
    val got = Audio.frameFeatures(Audio.decodeClips(media))
      .collect().map(r => (r.audio_id, r.frame_idx) -> r).toMap
    val exp = spark.read.parquet(Audio.WavExpectedPath).collect()
    assert(exp.nonEmpty && got.size == exp.length)
    exp.foreach { e =>
      val r = got((e.getLong(0), e.getLong(4)))
      assert(r.abs_sum == e.getLong(6) && r.peak == e.getLong(7) &&
        r.zcr == e.getLong(8) && r.n_samples == e.getLong(3))
    }
    // the three corrupt payloads decode to nothing
    assert(!got.keySet.exists(k => k._1 >= 7L))
  }
}
