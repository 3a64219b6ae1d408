package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{Audio, AudioNearDup, ImageNearDup}
import graft.tools.MakeWavFixture.{encodeWav, Clip}

class AudioNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def squares(id: Long, a: Array[Int]): Clip =
    Clip(id, 8000, 1, Array(Array.tabulate(a.length * 20) { i =>
      val w = i / 20
      if (i % 2 == 0) a(w) else -a(w)
    }))

  private def rec(c: Clip): Audio.AudioRecord =
    Audio.AudioRecord(c.id, encodeWav(c), "wav")

  test("banded pairs == brute force over fingerprints") {
    // 15 base contours + a gain-scaled copy each
    val media = (0 until 15).flatMap { v =>
      val a = Array.tabulate(AudioNearDup.Windows)(w => (w * 37 + v * 13 + 7) % 100 + 1)
      Seq(rec(squares(2L * v, a)), rec(squares(2L * v + 1, a.map(_ * 3))))
    }.toDS()
    val fp = AudioNearDup.fingerprints(media)
    val hs = fp.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hs.length == 30, "every pool clip must fingerprint")
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= ImageNearDup.Tau
    } yield (a, b, d.toLong)).toSet
    val got = AudioNearDup.neardupPairs(fp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute,
      s"banding must be exact: missed ${brute -- got}, extra ${got -- brute}")
    assert(brute.size >= 15, "every planted gain pair must be found")
  }

  test("invariances: gain 0 bits, stereo re-layout 0 bits; reversal differs") {
    val a = Array.tabulate(AudioNearDup.Windows)(w => (w * 37 + 11) % 100 + 1)
    val mono = squares(1L, a)
    val media = Seq(
      rec(mono),
      rec(squares(2L, a.map(_ * 2))),
      rec(Clip(3L, 8000, 2,
        Array(mono.samples(0), mono.samples(0).clone()))),
      rec(squares(4L, a.reverse))).toDS()
    val fp = AudioNearDup.fingerprints(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L), "gain change must not flip bits")
    assert(fp(1L) == fp(3L), "equal-channel stereo must mix down to the same contour")
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(4L)) > ImageNearDup.Tau,
      "reversed contour must be far")
  }

  test("sub-resolution and corrupt clips carry no fingerprint") {
    val a = Array.tabulate(AudioNearDup.Windows)(w => (w * 37 + 11) % 100 + 1)
    val good = rec(squares(1L, a))
    val media = Seq(
      good,
      rec(Clip(2L, 8000, 1,
        Array(Array.tabulate(40)(i => if (i % 2 == 0) 50 else -50)))),
      Audio.AudioRecord(3L, good.data.take(20), "wav")).toDS()
    val ids = AudioNearDup.fingerprints(media).collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L))
  }

  test("q248 matches the committed analytic expectation") {
    val got = AudioNearDup.q248AudioNeardup(spark, sfDir())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exp = spark.read.parquet(AudioNearDup.ExpectedPath)
      .orderBy("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == exp.toSeq)
    assert(exp.exists(_._3 == 0L) && exp.exists(_._3 >= 1L))
  }
}
