package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.tools.MakeWavFixture.{encodeWav, monoMix, Clip}

/** One-off generator for the committed audio near-dup fixture behind
  * q248 (`multimodal/AudioNearDup.scala`): real RIFF/WAVE PCM-16
  * payloads planting every class the energy-contour fingerprint
  * distinguishes, plus the analytic expected pairs computed from the
  * DESIGNED waveforms with an INDEPENDENT energy/delta
  * implementation (never the codec or the operator's fingerprint
  * function — the q167/q162 convention).
  *
  * Clip design: 1300 mono samples = 65 windows of exactly 20
  * samples; window w holds a ±A(w) square wave, so its energy is
  * exactly 20·A(w) and the fingerprint is the sign contour of A.
  *
  * Planted classes:
  *  - 1 vs 2: ×2 gain — energy ordering unchanged, hamming 0 → PAIR.
  *  - 1 vs 3: ONE window's amplitude edited — 1..τ bits → PAIR.
  *  - 1 vs 6: STEREO re-layout of the same waveform (both channels
  *    equal; the exact mixdown reproduces the mono samples) → PAIR.
  *  - 1 vs 5: window-REVERSED clip — contour reversed → far, NOT a
  *    pair (time-structure sensitivity pinned).
  *  - 4: unrelated contour → no pairs.
  *  - 7: sub-resolution clip (< 65 samples) → no fingerprint.
  *  - 8: corrupt WAV → quarantined by the codec.
  *
  * Run once, outputs committed:
  * `sbt "runMain graft.tools.MakeAudioNearDupFixture"` writes
  * src/test/resources/audio_neardup_fixture.parquet and
  * audio_neardup_expected.parquet (single files).
  */
object MakeAudioNearDupFixture {

  val Windows = 65
  val WinLen = 20

  /** Designed per-window amplitudes, clip family `seed`. */
  def amps(seed: Int): Array[Int] =
    Array.tabulate(Windows)(w => (w * 37 + seed) % 100 + 1)

  /** ±A square wave per window (starts positive each window). */
  def squares(id: Long, a: Array[Int]): Clip =
    Clip(id, 8000, 1, Array(Array.tabulate(Windows * WinLen) { i =>
      val w = i / WinLen
      if (i % 2 == 0) a(w) else -a(w)
    }))

  /** INDEPENDENT analytic fingerprint: energies are 20·A(w) by
    * design; deltas read straight off the amplitude sequence. */
  def contourBits(a: Array[Int]): Long =
    (0 until Windows - 1).foldLeft(0L) { (acc, i) =>
      acc | (if (a(i + 1).toLong * WinLen > a(i).toLong * WinLen)
               1L << (Windows - 2 - i)
             else 0L)
    }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("make-audio-neardup-fixture").master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()

    val a1 = amps(11)
    val a2 = a1.map(_ * 2)
    // window 10's base amplitude (82) sits ABOVE both neighbors' 45
    // and 19; dropping it to 1 flips exactly the two adjacent delta
    // signs — a real, bounded edit
    val a3 = a1.clone(); a3(10) = 1
    val a4 = amps(53)
    val a5 = a1.reverse
    val clips = Seq(
      1L -> squares(1L, a1),
      2L -> squares(2L, a2),
      3L -> squares(3L, a3),
      4L -> squares(4L, a4),
      5L -> squares(5L, a5),
      // stereo re-layout: both channels carry clip 1's waveform, the
      // exact mixdown (l+r)>>1 reproduces it sample-for-sample
      6L -> {
        val m = squares(6L, a1).samples(0)
        Clip(6L, 8000, 2, Array(m, m.clone()))
      },
      7L -> Clip(7L, 8000, 1, Array(Array.tabulate(40)(i => if (i % 2 == 0) 50 else -50))),
    )
    val corruptId = 8L
    val corrupt = encodeWav(clips.head._2).take(20)

    val tau = graft.multimodal.ImageNearDup.Tau
    val fps: Map[Long, Long] = clips.collect {
      case (id, c) if c.samples(0).length >= Windows * WinLen ||
          monoMix(c).length >= Windows =>
        id -> contourBits(
          // windows of the ACTUAL mono mixdown amplitude sequence:
          // for these square designs the per-window amplitude IS the
          // design array, including the stereo mixdown case
          (id match {
            case 2L => a2
            case 3L => a3
            case 4L => a4
            case 5L => a5
            case _  => a1
          }))
    }.toMap - 7L // sub-resolution clip carries no fingerprint
    val pairs = for {
      (a, ha) <- fps.toSeq.sortBy(_._1); (b, hb) <- fps.toSeq.sortBy(_._1)
      if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= tau
    } yield (a, b, d.toLong)
    def ham(x: Long, y: Long): Long =
      pairs.find(p => p._1 == x && p._2 == y).map(_._3).getOrElse(-1L)
    require(ham(1L, 2L) == 0L, "gain pair (1,2) drifted")
    require(ham(1L, 6L) == 0L, "stereo-layout pair (1,6) drifted")
    require(ham(1L, 3L) >= 1L && ham(1L, 3L) <= tau,
      s"edit pair (1,3) drifted: ${ham(1L, 3L)}")
    require(!pairs.exists(p => Set(p._1, p._2).contains(5L)),
      "reversed clip must not pair")
    require(!pairs.exists(p => Set(p._1, p._2).contains(4L)),
      "unrelated clip must not pair")

    val mediaSchema = StructType(Seq(
      StructField("audio_id", LongType, nullable = false),
      StructField("data", BinaryType, nullable = false),
      StructField("format", StringType, nullable = false)))
    val mediaRows = clips.map { case (id, c) => Row(id, encodeWav(c), "wav") } :+
      Row(corruptId, corrupt, "wav")
    val expSchema = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false),
      StructField("hamming", LongType, nullable = false)))
    val expRows = pairs.sortBy(p => (p._1, p._2)).map(p => Row(p._1, p._2, p._3))

    def writeSingle(rows: Seq[Row], schema: StructType, out: String): Unit = {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val tmp = Files.createTempDirectory("graft-fixture").toString
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.createDirectories(Paths.get(out).getParent)
      Files.move(part, Paths.get(out), StandardCopyOption.REPLACE_EXISTING)
    }

    writeSingle(mediaRows, mediaSchema,
      "src/test/resources/audio_neardup_fixture.parquet")
    writeSingle(expRows, expSchema,
      "src/test/resources/audio_neardup_expected.parquet")
    println(s"wrote ${mediaRows.size} media rows / ${expRows.size} expected pairs")
    expRows.foreach(r => println(s"  pair $r"))
    spark.stop()
  }
}
