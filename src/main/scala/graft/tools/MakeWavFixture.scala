package graft.tools

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** One-off generator for the committed WAV fixture behind q167
  * (`multimodal/Audio.scala`): REAL RIFF/WAVE PCM-16 payloads encoded
  * in-process (ByteBuffer against the public WAVE layout — no
  * downloads, no audio libs), plus deliberately corrupt payloads for
  * the quarantine path.
  *
  * The expected-feature rows are computed ANALYTICALLY from the
  * designed sample arrays BEFORE encoding — never by running
  * [[graft.multimodal.Audio.WavPcmCodec]] — so the oracle is
  * independent of the parser under test: if chunk walking, LE sample
  * decode, stereo mixdown, or quarantine regress, q167 hash-mismatches.
  *
  * Run once, outputs committed: `sbt "runMain graft.tools.MakeWavFixture"`
  * writes src/test/resources/audio_fixture.parquet and
  * audio_features_expected.parquet (single files, not directories).
  */
object MakeWavFixture {

  final case class Clip(id: Long, sampleRate: Int, channels: Int,
      samples: Array[Array[Int]]) // samples(ch)(i), designed waveforms

  /** RIFF/WAVE PCM-16 encode (fmt + data chunks, little-endian). */
  def encodeWav(c: Clip): Array[Byte] = {
    val n = c.samples(0).length
    val dataLen = n * 2 * c.channels
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1.toShort) // PCM
    buf.putShort(c.channels.toShort)
    buf.putInt(c.sampleRate)
    buf.putInt(c.sampleRate * 2 * c.channels) // byte rate
    buf.putShort((2 * c.channels).toShort)    // block align
    buf.putShort(16.toShort)                  // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    for (i <- 0 until n; ch <- 0 until c.channels)
      buf.putShort(c.samples(ch)(i).toShort)
    buf.array()
  }

  /** The decoder's documented mono mixdown, applied to the DESIGN. */
  def monoMix(c: Clip): Array[Int] = {
    val n = c.samples(0).length
    Array.tabulate(n) { i =>
      if (c.channels == 1) c.samples(0)(i)
      else (c.samples(0)(i) + c.samples(1)(i)) >> 1
    }
  }

  def expectedRows(c: Clip, frameLen: Int, maxFrames: Int): Seq[Row] = {
    val s = monoMix(c)
    val n = s.length
    val nFrames = math.min((n + frameLen - 1) / frameLen, maxFrames)
    (0 until nFrames).map { f =>
      val from = f * frameLen
      val until = math.min(from + frameLen, n)
      val win = s.slice(from, until)
      val absSum = win.map(x => math.abs(x.toLong)).sum
      val peak = if (win.isEmpty) 0L else win.map(x => math.abs(x.toLong)).max
      val zcr = win.indices.drop(1)
        .count(i => (win(i - 1) < 0) != (win(i) < 0)).toLong
      Row(c.id, c.sampleRate.toLong, c.channels.toLong, n.toLong,
        f.toLong, (until - from).toLong, absSum, peak, zcr)
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("make-wav-fixture").master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()

    def mono(id: Long, rate: Int, n: Int)(f: Int => Int) =
      Clip(id, rate, 1, Array(Array.tabulate(n)(f)))

    val clips = Seq(
      // square wave, period 50
      mono(1L, 8000, 1000)(i => if ((i / 25) % 2 == 0) 8000 else -8000),
      // integer sawtooth crossing zero
      mono(2L, 16000, 2400)(i => ((i * 13) % 4001) - 2000),
      // stereo: triangle left, DC right (exercises the mixdown)
      Clip(3L, 8000, 2, Array(
        Array.tabulate(900)(i => math.abs((i % 200) - 100) * 50 - 2500),
        Array.tabulate(900)(_ => 1001))),
      // shorter than one frame window
      mono(4L, 22050, 150)(i => (i * 7919) % 1237 - 618),
      // digital silence
      mono(5L, 8000, 500)(_ => 0),
      // long clip: more frames than MaxFrames (frame cap exercised)
      mono(6L, 44100, 5000)(i => ((i * 31) % 997) - 498),
    )

    val wav1 = encodeWav(clips.head)
    val corrupt = Seq(
      (7L, wav1.take(20)),                                   // truncated
      (8L, Array.tabulate[Byte](96)(i => (i * 41 + 7).toByte)), // garbage
      // IEEE-float format tag (3): valid RIFF, unsupported codec
      (9L, { val b = encodeWav(clips.head); b(20) = 3; b }),
    )

    val mediaSchema = StructType(Seq(
      StructField("audio_id", LongType, nullable = false),
      StructField("data", BinaryType, nullable = false),
      StructField("format", StringType, nullable = false)))
    val mediaRows = clips.map(c => Row(c.id, encodeWav(c), "wav")) ++
      corrupt.map { case (id, bytes) => Row(id, bytes, "wav") }

    val expSchema = StructType(Seq(
      StructField("audio_id", LongType, nullable = false),
      StructField("sample_rate", LongType, nullable = false),
      StructField("n_channels", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("n_frame", LongType, nullable = false),
      StructField("abs_sum", LongType, nullable = false),
      StructField("peak", LongType, nullable = false),
      StructField("zcr", LongType, nullable = false)))
    val expRows = clips.flatMap(expectedRows(_,
      graft.multimodal.Audio.FrameSamples,
      graft.multimodal.Audio.MaxFrames)) // corrupt: NO rows (quarantine)

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

    writeSingle(mediaRows, mediaSchema, "src/test/resources/audio_fixture.parquet")
    writeSingle(expRows, expSchema,
      "src/test/resources/audio_features_expected.parquet")
    println(s"wrote ${mediaRows.size} media rows / ${expRows.size} expected rows")
    spark.stop()
  }
}
