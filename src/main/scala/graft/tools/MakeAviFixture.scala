package graft.tools

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.tools.MakeImageFixture.Img

/** One-off generator for the committed AVI fixture behind q171
  * (`multimodal/Video.scala`): REAL RIFF/AVI containers encoded
  * in-process (minimal 'hdrl' + 'movi' LIST per the public AVI
  * layout) whose frame chunks carry LOSSLESS PNG/BMP payloads
  * (encoded via javax.imageio like the image fixture), plus corrupt
  * containers and one corrupt frame inside a valid container.
  *
  * Expected rows are computed ANALYTICALLY from the designed pixel
  * layouts (MakeImageFixture.expectedPixels — never by running the
  * extractor or codec under test) for the frames the q171 sampling
  * keeps (every [[graft.multimodal.Video.FrameSampleEvery]]-th).
  *
  * Run once, outputs committed: `sbt "runMain graft.tools.MakeAviFixture"`
  * writes src/test/resources/video_fixture.parquet and
  * video_features_expected.parquet.
  */
object MakeAviFixture {

  /** Wrap pre-encoded frame payloads in a RIFF/AVI container. */
  def encodeAvi(framePayloads: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val buf = ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(ByteOrder.LITTLE_ENDIAN)
      buf.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      buf.array()
    }
    def list(listType: String, bodies: Seq[Array[Byte]]): Array[Byte] = {
      val inner = new ByteArrayOutputStream()
      inner.write(listType.getBytes("US-ASCII"))
      bodies.foreach(inner.write)
      chunk("LIST", inner.toByteArray)
    }
    // minimal 'avih' main header: 14 DWORDs, most zero; frame count set
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    avih.putInt(33333)                 // us per frame
    avih.putInt(0).putInt(0).putInt(0) // rate/padding/flags
    avih.putInt(framePayloads.length)  // total frames
    val hdrl = list("hdrl", Seq(chunk("avih", avih.array())))
    val movi = list("movi", framePayloads.map(chunk("00dc", _)))
    val body = new ByteArrayOutputStream()
    body.write("AVI ".getBytes("US-ASCII"))
    body.write(hdrl); body.write(movi)
    val payload = body.toByteArray
    val out = ByteBuffer.allocate(8 + payload.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(payload.length).put(payload)
    out.array()
  }

  def expectedRow(docId: Long, frameIdx: Long, img: Img): Row = {
    val px = MakeImageFixture.expectedPixels(img)
    val mean = px.sum / px.length
    val std = math.sqrt(px.map(p => (p - mean) * (p - mean)).sum / px.length)
    val hist = Array.tabulate(8) { b =>
      px.count(p => math.min(math.floor(p * 8), 7.0).toInt == b).toDouble / px.length
    }
    Row.fromSeq(Seq[Any](docId, frameIdx, img.w.toLong, img.h.toLong,
      BigDecimal(mean).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      BigDecimal(std).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) ++
      hist)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("make-avi-fixture").master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()

    def gray(v: Int): (Int, Int, Int) = (v, v, v)

    // designed per-video frame layouts
    val vid1 = (0 until 5).map(i =>
      Img(1L, "png", 8, 8, (_, _) => gray(i * 40)))
    val vid2 = Seq(
      Img(2L, "png", 8, 8, (_, _) => (255, 0, 0)),
      Img(2L, "bmp", 12, 6, (_, _) => (0, 255, 0)),
      Img(2L, "png", 16, 16, (x, _) => if (x < 8) gray(0) else gray(255)))
    val vid3 = Seq(
      Img(3L, "png", 10, 10, (x, y) => gray(((x + y) * 255) / 18)))
    val vid4good = Seq(
      Img(4L, "png", 8, 8, (_, _) => gray(128)),
      Img(4L, "png", 8, 8, (_, _) => gray(64)))

    val sampleEvery = graft.multimodal.Video.FrameSampleEvery

    val avi1 = encodeAvi(vid1.map(MakeImageFixture.encode))
    val avi2 = encodeAvi(vid2.map(MakeImageFixture.encode))
    val avi3 = encodeAvi(vid3.map(MakeImageFixture.encode))
    // valid container whose THIRD frame (index 2 — sampled in) is a
    // corrupt payload: the container's other frames must survive
    val avi4 = encodeAvi(vid4good.map(MakeImageFixture.encode) :+
      Array.tabulate[Byte](48)(i => (i * 73 + 5).toByte))
    val corrupt = Seq(
      (5L, avi1.take(16)),                                      // truncated
      (6L, Array.tabulate[Byte](80)(i => (i * 29 + 3).toByte)), // garbage
      (7L, { val b = avi1.clone()                               // RIFF/WAVE
             System.arraycopy("WAVE".getBytes("US-ASCII"), 0, b, 8, 4); b }))

    val mediaSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("data", BinaryType, nullable = false),
      StructField("format", StringType, nullable = false)))
    val mediaRows = Seq(
      Row(1L, avi1, "avi"), Row(2L, avi2, "avi"),
      Row(3L, avi3, "avi"), Row(4L, avi4, "avi")) ++
      corrupt.map { case (id, bytes) => Row(id, bytes, "avi") }

    def kept[T](frames: Seq[T]): Seq[(T, Long)] =
      frames.zipWithIndex.collect {
        case (f, i) if i % sampleEvery == 0 => (f, i.toLong) }
    val expRows =
      kept(vid1).map { case (im, i) => expectedRow(1L, i, im) } ++
      kept(vid2).map { case (im, i) => expectedRow(2L, i, im) } ++
      kept(vid3).map { case (im, i) => expectedRow(3L, i, im) } ++
      // vid4: frame 0 decodes; frame 2 is sampled in but CORRUPT -> no row
      Seq(expectedRow(4L, 0L, vid4good.head))

    val expSchema = StructType(
      Seq(StructField("doc_id", LongType, nullable = false),
        StructField("frame_idx", LongType, nullable = false),
        StructField("width", LongType, nullable = false),
        StructField("height", LongType, nullable = false),
        StructField("mean_px", DoubleType, nullable = false),
        StructField("std_px", DoubleType, nullable = false)) ++
        (0 until 8).map(b => StructField(s"h$b", DoubleType, nullable = false)))

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

    writeSingle(mediaRows, mediaSchema, "src/test/resources/video_fixture.parquet")
    writeSingle(expRows, expSchema,
      "src/test/resources/video_features_expected.parquet")
    println(s"wrote ${mediaRows.size} media rows / ${expRows.size} expected rows")
    spark.stop()
  }
}
