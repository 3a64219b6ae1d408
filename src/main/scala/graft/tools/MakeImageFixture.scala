package graft.tools

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** One-off generator for the committed real-image fixture behind
  * q162 (`multimodal/Multimodal.scala`): REAL PNG/BMP payloads encoded
  * in-process via javax.imageio (no downloads), plus deliberately
  * corrupt payloads for the quarantine path.
  *
  * The expected-feature rows are computed ANALYTICALLY here — from the
  * designed pixel layout and the Rec. 601 luminance constants, never
  * by running [[graft.multimodal.Multimodal.ImageIoCodec]] — so the
  * oracle is independent of the decode path under test: if PNG/BMP
  * decode, nearest-neighbor sampling, or the quarantine contract
  * regress, q162 hash-mismatches.
  *
  * Run once, outputs committed: `sbt "runMain graft.tools.MakeImageFixture"`
  * writes src/test/resources/media_fixture.parquet and
  * media_features_expected.parquet (single files, not directories).
  */
object MakeImageFixture {

  /** (doc_id, format, width, height, rgb at (x, y)) */
  final case class Img(docId: Long, format: String, w: Int, h: Int,
      rgb: (Int, Int) => (Int, Int, Int))

  val TargetPixels = 16 // q162 uses the q90 frame size

  def encode(img: Img): Array[Byte] = {
    val bi = new BufferedImage(img.w, img.h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until img.h; x <- 0 until img.w) {
      val (r, g, b) = img.rgb(x, y)
      bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(bi, img.format, bos), s"no ${img.format} writer")
    bos.toByteArray
  }

  /** The codec's per-pixel color math (Rec. 601 luminance in float) —
    * a two-line color-space constant, applied to the DESIGNED layout,
    * not to decoded bytes. */
  def expectedPixels(img: Img): Array[Double] = {
    val g = math.sqrt(TargetPixels.toDouble).toInt
    Array.tabulate(TargetPixels) { i =>
      val x = ((i % g) * img.w) / g
      val y = ((i / g) * img.h) / g
      val (r, gg, b) = img.rgb(x, y)
      val lum = 0.299f * r + 0.587f * gg + 0.114f * b
      (lum / 255.0f).toDouble
    }
  }

  def expectedRow(img: Img): Row = {
    val px = expectedPixels(img)
    val mean = px.sum / px.length
    val std = math.sqrt(px.map(p => (p - mean) * (p - mean)).sum / px.length)
    val hist = Array.tabulate(8) { b =>
      px.count(p => math.min(math.floor(p * 8), 7.0).toInt == b).toDouble / px.length
    }
    Row.fromSeq(Seq[Any](img.docId, 0L, img.w.toLong, img.h.toLong,
      BigDecimal(mean).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      BigDecimal(std).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) ++
      hist)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("make-image-fixture").master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()

    val images = Seq(
      Img(1L, "png", 8, 8, (_, _) => (0, 0, 0)),            // solid black
      Img(2L, "png", 8, 8, (_, _) => (255, 255, 255)),      // solid white
      Img(3L, "png", 16, 16, (_, _) => (128, 128, 128)),    // solid mid-gray
      Img(4L, "png", 8, 8,                                   // left black / right white
        (x, _) => if (x < 4) (0, 0, 0) else (255, 255, 255)),
      Img(5L, "bmp", 12, 6, (_, _) => (200, 100, 50)),      // lossless 2nd format
    )
    val pngBytes = encode(images.head)
    val corrupt = Seq(
      (6L, pngBytes.take(24), "png"),                        // truncated header
      (7L, Array.tabulate[Byte](64)(i => (i * 37 + 11).toByte), "png"), // garbage
    )

    val mediaSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("data", BinaryType, nullable = false),
      StructField("format", StringType, nullable = false)))
    val mediaRows = images.map(im => Row(im.docId, encode(im), im.format)) ++
      corrupt.map { case (id, bytes, fmt) => Row(id, bytes, fmt) }

    val expSchema = StructType(
      Seq(StructField("doc_id", LongType, nullable = false),
        StructField("frame_idx", LongType, nullable = false),
        StructField("width", LongType, nullable = false),
        StructField("height", LongType, nullable = false),
        StructField("mean_px", DoubleType, nullable = false),
        StructField("std_px", DoubleType, nullable = false)) ++
        (0 until 8).map(b => StructField(s"h$b", DoubleType, nullable = false)))
    val expRows = images.map(expectedRow) // corrupt payloads: NO rows (quarantine)

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

    writeSingle(mediaRows, mediaSchema, "src/test/resources/media_fixture.parquet")
    writeSingle(expRows, expSchema,
      "src/test/resources/media_features_expected.parquet")
    println(s"wrote ${mediaRows.size} media rows / ${expRows.size} expected rows")

    // LOSSY family (q204): JPEG payloads in their own fixture pair.
    // JPEG decode is not bit-deterministic across decoders, so the
    // committed expectation covers only decoder-INDEPENDENT
    // properties — dims, frame count, frame size, and quarantine-by-
    // omission; the pixel-level sanity check (solid-color luminance
    // within quantization tolerance) lives in MultimodalSpec where it
    // can assert a tolerance instead of a hash.
    val jpegs = Seq(
      Img(1L, "jpg", 20, 10, (_, _) => (90, 150, 210)),     // solid mid-tone
      Img(2L, "jpg", 32, 16,                                 // two-tone halves
        (x, _) => if (x < 16) (30, 30, 30) else (220, 220, 220)),
    )
    val jpegBytes = encode(jpegs.head)
    val jpegRows = jpegs.map(im => Row(im.docId, encode(im), im.format)) :+
      Row(3L, jpegBytes.take(20), "jpg") // truncated: quarantined
    val jpegExpSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("n_px", LongType, nullable = false)))
    val jpegExpRows = jpegs.map(im =>
      Row(im.docId, 0L, im.w.toLong, im.h.toLong, TargetPixels.toLong))
    writeSingle(jpegRows, mediaSchema,
      "src/test/resources/media_jpeg_fixture.parquet")
    writeSingle(jpegExpRows, jpegExpSchema,
      "src/test/resources/media_jpeg_expected.parquet")
    println(s"wrote ${jpegRows.size} jpeg rows / ${jpegExpRows.size} expected rows")
    spark.stop()
  }
}
