package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.tools.MakeImageFixture.{encode, Img}

/** One-off generator for the committed image near-dup fixture behind
  * q245 (`multimodal/ImageNearDup.scala`): real PNG/BMP payloads with
  * PLANTED near-duplicate pairs, distinct controls, and a corrupt
  * payload, plus the analytically computed expected pair table.
  *
  * The expectation is computed from the DESIGNED pixel layouts — the
  * same 9×9 nearest-neighbor grid, Rec. 601 float luminance, and
  * dHash bit order the operator implements, but never by running the
  * codec under test (the q162 convention): if decode, sampling,
  * luminance, the hash HOF, banding, or the verify regress, q245
  * hash-mismatches.
  *
  * Planted geometry (hamming distances are properties of the designed
  * layouts, asserted here at generation time):
  *  - 1 vs 2: horizontal gradient, +6 global brightness — gradient
  *    signs unchanged, hamming 0 (the re-encode/brightness case).
  *  - 3 vs 4: alternating columns, ONE cell flipped — ≤2 bits (the
  *    small-edit case).
  *  - 6 vs 8: checkerboard PNG vs one-cell-flipped BMP — ≤2 bits
  *    across FORMATS (both lossless).
  *  - 5: vertical gradient — rows are flat, so dHash = 0, which
  *    COLLIDES with the horizontal-flat gradient pair (1, 2): the
  *    documented dHash degenerate class, planted so the property is
  *    pinned in the expected table rather than met in production.
  *  - 7: pseudo-random control, far from everything.
  *  - 9: truncated PNG — quarantined, no hash, no pairs.
  *
  * Run once, outputs committed:
  * `sbt "runMain graft.tools.MakeImageNearDupFixture"` writes
  * src/test/resources/media_neardup_fixture.parquet and
  * media_neardup_expected.parquet (single files).
  */
object MakeImageNearDupFixture {

  /** The operator's grid/luminance math on the DESIGNED layout. */
  def analyticPixels(img: Img): Array[Float] = {
    val g = graft.multimodal.ImageNearDup.Grid
    Array.tabulate(g * g) { i =>
      val x = ((i % g) * img.w) / g
      val y = ((i / g) * img.h) / g
      val (r, gg, b) = img.rgb(x, y)
      (0.299f * r + 0.587f * gg + 0.114f * b) / 255.0f
    }
  }

  /** The operator's bit order on an analytic pixel grid (MSB-first
    * bitwise OR, matching the operator's ANSI-safe accumulate). */
  def dhash(px: Array[Float]): Long = {
    val g = graft.multimodal.ImageNearDup.Grid
    val bits = graft.multimodal.ImageNearDup.Bits
    (0 until bits).foldLeft(0L) { (acc, i) =>
      val r = i / 8; val c = i % 8
      acc | (if (px(r * g + c) > px(r * g + c + 1)) 1L << (bits - 1 - i)
             else 0L)
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("make-image-neardup-fixture").master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()

    def gray(v: Int): (Int, Int, Int) = { val c = v.max(0).min(255); (c, c, c) }
    val images = Seq(
      Img(1L, "png", 9, 9, (x, _) => gray(x * 28)),
      Img(2L, "png", 9, 9, (x, _) => gray(x * 28 + 6)),
      Img(3L, "png", 9, 9, (x, _) => gray(if (x % 2 == 0) 255 else 0)),
      Img(4L, "png", 9, 9, (x, y) =>
        gray(if (x == 4 && y == 4) 0 // base cell is 255: a real flip
             else if (x % 2 == 0) 255 else 0)),
      Img(5L, "png", 9, 9, (_, y) => gray(y * 28)),
      Img(6L, "png", 9, 9, (x, y) => gray(if ((x + y) % 2 == 0) 255 else 0)),
      Img(7L, "png", 9, 9, (x, y) => gray((x * 37 + y * 53 + 11) % 256)),
      Img(8L, "bmp", 9, 9, (x, y) =>
        gray(if (x == 2 && y == 6) 0 // base cell is 255: a real flip
             else if ((x + y) % 2 == 0) 255 else 0)),
    )
    val corruptId = 9L
    val corrupt = encode(images.head).take(24) // truncated header

    // analytic hashes → brute-force expected pairs at tau
    val hashes = images.map(im => im.docId -> dhash(analyticPixels(im)))
    val tau = graft.multimodal.ImageNearDup.Tau
    val pairs = for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= tau
    } yield (a, b, d.toLong)
    // generation-time pins of the planted geometry
    def ham(a: Long, b: Long): Long =
      pairs.find(p => p._1 == a && p._2 == b).map(_._3).getOrElse(-1L)
    require(ham(1L, 2L) == 0L, s"planted (1,2) drifted: ${ham(1L, 2L)}")
    require(ham(3L, 4L) >= 1L && ham(3L, 4L) <= 2L, "planted (3,4) drifted")
    require(ham(6L, 8L) >= 1L && ham(6L, 8L) <= 2L, "planted (6,8) drifted")
    require(ham(1L, 5L) == 0L && ham(2L, 5L) == 0L,
      "dHash flat-image collision pin drifted")
    require(hashes.toMap.apply(7L) != 0L &&
      pairs.forall(p => p._1 != 7L && p._2 != 7L), "control 7 paired")

    val mediaSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("data", BinaryType, nullable = false),
      StructField("format", StringType, nullable = false)))
    val mediaRows = images.map(im => Row(im.docId, encode(im), im.format)) :+
      Row(corruptId, corrupt, "png")
    val expSchema = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false),
      StructField("hamming", LongType, nullable = false)))
    val expRows = pairs.sortBy(p => (p._1, p._2))
      .map(p => Row(p._1, p._2, p._3))

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
      "src/test/resources/media_neardup_fixture.parquet")
    writeSingle(expRows, expSchema,
      "src/test/resources/media_neardup_expected.parquet")
    println(s"wrote ${mediaRows.size} media rows / ${expRows.size} expected pairs")
    expRows.foreach(r => println(s"  pair $r"))
    spark.stop()
  }
}
