package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.tools.MakeAviFixture.encodeAvi
import graft.tools.MakeImageFixture.{encode, Img}
import graft.tools.MakeImageNearDupFixture.{analyticPixels, dhash}

/** One-off generator for the committed video near-dup fixture behind
  * q247 (`multimodal/VideoNearDup.scala`): real AVI containers whose
  * lossless PNG frame payloads plant every class the aligned-sequence
  * dedup contract distinguishes, plus the analytic expected pairs
  * (designed layouts → the operator's grid/luminance/dHash math and
  * alignment rule — never the extractor or codec under test).
  *
  * Planted classes over a 6-frame base video (frames sampled every
  * [[graft.multimodal.Video.FrameSampleEvery]] → indices 0, 2, 4):
  *  - 1 vs 2: +6 global brightness on every frame — aligned hamming 0
  *    (the re-encode/grade case) → PAIR.
  *  - 1 vs 3: ONE cell flipped in one sampled frame — max aligned
  *    hamming 1..tau → PAIR.
  *  - 1 vs 4: same frames REORDERED (sampled frames rotated) —
  *    candidates fire (shared frames band-collide) but alignment
  *    fails → NOT a pair (sequence-awareness pinned).
  *  - 1 vs 5: TRUNCATED cut (first 3 frames only) — frame counts
  *    differ → NOT a pair.
  *  - 6: unrelated content → no pairs.
  *  - 7: corrupt container → quarantined, no hashes.
  *
  * Run once, outputs committed:
  * `sbt "runMain graft.tools.MakeVideoNearDupFixture"` writes
  * src/test/resources/video_neardup_fixture.parquet and
  * video_neardup_expected.parquet (single files).
  */
object MakeVideoNearDupFixture {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("make-video-neardup-fixture").master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()

    def gray(v: Int): (Int, Int, Int) = { val c = v.max(0).min(255); (c, c, c) }
    // base frame k: pseudo-random, values < 240 so +6 never clamps
    // (a clamp could flip a gradient sign and break the ham-0 pin)
    def baseFrame(id: Long, k: Int): Img =
      Img(id, "png", 9, 9,
        (x, y) => gray((x * 37 + y * 53 + k * 101 + 13) % 240))

    val nFrames = 6
    val vid1 = (0 until nFrames).map(k => baseFrame(1L, k))
    val vid2 = (0 until nFrames).map { k =>
      Img(2L, "png", 9, 9,
        (x, y) => gray((x * 37 + y * 53 + k * 101 + 13) % 240 + 6))
    }
    val vid3 = (0 until nFrames).map { k =>
      if (k != 2) baseFrame(3L, k)
      else Img(3L, "png", 9, 9, (x, y) =>
        // 255 lands ABOVE the cell's right neighbor (148), flipping
        // exactly that one gradient-sign bit
        if (x == 3 && y == 5) gray(255)
        else gray((x * 37 + y * 53 + 2 * 101 + 13) % 240))
    }
    // rotate by one SAMPLED position: sampled indices 0,2,4 hold
    // frames 2,?,0-ish — simplest: reverse the frame order
    val vid4 = (0 until nFrames).reverse.map(k => baseFrame(4L, k))
    val vid5 = (0 until 3).map(k => baseFrame(5L, k)) // truncated cut
    val vid6 = (0 until nFrames).map { k =>
      Img(6L, "png", 9, 9,
        (x, y) => gray((x * 91 + y * 17 + k * 59 + 7) % 240))
    }

    val vids: Seq[(Long, Seq[Img])] = Seq(
      1L -> vid1, 2L -> vid2, 3L -> vid3, 4L -> vid4, 5L -> vid5,
      6L -> vid6)
    val corruptId = 7L
    val corrupt = encodeAvi(vid1.map(encode)).take(16)

    // analytic frame hashes for the SAMPLED indices
    val sampleEvery = graft.multimodal.Video.FrameSampleEvery
    val tau = graft.multimodal.ImageNearDup.Tau
    val hashes: Map[Long, Seq[(Long, Long)]] = vids.map { case (id, frames) =>
      id -> frames.zipWithIndex.collect {
        case (im, i) if i % sampleEvery == 0 =>
          (i.toLong, dhash(analyticPixels(im)))
      }
    }.toMap
    // the operator's alignment rule, brute force
    val pairs = for {
      (a, ha) <- hashes.toSeq.sortBy(_._1); (b, hb) <- hashes.toSeq.sortBy(_._1)
      if a < b
      am = ha.toMap; bm = hb.toMap
      if am.size == bm.size && am.keySet == bm.keySet
      dists = am.keySet.toSeq.map(i => java.lang.Long.bitCount(am(i) ^ bm(i)))
      if dists.forall(_ <= tau)
    } yield (a, b, am.size.toLong, dists.max.toLong)
    // generation-time pins of the planted classes
    require(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._4 == 0L),
      "planted brightness pair (1,2) drifted")
    require(pairs.exists(p => p._1 == 1L && p._2 == 3L &&
      p._4 >= 1L && p._4 <= tau), "planted edit pair (1,3) drifted")
    require(!pairs.exists(p => Set(p._1, p._2).contains(4L)),
      "reordered cut must not pair")
    require(!pairs.exists(p => Set(p._1, p._2).contains(5L)),
      "truncated cut must not pair")
    require(!pairs.exists(p => Set(p._1, p._2).contains(6L)),
      "unrelated video must not pair")

    val mediaSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("data", BinaryType, nullable = false),
      StructField("format", StringType, nullable = false)))
    val mediaRows = vids.map { case (id, frames) =>
      Row(id, encodeAvi(frames.map(encode)), "avi")
    } :+ Row(corruptId, corrupt, "avi")
    val expSchema = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("max_hamming", LongType, nullable = false)))
    val expRows = pairs.sortBy(p => (p._1, p._2))
      .map(p => Row(p._1, p._2, p._3, p._4))

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
      "src/test/resources/video_neardup_fixture.parquet")
    writeSingle(expRows, expSchema,
      "src/test/resources/video_neardup_expected.parquet")
    println(s"wrote ${mediaRows.size} media rows / ${expRows.size} expected pairs")
    expRows.foreach(r => println(s"  pair $r"))
    spark.stop()
  }
}
