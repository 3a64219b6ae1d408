package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{ImageNearDup, Multimodal}
import graft.tools.MakeImageFixture.{encode, Img}

class ImageNearDupSpec extends SparkSpec {
  import spark.implicits._

  /** A deterministic pool of in-test images: 20 pseudo-random bases,
    * each with a one-cell-flipped variant (planted near-dups), through
    * the REAL codec. */
  private def pool(): org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val imgs = (0 until 20).flatMap { k =>
      val base = Img(2L * k, "png", 9, 9,
        (x, y) => { val v = (x * 37 + y * 53 + k * 101 + 13) % 256; (v, v, v) })
      val fx = (k * 3) % 8; val fy = (k * 5) % 8
      val variant = Img(2L * k + 1, "png", 9, 9, (x, y) => {
        val v = if (x == fx && y == fy) 255 - ((fx * 37 + fy * 53 + k * 101 + 13) % 256)
                else (x * 37 + y * 53 + k * 101 + 13) % 256
        (v, v, v)
      })
      Seq(base, variant)
    }
    imgs.map(im => Multimodal.MediaRecord(im.docId, encode(im), im.format)).toDS()
  }

  test("banded pairs == brute force at tau (recall 1.0 by pigeonhole)") {
    val sig = ImageNearDup.dhashes(pool(), () => new Multimodal.ImageIoCodec)
    val hs = sig.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hs.length == 40, "every pool image must decode")
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= ImageNearDup.Tau
    } yield (a, b, d.toLong)).toSet
    val banded = ImageNearDup.neardupPairs(sig).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute,
      s"banding must be exact at tau=${ImageNearDup.Tau}: " +
        s"missed ${brute -- banded}, extra ${banded -- brute}")
    // the planted variants are actually found (distance small but > 0
    // for a contrast-inverting one-cell flip)
    assert(brute.nonEmpty, "pool must contain near-dups")
  }

  test("hash invariances: brightness shift 0 bits, re-encode 0 bits") {
    def grad(id: Long, fmt: String, off: Int) =
      Img(id, fmt, 9, 9, (x, _) => { val v = (x * 25 + off).min(255); (v, v, v) })
    val media = Seq(grad(1L, "png", 0), grad(2L, "png", 9),
      grad(3L, "bmp", 0))
      .map(im => Multimodal.MediaRecord(im.docId, encode(im), im.format)).toDS()
    val hs = ImageNearDup.dhashes(media, () => new Multimodal.ImageIoCodec)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) == hs(2L), "global brightness shift must not flip bits")
    assert(hs(1L) == hs(3L), "lossless re-encode must not flip bits")
  }

  test("quarantine-by-omission: corrupt payloads produce no hash, no pairs") {
    val good = Img(1L, "png", 9, 9, (x, y) => { val v = (x * 31 + y * 7) % 256; (v, v, v) })
    val media = Seq(
      Multimodal.MediaRecord(1L, encode(good), "png"),
      Multimodal.MediaRecord(2L, encode(good).take(24), "png"),
      Multimodal.MediaRecord(3L, Array.tabulate[Byte](48)(i => (i * 41 + 3).toByte), "png"))
      .toDS()
    val sig = ImageNearDup.dhashes(media, () => new Multimodal.ImageIoCodec)
    assert(sig.collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("q245 matches the committed analytic expectation") {
    val got = ImageNearDup.q245ImageNeardup(spark, sfDir())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exp = spark.read.parquet(ImageNearDup.NearDupExpectedPath)
      .orderBy("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == exp.toSeq)
    // the fixture plants all three designed classes: identity-class
    // (hamming 0), small-edit (1..tau), and they are present
    assert(exp.exists(_._3 == 0L) && exp.exists(p => p._3 >= 1L))
  }

  test("candidate generation is a band bucket join, never a cross join") {
    val sig = ImageNearDup.dhashes(pool(), () => new Multimodal.ImageIoCodec)
    val plan = ImageNearDup.neardupPairs(sig)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"banding must stay an equi join:\n$plan")
  }
}
