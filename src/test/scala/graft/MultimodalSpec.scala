package graft

import graft.multimodal.Multimodal
import graft.text.TextOps

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal
    .attachBinary(Tables(spark, sfDir()).documents)
    .as[Multimodal.MediaRecord]

  test("attachBinary produces the binary + metadata schema") {
    val df = Multimodal.attachBinary(Tables(spark, sfDir()).documents)
    assert(df.schema("data").dataType.typeName == "binary")
    assert(df.schema("n_bytes").dataType.typeName == "long")
  }

  test("fake decode is deterministic with in-range dims") {
    val f1 = Multimodal.decodeFrames(media, targetPixels = 16).collect()
    val f2 = Multimodal.decodeFrames(media, targetPixels = 16).collect()
    assert(f1.map(f => (f.doc_id, f.frame_idx, f.pixels.toSeq)).toSet ==
      f2.map(f => (f.doc_id, f.frame_idx, f.pixels.toSeq)).toSet)
    f1.foreach { f =>
      assert(f.width >= 1 && f.width <= 512)
      assert(f.height >= 1 && f.height <= 512)
      assert(f.pixels.length == 16)
      assert(f.pixels.forall(p => p >= 0.0f && p <= 1.0f))
    }
  }

  test("frame sampling keeps every k-th frame") {
    val all = Multimodal.decodeFrames(media, 16).collect()
    val sampled = Multimodal.decodeFrames(media, 16, sampleEvery = 2).collect()
    assert(sampled.forall(_.frame_idx % 2 == 0))
    assert(sampled.length == all.count(_.frame_idx % 2 == 0))
  }

  test("decoder dims agree with the q31 metadata query") {
    val meta = TextOps.q31MultimodalMeta(spark, sfDir()).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("width"), r.getAs[Long]("height"), r.getAs[Long]("n_frames"))).toMap
    val frames = Multimodal.decodeFrames(media, 16).collect()
      .groupBy(_.doc_id)
    frames.foreach { case (id, fs) =>
      val (w, h, n) = meta(id)
      assert(fs.head.width.toLong == w)
      assert(fs.head.height.toLong == h)
      assert(fs.map(_.frame_idx).max.toLong + 1 == n)
    }
  }
}
