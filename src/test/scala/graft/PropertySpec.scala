package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.multimodal.Audio
import graft.multimodal.Multimodal.MediaRecord
import graft.text.SpanOps
import graft.tools.{MakeAviFixture, MakeWavFixture}
import graft.tools.MakeWavFixture.Clip

/** Generative properties over random inputs (ScalaCheck with a FIXED
  * initial seed — reproducible, no flaky shrink paths). The pure-JVM
  * codecs run at full iteration counts; Spark-backed properties use
  * smaller counts so the spec stays fast. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, n: Int, seed: Long): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(n)
        .withInitialSeed(Seed(seed))
        .withWorkers(1),
      prop)
    assert(res.passed, res.status.toString)
  }

  // ---------------------------------------------------------- WAV codec
  test("property: WAV encode->decode roundtrips any PCM16 stream") {
    val codec = new Audio.WavPcmCodec
    val gen = for {
      rate <- Gen.oneOf(8000, 16000, 22050, 44100)
      ch <- Gen.oneOf(1, 2)
      n <- Gen.choose(1, 400)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield (rate, ch, n, seed)
    check(Prop.forAll(gen) { case (rate, ch, n, seed) =>
      val r = new java.util.SplittableRandom(seed)
      val chans = Array.fill(ch)(Array.fill(n)(r.nextInt(65536) - 32768))
      val clip = Clip(1L, rate, ch, chans)
      val out = codec.decode(
        Audio.AudioRecord(1L, MakeWavFixture.encodeWav(clip), "wav")).toSeq
      out.size == 1 &&
        out.head.sample_rate == rate &&
        out.head.samples.toSeq == MakeWavFixture.monoMix(clip).toSeq
    }, n = 100, seed = 11L)
  }

  test("property: WAV decoder never throws on arbitrary bytes") {
    val codec = new Audio.WavPcmCodec
    val gen = for {
      n <- Gen.choose(0, 600)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
      // half the cases start from a valid header prefix (deeper walk)
      prefix <- Gen.oneOf(true, false)
    } yield (n, seed, prefix)
    val validHead = MakeWavFixture.encodeWav(
      Clip(1L, 8000, 1, Array(Array.fill(64)(7))))
    check(Prop.forAll(gen) { case (n, seed, prefix) =>
      val r = new java.util.SplittableRandom(seed)
      val noise = Array.fill(n)(r.nextInt(256).toByte)
      val bytes = if (prefix) validHead.take(28) ++ noise else noise
      codec.decode(Audio.AudioRecord(1L, bytes, "wav")).toSeq
      true // property IS "no throw"; quarantine content is free-form
    }, n = 100, seed = 13L)
  }

  // ---------------------------------------------------------- AVI walk
  test("property: AVI encode->walk yields exactly the frame payloads") {
    val ex = new graft.multimodal.Video.AviFrameExtractor
    val gen = for {
      nf <- Gen.choose(0, 12)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield (nf, seed)
    check(Prop.forAll(gen) { case (nf, seed) =>
      val r = new java.util.SplittableRandom(seed)
      val payloads = Seq.fill(nf)(
        Array.fill(1 + r.nextInt(300))(r.nextInt(256).toByte))
      val got = ex.frames(MediaRecord(3L,
        MakeAviFixture.encodeAvi(payloads), "avi")).toSeq
      got.size == nf &&
        got.map(_.frame_idx) == payloads.indices &&
        got.zip(payloads).forall { case (g, p) => g.data.sameElements(p) }
    }, n = 100, seed = 17L)
  }

  test("property: AVI walker never throws on arbitrary bytes") {
    val ex = new graft.multimodal.Video.AviFrameExtractor
    val gen = for {
      n <- Gen.choose(0, 500)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
      prefix <- Gen.oneOf(true, false)
    } yield (n, seed, prefix)
    val validHead = MakeAviFixture.encodeAvi(Seq(Array[Byte](1, 2, 3)))
    check(Prop.forAll(gen) { case (n, seed, prefix) =>
      val r = new java.util.SplittableRandom(seed)
      val noise = Array.fill(n)(r.nextInt(256).toByte)
      val bytes = if (prefix) validHead.take(24) ++ noise else noise
      ex.frames(MediaRecord(1L, bytes, "avi")).toSeq
      true
    }, n = 100, seed = 19L)
  }

  // ------------------------------------------------------- span dedup
  /** Brute-force span reference (same as SpanOpsSpec's, inlined). */
  private def refSpans(docs: Seq[(Long, String)], k: Int): Seq[(Long, Long, Long)] = {
    val grams = for {
      (id, s) <- docs if s.length >= k
      i <- 0 to (s.length - k)
    } yield (id, i, s.substring(i, i + k))
    val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
    val dup = grams.filter(g => counts(g._3) >= 2)
    dup.groupBy(_._1).toSeq.flatMap { case (id, ps) =>
      val sorted = ps.map(_._2).sorted
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      for (p <- sorted) {
        if (spans.nonEmpty && p <= spans.last._2) {
          val (s0, e0) = spans.last
          spans(spans.size - 1) = (s0, math.max(e0, p + k))
        } else spans += ((p, p + k))
      }
      spans.map { case (s, e) => (id, s + 1L, e + 1L) }
    }.sortBy(t => (t._1, t._2))
  }

  test("property: duplicateSpans == brute force on random low-entropy corpora") {
    val k = 8
    val gen = Gen.choose(Long.MinValue, Long.MaxValue)
    check(Prop.forAll(gen) { seed =>
      val r = new java.util.SplittableRandom(seed)
      // 3-letter alphabet forces plenty of coincidental 8-gram repeats
      val docs = (0L until 20L).map { id =>
        val n = 5 + r.nextInt(40)
        (id, Array.fill(n)(('a' + r.nextInt(3)).toChar).mkString)
      }
      val got = SpanOps.duplicateSpans(docs.toDF("doc_id", "s"), k)
        .select("doc_id", "span_start", "span_end")
        .as[(Long, Long, Long)].collect().toSeq.sortBy(t => (t._1, t._2))
      got == refSpans(docs, k)
    }, n = 8, seed = 23L)
  }

  // -------------------------------------------- star-contraction CC
  test("property: star contraction == min-label CC on random graphs") {
    import org.apache.spark.sql.functions.col
    val gen = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(0, 60)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L)
      } yield (a, b))
    } yield (n.toLong, es)
    check(Prop.forAll(gen) { case (n, es) =>
      val nodes = (0L until n).toDF("node")
      val e = es.toDF("u", "v")
      val star = graft.graph.StarContraction.components(nodes, e)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val und = e.select(col("u").as("src"), col("v").as("dst"))
        .union(e.select(col("v").as("src"), col("u").as("dst")))
        .filter(col("src") =!= col("dst")).distinct()
      val ref = graft.graph.Algorithms.connectedComponents(nodes, und)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // probe depth 1 forces ccAuto onto the quotient path mid-flight
      val auto = graft.graph.StarContraction.ccAuto(nodes, e, probeRounds = 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      star == ref && auto == ref
    }, n = 10, seed = 31L)
  }

  // -------------------------------------------- suffix array
  test("property: prefix-doubling SA == scalar suffix sort on random corpora") {
    val gen = for {
      nd <- Gen.choose(1, 4)
      docs <- Gen.listOfN(nd, for {
        len <- Gen.choose(1, 80)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
      } yield cs.mkString)
    } yield docs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    check(Prop.forAll(gen) { docs =>
      val got = graft.text.SuffixArray.suffixArray(docs.toDF("doc_id", "s"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
      val ref = docs.flatMap { case (id, s) =>
        (1 to s.length).map(p => (s.substring(p - 1), id, p.toLong))
      }.sortBy { case (suf, id, p) => (suf, id, p) }
        .map { case (_, id, p) => (id, p) }
      got == ref
    }, n = 8, seed = 37L)
  }
}
