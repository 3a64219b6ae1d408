package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads with typed
  * metadata, decoded/resized/frame-sampled through a partition-batched
  * decoder.
  *
  * The decode step itself is a STUB — image/audio codec libraries are
  * not available in this environment — substituted by a deterministic
  * md5-driven fake (`FakeCodec`). Everything around it is the real
  * Spark plumbing a production decoder would use: binary columns +
  * metadata struct schema, `mapPartitions` with one codec instance
  * per partition (not per row), bounded-size frame batches, and typed
  * Datasets so downstream operators are schema-checked.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, data: Array[Byte], format: String)
  case class Frame(doc_id: Long, frame_idx: Int, width: Int, height: Int,
    pixels: Array[Float])

  /** STUB decoder standing in for a real codec (libjpeg/ffmpeg/...).
    * Deterministic: dims and pixel values derive from md5(payload) —
    * the same derivation the q31 metadata query and its DuckDB oracle
    * use. One instance per partition; reuses its digest buffer. */
  final class FakeCodec {
    private val md = java.security.MessageDigest.getInstance("MD5")

    def decode(rec: MediaRecord, targetPixels: Int): Iterator[Frame] = {
      md.reset()
      val h = md.digest(rec.data)
      def hex(from: Int, n: Int): Long =
        java.lang.Long.parseLong(
          h.slice(from / 2, from / 2 + n / 2 + 1)
            .map("%02x".format(_)).mkString
            .substring(from % 2, from % 2 + n), 16)
      val width = (hex(0, 4) % 512 + 1).toInt
      val height = (hex(4, 4) % 512 + 1).toInt
      val nFrames = (hex(8, 2) % 16 + 1).toInt
      (0 until nFrames).iterator.map { f =>
        // "resize": a fixed-size pixel block per frame, derived from
        // the payload hash — stands in for decode+resample output.
        val pixels = Array.tabulate(targetPixels) { i =>
          ((h((f + i) % h.length) & 0xff) / 255.0f)
        }
        Frame(rec.doc_id, f, width, height, pixels)
      }
    }
  }

  /** Attach the binary payload + metadata columns to a text corpus
    * (documents stand in for raw media blobs in the test data). */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("data"),
      col("source").as("format"),
      octet_length(col("text")).cast("long").as("n_bytes"))

  /** Decode/resize/frame-sample through the partition-batched stub
    * codec. `sampleEvery` keeps every k-th frame (frame sampling);
    * `targetPixels` is the post-resize frame size. */
  def decodeFrames(media: Dataset[MediaRecord], targetPixels: Int = 16,
      sampleEvery: Int = 1): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val codec = new FakeCodec // one per partition, not per row
      it.flatMap(rec => codec.decode(rec, targetPixels)
        .filter(_.frame_idx % sampleEvery == 0))
    }
  }

  /** Feature extraction over decoded frames — genuine math (NOT part
    * of the stub): pixel mean, standard deviation, dimensions, and an
    * 8-bin intensity histogram as one fixed-width `array<double>`.
    * Pure codegen'd higher-order functions, no UDF, no shuffle; the
    * output column drops straight into the `graft.sim` similarity /
    * near-dup operators (media → embedding → ANN composition). */
  def extractFeatures(frames: DataFrame): DataFrame =
    frames
      .withColumn("px", col("pixels").cast("array<double>"))
      .withColumn("mean_px",
        expr("aggregate(px, 0.0D, (a, p) -> a + p) / size(px)"))
      .withColumn("std_px", sqrt(
        expr("aggregate(px, 0.0D, (a, p) -> a + (p - mean_px) * (p - mean_px)) / size(px)")))
      .withColumn("hist",
        expr("""transform(sequence(0, 7),
               |  b -> size(filter(px, p -> cast(least(floor(p * 8), 7D) as int) = b))
               |       / cast(size(px) as double))""".stripMargin))
      .select(col("doc_id"), col("frame_idx"),
        concat(
          array(col("mean_px"), col("std_px"),
            col("width").cast("double"), col("height").cast("double")),
          col("hist")).as("features"))
}
