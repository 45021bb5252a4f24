package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads + typed metadata, processed in partition-local batches.
  *
  * The Spark-side contract is real and tested — schema, batch shape,
  * partitioning, deterministic outputs. The decode stage is REAL for the
  * uncompressed formats ([[RealDecoder]]: WAV/PCM16, 24-bit BMP — pure
  * JVM, [[MediaCodecs]]); compressed formats (JPEG/MP3/video) stay behind
  * the same seam (no codec libraries ship in this container). Swap
  * [[MediaDecoder]] for a JNI/FFI or Arrow-batched-service implementation
  * without touching the plan: the `mapPartitions` boundary is the
  * same one `mapInPandas`/`mapInArrow` gives Python UDFs — one decoder
  * instance per task, amortized over the partition's rows, never per-row
  * setup. At 100 TB the input should be repartitioned by byte size (not
  * row count) before this stage so each task decodes a comparable volume.
  */
object Multimodal {

  /** One media row: north-rule-adjacent shape for non-text payloads. */
  final case class MediaRow(
      media_id: Long, modality: String, bytes: Array[Byte],
      width: Int, height: Int, sample_rate: Int, n_frames: Int)

  /** Extracted features: fixed-length embedding + basic decoded metadata. */
  final case class MediaFeatures(
      media_id: Long, modality: String, feat_dim: Int,
      features: Array[Float], ok: Boolean)

  /** Decoder SPI. Implementations MUST be deterministic per byte payload. */
  trait MediaDecoder extends Serializable {
    def decode(modality: String, bytes: Array[Byte], featDim: Int): Option[Array[Float]]
  }

  /** REAL decoder: WAV/PCM16 audio → framed RMS-energy features; images →
    * grid-pooled luminance features via the pure-JVM 24-bit BMP parser,
    * then the own-kernel PNG decoder (Inflater + spec unfiltering —
    * MediaCodecs.parsePng), then the JDK's javax.imageio readers
    * (JPEG/GIF — still standard library, zero external deps). Audio
    * beyond WAV and video return None here; swap in a JNI/FFI-backed
    * decoder at this seam. */
  object RealDecoder extends MediaDecoder {
    def decode(modality: String, bytes: Array[Byte], featDim: Int): Option[Array[Float]] =
      modality match {
        case "audio" => MediaCodecs.wavFeatures(bytes, featDim)
        case "image" => MediaCodecs.bmpFeatures(bytes, featDim)
          .orElse(MediaCodecs.pngFeatures(bytes, featDim))
          .orElse(MediaCodecs.imageioFeatures(bytes, featDim))
        case _ => None
      }
  }

  /** Deterministic stand-in for formats [[RealDecoder]] can't parse:
    * features are a seeded hash fold of the payload — stable across
    * runs/partitionings, so the pipeline around it is fully testable with
    * arbitrary synthetic bytes. */
  object FakeDecoder extends MediaDecoder {
    def decode(modality: String, bytes: Array[Byte], featDim: Int): Option[Array[Float]] = {
      if (bytes == null || bytes.isEmpty) return None
      val out = new Array[Float](featDim)
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
      var j = 0
      while (j < featDim) {
        val rng = graft.util.SplitMix64.stream(h, j.toLong)
        out(j) = (rng.nextDouble() * 2.0 - 1.0).toFloat
        j += 1
      }
      Some(out)
    }
  }

  /** Feature extraction stage: partition-local batches through the decoder.
    * `batchSize` models the Arrow batch shape a columnar decoder wants. */
  def extractFeatures(media: Dataset[MediaRow], featDim: Int = 16,
      decoder: MediaDecoder = FakeDecoder, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // batch the iterator like an Arrow reader would — the decoder sees
      // grouped work, not row-at-a-time calls
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          decoder.decode(r.modality, r.bytes, featDim) match {
            case Some(f) => MediaFeatures(r.media_id, r.modality, featDim, f, ok = true)
            case None => MediaFeatures(r.media_id, r.modality, featDim,
              Array.empty[Float], ok = false)
          }
        }
      }
    }
  }

  /** Frame sampling for video rows: emit one row per sampled frame index —
    * deterministic stride sampling, `explode` on a generated sequence (the
    * decode of each frame is again behind the decoder seam). */
  def sampleFrames(media: DataFrame, everyN: Int): DataFrame =
    media.filter(col("modality") === "video" && col("n_frames") > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN))))

  /** Analytic REAL-decode fixture: rows whose RealDecoder features have
    * closed forms an external engine recomputes independently (gate
    * q_multimodal_decode). Image rows become w×h gradient BMPs with
    * lum(x,y) = x, so a grid cell's feature is mean(x over the cell)/255;
    * audio rows become constant-amplitude PCM16 WAVs, so every RMS frame
    * is |amp|/32768 exactly. */
  def decodeFixture(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism).map { id =>
      if (id % 2 == 0)
        (id, "image", (4 + id % 13).toInt, (3 + id % 7).toInt, 0)
      else
        (id, "audio", 0, 0, (id * 997 % 20001 - 10000).toInt)
    }.toDF("media_id", "modality", "w", "h", "amp")
  }

  /** Deterministic synthetic media fixture (no external data). */
  def synthesize(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    val modalities = Array("image", "audio", "video")
    val rates = Array(8000, 16000, 44100)
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism).map { id =>
      val rng = graft.util.SplitMix64.stream(seed, id)
      val modality = modalities(rng.nextInt(3))
      val len = 64 + rng.nextInt(448)
      val bytes = new Array[Byte](len)
      var i = 0
      while (i < len) { bytes(i) = (rng.nextLong() & 0xff).toByte; i += 1 }
      modality match {
        case "image" => MediaRow(id, modality, bytes, 16 + rng.nextInt(1024),
          16 + rng.nextInt(1024), 0, 0)
        case "audio" => MediaRow(id, modality, bytes, 0, 0,
          rates(rng.nextInt(3)), 0)
        case _ => MediaRow(id, modality, bytes, 320, 240, 0, 1 + rng.nextInt(300))
      }
    }
  }
}
