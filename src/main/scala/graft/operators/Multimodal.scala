package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for the training-data pipeline surface:
  * image/audio/video as opaque `binary` columns with typed metadata.
  *
  * The Spark-side contract is real and tested — schema, partitioning,
  * batch shape, feature-vector layout. All three modalities now have
  * REAL decoders for their library-free formats: IMAGES ([[Images]] —
  * `javax.imageio` PNG/JPEG + perceptual near-dup signatures, q141),
  * WAV AUDIO ([[Audio]] — self-contained RIFF/PCM parser +
  * gain-invariant energy-contour fingerprint, q143), and MJPEG-AVI
  * VIDEO ([[Video]] — RIFF walk + per-frame JPEG decode, frame
  * sampling, clip-level near-dup, q145). Only compressed-codec decode
  * (MP3/H.264/MP4) remains STUBBED with a deterministic fake (those
  * codec libraries are not in this container); swap
  * [[MediaCodec.decode]] for a real JNI/javacpp decoder without
  * touching any plumbing.
  *
  * Scale notes: decode runs in `mapPartitions` so each task amortizes
  * codec init across its whole partition (the batch shape a real
  * decoder needs); binary payloads never hit the driver; metadata-only
  * queries prune the binary column at the parquet scan.
  */
object Multimodal {

  /** Typed metadata carried next to every binary payload. */
  val mediaMetadataSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // e.g. jpeg, wav, mp4
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("sample_rate", IntegerType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", mediaMetadataSchema)))

  final case class MediaMeta(media_type: String, format: String, width: Int,
      height: Int, duration_ms: Long, sample_rate: Int)
  final case class MediaRow(media_id: Long, content: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, n_bytes: Long, features: Array[Float])
  final case class MediaFrame(media_id: Long, frame_index: Int, frame: Array[Byte])

  /** ======== STUB ======== deterministic fake codec.
    * A real implementation would link an image/audio library; this one
    * derives stable pseudo-features from the byte stream so the whole
    * pipeline is testable and reproducible. */
  object MediaCodec {
    def decode(content: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < content.length) {
        h = scala.util.hashing.byteswap64(h ^ content(i))
        out(i % dim) += ((h % 1000L) / 1000.0f)
        i += 1
      }
      out
    }
    def frameCount(meta: MediaMeta): Int =
      if (meta.media_type == "video") math.max(1, (meta.duration_ms / 1000L).toInt) else 1
  }

  /** `binaryFile` source: directory of media files → (path, bytes). */
  def readBinaryDir(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
      .select(col("path"), col("length").as("n_bytes"), col("content"))

  /** Feature extraction: batch-shaped decode per partition. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here (amortized across batch)
      rows.map { r =>
        val feats = MediaCodec.decode(r.content, dim)
        MediaFeatures(r.media_id, r.content.length.toLong, feats)
      }
    }
  }

  /** Frame sampling: one row per sampled frame (video) / the payload
    * itself (image/audio). Generator-shaped: flatMap, no driver hop. */
  def sampleFrames(media: Dataset[MediaRow], everyNth: Int = 1): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val n = MediaCodec.frameCount(r.meta)
      (0 until n by everyNth).map { i =>
        // STUB: a real codec would decode frame i; the fake slices bytes
        val start = if (n <= 1) 0 else (r.content.length.toLong * i / n).toInt
        MediaFrame(r.media_id, i, r.content.slice(start, math.min(start + 16, r.content.length)))
      }
    }
  }

  /** Metadata-only projection — binary column pruned at the scan. */
  def metadataSummary(df: DataFrame): DataFrame =
    df.groupBy(col("meta.media_type").as("media_type"))
      .agg(count(lit(1)).as("n"),
        avg(col("meta.duration_ms")).as("avg_duration_ms"),
        max(col("meta.width")).as("max_width"))
}
