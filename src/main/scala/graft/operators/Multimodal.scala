package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media (image/audio/video) as opaque BINARY
  * columns with typed metadata, plus a feature-extraction stage.
  *
  * The Spark-side plumbing is real — schema, batch shape, partition-local
  * decode loop via mapPartitions on a typed Dataset — while the codec
  * itself is pluggable. This container has no image/audio libraries, so
  * the default decoder is [[StubDecoder]]: a clearly-marked deterministic
  * fake that derives pseudo-metadata from the raw bytes. Swapping in a
  * real decoder (JNI image lib, ffmpeg bridge, …) changes one binding and
  * nothing in the pipeline.
  */
object Multimodal {

  /** One media item: opaque payload + source metadata. */
  case class MediaRow(media_id: Long, payload: Array[Byte], kind: String,
      source: String)

  /** Extracted features (what a real image/audio decode would yield). */
  case class MediaFeatures(media_id: Long, n_bytes: Long, format: String,
      width: Int, height: Int, digest: String)

  /** Decoder contract: payload bytes → features. Implementations MUST be
    * deterministic and serializable (runs inside executor tasks). */
  trait Decoder extends Serializable {
    def decode(id: Long, payload: Array[Byte]): MediaFeatures
  }

  /** STUB — stands in for a real media codec (none available in this
    * container). Deterministic: format from the first byte, fake
    * dimensions from byte statistics, md5 digest of the payload. */
  object StubDecoder extends Decoder {
    override def decode(id: Long, payload: Array[Byte]): MediaFeatures = {
      val first = if (payload.nonEmpty) payload(0) & 0xFF else 0
      val fmt = if (first % 3 == 0) "png" else if (first % 3 == 1) "jpeg"
        else "webp"
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(payload).map("%02x".format(_)).mkString
      MediaFeatures(id, payload.length.toLong, fmt,
        16 * (1 + first % 64), 16 * (1 + (payload.length % 64)), md)
    }
  }

  /** Build a media table from the documents fixture: the text payload
    * plays the role of undecoded media bytes. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast(BinaryType).as("payload"),
      lit("image").as("kind"),
      col("source"))

  /** Partition-local feature extraction: typed Dataset + mapPartitions so
    * a real decoder could amortize per-partition init (model load, native
    * lib handle); no shuffle — runs wherever the payload partitions live. */
  def extractFeatures(media: DataFrame, decoder: Decoder = StubDecoder)
      : Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, p) => decoder.decode(id, p) } }
  }

  /** One sampled video frame: parent id, frame index, the frame's byte
    * slice (STUB: a real decoder would emit decoded image tensors), and a
    * per-frame digest. */
  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte],
      frame_digest: String)

  /** Frame sampling: explode each payload into ~`frames` evenly spaced
    * frame rows (1 row → N rows via flatMap; the real-codec version swaps
    * the byte-slicing stub for an ffmpeg-style keyframe reader). Output
    * row count scales with frames-per-doc, so the stage repartitions
    * afterwards at real scale — left to the caller, who knows the target
    * parallelism. */
  def sampleFrames(media: DataFrame, frames: Int = 4): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        val n = math.max(1, math.min(frames, p.length))
        val step = math.max(1, p.length / n)
        (0 until n).map { i =>
          val start = i * step
          val slice = p.slice(start, math.min(start + step, p.length))
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(slice).map("%02x".format(_)).mkString
          Frame(id, i, slice, md)
        }
      }
  }

  /** Resize stub: deterministic downsample of the payload bytes to
    * `targetBytes` by stride sampling (stands in for image resize). */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
    if (payload.length <= targetBytes) payload
    else {
      val stride = payload.length.toDouble / targetBytes
      Array.tabulate(targetBytes)(i => payload((i * stride).toInt))
    }
  }
}
