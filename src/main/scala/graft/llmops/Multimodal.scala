package graft.llmops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, processed per-partition
  * in batches.
  *
  * The actual media decode is STUBBED (`decodeStub`) — codec libraries are
  * not in this container — but the Spark-side contract is real and tested:
  * schema, batch iteration via `mapPartitions` (the Scala analog of
  * `mapInPandas`: one iterator per partition, vectorizable batch shape),
  * partitioning by content hash, and the metadata struct a real decoder
  * would fill.
  */
final case class MediaMeta(byte_len: Long, width: Int, height: Int, duration_ms: Long)

object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("byte_len", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))), nullable = true)))

  /** Wrap any (id, binary) DataFrame as a media table with empty metadata. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, modality: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      col(payloadCol).cast("binary").as("payload"),
      lit(null).cast(mediaSchema("meta").dataType).as("meta"))

  /** STUB decoder: where a real pipeline would call an image/audio codec,
    * we derive deterministic fake dimensions from the payload bytes. The
    * surrounding plumbing (partition-batched iteration, struct fill) is the
    * real production shape.
    */
  def decodeStub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val decoded = media
      .select(col("media_id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        // one iterator per partition — the mapInPandas batch shape; a real
        // decoder would drain `batch` in vectorized chunks here
        batch.map { case (mediaId, modality, payload) =>
          val byteLen = payload.length.toLong
          val w = 16 + (math.abs(java.util.Arrays.hashCode(payload)) % 1024)
          val h = 16 + (math.abs(java.util.Arrays.hashCode(payload) * 31) % 1024)
          val dur = if (modality == "image") 0L else byteLen / 4
          (mediaId, modality, payload, MediaMeta(byteLen, w, h, dur))
        }
      }
    decoded.toDF("media_id", "modality", "payload", "meta")
  }

  /** STUB feature extractor: payload bytes -> `dim`-dimensional unit-norm
    * float embedding. A real pipeline would run a vision/audio encoder over
    * the decoded media here; the deterministic hash-derived vector keeps
    * the downstream similarity plumbing (schema `array<float>`, ANN joins)
    * real and testable.
    */
  def featurizeStub(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, payload) =>
          val raw = Array.tabulate(dim) { d =>
            var h = 1125899906842597L * (d + 1)
            var i = 0
            while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
            ((h % 1000L) / 1000.0f)
          }
          val n = math.sqrt(raw.map(x => x * x).sum).toFloat
          val unit = if (n == 0f) raw else raw.map(_ / n)
          (id, unit)
        }
      }
      .toDF("media_id", "embedding")
  }

  /** STUB resize: a real pipeline decodes, RESIZES to the model's input
    * dims, then featurizes. The stub replaces the payload with exactly
    * `min(targetW * targetH, byte_len)` bytes sampled evenly across the
    * original (order-preserving downsampling — the access pattern a real
    * resampler has) and rewrites the metadata to the target dims, so the
    * output length and meta are externally checkable while the pixel math
    * stays behind the codec boundary. Same partition-batched shape as the
    * other stubs.
    */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0, s"resize dims must be positive, got ${targetW}x$targetH")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, modality, payload) =>
          // long product: 65536x65536 overflows Int to 0 (or negative)
          val outLen = math.min(targetW.toLong * targetH, payload.length.toLong).toInt
          val out = Array.tabulate(outLen) { i =>
            payload(((i.toLong * payload.length) / outLen).toInt)
          }
          val dur = if (modality == "image") 0L else outLen.toLong / 4
          (id, modality, out, MediaMeta(outLen.toLong, targetW, targetH, dur))
        }
      }
      .toDF("media_id", "modality", "payload", "meta")
  }

  /** Deterministic frame/sample selection for video/audio: pick `n` sample
    * offsets spread over the payload — stands in for frame extraction; the
    * byte-slicing and explode shape match the real operator.
    */
  def sampleFrames(media: DataFrame, n: Int): DataFrame =
    media.select(col("media_id"),
        explode(sequence(lit(0), lit(n - 1))).as("frame_idx"),
        length(col("payload")).as("len"))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        floor(col("frame_idx") * col("len") / n).as("byte_offset"))
}
