package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/**
 * Multimodal column plumbing (SURVEY.md §2.12): media travels as an opaque
 * BINARY payload plus a typed metadata struct; decode / feature-extract /
 * frame-sample are `mapPartitions` stages over typed Datasets.
 *
 * The codecs here are DETERMINISTIC STUBS (this container has no image or
 * audio libraries) — each stub documents the real library call it stands in
 * for. Everything Spark-side is real: schema, encoders, partition-sized
 * batching, explode shapes, and the feature vectors flow straight into
 * `Similarity` (ANN) and `Dedup` (embedding near-dup).
 */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int, duration_ms: Long)
  case class Blob(media_id: Long, meta: MediaMeta, payload: Array[Byte])
  case class Features(media_id: Long, features: Array[Float])
  case class Frame(media_id: Long, frame_idx: Int, frame_payload: Array[Byte])

  /** Deterministic stand-in for an image/audio decode+embed call
    * (e.g. JPEG decode -> CNN embedding). Hash-derived so tests are stable. */
  private def stubEmbed(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var j = 0
    while (j < dim) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17 // xorshift
      out(j) = ((h % 1000L) / 1000.0f)
      j += 1
    }
    out
  }

  /** Wrap any table into media blobs (payload = some binary column). */
  def toBlobs(df: DataFrame, idCol: String, payloadCol: String, format: String): Dataset[Blob] = {
    import df.sparkSession.implicits._
    df.select(
        col(idCol).cast("long").as("media_id"),
        struct(lit(format).as("format"),
          (length(col(payloadCol)) % 1920).cast("int").as("width"),
          (length(col(payloadCol)) % 1080).cast("int").as("height"),
          (length(col(payloadCol)) * 33L).cast("long").as("duration_ms")).as("meta"),
        col(payloadCol).cast("binary").as("payload"))
      .as[Blob]
  }

  /** Decode + feature-extract, one partition at a time (the batch shape a
    * real codec wants: amortized model init per partition, not per row). */
  def extractFeatures(blobs: Dataset[Blob], dim: Int = 64): Dataset[Features] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // real impl: init decoder/model ONCE here, then stream the partition
      it.map(b => Features(b.media_id, stubEmbed(b.payload, dim)))
    }
  }

  /** Sample every `stride`-th frame of a "video" payload (stub: slices). */
  def sampleFrames(blobs: Dataset[Blob], stride: Int = 10): Dataset[Frame] = {
    import blobs.sparkSession.implicits._
    blobs.flatMap { b =>
      val n = math.max(1, (b.meta.duration_ms / 1000 / stride).toInt)
      (0 until math.min(n, 8)).iterator.map { i =>
        val from = math.min(i * stride, math.max(b.payload.length - 1, 0))
        Frame(b.media_id, i, b.payload.slice(from, math.min(from + 16, b.payload.length)))
      }
    }
  }

  /** "Resize": metadata-only transform (real impl re-encodes payload). */
  def resizeMeta(blobs: Dataset[Blob], w: Int, h: Int): Dataset[Blob] = {
    import blobs.sparkSession.implicits._
    blobs.map(b => b.copy(meta = b.meta.copy(width = w, height = h)))
  }
}
