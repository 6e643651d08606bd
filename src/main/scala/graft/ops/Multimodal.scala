package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/**
 * Multimodal column plumbing (SURVEY.md §2.12): media travels as an opaque
 * BINARY payload plus a typed metadata struct; decode / feature-extract /
 * frame-sample are `mapPartitions` stages over typed Datasets.
 *
 * The IMAGE leg is a REAL codec: [[decodeImages]] decodes PNG/BMP/GIF
 * payloads with `javax.imageio` (JDK-public, deterministic for lossless
 * formats) into true dimensions, exact integer channel sums, and a
 * grid-mean-luminance embedding. Audio/video remain DETERMINISTIC STUBS
 * (this container has no media libraries) — each stub documents the real
 * library call it stands in for. Everything Spark-side is real: schema,
 * encoders, partition-sized batching, explode shapes, and the feature
 * vectors flow straight into `Similarity` (ANN) and `Dedup` (embedding
 * near-dup).
 */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int, duration_ms: Long)
  case class Blob(media_id: Long, meta: MediaMeta, payload: Array[Byte])
  case class Features(media_id: Long, features: Array[Float])
  case class Frame(media_id: Long, frame_idx: Int, frame_payload: Array[Byte])
  /** Real decode output: true dimensions/components, exact per-channel
    * integer pixel sums (orderless — safe to oracle-check), and a
    * grid×grid mean-luminance embedding for the ANN/dedup stages. */
  case class ImageInfo(media_id: Long, width: Int, height: Int, channels: Int,
                       sum_r: Long, sum_g: Long, sum_b: Long, features: Array[Float])

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

  /** REAL image decode+embed, one partition at a time. `javax.imageio`
    * reads PNG/BMP/GIF (lossless -> bit-exact pixels); each image yields
    * its true width/height/component-count, exact integer channel sums,
    * and a `grid`×`grid` box-averaged luminance embedding (row-major).
    * Undecodable payloads drop (flatMap) rather than poison the stage —
    * at 100 TB a corrupt object must cost one row, not a task retry loop. */
  def decodeImages(blobs: Dataset[Blob], grid: Int = 8): Dataset[ImageInfo] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // ImageIO's plugin registry is JVM-global (initialized once); the
      // per-partition shape still matters for codecs with per-batch state
      it.flatMap { b =>
        try {
          // payloads are already in memory: a MemoryCacheImageInputStream
          // avoids the default disk-backed cache's per-row tmpdir
          // create/write/delete WITHOUT flipping ImageIO's JVM-global
          // useCache flag for unrelated code in the executor
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(b.payload))
          // this JDK's ImageIO.read(ImageInputStream) closes the stream
          // itself; the defensive close tolerates the double-close
          val img = try javax.imageio.ImageIO.read(iis)
            finally { try iis.close() catch { case _: java.io.IOException => () } }
          if (img == null) None
          else {
            val w = img.getWidth
            val h = img.getHeight
            var sr = 0L; var sg = 0L; var sb = 0L
            val cells = new Array[Double](grid * grid)
            val cnt = new Array[Long](grid * grid)
            var y = 0
            while (y < h) {
              val cy = y * grid / h
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val r = (rgb >> 16) & 0xFF
                val g = (rgb >> 8) & 0xFF
                val bl = rgb & 0xFF
                sr += r; sg += g; sb += bl
                val ci = cy * grid + x * grid / w
                cells(ci) += (0.299 * r + 0.587 * g + 0.114 * bl) / 255.0
                cnt(ci) += 1
                x += 1
              }
              y += 1
            }
            val feat = new Array[Float](grid * grid)
            var i = 0
            while (i < feat.length) {
              feat(i) = if (cnt(i) > 0) (cells(i) / cnt(i)).toFloat else 0f
              i += 1
            }
            Some(ImageInfo(b.media_id, w, h, img.getColorModel.getNumComponents,
              sr, sg, sb, feat))
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    }
  }

  /** Deterministic PNG fixture: pixel (x,y) of image `id` is
    * rgb((id+3x+5y)%256, (2id+7x+11y)%256, (3id+9x+11y)%256) — distinct
    * per-channel/per-axis coefficients, so any coordinate flip or channel
    * swap in a decoder changes the channel sums. */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id + 3 * x + 5 * y) % 256).toInt
        val g = ((2 * id + 7 * x + 11 * y) % 256).toInt
        val b = ((3 * id + 9 * x + 11 * y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
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
