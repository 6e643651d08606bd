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
 * grid-mean-luminance embedding. The AUDIO leg is a REAL codec too:
 * [[decodeAudio]] reads WAV/PCM with `javax.sound.sampled` (JDK-public,
 * lossless) into true rate/channels/frame-count, exact integer per-channel
 * sample sums, and a fixed-bin energy embedding. VIDEO remains a
 * DETERMINISTIC STUB (no JDK-public video codec exists; the stub documents
 * the real library call it stands in for). Everything Spark-side is real:
 * schema, encoders, partition-sized batching, explode shapes, and the
 * feature vectors flow straight into `Similarity` (ANN) and `Dedup`
 * (embedding near-dup).
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

  /** Real decode output for audio: true format facts plus exact integer
    * per-channel sample sums (first two channels; orderless — safe to
    * oracle-check) and a `bins`-slot mean-amplitude energy embedding. */
  case class AudioInfo(media_id: Long, sample_rate: Int, channels: Int,
                       frames: Long, sum_c0: Long, sum_c1: Long,
                       features: Array[Float])

  /** REAL audio decode+embed, one partition at a time. `javax.sound.sampled`
    * reads WAV (RIFF) headers and PCM frames deterministically — the audio
    * analog of [[decodeImages]]: true sample rate / channel count / frame
    * count, EXACT integer sample sums for the first two channels, and a
    * `bins`-slot embedding (mean |amplitude|/fullScale per time bin, frames
    * split evenly). Handles PCM_SIGNED 16-bit (either endianness) and WAV's
    * 8-bit unsigned flavor; anything else — and any corrupt payload — drops
    * that ONE row (flatMap), never a task retry loop. */
  def decodeAudio(blobs: Dataset[Blob], bins: Int = 16): Dataset[AudioInfo] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.flatMap { b =>
        try {
          // ByteArrayInputStream supports mark/reset, so the format sniffing
          // AudioSystem does never touches disk
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(b.payload))
          try {
            val f = ais.getFormat
            val enc = f.getEncoding
            val bits = f.getSampleSizeInBits
            val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
            // 16-bit must be signed (the WAV norm); 8-bit is signed or
            // WAV's unsigned flavor — anything else is not plain PCM
            if (!((bits == 16 && signed) || (bits == 8 && (signed || unsigned)))) None
            else {
              val ch = f.getChannels
              val bytesPer = bits / 8
              val out = new java.io.ByteArrayOutputStream()
              val buf = new Array[Byte](8192)
              var r = ais.read(buf)
              while (r > 0) { out.write(buf, 0, r); r = ais.read(buf) }
              val data = out.toByteArray
              val frameSize = ch * bytesPer
              val frames = data.length / frameSize
              if (frames == 0) None
              else {
                val big = f.isBigEndian
                val full = if (bits == 16) 32768.0 else 128.0
                def sample(off: Int): Int =
                  if (bits == 16) {
                    val lo = data(if (big) off + 1 else off) & 0xFF
                    val hi = data(if (big) off else off + 1).toInt
                    (hi << 8) | lo
                  } else if (signed) data(off).toInt
                  else (data(off) & 0xFF) - 128 // WAV 8-bit is unsigned
                var s0 = 0L; var s1 = 0L
                val energy = new Array[Double](bins)
                val cnt = new Array[Long](bins)
                var i = 0
                while (i < frames) {
                  val bin = (i.toLong * bins / frames).toInt
                  var amp = 0.0
                  var c = 0
                  while (c < ch) {
                    val v = sample((i * ch + c) * bytesPer)
                    if (c == 0) s0 += v else if (c == 1) s1 += v
                    amp += math.abs(v) / full
                    c += 1
                  }
                  energy(bin) += amp / ch
                  cnt(bin) += 1
                  i += 1
                }
                val feat = new Array[Float](bins)
                var j = 0
                while (j < bins) {
                  feat(j) = if (cnt(j) > 0) (energy(j) / cnt(j)).toFloat else 0f
                  j += 1
                }
                Some(AudioInfo(b.media_id, math.round(f.getSampleRate), ch,
                  frames.toLong, s0, s1, feat))
              }
            }
          } finally ais.close()
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    }
  }

  /** Deterministic WAV fixture: PCM16 little-endian, sample i of channel c
    * is (id + 3i + 7c) — distinct per-axis/per-channel coefficients that
    * never clip at fixture sizes, so a frame skip, channel swap, or
    * byte-order mistake in a decoder changes a sum. */
  def syntheticWav(id: Long, frames: Int, channels: Int, sampleRate: Int): Array[Byte] = {
    require(id + 3L * (frames - 1) + 7L * (channels - 1) <= Short.MaxValue,
      s"fixture would clip: id=$id frames=$frames channels=$channels peaks past " +
        "Int16 — the closed-form sum oracle only holds without wrap")
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, false)
    val pcm = new Array[Byte](frames * channels * 2)
    var i = 0
    while (i < frames) {
      var c = 0
      while (c < channels) {
        val v = (id + 3L * i + 7L * c).toInt
        val off = (i * channels + c) * 2
        pcm(off) = (v & 0xFF).toByte
        pcm(off + 1) = ((v >> 8) & 0xFF).toByte
        c += 1
      }
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Amplitude of bin `b` in id's pattern fixture: `256*(4+(31*id+17*b) mod 64)`.
    * Always a multiple of 256 and < 2^15, so `amp/32768` is exactly
    * representable in Float32 — the whole decode→embed→cosine path stays
    * in exact dyadic arithmetic (see [[syntheticWavPattern]]). */
  def patternAmp(id: Long, b: Int): Int = {
    // signed % would return a NEGATIVE amplitude for id < 0 and silently
    // break the exact decode contract (decodeAudio takes |sample|)
    require(id >= 0 && b >= 0, s"patternAmp needs non-negative id/b: $id/$b")
    256 * (4 + ((31 * id + 17 * b) % 64)).toInt
  }

  /** Deterministic WAV fixture for the END-TO-END multimodal→ANN oracle:
    * mono PCM16, `frames` split into `bins` equal segments (`frames` must
    * be a multiple of `bins` so fixture segments align exactly with
    * [[decodeAudio]]'s `i*bins/frames` binning); every sample of segment
    * `b` holds the constant [[patternAmp]] value. decodeAudio's energy
    * embedding then recovers bin b as EXACTLY `patternAmp(id,b)/32768`:
    * each per-frame term is `amp/2^15` (dyadic, exact in double), the
    * per-bin sum is `cnt*amp/2^15` (< 2^21, exact), the `/cnt` division
    * has a representable true quotient (exact), and the Float32 cast is
    * value-preserving. A cosine over these embeddings is exact dyadic
    * arithmetic until the final sqrt/divide — so DuckDB can replay ANN
    * SCORES bit-identically from the closed form. */
  def syntheticWavPattern(id: Long, frames: Int, bins: Int, sampleRate: Int): Array[Byte] = {
    require(frames % bins == 0, s"frames=$frames must be a multiple of bins=$bins " +
      "so fixture segments align with decodeAudio's binning")
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val v = patternAmp(id, (i.toLong * bins / frames).toInt)
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
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
