package graft

import graft.ops.{Multimodal, Similarity}

import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val blobs = Multimodal.toBlobs(
    Seq((1L, "some media payload bytes here"), (2L, "other payload"), (3L, "some media payload bytes here"))
      .toDF("id", "data").withColumn("data", col("data").cast("binary")),
    "id", "data", "image/stub")

  test("blob schema carries typed metadata + binary payload") {
    val b = blobs.collect()
    assert(b.length == 3)
    assert(b.head.meta.format == "image/stub" && b.head.meta.duration_ms > 0)
  }

  test("feature extraction is deterministic and flows into ANN search") {
    val feats = Multimodal.extractFeatures(blobs, dim = 16)
    val rows = feats.collect()
    assert(rows.forall(_.features.length == 16))
    // identical payloads -> identical features
    val byId = rows.map(f => f.media_id -> f.features.toSeq).toMap
    assert(byId(1L) == byId(3L) && byId(1L) != byId(2L))
    // features work as embeddings downstream
    val top = Similarity.bruteTopK(feats.toDF(), col("features"), col("media_id"),
      byId(1L).map(_.toFloat).toArray, 2).select("vec_id").as[Long].collect().toSet
    assert(top == Set(1L, 3L))
  }

  test("frame sampling explodes video payloads deterministically") {
    val frames = Multimodal.sampleFrames(blobs, stride = 2).collect()
    assert(frames.nonEmpty)
    // frame indices are unique per media and the sample is repeatable
    frames.groupBy(_.media_id).foreach { case (_, fs) =>
      assert(fs.map(_.frame_idx).distinct.length == fs.length)
    }
    val again = Multimodal.sampleFrames(blobs, stride = 2).collect()
    assert(again.map(f => (f.media_id, f.frame_idx, f.frame_payload.toSeq)).toSet ==
      frames.map(f => (f.media_id, f.frame_idx, f.frame_payload.toSeq)).toSet)
  }

  test("resize rewrites metadata only") {
    val r = Multimodal.resizeMeta(blobs, 64, 64).collect()
    assert(r.forall(b => b.meta.width == 64 && b.meta.height == 64))
    assert(r.map(_.payload.toSeq).toSet == blobs.collect().map(_.payload.toSeq).toSet)
  }

  // ---- REAL image codec (javax.imageio) ----

  /** In-test PNG with hand-set pixels (row-major List of packed RGB). */
  private def png(w: Int, h: Int, rgb: Seq[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(y * w + x))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImages: true dimensions, exact channel sums, hand-computed grid means") {
    // 4x2: left half pure red (255,0,0), right half mid gray (100,100,100)
    val pixels = Seq(0xFF0000, 0xFF0000, 0x646464, 0x646464,
                     0xFF0000, 0xFF0000, 0x646464, 0x646464)
    val ds = Seq(Multimodal.Blob(7L, Multimodal.MediaMeta("png", 4, 2, 0L),
      png(4, 2, pixels))).toDS()
    val out = Multimodal.decodeImages(ds, grid = 2).collect()
    assert(out.length == 1)
    val i = out.head
    assert(i.width == 4 && i.height == 2 && i.channels == 3)
    assert(i.sum_r == 4 * 255 + 4 * 100)
    assert(i.sum_g == 4 * 100 && i.sum_b == 4 * 100)
    // grid=2 over 4x2: each cell is a uniform 2x1 block -> closed-form lum
    val lumRed = (0.299 * 255) / 255.0
    val lumGray = (0.299 * 100 + 0.587 * 100 + 0.114 * 100) / 255.0
    assert(math.abs(i.features(0) - lumRed) < 1e-6)   // top-left
    assert(math.abs(i.features(1) - lumGray) < 1e-6)  // top-right
    assert(math.abs(i.features(2) - lumRed) < 1e-6)   // bottom-left
    assert(math.abs(i.features(3) - lumGray) < 1e-6)  // bottom-right
  }

  test("decodeImages: BMP decodes too; undecodable payloads drop, not fail") {
    val img = new java.awt.image.BufferedImage(3, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 3) img.setRGB(x, y, 0x0A141E) // (10,20,30)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val ds = Seq(
      Multimodal.Blob(1L, Multimodal.MediaMeta("bmp", 3, 3, 0L), bos.toByteArray),
      Multimodal.Blob(2L, Multimodal.MediaMeta("png", 0, 0, 0L),
        "not an image at all".getBytes)).toDS()
    val out = Multimodal.decodeImages(ds, grid = 2).collect()
    assert(out.map(_.media_id).toSeq == Seq(1L)) // corrupt row dropped
    assert(out.head.sum_r == 90 && out.head.sum_g == 180 && out.head.sum_b == 270)
  }

  test("decodeImages roundtrips syntheticPng exactly (the [C] query's contract)") {
    val ds = Seq(Multimodal.Blob(5L, Multimodal.MediaMeta("png", 10, 7, 0L),
      Multimodal.syntheticPng(5L, 10, 7))).toDS()
    val i = Multimodal.decodeImages(ds).head()
    val exp = for (y <- 0 until 7; x <- 0 until 10)
      yield ((5 + 3 * x + 5 * y) % 256, (10 + 7 * x + 11 * y) % 256,
             (15 + 9 * x + 11 * y) % 256)
    assert(i.width == 10 && i.height == 7)
    assert(i.sum_r == exp.map(_._1).sum && i.sum_g == exp.map(_._2).sum &&
      i.sum_b == exp.map(_._3).sum)
    // decoded features feed ANN downstream exactly like the stub path
    assert(i.features.length == 64 && i.features.forall(f => f >= 0f && f <= 1f))
  }

  test("decodeAudio: true format facts, exact sample sums, hand-computed energy") {
    // stereo PCM16 ramp at 11025 Hz: sample i of channel c = 9 + 3i + 7c
    val frames = 100
    val ds = Seq(Multimodal.Blob(9L, Multimodal.MediaMeta("wav", 0, 0, 0L),
      Multimodal.syntheticWav(9L, frames, channels = 2, sampleRate = 11025))).toDS()
    val out = Multimodal.decodeAudio(ds, bins = 4).collect()
    assert(out.length == 1)
    val a = out.head
    assert(a.sample_rate == 11025 && a.channels == 2 && a.frames == frames.toLong)
    val exp0 = (0 until frames).map(i => 9L + 3 * i).sum
    assert(a.sum_c0 == exp0 && a.sum_c1 == exp0 + 7L * frames)
    // bins split 100 frames into 4×25; all samples positive -> closed form
    val expBins = (0 until 4).map { b =>
      val is = (b * 25) until ((b + 1) * 25)
      is.map(i => ((9.0 + 3 * i) + (16.0 + 3 * i)) / 2 / 32768.0).sum / 25
    }
    assert(a.features.length == 4)
    expBins.zipWithIndex.foreach { case (e, j) =>
      assert(math.abs(a.features(j) - e) < 1e-6, s"bin $j: ${a.features(j)} vs $e")
    }
  }

  test("decodeAudio: mono roundtrip matches the [C] query's closed form; corrupt drops") {
    val ds = Seq(
      Multimodal.Blob(3L, Multimodal.MediaMeta("wav", 0, 0, 0L),
        Multimodal.syntheticWav(3L, 251, channels = 1, sampleRate = 8000)),
      Multimodal.Blob(4L, Multimodal.MediaMeta("wav", 0, 0, 0L),
        "definitely not RIFF bytes".getBytes)).toDS()
    val out = Multimodal.decodeAudio(ds).collect()
    assert(out.map(_.media_id).toSeq == Seq(3L)) // corrupt row dropped, not failed
    val a = out.head
    assert(a.sample_rate == 8000 && a.channels == 1 && a.frames == 251L)
    assert(a.sum_c0 == (0 until 251).map(i => 3L + 3 * i).sum && a.sum_c1 == 0L)
    assert(a.features.length == 16 && a.features.forall(f => f >= 0f && f <= 1f))
    // energies feed ANN/dedup downstream like every other embedding
    assert(a.features.exists(_ > 0f))
  }

  test("syntheticWavPattern: exact dyadic embeddings; ANN scores replay bit-exactly " +
       "in the closed form (the multimodal_ann_top10 [C] contract)") {
    val ids = (0L until 25L).toSeq
    val blobs = ids.map(id => Multimodal.Blob(id, Multimodal.MediaMeta("wav", 0, 0, 0L),
      Multimodal.syntheticWavPattern(id, frames = 400, bins = 8, sampleRate = 16000))).toDS()
    val feats = Multimodal.decodeAudio(blobs, bins = 8)
    val byId = feats.collect().map(a => a.media_id -> a).toMap
    assert(byId.size == 25)
    // the embedding recovers the pattern EXACTLY — zero float rounding
    for (id <- ids; b <- 0 until 8)
      assert(byId(id).features(b) == Multimodal.patternAmp(id, b).toFloat / 32768f,
        s"id=$id bin=$b not exact")
    // closed-form double replica of the cosine — the same math the DuckDB
    // oracle runs; every sum is exact dyadic so association can't matter
    def vec(id: Long): Array[Double] =
      Array.tabulate(8)(b => Multimodal.patternAmp(id, b).toDouble / 32768)
    val qd = vec(0L)
    def cosd(e: Array[Double]): Double = {
      val d = (0 until 8).map(i => e(i) * qd(i)).sum
      d / (math.sqrt(e.map(x => x * x).sum) * math.sqrt(qd.map(x => x * x).sum))
    }
    val qf = Array.tabulate(8)(b => Multimodal.patternAmp(0L, b).toFloat / 32768f)
    val got = Similarity.bruteTopK(feats.toDF(), col("features"), col("media_id"), qf, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(t => (-t._2, t._1)).toSeq
    val want = ids.map(id => (id, cosd(vec(id)))).sortBy(t => (-t._2, t._1)).take(10)
    assert(got == want, "engine scores must equal the closed form BIT-exactly")
    // belt-and-braces: ranking margins dwarf any conceivable rounding skew
    val sorted = ids.map(id => cosd(vec(id))).sorted
    sorted.sliding(2).foreach { case Seq(a, b) => assert(b - a > 1e-6) ; case _ => () }
  }

  test("decodeAudio: 8-bit unsigned WAV and big-endian AIFF branches decode exactly") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def encode(pcm: Array[Byte], fmt: AudioFormat, frames: Int,
               t: AudioFileFormat.Type): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong), t, bos)
      bos.toByteArray
    }
    val n = 200
    // WAV stores 8-bit PCM UNSIGNED (value+128) — the third-party shape
    val pcm8 = Array.tabulate(n)(i => ((i % 100) + 128).toByte)
    val wav8 = encode(pcm8, new AudioFormat(8000f, 8, 1, false, false), n,
      AudioFileFormat.Type.WAVE)
    // AIFF stores PCM16 BIG-endian — the other byte-order branch
    val pcm16 = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = 5 + 3 * i
      pcm16(2 * i) = ((v >> 8) & 0xFF).toByte; pcm16(2 * i + 1) = (v & 0xFF).toByte
    }
    val aiff = encode(pcm16, new AudioFormat(8000f, 16, 1, true, true), n,
      AudioFileFormat.Type.AIFF)
    val out = Multimodal.decodeAudio(Seq(
        Multimodal.Blob(1L, Multimodal.MediaMeta("wav", 0, 0, 0L), wav8),
        Multimodal.Blob(2L, Multimodal.MediaMeta("aiff", 0, 0, 0L), aiff)).toDS(),
      bins = 4).collect().sortBy(_.media_id)
    assert(out.length == 2)
    assert(out(0).channels == 1 && out(0).frames == n.toLong &&
      out(0).sum_c0 == (0 until n).map(i => (i % 100).toLong).sum,
      s"8-bit unsigned WAV mis-decoded: ${out(0)}")
    assert(out(1).channels == 1 && out(1).frames == n.toLong &&
      out(1).sum_c0 == (0 until n).map(i => 5L + 3 * i).sum,
      s"big-endian AIFF mis-decoded: ${out(1)}")
  }
}
