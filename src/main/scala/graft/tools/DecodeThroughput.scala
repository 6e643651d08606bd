package graft.tools

import graft.ops.Multimodal

import org.apache.spark.sql.SparkSession

/**
 * Media-codec throughput at realistic payload sizes — the per-core rows/s
 * number that says whether decodeImages/decodeAudio are viable as a 100 TB
 * mapPartitions stage (decode is embarrassingly parallel per row, so
 * per-core throughput IS the scaling law; only a catastrophically slow
 * codec would make the stage cluster-bound).
 *
 *  - images: 256x256 RGB PNGs (synthetic gradient, ~real photo dimensions
 *    for thumbnail/vision-embedding pipelines)
 *  - audio: 0.5 s of 16 kHz stereo PCM16 WAV (~32 KB, an ASR-chunk shape)
 *
 * Usage: runMain graft.tools.DecodeThroughput [rowsPerKind] [cores]
 */
object DecodeThroughput {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000)
    val cores = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName("graft-decode-throughput")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def run(tag: String, count: () => Long): Unit = {
      count() // warm: codegen + codec plugin registry init
      val t0 = System.nanoTime()
      val c = count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[decode] $tag%-6s rows=$c%6d wall=$sec%6.2f s " +
        f"rows/s=${c / sec}%8.0f rows/s/core=${c / sec / cores}%7.0f")
    }

    val imgBlobs = spark.range(n).as[Long].mapPartitions(_.map { id =>
      Multimodal.Blob(id, Multimodal.MediaMeta("png", 256, 256, 0L),
        Multimodal.syntheticPng(id, 256, 256))
    }).cache()
    println(s"[decode] image payload bytes: ${imgBlobs.head().payload.length}")
    run("image", () => Multimodal.decodeImages(imgBlobs, grid = 8).count())

    // id % 100 + 8000 frames keeps the ramp inside Int16 (syntheticWav
    // enforces the no-clip invariant its sum oracle depends on)
    val wavBlobs = spark.range(n).as[Long].mapPartitions(_.map { id =>
      Multimodal.Blob(id, Multimodal.MediaMeta("wav", 0, 0, 500L),
        Multimodal.syntheticWav(id % 100, frames = 8000, channels = 2,
          sampleRate = 16000))
    }).cache()
    println(s"[decode] audio payload bytes: ${wavBlobs.head().payload.length}")
    run("audio", () => Multimodal.decodeAudio(wavBlobs, bins = 16).count())

    spark.stop()
  }
}
