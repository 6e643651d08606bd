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
}
