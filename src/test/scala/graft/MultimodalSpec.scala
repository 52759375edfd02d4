package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaFromDocuments(spark, sf)

  test("feature extraction is deterministic and schema-complete") {
    val a = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(a.map(_.media_id).sameElements(b.map(_.media_id)))
    assert(a.zip(b).forall { case (x, y) =>
      x.width == y.width && x.height == y.height &&
        x.feature.sameElements(y.feature) })
    assert(a.forall(_.feature.length == 8))
    assert(a.forall(f => f.n_bytes > 0))
  }

  test("decode stub respects kind-specific metadata shapes") {
    val rows = Multimodal.extractFeatures(media).collect()
    val images = rows.filter(_.kind == "image")
    val audio = rows.filter(_.kind == "audio")
    val video = rows.filter(_.kind == "video")
    assert(images.nonEmpty && audio.nonEmpty && video.nonEmpty)
    assert(images.forall(f => f.width >= 64 && f.n_frames == 1))
    assert(audio.forall(f => f.width == 0 && f.n_frames >= 1))
    assert(video.forall(f => f.n_frames >= 1))
  }

  test("frame sampling fans out one row per sampled frame") {
    val videos = media.filter(col("kind") === "video")
    val sampled = Multimodal.sampleFrames(videos, 30)
    val counts = sampled.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Multimodal.extractFeatures(videos).collect()
      .map(f => f.media_id -> ((f.n_frames + 29) / 30).toLong).toMap
    assert(counts == expected)
  }
}
