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

  test("real image codec: PNG round trip recovers exact pixels, " +
      "histogram feature normalized, JPEG also decodes") {
    val images = Multimodal.imagesFromDocuments(spark, sf)
    val metas = Multimodal.decodeImages(images).collect()
    assert(metas.nonEmpty)
    metas.foreach { m =>
      val (w, h) = ((4 + m.media_id % 13).toInt, (3 + m.media_id % 7).toInt)
      assert(m.width == w && m.height == h, s"dims wrong for ${m.media_id}")
      // exact pixel sum from the generation formula — PNG is lossless
      var expect = 0L
      for (y <- 0 until h; x <- 0 until w)
        expect += (31 * m.media_id + 7 * x + 13 * y) % 256
      assert(m.sum_lum == expect, s"pixel sum wrong for ${m.media_id}")
      assert(math.abs(m.feature.sum - 1.0f) < 1e-5,
        "histogram feature must normalize to 1")
      assert(m.n_bytes > 0)
    }
    // the same raster decodes through the JPEG path too (lossy — only
    // dimensions are contract)
    val jpeg = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(
          images.head().payload))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bos.toByteArray))
    }
    assert(jpeg != null && jpeg.getWidth > 0)
  }

  test("real image resize: longest side bounded, aspect floor-scaled, " +
      "output re-decodes") {
    val out = Multimodal.resizeImages(
      Multimodal.imagesFromDocuments(spark, sf), maxDim = 8).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = ((4 + id % 13).toInt, (3 + id % 7).toInt)
      val mx = math.max(w, h)
      val (ew, eh) =
        if (mx <= 8) (w, h)
        else (math.max(1, w * 8 / mx), math.max(1, h * 8 / mx))
      assert(r.getInt(1) == ew && r.getInt(2) == eh,
        s"resize dims wrong for $id: ${r.getInt(1)}x${r.getInt(2)}")
      assert(math.max(r.getInt(1), r.getInt(2)) <= 8)
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](3)))
      assert(back.getWidth == r.getInt(1) && back.getHeight == r.getInt(2))
    }
  }
}
