package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque binary columns
  * with typed metadata, decoded / feature-extracted via per-partition
  * batch processing.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC STUB (clearly marked below) — what is real and tested is
  * the Spark plumbing: binary schema, mapPartitions batch shape,
  * per-partition decoder initialization (the expensive part on a real
  * cluster), feature schema, and downstream aggregations. Swapping the
  * stub for a JNI/codec call changes no plan shape.
  *
  * Scale: decode runs per-partition with one decoder instance per
  * partition (not per row); binary payloads never shuffle — features are
  * extracted first and only the (id, features) projection moves.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int,
      feature: Array[Float])

  /** STUB decoder: derives deterministic pseudo-metadata from the payload
    * bytes. A real implementation would decode image dimensions / audio
    * duration / video frames here; everything around it is production
    * plumbing. */
  private[operators] def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
    val h = payload.foldLeft(17L)((acc, b) => acc * 31 + (b & 0xff))
    def pick(lo: Int, hi: Int, salt: Int): Int =
      lo + (((h >>> salt) & 0x7fffffff) % (hi - lo)).toInt
    kind match {
      case "image" => (pick(64, 4096, 3), pick(64, 4096, 7), 1)
      case "video" => (pick(64, 1920, 3), pick(64, 1080, 7), pick(1, 300, 11))
      case _       => (0, 0, pick(1, 1000, 5)) // audio: frames = samples/1k
    }
  }

  /** STUB feature extractor: 8-dim float embedding from byte n-grams —
    * stands in for a vision/audio model forward pass. */
  private[operators] def featurizeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      out(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    val n = math.max(payload.length / 8, 1)
    out.map(_ / n)
  }

  /** The real plumbing: Dataset[MediaRow] → Dataset[MediaFeatures] via
    * mapPartitions with per-partition decoder setup. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens HERE (decoder/model load on a real cluster)
      rows.map { r =>
        val (w, h, frames) = decodeStub(r.kind, r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length, w, h, frames,
          featurizeStub(r.payload))
      }
    }
  }

  /** Frame sampling plumbing: one row per sampled frame index
    * (video → every `stride`-th frame), schema-preserving flatMap. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val (_, _, frames) = decodeStub(r.kind, r.payload)
      (0 until frames by stride).map(i => (r.media_id, r.kind, i))
    }.toDF("media_id", "kind", "frame_index")
  }

  /** documents.text reinterpreted as binary payloads — exercises the
    * binary column path end-to-end on the driver's tables. */
  def mediaFromDocuments(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    T.documents(s, dir)
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** Binary plumbing stats — oracle-checkable because byte length and
    * kind assignment are engine-independent. */
  val m01 = Q("m01_media_stats",
    """SELECT CASE cast(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      |            WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |  count(*) AS n, cast(sum(length(text)) AS BIGINT) AS total_bytes
      |FROM documents GROUP BY 1 ORDER BY kind""".stripMargin) { (s, dir) =>
    import s.implicits._
    extractFeatures(mediaFromDocuments(s, dir)).toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n"), sum(col("n_bytes")).as("total_bytes"))
      .orderBy("kind")
  }

  /** Decoded metadata + features (stub-deterministic → rows-only check;
    * determinism pinned by MultimodalSpec). */
  val m02 = Q.noOracle("m02_media_features") { (s, dir) =>
    extractFeatures(mediaFromDocuments(s, dir)).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"), col("width"),
        col("height"), col("n_frames"), round(element_at(col("feature"), 1), 6)
          .as("f0"))
      .orderBy("media_id")
  }

  /** Frame sampling fan-out. */
  val m03 = Q.noOracle("m03_frame_sample") { (s, dir) =>
    sampleFrames(mediaFromDocuments(s, dir).filter(col("kind") === "video"), 30)
      .orderBy("media_id", "frame_index")
  }

  val all: Seq[Q] = Seq(m01, m02, m03)
}
