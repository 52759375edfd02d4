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

  test("real video container: RIFF round trip, idx1-driven selective " +
      "decode, JPEG frames near the generated raster") {
    import graft.functions.Riff
    // hand-built container round trip
    val frames = (0 until 5).map { f =>
      val img = new java.awt.image.BufferedImage(6, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 6) {
        val g = (40 * f + 10) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val avi = Riff.writeAvi(frames, 6, 4)
    val refs = Riff.frameIndex(avi)
    assert(refs.size == 5)
    assert(refs.map(_.index) == (0 until 5))
    refs.zipWithIndex.foreach { case (ref, f) =>
      val img = Riff.decodeFrame(avi, ref)
      assert(img.getWidth == 6 && img.getHeight == 4)
      // flat gray frame: JPEG reproduces it closely
      val got = img.getRGB(3, 2) & 0xff
      assert(math.abs(got - ((40 * f + 10) % 256)) <= 8,
        s"frame $f pixel drifted: $got")
    }
    // the generic walker also works WITHOUT the idx1 index (movi scan)
    val idxAt = {
      val cs = Riff.chunks(avi)
      cs.collectFirst { case ("idx1", p, _) => p }.get
    }
    val noIdx = avi.clone()
    // corrupt the idx1 fourcc so the reader falls back to the movi scan
    System.arraycopy("JUNK".getBytes("US-ASCII"), 0, noIdx, idxAt - 8, 4)
    val refs2 = Riff.frameIndex(noIdx)
    assert(refs2.map(r => (r.offset, r.size)) ==
      refs.map(r => (r.offset, r.size)),
      "movi-scan fallback must find the same frames as idx1")

    // the Spark operator end-to-end on the fixture corpus
    val out = Multimodal.sampleVideoFrames(
      Multimodal.videosFromDocuments(spark, sf), 3).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(2) == (4 + id % 13).toInt &&
        r.getInt(3) == (3 + id % 7).toInt)
      assert(r.getLong(1) % 3 == 0)
      assert(r.getLong(1) < 1 + id % 12)
    }
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
  test("perceptual-hash near-dup: banded pairs equal brute-force Hamming; " +
      "star contraction bounds a saturated bucket") {
    import org.apache.spark.sql.functions._
    val hashes = Multimodal.perceptualHash(
      Multimodal.imagesFromDocuments(spark, sf)).toDF().cache()
    val hs = hashes.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // decoded-pixel hash is deterministic across decodes
    val again = Multimodal.perceptualHash(
      Multimodal.imagesFromDocuments(spark, sf)).toDF().collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(hs.toSet == again.toSet)
    val got = Multimodal.imageNearDupPairs(hashes, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exp = (for {
      a <- hs; b <- hs
      if a._1 < b._1 && a._2 == b._2 && a._3 == b._3
      ham = java.lang.Long.bitCount(a._4 ^ b._4)
      if ham <= 2
    } yield (a._1, b._1, ham)).toSet
    assert(got == exp, "banding must be exact for Hamming <= 2 (pigeonhole)")
    assert(exp.nonEmpty, "fixture must contain perceptual near-dups")
    // a cap below the largest bucket still returns a connected subset:
    // every kept pair is real, and each contracted bucket keeps its
    // representative's pairs (the no-silent-caps star contract)
    val capped = Multimodal.imageNearDupPairs(hashes, maxHamming = 2,
        bucketCap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(capped.subsetOf(exp), "capped output must stay a subset")
    hashes.unpersist()
    ()
  }
  test("multimodal clusters honor both pair relations and actually merge " +
      "across modalities") {
    import org.apache.spark.sql.functions._
    val canon = Multimodal.multimodalClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // full J >= 0.3 listing (the d13 report's underlying relation)
    val textPairs = graft.operators.Dedup.exactJaccardPairs(spark,
        graft.operators.Dedup.shingled(spark, sf), 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val imgPairs = Multimodal.imageNearDupPairs(
        Multimodal.perceptualHash(
          Multimodal.imagesFromDocuments(spark, sf)).toDF(), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val audioPairs = Multimodal.audioNearDupPairs(
        Multimodal.audioFingerprint(
          Multimodal.audioGroupsFromDocuments(spark, sf)).toDF(), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    (textPairs ++ imgPairs ++ audioPairs).foreach { case (a, b) =>
      assert(canon(a) == canon(b), s"pair ($a, $b) split across clusters")
    }
    assert(audioPairs.nonEmpty, "audio arm should contribute pairs")
    // cross-modality merge: some text-only pair and image-only pair must
    // share a cluster through a common member, or the composite adds
    // nothing over running the two relations separately
    def components(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    val merged = components(textPairs ++ imgPairs)
    val textOnly = components(textPairs)
    val mergedGroups = merged.values.toSet.size
    assert(canon.nonEmpty && textPairs.nonEmpty && imgPairs.nonEmpty)
    assert(mergedGroups < textOnly.values.toSet.size + components(imgPairs).values.toSet.size,
      "union of relations must merge at least one group across modalities")
  }

  test("audio fingerprint near-dup: real-decode fingerprints recompute " +
      "from the generation formula; banded pairs equal brute force") {
    import org.apache.spark.sql.functions._
    val fps = Multimodal.audioFingerprint(
      Multimodal.audioGroupsFromDocuments(spark, sf)).toDF().cache()
    val got = fps.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // Scala-side recompute straight from the fixture formula — no codec
    val exp = got.map { case (id, _, _) =>
      val g = id - id % 3
      val m = id % 3
      val n = (100 + g % 50).toInt
      val s = (0 until n).map(i =>
        ((13 * g + 7 * i + (if (i % 17 == 0) 97L * m else 0L)) % 65536)
          - 32768)
      val tot = s.sum
      val ws = new Array[Long](64); val wn = new Array[Long](64)
      s.zipWithIndex.foreach { case (v, i) =>
        val k = i * 64 / n; ws(k) += v; wn(k) += 1 }
      var bits = 0L
      (0 until 64).foreach(k =>
        if (ws(k) * n > tot * wn(k)) bits |= (1L << k))
      (id, n, bits)
    }
    assert(got.toSet == exp.toSet,
      "decoded fingerprints must equal the formula recompute")
    val pairs = Multimodal.audioNearDupPairs(fps, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      a <- got; b <- got
      if a._1 < b._1 && a._2 == b._2
      ham = java.lang.Long.bitCount(a._3 ^ b._3)
      if ham <= 2
    } yield (a._1, b._1, ham)).toSet
    assert(pairs == brute, "banding must be exact for Hamming <= 2")
    assert(brute.nonEmpty, "fixture must plant audio near-dups")
    assert(brute.exists(_._3 > 0),
      "perturbed group members should produce nonzero Hamming pairs")
    fps.unpersist()
    ()
  }

  test("image and video near-dup reports: lossless contraction — stars " +
      "+ rep pairs + counts reconstruct the full pair listing exactly " +
      "(the audio pin, applied to both gridNearDupReport consumers)") {
    for ((label, fps) <- Seq(
        "image" -> Multimodal.phashSilver(spark, sf),
        "video" -> Multimodal.videoFpSilver(spark, sf))) {
      val cached = fps.cache()
      val report = Multimodal.gridNearDupReport(cached, maxHamming = 2)
        .collect().map { r =>
          (r.getString(0), r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            if (r.isNullAt(3)) None else Some(r.getInt(3)),
            if (r.isNullAt(4)) None else Some(r.getLong(4)))
        }
      val full = Multimodal.imageNearDupPairs(cached, maxHamming = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val members = scala.collection.mutable.Map[Long, Set[Long]]()
        .withDefault(r => Set(r))
      report.collect { case ("star", rep, Some(m), Some(0), None) =>
        members(rep) = members(rep) + rep + m
      }
      val within = members.values.flatMap { ms =>
        val s = ms.toSeq.sorted
        for (i <- s.indices; j <- (i + 1) until s.size) yield (s(i), s(j), 0)
      }.toSet
      val cross = report.collect {
        case ("near", a, Some(b), Some(h), Some(np)) =>
          val pairs = for (x <- members(a); y <- members(b))
            yield (math.min(x, y), math.max(x, y), h)
          assert(pairs.size.toLong == np,
            s"$label near row ($a,$b) n_pairs=$np expands to ${pairs.size}")
          pairs
      }.flatten.toSet
      assert(within.union(cross) == full,
        s"$label report reconstruction must equal the full pair listing")
      assert(report.exists(_._1 == "star") && full.nonEmpty,
        s"$label fixture must exercise the contraction")
      cached.unpersist()
    }
  }

  test("audio near-dup report: lossless contraction — stars + rep pairs " +
      "+ counts reconstruct the full pair listing exactly") {
    val fps = Multimodal.audioFingerprint(
      Multimodal.audioGroupsFromDocuments(spark, sf)).toDF().cache()
    val report = Multimodal.audioNearDupReport(fps, maxHamming = 2)
      .collect().map { r =>
        (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getInt(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))
      }
    val full = Multimodal.audioNearDupPairs(fps, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // class membership from the star rows: rep -> all members (incl rep)
    val members = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefault(r => Set(r))
    report.collect { case ("star", rep, Some(m), Some(0), None) =>
      members(rep) = members(rep) + rep + m
    }
    // reconstruct: within-class pairs are Hamming 0; each 'near' row
    // expands to all cross-class member pairs at the reps' Hamming
    val within = members.values.flatMap { ms =>
      val s = ms.toSeq.sorted
      for (i <- s.indices; j <- (i + 1) until s.size) yield (s(i), s(j), 0)
    }.toSet
    val cross = report.collect {
      case ("near", a, Some(b), Some(h), Some(np)) =>
        val pairs = for (x <- members(a); y <- members(b))
          yield (math.min(x, y), math.max(x, y), h)
        assert(pairs.size.toLong == np,
          s"near row ($a,$b) n_pairs=$np but expands to ${pairs.size}")
        pairs
    }.flatten.toSet
    assert(within.union(cross) == full,
      "report reconstruction must equal the full pair listing")
    // per-class counts: C(sz, 2), and the report's total pair ledger
    // equals the full listing's cardinality without materializing it
    val classCounts = report.collect {
      case ("class", rep, None, None, Some(np)) => rep -> np
    }.toMap
    classCounts.foreach { case (rep, np) =>
      val sz = members(rep).size.toLong
      assert(np == sz * (sz - 1) / 2, s"class $rep count off: $np vs $sz")
    }
    val ledger = report.flatMap(_._5).sum
    assert(ledger == full.size.toLong,
      s"sum(n_pairs)=$ledger must equal full listing ${full.size}")
    // wherever exact-fp classes exist the contraction is strictly
    // smaller: a class of sz contributes sz-1 star rows for C(sz,2) pairs
    val dupClassSizes = members.values.map(_.size).filter(_ > 2)
    dupClassSizes.foreach { sz =>
      assert(sz - 1 < sz * (sz - 1) / 2, s"contraction not smaller at $sz")
    }
    fps.unpersist()
    ()
  }

  test("video fingerprint: selective-decode fingerprints recompute from " +
      "the generation formula; banded pairs equal brute force") {
    val fps = Multimodal.videoFingerprint(
      Multimodal.videoGroupsFromDocuments(spark, sf), stride = 2)
      .toDF().cache()
    val got = fps.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // Scala-side recompute straight from the fixture formula — no
    // container, no codec: any corruption in the RIFF walk, the PNG
    // round trip, the stride sampling, or the pooling breaks this
    val exp = got.map { case (id, _, _, _) =>
      val g = id - id % 3
      val m = id % 3
      val w = (4 + g % 13).toInt; val h = (3 + g % 7).toInt
      val nf = (1 + g % 12).toInt
      val gw = math.min(8, w); val gh = math.min(8, h)
      val bs = Array.ofDim[Long](gh, gw)
      val bn = Array.ofDim[Long](gh, gw)
      var tot = 0L
      for (f <- 0 until nf by 2; y <- 0 until h; x <- 0 until w) {
        val bump = if ((x + y + f) % 23 == 0) 101L * m else 0L
        val lum = (31 * g + 7 * x + 13 * y + 17 * f + bump) % 256
        bs(y * gh / h)(x * gw / w) += lum
        bn(y * gh / h)(x * gw / w) += 1
        tot += lum
      }
      val n = w.toLong * h * ((nf + 1) / 2)
      var bits = 0L
      for (j <- 0 until gh; i <- 0 until gw)
        if (bs(j)(i) * n > tot * bn(j)(i)) bits |= (1L << (j * gw + i))
      (id, gw, gh, bits)
    }
    assert(got.toSet == exp.toSet,
      "decoded video fingerprints must equal the formula recompute")
    val pairs = Multimodal.imageNearDupPairs(fps, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      a <- got; b <- got
      if a._1 < b._1 && a._2 == b._2 && a._3 == b._3
      ham = java.lang.Long.bitCount(a._4 ^ b._4)
      if ham <= 2
    } yield (a._1, b._1, ham)).toSet
    assert(pairs == brute, "banding must be exact for Hamming <= 2")
    assert(brute.nonEmpty, "fixture must plant video near-dups")
    assert(brute.exists(_._3 > 0),
      "perturbed group members should produce nonzero Hamming pairs")
    fps.unpersist()
    ()
  }

  test("m09 contracted cluster report reconstructs the full doc-level " +
      "listing exactly, with a consistent size ledger (r15 verdict " +
      "item 2)") {
    val report = Multimodal.multimodalClusterReport(spark, sf).collect()
    val full = Multimodal.multimodalClusters(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val assign = report.filter(_.getString(0) == "assign")
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    val stars = report.filter(_.getString(0) == "star")
      .map(r => (r.getLong(1), r.getLong(2)))
    // reconstruction: reps carry their own assignment; members inherit
    // their signature rep's canonical
    val rec = assign.toSet.map((kv: (Long, Long)) => (kv._1, kv._2)) ++
      stars.map { case (rep, member) => (member, assign(rep)) }
    assert(rec == full,
      s"report must reconstruct the listing (rec ${rec.size}, " +
        s"full ${full.size})")
    // size ledger: per-cluster n_docs sums class sizes, so Σ sizes ==
    // clustered docs == reconstruction cardinality
    val sizes = report.filter(_.getString(0) == "size")
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(sizes.values.sum == rec.size.toLong,
      "size rows must account for every clustered doc")
    // every canonical referenced by assign has a size row and vice versa
    assert(assign.values.toSet == sizes.keySet,
      "size rows must cover exactly the assign canonicals")
  }
}
