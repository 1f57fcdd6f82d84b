package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Multimodal

/** Multimodal plumbing: schema, batch decode shape, determinism. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("feature extraction is deterministic and covers every blob") {
    val media = Multimodal.syntheticMedia(spark, sf)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() == media.count())
    val a = feats.orderBy("media_id").collect().toSeq
    val b = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, sf))
      .orderBy("media_id").collect().toSeq
    assert(a == b)
    assert(a.forall(f => f.n_bytes > 0 && f.mean_intensity >= 0.0 &&
                         f.mean_intensity <= 1.0 && f.n_frames >= 1))
  }

  test("modalities partition the corpus and aggregate cleanly") {
    val rows = Multimodal.qMultimodalFeatures(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(rows.map(_.getAs[Long]("n_blobs")).sum ==
      Tables.documents(spark, sf).count())
  }

  test("video decode reads real YCbCr planes: gradient Y4M, exact means") {
    // independent arithmetic: the test brute-forces the generator's
    // closed-form gradient; the decoder must reproduce it from bytes
    val (docId, w, h, n) = (5L, 8, 8, 3)
    val blob = Multimodal.y4mBytes(docId, w, h, n)
    val v = Multimodal.y4mOpen(blob)
    assert(v.width == w && v.height == h)
    val frames = v.frames.toSeq
    assert(frames.length == n)
    for (f <- 0 until n) {
      val fr = frames(f)
      assert(fr.length == w * h + 2 * (w / 2) * (h / 2))
      val yMean = fr.take(w * h).map(_ & 0xFF).sum.toDouble / (w * h)
      val expectY = (for (y <- 0 until h; x <- 0 until w)
        yield (x + y + f + 31 * docId) & 0xFF).sum.toDouble / (w * h)
      assert(yMean == expectY)
      val cb = fr.slice(w * h, w * h + (w / 2) * (h / 2))
      val cr = fr.drop(w * h + (w / 2) * (h / 2))
      assert(cb.forall(b => (b & 0xFF) == 128))
      assert(cr.forall(b => (b & 0xFF) == 64 + f))
    }
    // decodeVideo: exact overall mean over every plane sample
    val allBytes = frames.flatten
    val expectMean = allBytes.map(_ & 0xFF).sum.toDouble / allBytes.length / 255.0
    val (mean, nf) = Multimodal.decodeVideo(blob)
    assert(mean == expectMean && nf == n)
    // malformed input is rejected, not misparsed
    intercept[IllegalArgumentException] {
      Multimodal.y4mOpen("MPEG-PS not y4m\n".getBytes("US-ASCII"))
    }
  }

  test("image decode reads real pixels: known uniform PNG, known mean") {
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 8; x <- 0 until 8) img.getRaster.setSample(x, y, 0, 100)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (mean, frames) = Multimodal.decodeImage(bos.toByteArray)
    assert(mean == 100.0 / 255.0 && frames == 1)
    // and the synthetic corpus blobs are themselves real images
    val blob = Multimodal.pngBytes(7L, 64, 64)
    val decoded = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(blob))
    assert(decoded.getWidth == 64 && decoded.getHeight == 64)
    val (m, _) = Multimodal.decodeImage(blob)
    assert(m > 0.0 && m < 1.0) // hash-mixed pixels, nowhere near uniform
  }

  test("audio decode reads real PCM: known square wave, exact amplitude") {
    // square wave of amplitude A: mean |sample| is exactly A
    val blob = Multimodal.wavBytes(docId = 3L, nSamples = 2048,
                                   sampleRate = 16000)
    // the blob is a genuine RIFF/WAVE file the JDK codec accepts
    val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(blob))
    assert(fmt.getType == javax.sound.sampled.AudioFileFormat.Type.WAVE)
    assert(fmt.getFormat.getSampleRate == 16000f)
    val (mean, frames) = Multimodal.decodeAudio(blob)
    assert(frames == 2048)
    assert(mean == Multimodal.wavAmplitude(3L).toDouble / 32768.0)
  }

  test("image decode scales 16-bit samples by the actual bit depth") {
    // uniform 16-bit gray image: mean must be v/65535, not v/255
    val cm = new java.awt.image.ComponentColorModel(
      java.awt.color.ColorSpace.getInstance(java.awt.color.ColorSpace.CS_GRAY),
      Array(16), false, false, java.awt.Transparency.OPAQUE,
      java.awt.image.DataBuffer.TYPE_USHORT)
    val raster = cm.createCompatibleWritableRaster(8, 8)
    for (y <- 0 until 8; x <- 0 until 8) raster.setSample(x, y, 0, 40000)
    val img = new java.awt.image.BufferedImage(cm, raster, false, null)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (mean, _) = Multimodal.decodeImage(bos.toByteArray)
    assert(mean == 40000.0 / 65535.0)
    // ...and resize handles the TYPE_CUSTOM BufferedImage it decodes to
    val resized = Multimodal.resizeImage(bos.toByteArray, 4, 4)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized))
    assert(back.getWidth == 4 && back.getHeight == 4)
  }

  test("resize re-encodes images at target dims, passes others through") {
    val media = Multimodal.syntheticMedia(spark, sf)
    val resized = Multimodal.resizeImages(media, 32, 32).collect()
    resized.foreach { r =>
      if (r.modality == "image") {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        assert(img.getWidth == 32 && img.getHeight == 32)
        assert(r.width == 32 && r.height == 32)
      } else assert(r.payload.length > 0 && (r.width == 0 || r.width == 16))
    }
    assert(resized.length == media.count())
  }

  test("frame sampling follows the stride and stays deterministic") {
    val media = Multimodal.syntheticMedia(spark, sf)
    val frames = Multimodal.sampleFrames(media, stride = 30)
      .orderBy("media_id", "frame_idx").collect().toSeq
    assert(frames.nonEmpty)
    // per-media: indices are 0, 30, 60... and count == ceil(n_frames/30)
    val byMedia = frames.groupBy(_.media_id)
    val nFrames = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.n_frames).toMap
    byMedia.foreach { case (id, fs) =>
      assert(fs.map(_.frame_idx) == (0 until nFrames(id) by 30))
    }
    // only videos contribute
    val modalities = media.collect().map(m => m.media_id -> m.modality).toMap
    assert(byMedia.keySet.forall(id => modalities(id) == "video"))
    val again = Multimodal.sampleFrames(
      Multimodal.syntheticMedia(spark, sf), stride = 30)
      .orderBy("media_id", "frame_idx").collect().toSeq
    assert(frames == again)
  }

  test("q_multimodal_frames aggregates per-media sampled stats") {
    val rows = Multimodal.qMultimodalFrames(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sampled") >= 1)
      assert(r.getAs[Long]("sampled_bytes") ==
             r.getAs[Long]("n_sampled") * 256) // 16×16 resized luma planes
    }
  }

  test("q_multimodal_resize: NN 16x16 survives the encode/decode loop exactly") {
    val rows = Multimodal.qMultimodalResize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("out_w") == 16L && r.getAs[Long]("out_h") == 16L)
      // re-derive the expected pixel sum straight from the generator:
      // the resized image samples src(4x, 4y) = LCG(doc, 256y + 4x)
      val id = r.getAs[Long]("media_id")
      var want = 0L
      for (y <- 0 until 16; x <- 0 until 16) {
        val mix = id * 6364136223846793005L +
          (y.toLong * 4 * 64 + x * 4) * 1442695040888963407L
        want += ((mix >>> 33) & 0xFF)
      }
      assert(r.getAs[Long]("px_sum") == want,
             s"media $id: resize+reencode+decode must be lossless")
      assert(math.abs(r.getAs[Double]("mean_intensity") -
                      want / 255.0 / 256) < 1e-6)
    }
  }

  test("q_multimodal_phash: every planted near-dup found, no noise pairs") {
    val rows = Multimodal.qMultimodalPhash(spark, sf).collect()
    assert(rows.nonEmpty)
    val imageDocs = Tables.documents(spark, sf)
      .where(org.apache.spark.sql.functions.col("doc_id") % 3 === 0)
      .count()
    // at this corpus size every base↔trunc pair survives (Hamming ≤ 8
    // w.h.p.) and unrelated md5-noise images sit near Hamming 32 — so
    // the result is exactly the planted pairs
    assert(rows.length == imageDocs.toInt,
      s"expected $imageDocs planted pairs, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") == r.getAs[Long]("doc_b"),
        "only same-image (base, trunc) pairs should pass at Hamming ≤ 8")
      assert(r.getAs[String]("role_a") == "base" &&
             r.getAs[String]("role_b") == "trunc")
      assert(r.getAs[Long]("hamming") <= 8)
    }
  }

  test("averageHashBits: integer thresholding and truncation robustness") {
    val base = Multimodal.averageHashBits(
      Multimodal.pngBytesMd5(7L, truncate = false))
    val trunc = Multimodal.averageHashBits(
      Multimodal.pngBytesMd5(7L, truncate = true))
    val other = Multimodal.averageHashBits(
      Multimodal.pngBytesMd5(8L, truncate = false))
    assert(base.length == 64 && base.forall(b => b == 0 || b == 1))
    val hamTrunc = base.zip(trunc).map { case (a, b) => (a - b).abs }.sum
    val hamOther = base.zip(other).map { case (a, b) => (a - b).abs }.sum
    assert(hamTrunc <= 8, s"re-quantized image drifted $hamTrunc bits")
    assert(hamOther > 8, s"unrelated image too close: $hamOther bits")
  }

  test("q_multimodal_shots: cuts match the generator's wrap arithmetic") {
    val rows = Multimodal.qMultimodalShots(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val nf = (31 + id % 90).toInt
      // every pixel gains +1 per frame except the wrapping ones
      // (255 -> 0), so diff(f -> f+1) = 256·(1 − w) where w counts
      // pixels at 255 in frame f: x+y ≡ 255 − f − 31·id (mod 256)
      def w(f: Long): Long = {
        val t = java.lang.Math.floorMod(255L - f - 31L * id, 256L)
        if (t <= 15) t + 1 else if (t <= 30) 31 - t else 0
      }
      val diffs = (0 until nf - 1).map(f => math.abs(256L * (1 - w(f))))
      assert(r.getAs[Long]("n_frames") == nf.toLong)
      assert(r.getAs[Long]("n_shots") == 1L + diffs.count(_ > 1000L),
        s"video $id: decoded cuts disagree with the closed form")
      assert(r.getAs[Long]("max_abs_diff") == diffs.max)
    }
  }

  test("q_multimodal_phash plan: band-bucketed join, never all-pairs") {
    val p = Multimodal.qMultimodalPhash(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "candidates must come from the (band, val) equi-join")
  }
}
