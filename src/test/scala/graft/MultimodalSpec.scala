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

  test("decode stub honors modality frame semantics") {
    val (_, imgFrames) = Multimodal.decodeStub("abc".getBytes, "image")
    assert(imgFrames == 1)
    val (_, vidFrames) = Multimodal.decodeStub("abc".getBytes, "video")
    assert(vidFrames >= 1 && vidFrames <= 120)
  }
}
