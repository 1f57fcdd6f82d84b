package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import util._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video ride along as opaque `binary` columns with typed metadata, and
  * decode / feature-extraction runs as partition-local batch transforms.
  *
  * The decode kernels themselves are STUBS — this container has no image
  * or audio libraries, so `decodeStub` derives deterministic fake
  * features from the payload bytes. Everything around them is real and
  * tested: the schema, the mapPartitions batch shape (the Scala analog
  * of mapInPandas: one iterator per partition, amortizing per-batch
  * setup), and the partitioning strategy.
  *
  * Scale notes (100 TB of media):
  *  - binaries never shuffle: metadata extraction projects features
  *    immediately and drops the payload column before any wide stage;
  *  - `spark.sql.files.maxPartitionBytes` governs scan granularity, so a
  *    task holds a bounded number of blobs; feature extraction is
  *    embarrassingly parallel;
  *  - at rest, media lives in its own column family (parquet binary) or
  *    object store with pointer columns — both shapes read through the
  *    same decode entry points.
  */
object Multimodal {

  /** One media row: payload + typed metadata. */
  final case class MediaRow(media_id: Long, modality: String,
                            payload: Array[Byte], width: Int, height: Int,
                            sample_rate: Int)

  /** Extracted features (what a real decoder would emit per blob). */
  final case class MediaFeatures(media_id: Long, modality: String,
                                 n_bytes: Long, checksum: Long,
                                 mean_intensity: Double, n_frames: Int)

  /** STUB decode kernel: a real implementation would hand `payload` to
    * javax.imageio / a JNI codec here. The fake is deterministic in the
    * payload bytes so tests are stable.
    */
  def decodeStub(payload: Array[Byte], modality: String): (Double, Int) = {
    var h = 1125899906842597L
    var s = 0L
    var i = 0
    while (i < payload.length) {
      h = 31 * h + payload(i)
      s += (payload(i) & 0xFF)
      i += 1
    }
    val mean = if (payload.isEmpty) 0.0 else s.toDouble / payload.length / 255.0
    val frames = modality match {
      case "video" => 1 + math.abs(h % 120).toInt // pretend fps*duration
      case "audio" => 1 + math.abs(h % 48000).toInt
      case _       => 1
    }
    (mean, frames)
  }

  private def checksum(payload: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    h
  }

  /** Partition-local batch decode: Dataset[MediaRow] → Dataset[MediaFeatures].
    * One task iterates its partition's blobs; per-partition setup (a real
    * decoder context) would be allocated once per iterator, exactly like
    * a mapInPandas batch function.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // (real pipeline: allocate decoder context here, once per task)
      rows.map { r =>
        val (mean, frames) = decodeStub(r.payload, r.modality)
        MediaFeatures(r.media_id, r.modality, r.payload.length.toLong,
                      checksum(r.payload), mean, frames)
      }
    }
  }

  /** Deterministic synthetic media table built from `documents` text
    * bytes — stands in for a real blob column in the driver testdata.
    */
  def syntheticMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), pmod(col("doc_id"), lit(3)).as("m"))
      .map { r =>
        val modality = r.getLong(2) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(r.getLong(0), modality, r.getString(1).getBytes("UTF-8"),
                 width = 64, height = 64, sample_rate = 16000)
      }
  }

  /** Rows-only queries entry: synthesize blobs → decode → per-modality
    * feature aggregate. The payload column is dropped before the
    * groupBy, so no binary bytes cross the shuffle.
    */
  val qMultimodalFeatures: Q = (s, d) => {
    val feats = extractFeatures(syntheticMedia(s, d)).drop("checksum")
    feats.groupBy("modality")
      .agg(count(lit(1)).as("n_blobs"),
           sum(col("n_bytes")).as("total_bytes"),
           round(avg(col("mean_intensity")), 6).as("avg_intensity"),
           max(col("n_frames")).cast("long").as("max_frames"))
      .orderBy("modality")
  }

  /** STUB resize kernel: deterministic byte downsample standing in for a
    * real scaler (javax.imageio / libvips). Output length is exactly
    * targetW×targetH so downstream size accounting is real.
    */
  def resizeStub(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val n = targetW * targetH
    val out = new Array[Byte](n)
    if (payload.nonEmpty) {
      var i = 0
      while (i < n) {
        out(i) = payload((i.toLong * payload.length / n).toInt)
        i += 1
      }
    }
    out
  }

  /** Binary-in/binary-out partition-local transform: images are resized
    * in place, other modalities pass through. Same batch discipline as
    * extractFeatures — and the resized payload stays partition-local
    * until a sink consumes it (no shuffle of binaries).
    */
  def resizeImages(media: Dataset[MediaRow], targetW: Int, targetH: Int)
      : Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // (real pipeline: allocate scaler context here, once per task)
      rows.map { r =>
        if (r.modality == "image")
          r.copy(payload = resizeStub(r.payload, targetW, targetH),
                 width = targetW, height = targetH)
        else r
      }
    }
  }

  /** One sampled frame of a video blob. */
  final case class FrameRow(media_id: Long, frame_idx: Int,
                            frame_bytes: Long, frame_checksum: Long)

  /** Frame sampling: 1→N row expansion, iterator-based so a long video
    * never materializes all frames in memory at once. Every `stride`-th
    * frame is emitted; frame payloads are summarized (bytes + checksum)
    * immediately so, as everywhere else, no binary crosses a shuffle.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.modality == "video").flatMap { r =>
        val (_, nFrames) = decodeStub(r.payload, r.modality)
        // (real pipeline: demux/seek context allocated per blob here)
        Iterator.range(0, nFrames, stride).map { idx =>
          val frame = resizeStub(r.payload, 16, 16) // stand-in frame decode
          var h = 1125899906842597L + idx
          var i = 0
          while (i < frame.length) { h = 31 * h + frame(i); i += 1 }
          FrameRow(r.media_id, idx, frame.length.toLong, h)
        }
      }
    }
  }

  /** Frame-sample pipeline: videos → every-30th frame → per-media frame
    * stats. Rows-only + MultimodalSpec assertions (stride arithmetic,
    * determinism).
    */
  val qMultimodalFrames: Q = (s, d) => {
    sampleFrames(syntheticMedia(s, d), stride = 30)
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_sampled"),
           sum(col("frame_bytes")).as("sampled_bytes"),
           countDistinct(col("frame_checksum")).as("distinct_frames"))
      .orderBy("media_id")
  }

  val entries: Map[String, Q] = Map(
    "q_multimodal_features" -> qMultimodalFeatures,
    "q_multimodal_frames"   -> qMultimodalFrames
  )
}
