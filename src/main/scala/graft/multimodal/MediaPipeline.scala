package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media
  * payloads as opaque `binary` columns with typed metadata, decoded /
  * feature-extracted in per-partition batches.
  *
  * The Spark-side architecture is the real thing — explicit schema
  * (`doc_id, fmt, media: binary`), a typed `Dataset[MediaRow]`, and
  * `mapPartitions` batch iteration (the JVM analog of `mapInPandas`:
  * one decoder instance per partition, rows streamed through it, so a
  * native decoder library would be initialized once per task, not per
  * row). The DECODE ITSELF IS A STUB — this container has no image
  * codecs — replaced by a deterministic byte-level feature extractor
  * ([[MediaPipeline.decodeStub]]) so the plumbing (schema, batching,
  * partitioning, feature shape) is fully testable and oracle-checkable.
  */
object MediaPipeline {

  /** One media row: payload + minimal typed metadata. */
  case class MediaRow(doc_id: Long, fmt: String, media: Array[Byte])

  /** Extracted features — what a real decoder would emit (dimensions,
    * channel stats); here derived deterministically from the bytes. */
  case class MediaFeatures(doc_id: Long, fmt: String, n_bytes: Int,
    width: Int, height: Int, mean_byte: Double)

  /** Synthesize a deterministic media corpus from `documents`: the
    * md5 of the text as a 16-byte "payload" (stands in for image
    * bytes), format cycled from the doc id. At 100 TB the payload
    * column is a real binary column in parquet — everything downstream
    * is unchanged. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import graft.Tables
    Tables.documents(spark, dir).select(
      col("doc_id"),
      element_at(typedlit(Seq("png", "jpg", "wav")),
        (col("doc_id") % 3 + 1).cast("int")).as("fmt"),
      unhex(md5(col("text"))).as("media"))
  }

  /** STUB decoder — stands in for e.g. an ImageIO/ffmpeg call. Reads
    * "dimensions" from the first four bytes and a channel mean over
    * the payload; pure function of the bytes, so the DuckDB oracle
    * recomputes it from the md5 hex. */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val b = r.media.map(_ & 0xff)
    val width = ((b(0) << 8) | b(1)) % 1920 + 1
    val height = ((b(2) << 8) | b(3)) % 1080 + 1
    val mean = b.map(_.toLong).sum.toDouble / b.length
    MediaFeatures(r.doc_id, r.fmt, r.media.length, width, height,
      math.rint(mean * 10000) / 10000)
  }

  /** The batch feature-extraction operator: typed Dataset in,
    * per-partition iteration (decoder init once per partition — the
    * scale-relevant shape), typed Dataset out. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // a real pipeline would initialize the codec here, once
      rows.map(decodeStub)
    }
  }

  /** End-to-end: documents → media table → typed decode → features. */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaTable(spark, dir).as[MediaRow]).toDF()
  }

  // -------------------------------------------------------------------
  // mm2 — video frame sampling (1 row in → N frame rows out)
  // -------------------------------------------------------------------

  /** One video row: opaque byte payload, 16-byte "frames". */
  case class VideoRow(doc_id: Long, video: Array[Byte])

  /** Per-sampled-frame features a real decoder would emit. */
  case class FrameFeatures(doc_id: Long, frame_idx: Int,
    frame_mean: Double, n_high: Int)

  /** Synthesized 64-byte "video" (4 frames of 16 bytes): block i is
    * md5(text || ":i") — deterministic, so the oracle regenerates the
    * identical bytes. In production this is a real binary column;
    * everything downstream is unchanged. */
  def videoTable(spark: SparkSession, dir: String): DataFrame = {
    import graft.Tables
    val blocks = (0 until 4).map(i =>
      unhex(md5(concat(col("text"), lit(s":$i")))))
    Tables.documents(spark, dir).select(
      col("doc_id"), concat(blocks: _*).as("video"))
  }

  /** Frame sampling + per-frame features: every `stride`-th 16-byte
    * frame gets a brightness mean and a high-byte count. The shape is
    * the multimodal generator pattern — one input row expands to N
    * frame rows inside a per-partition batch (decoder init once per
    * task), never on the driver. At 100 TB the expansion factor is
    * bounded by the stride, and the narrow output (id, idx, scalars)
    * is what shuffles — never the payload. */
  /** Oracle-critical mean of one 16-byte block, rounded half-up to 4
    * places. ONE definition: mm2 frames and mm3 chunks (and their
    * DuckDB oracles) must round identically. */
  private def blockMean(block: Array[Byte]): Double = {
    val s = block.map(_ & 0xff).sum
    math.rint(s.toDouble / 16 * 10000) / 10000
  }

  def sampleFrames(videos: Dataset[VideoRow], stride: Int): Dataset[FrameFeatures] = {
    import videos.sparkSession.implicits._
    videos.mapPartitions { rows =>
      // a real pipeline would initialize the video codec here, once
      rows.flatMap { r =>
        (0 until r.video.length / 16 by stride).iterator.map { f =>
          val b = r.video.slice(16 * f, 16 * f + 16)
          FrameFeatures(r.doc_id, f, blockMean(b),
            b.count(x => (x & 0xff) >= 128))
        }
      }
    }
  }

  /** End-to-end: documents → videos → sampled frame features
    * (stride 2 over 4 frames ⇒ frames 0 and 2). */
  def frameFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sampleFrames(videoTable(spark, dir).as[VideoRow], 2).toDF()
  }

  // -------------------------------------------------------------------
  // mm3 — audio chunking (duration metadata drives the expansion)
  // -------------------------------------------------------------------

  /** One audio row: payload + the duration a real container header
    * would declare. */
  case class AudioRow(doc_id: Long, duration_ms: Int, audio: Array[Byte])

  /** Per-chunk features: time bounds from the metadata, a level mean a
    * real decoder would compute from the samples. */
  case class AudioChunk(doc_id: Long, chunk_idx: Int, start_ms: Int,
    end_ms: Int, chunk_mean: Double)

  /** Synthesized 48-byte "audio" (3 blocks of 16: block i is
    * md5(text || ":a<i>")) with a deterministic duration 500–2999 ms —
    * both replayable by the oracle. In production: binary column +
    * real header metadata, downstream unchanged. */
  def audioTable(spark: SparkSession, dir: String): DataFrame = {
    import graft.Tables
    val blocks = (0 until 3).map(i =>
      unhex(md5(concat(col("text"), lit(s":a$i")))))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      ((col("doc_id") % 2500) + 500).cast("int").as("duration_ms"),
      concat(blocks: _*).as("audio"))
  }

  /** Fixed-window audio chunking: each row expands to
    * ceil(duration/chunkMs) chunk rows inside the partition batch —
    * the generator shape mm2 uses, but METADATA-driven (the expansion
    * factor comes from a typed column, not the payload length, which
    * is how variable-length media behaves: a 3-hour podcast row
    * expands 10800×, a 2-second clip 2×). The last chunk is clipped to
    * the real duration. Only the narrow (id, idx, bounds, scalar)
    * output ever shuffles; the payload dies inside the task. */
  def chunkAudio(audio: Dataset[AudioRow], chunkMs: Int): Dataset[AudioChunk] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions { rows =>
      // a real pipeline would initialize the audio codec here, once
      rows.flatMap { r =>
        val n = (r.duration_ms + chunkMs - 1) / chunkMs
        (0 until n).iterator.map { i =>
          val blk = (i % 3) * 16
          AudioChunk(r.doc_id, i, i * chunkMs,
            math.min((i + 1) * chunkMs, r.duration_ms),
            blockMean(r.audio.slice(blk, blk + 16)))
        }
      }
    }
  }

  /** End-to-end: documents → audio rows → 1-second chunks. */
  def audioChunks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chunkAudio(audioTable(spark, dir).as[AudioRow], 1000).toDF()
  }
}
