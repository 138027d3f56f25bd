package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column pattern: media as opaque `binary` payloads with a
  * typed metadata struct, processed in partition-local batches.
  *
  * Decoding is REAL for the formats the JVM ships codecs for —
  * PNG/JPEG/BMP/GIF via `javax.imageio` and WAV/PCM via
  * `javax.sound.sampled` (see [[MediaCodecs]]; features = grayscale
  * histogram / RMS energy). Mimes with no JDK codec (video, modern
  * audio) fall back to `decodeStub`, a deterministic byte-fold marked
  * clearly below. The Spark-side shape — schema, typed Dataset
  * plumbing, batched mapPartitions, partitioning — is identical either
  * way and is what MultimodalSpec tests.
  *
  * Scale notes: mapPartitions keeps the decoder per-partition (one codec
  * init per task, not per row; batches bound peak memory). Binary
  * payloads ride Parquet binary columns; at 100 TB, payloads should be
  * size-bucketed (`repartitionByRange` on n_bytes) so decode tasks are
  * even, and metadata-only queries never touch payload bytes thanks to
  * Parquet column pruning.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, mime: String, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
                                 feature: Array[Float])

  /** Wrap a text corpus as media records (payload = utf-8 bytes) — the
    * fixture stand-in for real image/audio bytes.
    */
  def asMediaRecords(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"),
      lit("text/plain").as("mime"),
      col("text").cast("binary").as("payload")).as[MediaRecord]
  }

  /** STUB decoder: a real implementation would decode image/audio bytes
    * (JPEG→pixels, WAV→PCM) and extract features; deterministic fake =
    * 8 floats folded from payload bytes. Accumulates in double and
    * quantizes to float once at the end (the usual decoder pattern —
    * wide accumulator, narrow output), which also makes the emitted
    * floats reproducible by the DuckDB oracle. Marked clearly; see
    * class doc.
    */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Double](8)
    var i = 0
    while (i < payload.length) {
      acc(i % 8) += (payload(i) & 0xff) / 255.0
      i += 1
    }
    acc.map(_.toFloat)
  }

  /** Batched partition-local decode/feature-extract. `batchSize` mirrors
    * the batch shape a vectorized (Arrow/pandas-UDF-style) decoder would
    * use: the iterator is consumed in groups so a real codec can amortize
    * setup across the batch.
    */
  def extractFeatures(media: Dataset[MediaRecord], batchSize: Int = 64)
      : Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch: real decoders init once here
        batch.iterator.map { r =>
          MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong,
            decodeByMime(r.mime, r.payload))
        }
      }
    }
  }

  /** Real decode where the JDK has a codec; deterministic fallback
    * elsewhere. Feature vector is fixed-dim 8 for every modality (the
    * multimodal-table contract: one schema across mimes).
    */
  private def decodeByMime(mime: String, payload: Array[Byte]): Array[Float] =
    mime match {
      case m if m.startsWith("image/") =>
        MediaCodecs.imageFeatures(payload).map(_.histogram)
          .getOrElse(decodeStub(payload))
      case "audio/wav" | "audio/x-wav" =>
        MediaCodecs.wavFeatures(payload).map { a =>
          Array(a.sampleRate / 48000f, a.channels.toFloat,
            math.min(a.nFrames, 1L << 24).toFloat, a.durationSec.toFloat,
            a.rms.toFloat, 0f, 0f, 0f)
        }.getOrElse(decodeStub(payload))
      case _ => decodeStub(payload)
    }

  final case class MediaFrames(doc_id: Long, n_frames: Int,
                               frames: Array[Array[Byte]])

  /** STUB frame sampler: a real implementation would decode video/audio
    * and sample keyframes / fixed-rate windows; the deterministic fake
    * takes every `stride`-th fixed-size byte window. The Spark-side
    * shape — batched partition-local processing, bounded frames per
    * record, nested binary output schema — is the real contract.
    */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int = 32,
                   stride: Int = 4, maxFrames: Int = 8): Dataset[MediaFrames] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val frames = r.payload.grouped(frameBytes).zipWithIndex
          .collect { case (w, i) if i % stride == 0 => w }
          .take(maxFrames).toArray
        MediaFrames(r.doc_id, frames.length, frames)
      }
    }
  }

  /** Resize: REAL raster scaling (decode → area-average → PNG
    * re-encode, [[MediaCodecs.resizeImage]]) for image mimes; for
    * non-image payloads a deterministic byte downsample to
    * `targetBytes`. Output stays a MediaRecord, so resize composes with
    * every other stage (the pipeline-shape contract).
    */
  def resize(media: Dataset[MediaRecord], targetBytes: Int = 64): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        if (r.mime.startsWith("image/"))
          MediaCodecs.resizeImage(r.payload, maxDim = targetBytes)
            .map(b => MediaRecord(r.doc_id, "image/png", b)).getOrElse(r)
        else if (r.payload.length <= targetBytes) r
        else {
          val step = r.payload.length.toDouble / targetBytes
          val out = new Array[Byte](targetBytes)
          var i = 0
          while (i < targetBytes) { out(i) = r.payload((i * step).toInt); i += 1 }
          MediaRecord(r.doc_id, r.mime, out)
        }
      }
    }
  }

  /** Feature summary as a plain DataFrame query (registered rows-only). */
  def featureSummary(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    extractFeatures(asMediaRecords(docs)).toDF()
      .select(col("doc_id"), col("mime"), col("n_bytes"),
        size(col("feature")).cast("long").as("feature_dim"),
        round(aggregate(col("feature"), lit(0.0),
          (acc, x) => acc + x.cast("double")), 6).as("feature_sum"))
  }
}
