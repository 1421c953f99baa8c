package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary media payloads with typed
  * metadata, decoded/feature-extracted in distributed batches.
  *
  * The engine treats image/audio/video as `binary` columns plus a metadata
  * struct, exactly like a production training-data pipeline: the payload is
  * never interpreted by Catalyst, only by a per-partition decode stage.
  * Decode runs as `mapPartitions` over a typed Dataset (the Scala analog of
  * arrow-batched Python `mapInPandas`): one decoder instantiation per
  * partition, streaming iterator in/out, no driver materialization.
  *
  * STUB: real codec libraries are unavailable in this container, so
  * [[decodeStub]] derives deterministic features (byte length, head byte)
  * instead of pixels/samples. The schema, partitioning, batch shape, and
  * iterator contract are the real thing; swap `decodeStub` for a codec call
  * to productionize.
  */
object Multimodal {

  /** One media record: id + modality kind + opaque payload. */
  case class MediaRecord(doc_id: Long, kind: String, media: Array[Byte])

  /** Extracted features (stub decode). */
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long, head_byte: Int)

  /** Shape the documents table into a multimodal table: payload = utf-8
    * bytes of the text (stand-in for image/audio/video bytes), kind cycled
    * deterministically so each modality path is exercised.
    */
  def asMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("media"))

  /** Per-partition stub decode: in production this is where the image/audio
    * codec runs (one decoder per partition, amortized over the iterator).
    * Features are deterministic functions of the payload bytes.
    */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition decoder init would go here (e.g. codec context)
      it.map { r =>
        val bytes = r.media
        MediaFeatures(
          doc_id = r.doc_id,
          kind = r.kind,
          n_bytes = bytes.length.toLong,
          head_byte = if (bytes.nonEmpty) bytes(0) & 0xFF else -1)
      }
    }
  }

  /** Resized media: payload after the (stub) resample plus output dims. */
  case class ResizedMedia(doc_id: Long, kind: String, media: Array[Byte],
                          out_w: Int, out_h: Int)

  /** Resize / re-encode stage (STUB): a real implementation decodes,
    * resamples to `w x h`, re-encodes. The deterministic fake keeps the
    * first w*h payload bytes (or all, if shorter) so downstream size
    * accounting is testable. Plumbing — typed batches, per-partition
    * execution, binary in/out — is the real shape.
    */
  def resizeStub(spark: SparkSession, media: DataFrame, w: Int, h: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val out = r.media.take(w * h)
        ResizedMedia(r.doc_id, r.kind, out, w, h)
      }
    }
  }

  /** One sampled frame: parent id, frame index, frame payload. */
  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling (STUB): a real implementation seeks keyframes; the fake
    * slices the payload into fixed `frameBytes` chunks and keeps every
    * `stride`-th chunk. One-to-many typed flatMap — the same operator shape
    * video pipelines use to turn one blob row into N frame rows.
    */
  def frameSampleStub(spark: SparkSession, media: DataFrame,
                      frameBytes: Int, stride: Int): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRecord].flatMap { r =>
      r.media.grouped(frameBytes).zipWithIndex
        .collect { case (chunk, i) if i % stride == 0 => Frame(r.doc_id, i, chunk) }
    }
  }

  /** One dimension of one frame's pseudo-embedding. */
  case class FrameDim(doc_id: Long, frame_idx: Int, dim: Int, v: Long)

  /** Frame embedding (STUB): a real implementation runs a vision/audio
    * encoder per frame; the deterministic fake folds the frame bytes into
    * a `dim`-dimensional integer vector (dimension k = sum of unsigned
    * bytes at positions ≡ k mod dim). Emits (frame, dim, value) rows for
    * dimensions that received at least one byte — a short tail frame
    * contributes only its populated dimensions, so downstream pooling
    * counts match a byte-position oracle exactly. Same per-partition
    * typed-batch shape as the decode stage; composes with elementwise
    * pooling and the ANN operators to close the multimodal -> embedding
    * loop.
    */
  def embedStub(spark: SparkSession, frames: DataFrame, dim: Int = 8): Dataset[FrameDim] = {
    import spark.implicits._
    frames.as[Frame].flatMap { f =>
      val d = math.min(dim, f.frame.length)
      val v = new Array[Long](d)
      var j = 0
      while (j < f.frame.length) {
        v(j % dim) += f.frame(j) & 0xFFL
        j += 1
      }
      (0 until d).iterator.map(k => FrameDim(f.doc_id, f.frame_idx, k, v(k)))
    }
  }

  /** One VAD frame: fixed-size byte window with its (stub) energy. */
  case class VadChunk(doc_id: Long, chunk_idx: Int, n_bytes: Long,
                      energy_u: Long, voiced: Boolean)

  /** VAD-style audio chunking (STUB): fixed-size byte frames, per-frame
    * "energy" = exact byte-value sum (the deterministic stand-in for RMS
    * over decoded PCM samples), voiced = mean energy above a threshold.
    * The one-to-many flatMap is the same seam the frame slicer uses — a
    * real decoder + energy/VAD model slots in per partition. Integer
    * energies keep the census bit-portable to the oracle.
    */
  def vadChunksStub(spark: SparkSession, media: DataFrame,
                    frameBytes: Int = 256,
                    thresholdPerByte: Int = 96): Dataset[VadChunk] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.flatMap { r =>
        r.media.grouped(frameBytes).zipWithIndex.map { case (frame, i) =>
          var e = 0L
          var j = 0
          while (j < frame.length) { e += frame(j) & 0xFFL; j += 1 }
          VadChunk(r.doc_id, i, frame.length.toLong, e,
            e > thresholdPerByte.toLong * frame.length)
        }
      }
    }
  }
}
