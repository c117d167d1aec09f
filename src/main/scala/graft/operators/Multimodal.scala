package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata extracted by a partition-wise decoder.
  *
  * The Spark-side shape is the real deliverable: binary payload column,
  * `mapPartitions` batch decode (one decoder instantiation per
  * partition, not per row — the same shape a JNI image/audio codec
  * needs), typed `Dataset` output with an explicit schema. The decode
  * itself is a clearly-marked deterministic STUB (no media codecs in
  * this environment); swapping in a real decoder changes only the body
  * of `decodeStub`.
  *
  * Scale: decode is embarrassingly parallel; partition sizing is
  * governed by `spark.sql.files.maxPartitionBytes` on the payload scan,
  * and the output is a narrow metadata table (bytes → ~24B/row), so the
  * heavy binary column is dropped before any shuffle.
  */
object Multimodal {
  /** Typed metadata row produced by the decoder. */
  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int, channels: Int)

  /** STUB decoder ??? — stands in for a real image/audio decode.
    * Deterministic pure arithmetic on the payload bytes so the whole
    * pipeline (schema, batching, partitioning) is testable and carries
    * a DuckDB oracle. A real implementation would parse the container
    * header here (and this is the ONLY place that changes).
    */
  private def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
    val nBytes = payload.length
    val firstByte = if (nBytes > 0) payload(0) & 0xff else 0
    MediaMeta(docId, nBytes, 64 + nBytes % 512, 64 + firstByte % 512, 3)
  }

  /** Attach a binary payload column (here: the UTF-8 text bytes as the
    * stand-in media blob; real data would read e.g. image files).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Partition-wise batch decode: binary payloads → typed metadata. */
  def decodeFeatures(docs: DataFrame): Dataset[MediaMeta] = {
    val payloads = withPayload(docs)
    import payloads.sparkSession.implicits._
    payloads.as[(Long, Array[Byte])].mapPartitions { batch =>
      // Real decoders init per-partition state here (codec handles etc.)
      batch.map { case (id, bytes) => decodeStub(id, bytes) }
    }
  }

  /** Resize planning row: source dims → fitted dims + scale factor. */
  case class ResizeMeta(doc_id: Long, src_w: Int, src_h: Int,
      dst_w: Int, dst_h: Int, scale: Double)

  /** Resize-to-fit planning: aspect-preserving scale into a
    * (maxW, maxH) box, never upscaling — the dimension arithmetic every
    * image-normalization stage runs before the actual pixel resample.
    * Composes the partition-wise decode (dims come from `decodeStub`;
    * a real pipeline resamples pixels in the same mapPartitions pass —
    * STUB ??? only the metadata math runs here, deterministically, so
    * the plumbing carries a DuckDB oracle). All arithmetic is plain
    * IEEE double + floor, bit-identical cross-engine.
    */
  def resizePlan(docs: DataFrame, maxW: Int = 256, maxH: Int = 256): Dataset[ResizeMeta] = {
    val metas = decodeFeatures(docs)
    import metas.sparkSession.implicits._
    metas.map { m =>
      val scale = math.min(math.min(maxW.toDouble / m.width, maxH.toDouble / m.height), 1.0)
      ResizeMeta(m.doc_id, m.width, m.height,
        math.max(1, math.floor(m.width * scale).toInt),
        math.max(1, math.floor(m.height * scale).toInt),
        BigDecimal(scale).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  /** One sampled frame of a media payload. */
  case class FrameMeta(doc_id: Long, frame_idx: Int, frame_offset: Int, frame_hash: Int)

  /** Frame sampling: each payload fans out to `nFrames` evenly-spaced
    * frames — the video/audio sampling shape (one row per frame, typed,
    * exploded inside the partition; the binary column never survives
    * past the mapPartitions).
    *
    * STUB ??? — frame_hash is the byte at the frame offset, standing in
    * for a decoded-frame content hash; pure arithmetic so the fan-out
    * plumbing carries a DuckDB oracle.
    */
  def frameSample(docs: DataFrame, nFrames: Int): Dataset[FrameMeta] = {
    val payloads = withPayload(docs)
    import payloads.sparkSession.implicits._
    payloads.as[(Long, Array[Byte])].mapPartitions { batch =>
      batch.flatMap { case (id, bytes) =>
        val nb = bytes.length
        (0 until nFrames).iterator.map { i =>
          val offset = if (nb == 0) 0 else ((i.toLong * nb) / nFrames).toInt
          val hash = if (nb == 0) 0 else bytes(offset) & 0xff
          FrameMeta(id, i, offset, hash)
        }
      }
    }
  }
}
