package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches.
  *
  * The decode kernels (JPEG decode, resample, frame sample) are STUBBED
  * with deterministic fakes — the image/audio codecs are not in this
  * container — but the Spark-side contract is real and tested: schema,
  * batch iteration shape (mapPartitions ≈ mapInPandas batches), binary
  * passthrough, and partition-preserving narrow execution. Swapping the
  * stub for a real codec changes no plan shape.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  case class Feature(media_id: Long, kind: String, n_bytes: Int,
      feature: Array[Float])

  /** Shared media-row synthesis: kind ladder + metadata are pure functions
    * of the id (single source of truth for syntheticMedia, fromDocuments
    * AND the q37 oracle's CASE expression). */
  def mediaRowFor(id: Long, payload: Array[Byte]): MediaRow = {
    val kind = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio"
      else "video"
    MediaRow(id, kind, payload, 16 + (id % 64).toInt, 16 + (id % 48).toInt,
      8000 + (id % 3).toInt * 8000)
  }

  /** Deterministic fake media table: payload bytes are a pure function of
    * id (stand-in for real WARC media payloads). */
  def syntheticMedia(spark: SparkSession, n: Long, partitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val len = 64 + (i % 128).toInt
      val payload = Array.tabulate[Byte](len)(j =>
        (graft.extract.PageSynth.splitmix64(i * 1000 + j) & 0xFF).toByte)
      mediaRowFor(i, payload)
    }
  }

  /** Media table derived from the `documents` corpus: payload = the
    * document's UTF-8 bytes (stand-in for a WARC media payload whose size
    * an external oracle can recompute as octet_length), kind cycled by id.
    * Makes the binary-column plumbing oracle-checkable: the driver's DuckDB
    * gate verifies (media_id, kind, n_bytes) while the decode stub stays
    * spec-tested. */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val payload = if (text == null) Array.emptyByteArray
          else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        mediaRowFor(id, payload)
    }
  }

  /** STUB decode: a real implementation would decode the codec here.
    * The fake derives a fixed-size feature vector deterministically from
    * payload bytes, so downstream plumbing (schema, batching, similarity)
    * is fully exercisable. */
  def decodeFeatureStub(payload: Array[Byte], dims: Int = 8): Array[Float] = {
    val out = new Array[Float](dims)
    var i = 0
    while (i < payload.length) {
      out(i % dims) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    out
  }

  /** Batched feature extraction: one pass per partition (the Scala analogue
    * of mapInPandas batch processing) — narrow, no shuffle. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow],
      dims: Int = 8): Dataset[Feature] = {
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        Feature(m.media_id, m.kind, m.payload.length,
          decodeFeatureStub(m.payload, dims))
      }
    }
  }

  case class ResizedRow(media_id: Long, width: Int, height: Int,
      payload: Array[Byte])
  case class FrameRow(media_id: Long, frame_idx: Int, payload: Array[Byte])

  /** STUB resize kernel: a real implementation decodes, scales and
    * re-encodes; the fake derives the output bytes deterministically from
    * (payload, target dims) so the plumbing — batch iteration, binary
    * in/out schema, metadata columns — is fully testable in-container. */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](math.max(1, (w * h) / 64))
    var i = 0
    while (i < out.length) {
      out(i) = (if (payload.isEmpty) (i * 31).toByte
        else payload(i % payload.length)) ; i += 1
    }
    out
  }

  /** Batched resize over image rows (mapPartitions ≈ mapInPandas batch):
    * narrow, partition-preserving, non-image kinds pass through untouched
    * upstream (filter pushes to the scan). */
  def resizeImages(spark: SparkSession, media: Dataset[MediaRow],
      w: Int, h: Int): Dataset[ResizedRow] = {
    import spark.implicits._
    media.filter(_.kind == "image").mapPartitions { batch =>
      batch.map(m => ResizedRow(m.media_id, w, h, resizeStub(m.payload, w, h)))
    }
  }

  /** STUB frame sampling: a real implementation demuxes the container and
    * decodes every Nth frame; the fake slices the payload into fixed-size
    * pseudo-frames and keeps every Nth — the row-explosion shape (one
    * input row → many frame rows) is the real contract. */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow],
      everyN: Int, frameBytes: Int = 16): Dataset[FrameRow] = {
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      m.payload.grouped(frameBytes).zipWithIndex
        .filter { case (_, idx) => idx % everyN == 0 }
        .map { case (bytes, idx) => FrameRow(m.media_id, idx, bytes) }
    }
  }

  /** Metadata-only pushdown demo: stats per kind never touch the payload
    * column (column pruning keeps the binary out of the scan). */
  def kindStats(media: DataFrame): DataFrame =
    media.groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        avg(col("width")).as("avg_width"),
        max(col("sample_rate")).as("max_sample_rate"))
}
