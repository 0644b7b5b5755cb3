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

  /** Metadata-only pushdown demo: stats per kind never touch the payload
    * column (column pruning keeps the binary out of the scan). */
  def kindStats(media: DataFrame): DataFrame =
    media.groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        avg(col("width")).as("avg_width"),
        max(col("sample_rate")).as("max_sample_rate"))
}
