package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches.
  *
  * The IMAGE leg is REAL: PNG/JPEG encode, decode and bilinear resize run
  * through JDK `javax.imageio` / `java.awt.image` (no external deps) —
  * synthetic media rows carry genuine PNG payloads, features come from
  * decoded pixels, and resize re-encodes a genuinely scaled raster (FunctionsSpec
  * asserts decoded dimensions and pixel content; q50 oracle-checks
  * decode-derived values against DuckDB).
  *
  * The AUDIO leg is REAL too: RIFF/PCM16 WAV encode + decode run through
  * JDK `javax.sound.sampled` (pure-Java file codec, no audio device
  * needed) — synthetic audio rows carry genuine WAV payloads and features
  * come from decoded samples (FunctionsSpec asserts sample-exact
  * roundtrips; q53 oracle-checks decode-derived values against DuckDB).
  *
  * The VIDEO leg is REAL at the container level: an MJPEG-style format
  * (magic + frame count + length-prefixed intra-coded frames — see
  * [[encodeVideo]]) is genuinely DEMUXED frame by frame ([[demuxVideo]],
  * with magic/length validation), and every demuxed frame decodes through
  * the real ImageIO kernel ([[decodeImage]]). Frames are stored as PNG
  * rather than JPEG so decoded pixel values are exact integers an external
  * oracle can recompute (q75); the demux logic is byte-format-agnostic and
  * accepts any ImageIO-decodable frame bytes, JPEG included. What this
  * container is NOT is an inter-frame-predicted codec (H.26x) — the JDK
  * ships no such codec and none exists in this container; swapping the
  * frame payload format changes no plan shape and no demux code.
  */
object Multimodal {

  // ImageIO's default stream cache is DISK-backed: every read/write spins
  // up (and deletes) a temp file, which under 32 concurrent decode tasks
  // turns into filesystem churn — profiled as multi-second swings on the
  // q50/q75 decode stages (r06). All payloads here are in-memory byte
  // arrays, so the memory cache is strictly better; decode/encode results
  // are unchanged (the cache only buffers stream bytes).
  javax.imageio.ImageIO.setUseCache(false)

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

  // ------------------------------------------------------------------
  // REAL image codec kernels (JDK javax.imageio — zero external deps)
  // ------------------------------------------------------------------

  /** Deterministic base gray level for an image id — shared by the PNG
    * synthesizer, the decode specs, and the q50 DuckDB oracle. */
  def grayOf(id: Long): Int = (id % 256).toInt

  private def rgb(gray: Int): Int = (gray << 16) | (gray << 8) | gray

  /** Real PNG encode of a programmatic raster. */
  def encodePng(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, pixel(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real PNG/JPEG/GIF/BMP decode. Fails fast on undecodable payloads —
    * image rows carry genuine encoded images by contract. */
  def decodeImage(payload: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, s"payload (${payload.length} bytes) is not a " +
      "decodable image — image rows must carry real encoded images")
    img
  }

  /** Deterministic synthetic PNG for an id: constant gray `grayOf(id)`
    * with pixel (0,0) marked `(gray+7)%256` — reading the marker back
    * proves a decode touched real pixels, not metadata. PNG is lossless,
    * so the roundtrip values are exact integers (oracle-checkable). */
  def syntheticPng(id: Long, width: Int, height: Int): Array[Byte] = {
    val g = grayOf(id)
    encodePng(width, height,
      (x, y) => if (x == 0 && y == 0) rgb((g + 7) % 256) else rgb(g))
  }

  /** Real image feature: decode, then mean gray per horizontal stripe
    * (dims stripes) over the actual raster. */
  def imageFeature(payload: Array[Byte], dims: Int = 8): Array[Float] = {
    val img = decodeImage(payload)
    val out = new Array[Float](dims)
    val cnt = new Array[Int](dims)
    var y = 0
    while (y < img.getHeight) {
      // long arithmetic for the same overflow reason as audioFeature
      val d = math.min(dims - 1, (y.toLong * dims / img.getHeight).toInt)
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        out(d) += (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) / (3f * 255f)
        cnt(d) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < dims) { if (cnt(i) > 0) out(i) /= cnt(i); i += 1 }
    out
  }

  /** Real resize: decode → bilinear rescale → PNG re-encode. */
  def resizeImage(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val src = decodeImage(payload)
    val dst = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = dst.createGraphics()
    try {
      g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g2.drawImage(src, 0, 0, w, h, null)
    } finally g2.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(dst, "png", bos)
    bos.toByteArray
  }

  // ------------------------------------------------------------------
  // REAL audio codec kernels (JDK javax.sound.sampled — zero external
  // deps; the WAV file codec is pure Java and needs no audio device)
  // ------------------------------------------------------------------

  /** Deterministic peak amplitude for an audio id — shared by the WAV
    * synthesizer, the decode specs, and the q53 DuckDB oracle.
    * Bounded well inside Short range so PCM16 never clips. */
  def ampOf(id: Long): Int = 1000 + (id % 100).toInt * 250

  /** Real RIFF/PCM16-mono WAV encode of programmatic samples. */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false) // PCM16 mono signed LE
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xFF).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Real WAV decode: (sample rate from the parsed RIFF header, PCM16
    * samples). Fails fast on undecodable payloads — audio rows carry
    * genuine encoded audio by contract. */
  def decodeWav(payload: Array[Byte]): (Int, Array[Short]) = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            s"payload (${payload.length} bytes) is not a decodable audio " +
              "file — audio rows must carry real encoded audio", e)
      }
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
      s"expected PCM16 mono, got $fmt")
    val bytes = ais.readAllBytes()
    val out = new Array[Short](bytes.length / 2)
    var i = 0
    if (fmt.isBigEndian)
      while (i < out.length) {
        out(i) = (((bytes(2 * i) & 0xFF) << 8) | (bytes(2 * i + 1) & 0xFF)).toShort
        i += 1
      }
    else
      while (i < out.length) {
        out(i) = (((bytes(2 * i + 1) & 0xFF) << 8) | (bytes(2 * i) & 0xFF)).toShort
        i += 1
      }
    (fmt.getSampleRate.toInt, out)
  }

  /** Deterministic synthetic WAV for an id: an `ampOf(id)`-amplitude
    * square wave (alternating +amp/−amp), `32 + id % 64` samples at the
    * row's metadata sample rate. PCM is lossless, so peak/trough/length
    * survive the roundtrip as exact integers (oracle-checkable). */
  def syntheticWav(id: Long, sampleRate: Int): Array[Byte] = {
    val amp = ampOf(id)
    val n = 32 + (id % 64).toInt
    val samples = Array.tabulate[Short](n)(i =>
      (if (i % 2 == 0) amp else -amp).toShort)
    encodeWav(samples, sampleRate)
  }

  /** Real audio feature: decode, then mean |sample|/32768 per time stripe
    * (dims stripes) over the actual PCM samples. */
  def audioFeature(payload: Array[Byte], dims: Int = 8): Array[Float] = {
    val (_, samples) = decodeWav(payload)
    val out = new Array[Float](dims)
    val cnt = new Array[Int](dims)
    var i = 0
    while (i < samples.length) {
      // long arithmetic: i * dims overflows Int past 2^31/dims samples
      // (~537 MB of PCM16 at dims=8 — reachable for long-form audio),
      // which would index negative and crash the task on every retry
      val d = math.min(dims - 1, (i.toLong * dims / samples.length).toInt)
      out(d) += math.abs(samples(i).toInt) / 32768f
      cnt(d) += 1
      i += 1
    }
    var j = 0
    while (j < dims) { if (cnt(j) > 0) out(j) /= cnt(j); j += 1 }
    out
  }

  // ------------------------------------------------------------------
  // REAL video container (MJPEG-style: length-prefixed intra-coded
  // frames) — genuine demux; per-frame decode rides the ImageIO kernel
  // ------------------------------------------------------------------

  private val VideoMagic = "GVID1".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Mux encoded frames into the container: magic, int32-BE frame count,
    * then per frame an int32-BE length prefix + the frame bytes. The same
    * layout family as MJPEG-in-AVI's frame chunks, minus the RIFF
    * ceremony. */
  def encodeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(VideoMagic)
    out.writeInt(frames.length)
    frames.foreach { f => out.writeInt(f.length); out.write(f) }
    out.flush()
    bos.toByteArray
  }

  /** Real demux: validates the magic, walks the length-prefixed frames,
    * fails fast on truncation or corrupt lengths — video rows carry
    * genuine containers by contract. */
  def demuxVideo(payload: Array[Byte]): IndexedSeq[Array[Byte]] = {
    require(payload.length >= VideoMagic.length + 4 &&
      payload.startsWith(VideoMagic),
      s"payload (${payload.length} bytes) is not a ${new String(VideoMagic)} " +
        "container — video rows must carry real muxed video")
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(payload, VideoMagic.length,
        payload.length - VideoMagic.length))
    val n = in.readInt()
    require(n >= 0 && n < (1 << 20), s"corrupt frame count $n")
    (0 until n).map { i =>
      val len = in.readInt()
      require(len > 0 && len <= payload.length, s"corrupt frame $i length $len")
      val buf = new Array[Byte](len)
      in.readFully(buf)
      buf
    }
  }

  /** Deterministic base gray of frame `f` of video `id` — shared by the
    * synthesizer, the specs and the q75 DuckDB oracle. */
  def frameGrayOf(id: Long, f: Int): Int = ((id + 11L * f) % 256).toInt

  /** Frame count of the synthetic video for an id (3..6). */
  def frameCountOf(id: Long): Int = 3 + (id % 4).toInt

  /** Deterministic synthetic video: [[frameCountOf]] genuine width×height
    * PNG frames, frame f constant gray [[frameGrayOf]] with pixel (0,0)
    * marked `(gray+7)%256` — the q50 oracle trick per frame: reading the
    * values back requires a real demux AND a real per-frame decode. */
  def syntheticVideo(id: Long, width: Int = 8, height: Int = 6): Array[Byte] =
    encodeVideo((0 until frameCountOf(id)).map { f =>
      val g = frameGrayOf(id, f)
      encodePng(width, height,
        (x, y) => if (x == 0 && y == 0) rgb((g + 7) % 256) else rgb(g))
    })

  /** Real video feature: demux, decode each frame via ImageIO, mean gray
    * per frame over the actual rasters (first `dims` frames; zero-padded —
    * temporal profile analogue of [[imageFeature]]'s spatial stripes). */
  def videoFeature(payload: Array[Byte], dims: Int = 8): Array[Float] = {
    val out = new Array[Float](dims)
    demuxVideo(payload).take(dims).zipWithIndex.foreach { case (fb, i) =>
      val img = decodeImage(fb)
      var sum = 0.0
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val p = img.getRGB(x, y)
          sum += (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) / (3.0 * 255.0)
          x += 1
        }
        y += 1
      }
      out(i) = (sum / (img.getWidth * img.getHeight)).toFloat
    }
    out
  }

  /** Deterministic media table: image rows carry REAL PNG payloads, audio
    * rows REAL RIFF/PCM16 WAV payloads, video rows REAL muxed containers
    * of PNG frames (all decodable, content a pure function of id). */
  def syntheticMedia(spark: SparkSession, n: Long, partitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val meta = mediaRowFor(i, Array.emptyByteArray)
      val payload = meta.kind match {
        case "image" => syntheticPng(i, meta.width, meta.height)
        case "audio" => syntheticWav(i, meta.sample_rate)
        // frames carry the row's OWN metadata dims, so metadata and
        // decodable payload never contradict each other
        case _ => syntheticVideo(i, meta.width, meta.height)
      }
      meta.copy(payload = payload)
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

  /** Byte-level feature for payloads that are NOT encoded media — e.g.
    * [[fromDocuments]] rows, whose payloads are document text bytes so the
    * driver oracle can recompute sizes. Derives a fixed-size vector
    * deterministically from raw bytes; the real decode kernels
    * ([[imageFeature]]/[[audioFeature]]/[[videoFeature]]) are used for
    * genuine media payloads. */
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
    * of mapInPandas batch processing) — narrow, no shuffle. Image rows
    * genuinely decode via ImageIO ([[imageFeature]]), audio rows via the
    * JDK WAV codec ([[audioFeature]]), video rows via the container demux
    * + per-frame ImageIO decode ([[videoFeature]]).
    * `decodePayloads = false` skips ALL real decodes (every kind falls
    * back to the byte-level [[decodeFeatureStub]]) for media tables whose
    * payloads are metadata stand-ins rather than encoded media (e.g.
    * [[fromDocuments]], whose payloads are the document's text bytes so
    * the driver oracle can recompute sizes). */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow],
      dims: Int = 8, decodePayloads: Boolean = true): Dataset[Feature] = {
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val feat =
          if (!decodePayloads) decodeFeatureStub(m.payload, dims)
          else m.kind match {
            case "image" => imageFeature(m.payload, dims)
            case "audio" => audioFeature(m.payload, dims)
            case "video" => videoFeature(m.payload, dims)
            case _ => decodeFeatureStub(m.payload, dims)
          }
        Feature(m.media_id, m.kind, m.payload.length, feat)
      }
    }
  }

  case class ResizedRow(media_id: Long, width: Int, height: Int,
      payload: Array[Byte])
  case class FrameRow(media_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Batched REAL resize over image rows (mapPartitions ≈ mapInPandas
    * batch): decode → bilinear rescale → PNG re-encode per row — narrow,
    * partition-preserving; non-image kinds are filtered upstream. */
  def resizeImages(spark: SparkSession, media: Dataset[MediaRow],
      w: Int, h: Int): Dataset[ResizedRow] = {
    import spark.implicits._
    media.filter(_.kind == "image").mapPartitions { batch =>
      batch.map(m => ResizedRow(m.media_id, w, h, resizeImage(m.payload, w, h)))
    }
  }

  /** REAL frame sampling: genuinely demux the container ([[demuxVideo]])
    * and keep every Nth frame — one input row explodes to many frame rows
    * (narrow flatMap, partition-preserving); each emitted payload is a
    * decodable encoded frame ([[decodeImage]] reads it; q75 oracle-checks
    * decode-derived pixel values). */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow],
      everyN: Int): Dataset[FrameRow] = {
    require(everyN >= 1, s"sampleFrames needs everyN >= 1, got $everyN" +
      " (0 would divide-by-zero inside executor tasks; negatives would" +
      " silently keep only frame 0)")
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      demuxVideo(m.payload).zipWithIndex
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
