package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for the training-data pipeline: image/audio/video
  * payloads ride as opaque BINARY columns with a typed metadata struct, and
  * decode / feature-extract / resize / frame-sample run as per-partition
  * batch transforms.
  *
  * The Spark-side plumbing here is real and tested — schema, partition
  * sizing, `mapPartitions` batch shape, null routing. Codec work splits
  * two ways: formats parseable in pure JVM have REAL decoders —
  * RIFF/WAVE PCM, 24bpp BMP, PNG in [[Codecs]] and baseline JPEG in
  * [[Jpeg]] (byte-level chunk/marker walks, exercised end-to-end under
  * the oracle gate by `q_wav_decode` / `q_bmp_decode` / `q_png_decode` /
  * `q_jpeg_decode`); formats that require native libraries this
  * container doesn't ship (MP4/video, …) remain STUBBED behind
  * `DECODE_STUB`, which derives stats from an md5 of the payload so
  * tests stay reproducible and a JNI/FFmpeg-backed implementation slots
  * into exactly this seam.
  *
  * Scale notes: payloads never pass through a shuffle in these transforms
  * (map-only); for joins, always project metadata-only frames first and
  * semi-join back — moving binary blobs through an exchange is the classic
  * multimodal-pipeline mistake.
  */
object Multimodal {

  /** Typed media row: opaque payload + envelope metadata. */
  case class MediaRow(
      media_id: Long,
      media_type: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      source_uri: String)

  case class DecodedImage(
      media_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      mean_luma: Double)

  case class MediaFeatures(
      media_id: Long,
      feature: Array[Float])

  /** 60-bit value from the md5 of the payload — the seed every stub
    * derives from. md5 (not a JVM hash) so the driver's DuckDB oracle can
    * replicate the fake decode bit-for-bit and keep the multimodal
    * plumbing under the hash gate.
    */
  private def md5Seed(payload: Array[Byte]): Long = graft.expr.Md5Hex.long60(payload)

  /** >>> DECODE_STUB <<< — deterministic fake decode. A production build
    * replaces ONLY this function body with the real codec call; everything
    * around it (batching, schema, partitioning) stays.
    */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Int, Double) = {
    val h = md5Seed(payload) // ≥ 0, < 2^60
    val width = (64 + h % 512).toInt
    val height = (64 + (h / 512) % 512).toInt
    val channels = 3
    val meanLuma = ((h / 262144) % 1000) / 1000.0
    (width, height, channels, meanLuma)
  }

  /** Decode a media frame per partition — one iterator pass, no shuffle,
    * payloads dropped as soon as the metadata is extracted.
    */
  def decodeImages(media: Dataset[MediaRow]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.media_type == "image").map { r =>
        val (w, h, c, luma) = decodeStub(r.payload)
        DecodedImage(r.media_id, w, h, c, luma)
      }
    }
  }

  /** Feature extraction: fixed-dim embedding per payload (stubbed as
    * seeded-hash floats; same batch shape as an ONNX/JNI encoder that
    * processes a partition's rows in micro-batches).
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        // >>> DECODE_STUB <<< deterministic fake embedding (md5-seeded so
        // the oracle replicates it; bounded so h*31+i never overflows)
        val h = md5Seed(r.payload) % 1048576L
        val feat = Array.tabulate(dim)(i =>
          (((h * 31 + i) % 1000) / 1000.0).toFloat)
        MediaFeatures(r.media_id, feat)
      }
    }
  }

  /** Frame sampling for video rows: emit every `stride`-th frame index up
    * to `maxFrames` as (media_id, frame_idx) — the fan-out side of a video
    * pipeline, expressed as a generator so downstream decode stays
    * per-partition.
    */
  def sampleFrames(media: DataFrame, stride: Int, maxFrames: Int): DataFrame = {
    // Guard at call time: non-positive bounds would build an illegal
    // sequence() that fails per-row inside the RUNNING job.
    require(stride > 0, s"stride must be > 0, got $stride")
    require(maxFrames > 0, s"maxFrames must be > 0, got $maxFrames")
    media.filter(col("media_type") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), lit((maxFrames - 1) * stride), lit(stride)))
          .as("frame_idx"))
  }

  /** Little-endian unsigned integer read from `nBytes` bytes of a binary
    * column at 1-based `offset` — a pure expression chain (per-byte
    * hex → base conversion), so it runs inside whole-stage codegen on the
    * scan. This is the header-only fast path: at 100 TB you classify and
    * filter media by METADATA without ever decoding payloads, and only
    * the surviving rows reach a (much more expensive) full decode.
    * Reads past the end of the payload yield null (hex of an empty slice).
    */
  def leUInt(c: Column, offset: Int, nBytes: Int): Column = {
    require(nBytes >= 1 && nBytes <= 7, "1..7 bytes fit an unsigned long read")
    val full = length(c) >= lit(offset + nBytes - 1)
    val bytes = (0 until nBytes).map { i =>
      conv(hex(substring(c, offset + i, 1)), 16, 10).cast("long") *
        lit(1L << (8 * i))
    }.reduce(_ + _)
    when(c.isNotNull && full, bytes)
  }

  /** Big-endian counterpart of [[leUInt]] — ISO-BMFF (MP4/QuickTime/HEIF)
    * box sizes and brands are big-endian, unlike RIFF/BMP.
    */
  def beUInt(c: Column, offset: Int, nBytes: Int): Column = {
    require(nBytes >= 1 && nBytes <= 7, "1..7 bytes fit an unsigned long read")
    val full = length(c) >= lit(offset + nBytes - 1)
    val bytes = (0 until nBytes).map { i =>
      conv(hex(substring(c, offset + i, 1)), 16, 10).cast("long") *
        lit(1L << (8 * (nBytes - 1 - i)))
    }.reduce(_ + _)
    when(c.isNotNull && full, bytes)
  }

  /** The `ftyp` major brand of an ISO-BMFF payload (4 ASCII chars,
    * trailing spaces significant — "qt  ", "M4A "); null when the payload
    * is not a plausible ISO-BMFF file. Header-only, like every accessor
    * here: triage reads 12 bytes, decode is someone else's job (the
    * documented DECODE_STUB seam — container SNIFFING is pure
    * byte-walking and belongs in the scan).
    */
  def mp4MajorBrand(c: Column): Column =
    when(isIsoBmff(c), substring(c, 9, 4).cast("string"))

  /** Plausible ISO-BMFF: first box is `ftyp` with a sane size (≥ 16: 8
    * box header + major brand + minor version — the spec minimum). The
    * size guard keeps a random payload with "ftyp" at offset 5 from
    * classifying (the four size bytes must cooperate too); it does NOT
    * require size ≤ payload length, because triage columns often hold a
    * prefix read of a large object, not the whole file.
    */
  private def isIsoBmff(c: Column): Column =
    substring(c, 5, 4) === ascii("ftyp") && beUInt(c, 1, 4) >= 16 &&
      // The major brand lives at bytes 9–12: a prefix read cut at 8–11
      // bytes would otherwise classify and hand mp4MajorBrand a partial
      // brand ("M4" from a truncated M4A), breaking its null-when-not-
      // plausible contract and mislabeling the MIME dispatch.
      length(c) >= 12

  private def ascii(s: String): Column =
    lit(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  /** Magic-byte MIME classification of an opaque binary column — map-only,
    * codegen'd, no decode. The ingest triage step: route rows to the right
    * codec pool (or quarantine) before any expensive work. Unknown or
    * too-short payloads classify as application/octet-stream; null stays
    * null. Binary slices compare directly (BinaryType is orderable), so
    * the whole thing is a when-chain over prefix slices.
    */
  def sniffMime(c: Column): Column =
    when(c.isNull, lit(null).cast("string"))
      .when(substring(c, 1, 4) === ascii("RIFF") &&
        substring(c, 9, 4) === ascii("WAVE"), "audio/wav")
      .when(substring(c, 1, 2) === ascii("BM"), "image/bmp")
      .when(hex(substring(c, 1, 3)) === "FFD8FF", "image/jpeg")
      .when(hex(substring(c, 1, 8)) === "89504E470D0A1A0A", "image/png")
      .when(substring(c, 1, 6) === ascii("GIF87a") ||
        substring(c, 1, 6) === ascii("GIF89a"), "image/gif")
      // ISO-BMFF family: one container magic, MIME decided by the ftyp
      // major brand (the registered-brand dispatch every sniffing spec
      // does — video vs audio-only vs QuickTime vs HEIF stills).
      .when(isIsoBmff(c),
        when(substring(c, 9, 4) === ascii("M4A "), "audio/mp4")
          .when(substring(c, 9, 4) === ascii("qt  "), "video/quicktime")
          .when(substring(c, 9, 4) === ascii("heic") ||
            substring(c, 9, 4) === ascii("mif1"), "image/heic")
          .otherwise("video/mp4"))
      .otherwise("application/octet-stream")

  /** Canonical-layout WAV header fields (fmt chunk first, as
    * [[Codecs.encodeWavPcm16]] writes and virtually all real PCM files
    * are). Header-only: null on payloads shorter than the canonical
    * header. Files with leading non-fmt chunks need the full chunk walk
    * in [[Codecs.decodeWav]] — this is the scan-time triage projection,
    * not the decoder.
    */
  def wavSampleRate(c: Column): Column = leUInt(c, 25, 4)
  def wavChannels(c: Column): Column = leUInt(c, 23, 2)
  def wavBitsPerSample(c: Column): Column = leUInt(c, 35, 2)

  /** BITMAPINFOHEADER dimension fields of a BMP payload (header-only;
    * width/height are signed in the spec but non-negative in practice —
    * callers needing top-down negative-height files use the decoder).
    */
  def bmpWidth(c: Column): Column = leUInt(c, 19, 4)
  def bmpHeight(c: Column): Column = leUInt(c, 23, 4)

  /** Fixture builder: wrap any string column as an opaque payload so the
    * pipeline plumbing is testable without real codecs.
    */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String,
      mediaType: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    // Null routing: a null text has no payload to wrap — dropped here, the
    // same way a media scan skips unreadable objects.
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        MediaRow(id, mediaType, text.getBytes("UTF-8"), s"mem://doc/$id")
      }
  }
}
