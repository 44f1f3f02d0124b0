package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing under the oracle gate: documents wrap as opaque
  * binary payloads, run the typed `mapPartitions` decode / feature /
  * frame-sample transforms, and the DuckDB oracle replicates the
  * md5-derived `DECODE_STUB` bodies — so the schema, batch shape, null
  * routing and fan-out of the multimodal path are hash-checked end-to-end
  * even though the codec bodies are deterministic fakes (no image/audio
  * libraries in this container; see [[graft.multimodal.Multimodal]]).
  */
object MultimodalQueries extends QueryGroup {

  private val h60 = "CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)"

  val queries: Map[String, Q] = Map(
    // Decode + quality gate: stats per payload, low-luma rows dropped —
    // the metadata-only projection that downstream joins should use
    // (payloads never cross a shuffle).
    "q_multimodal_decode" -> ((s, dir) => {
      val media = Multimodal.mediaFromText(
        Tables.documents(s, dir), "doc_id", "text", "image")
      Multimodal.decodeImages(media).toDF()
        .filter(col("mean_luma") >= 0.25)
        .select(col("media_id"), col("width"), col("height"),
          col("channels"), col("mean_luma"))
    }),

    // Fixed-dim fake embedding, exploded to (id, dim_idx, val) so the
    // float payload compares exactly after a 3-decimal round.
    "q_multimodal_features" -> ((s, dir) => {
      val media = Multimodal.mediaFromText(
        Tables.documents(s, dir), "doc_id", "text", "image")
      Multimodal.extractFeatures(media, dim = 8).toDF()
        .select(col("media_id"), posexplode(col("feature")))
        .select(col("media_id"), col("pos").cast("int").as("dim_idx"),
          round(col("col").cast("double"), 3).as("val"))
    }),

    // Video frame-sampling fan-out: every 5th frame, 4 frames per video.
    "q_multimodal_frames" -> ((s, dir) => {
      val media = Multimodal.mediaFromText(
        Tables.documents(s, dir).filter(pmod(col("doc_id"), lit(3)) === 0),
        "doc_id", "text", "video").toDF()
      Multimodal.sampleFrames(media, stride = 5, maxFrames = 4)
        .select(col("media_id"), col("frame_idx").cast("int").as("frame_idx"))
    }),

    // REAL audio decode (no stub): PCM WAV bytes synthesized per doc_id,
    // then parsed back through the strict RIFF/PCM decoder
    // (multimodal.Codecs.decodeWav) — header fields, sample count, peak
    // and RMS all come from the byte-level parse. The oracle recomputes
    // the same stats from the closed-form sample definition, so the
    // encoder AND decoder sit under the hash gate. Map-only; payloads
    // live and die inside one task.
    "q_wav_decode" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val n = (200 + id % 57).toInt
            val rate = (8000 + (id % 5) * 4000).toInt
            val samples = Array.tabulate(n)(i =>
              (((id * 31 + i * 7919L) % 65536L) - 32768L).toShort)
            val w = graft.multimodal.Codecs.decodeWav(
              graft.multimodal.Codecs.encodeWavPcm16(rate, samples))
            (id, w.sampleRate, w.channels, w.bitsPerSample, w.nSamples,
              w.peak, w.rms)
          }
        }
        .toDF("doc_id", "sample_rate", "channels", "bits", "n_samples",
          "peak", "rms")
        .withColumn("rms", round(col("rms"), 4))
    }),

    // Framed audio features over the REAL WAV decode path
    // (Codecs.decodeWavSamples → audioFrames): non-overlapping 64-sample
    // frames, per-frame integer peak / zero-crossing count and
    // exact-integer-sum RMS — the energy/VAD slice of an audio pipeline.
    // Same planted PCM as q_wav_decode, restated per-frame in the oracle.
    "q_audio_frames" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .flatMap { id =>
          val n = (200 + id % 57).toInt
          val rate = (8000 + (id % 5) * 4000).toInt
          val samples = Array.tabulate(n)(i =>
            (((id * 31 + i * 7919L) % 65536L) - 32768L).toShort)
          val (_, pcm) = graft.multimodal.Codecs.decodeWavSamples(
            graft.multimodal.Codecs.encodeWavPcm16(rate, samples))
          graft.multimodal.Codecs.audioFrames(pcm, 64).map(f =>
            (id, f.frameIdx, f.peak, f.zcr, f.rms))
        }
        .toDF("doc_id", "frame_idx", "peak", "zcr", "rms")
        .withColumn("rms", round(col("rms"), 4))
    }),

    // Channel histogram over the REAL JPEG decode path (Jpeg.decodePixels
    // on the exactly-round-tripping constant-block images): 8 bins of 32
    // values — the image-statistics slice (exposure/contrast screens)
    // of a vision pipeline. The oracle restates the planted block values.
    "q_image_histogram" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .flatMap { id =>
          val w = 8 * (1 + id % 3).toInt
          val h = 8 * (1 + id % 2).toInt
          val bytes = graft.multimodal.Jpeg.encodeGray(w, h,
            (x, y) => ((id + 17 * (x / 8) + 29 * (y / 8)) % 256).toInt,
            quant = 8)
          val (_, planes) = graft.multimodal.Jpeg.decodePixels(bytes)
          val counts = new Array[Long](8)
          planes(0).foreach(v => counts(v / 32) += 1)
          counts.zipWithIndex.collect { case (n, b) if n > 0 => (id, b, n) }
        }
        .toDF("doc_id", "bin", "n")
    }),

    // REAL image decode (no stub): 24bpp BMP bytes (padded bottom-up
    // rows) synthesized per doc_id, parsed back through
    // multimodal.Codecs.decodeBmp; mean luma sums integer-weighted
    // channels so the oracle reproduces it exactly.
    "q_bmp_decode" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val w = (8 + id % 9).toInt
            val h = (4 + id % 5).toInt
            val d = graft.multimodal.Codecs.decodeBmp(
              graft.multimodal.Codecs.encodeBmp24(w, h, (x, y) =>
                (((id + x + y) % 256).toInt, ((id + y) % 256).toInt,
                  ((id + x) % 256).toInt)))
            (id, d.width, d.height, d.bpp, d.meanLuma)
          }
        }
        .toDF("doc_id", "width", "height", "bpp", "mean_luma")
        .withColumn("mean_luma", round(col("mean_luma"), 4))
    }),

    // Audio fingerprint: per-doc pure tone (bin 3 + doc_id % 40 of a
    // 256-pt frame) synthesized, roundtripped through the REAL WAV
    // codec, then FFT spectral peaks per frame — an integer-period
    // sinusoid concentrates all energy in its bin, so the whole
    // decode→FFT→argmax path has a closed-form oracle.
    "q_audio_fingerprint" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.flatMap { id =>
            val bin = (3 + id % 40).toInt
            val samples = Array.tabulate[Short](512)(t =>
              math.round(12000.0 * math.sin(
                2.0 * math.Pi * bin * t / 256.0)).toShort)
            val wav = graft.multimodal.Codecs.encodeWavPcm16(8000, samples)
            val decoded = graft.multimodal.Codecs.decodeWavSamples(wav)._2
            graft.multimodal.Fft.framePeaks(decoded, 256).map {
              case (f, peak) => (id, f, peak)
            }
          }
        }
        .toDF("doc_id", "frame_idx", "peak_bin")
    }),

    // Perceptual dHash through the real byte-level resize+decode path:
    // planted BMPs → 9×8 thumbnail → integer-luma gradient bits, emitted
    // as two 32-bit halves (bit 63 overflows BIGINT shifts in SQL). The
    // oracle rebuilds the hash closed-form from the planted pixel
    // function and the floor-div resize sampling.
    "q_image_phash" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val w = (8 + id % 9).toInt
            val h = (4 + id % 5).toInt
            val bmp = graft.multimodal.Codecs.encodeBmp24(w, h, (x, y) =>
              (((id + x + y) % 256).toInt, ((id + y) % 256).toInt,
                ((id + x) % 256).toInt))
            val (lo, hi) = graft.multimodal.PerceptualHash.dHashBmp(bmp)
            (id, lo, hi)
          }
        }
        .toDF("doc_id", "dhash_lo", "dhash_hi")
    }),

    // Resize-then-featurize: real encode → nearest-neighbor resize to
    // 4×3 → decode, all byte-level in one map-only pass; the oracle
    // recomputes the sampled source pixels closed-form.
    "q_bmp_resize" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val w = (8 + id % 9).toInt
            val h = (4 + id % 5).toInt
            val src = graft.multimodal.Codecs.encodeBmp24(w, h, (x, y) =>
              (((id + x + y) % 256).toInt, ((id + y) % 256).toInt,
                ((id + x) % 256).toInt))
            val d = graft.multimodal.Codecs.decodeBmp(
              graft.multimodal.Codecs.resizeBmpNearest(src, 4, 3))
            // Recover the EXACT integer luma sum (mean is sum/12000; the
            // double round-trip stays within 1 ulp, so rint is exact) —
            // a fixed /12000 mean hits the cross-engine half-rounding
            // trap on ~1 row in 12.
            (id, d.width, d.height, math.rint(d.meanLuma * 12000.0).toLong)
          }
        }
        .toDF("doc_id", "width", "height", "luma_sum")
    }),

    // REAL PNG decode: per-doc PNGs (RGB for even ids, grayscale for
    // odd) synthesized with all five scanline filters and a split IDAT,
    // then decoded back through the strict chunk walk — CRC32 verify,
    // zlib inflate (java.util.zip), five-way unfiltering. The oracle
    // recomputes the planted pixels closed-form.
    "q_png_decode" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val w = (8 + id % 9).toInt
            val h = (4 + id % 5).toInt
            val bytes =
              if (id % 2 == 0)
                graft.multimodal.Codecs.encodePngRgb8(w, h, (x, y) =>
                  (((id + x + y) % 256).toInt, ((id + y) % 256).toInt,
                    ((id + x) % 256).toInt))
              else
                graft.multimodal.Codecs.encodePngGray8(w, h, (x, y) =>
                  ((id + 3 * x + 7 * y) % 256).toInt)
            val d = graft.multimodal.Codecs.decodePng(bytes)
            (id, d.width, d.height, d.bitDepth, d.colorType, d.meanLuma)
          }
        }
        .toDF("doc_id", "width", "height", "bit_depth", "color_type",
          "mean_luma")
        .withColumn("mean_luma", round(col("mean_luma"), 4))
    }),

    // REAL baseline JPEG decode (multimodal.Jpeg): per-doc grayscale
    // JPEGs with CONSTANT 8×8 blocks — the one image family a lossy
    // codec round-trips bit-exactly (DC-only energy, quant step 8; see
    // Jpeg object doc) — synthesized with restart markers every 2 MCUs,
    // then decoded back through the full marker walk, Huffman entropy
    // decode, dequant + IDCT. The oracle restates the planted block
    // values closed-form; general (AC-bearing) images are
    // tolerance-checked in JpegSpec where no exact oracle can exist.
    "q_jpeg_decode" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val w = 8 * (1 + id % 3).toInt
            val h = 8 * (1 + id % 2).toInt
            val bytes = graft.multimodal.Jpeg.encodeGray(w, h,
              (x, y) => ((id + 17 * (x / 8) + 29 * (y / 8)) % 256).toInt,
              quant = 8, restartInterval = 2)
            val d = graft.multimodal.Jpeg.decode(bytes)
            (id, d.width, d.height, d.components, d.meanLuma)
          }
        }
        .toDF("doc_id", "width", "height", "components", "mean_luma")
        .withColumn("mean_luma", round(col("mean_luma"), 4))
    }),

    // Ingest triage WITHOUT decoding: a mixed bag of payloads (real WAV
    // bytes, real BMP bytes, UTF-8 text, garbage) is classified by magic
    // bytes and header fields are read as pure expressions over the
    // binary column (Multimodal.sniffMime / leUInt) — the metadata-only
    // scan that routes 100 TB of blobs to codec pools. The oracle states
    // the expected classification closed-form from the planting rule, so
    // the sniffer's verdict on REAL bytes is what's hash-checked.
    "q_media_sniff" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val payload: Array[Byte] = (id % 4) match {
              case 0 =>
                val rate = (8000 + (id % 5) * 4000).toInt
                graft.multimodal.Codecs.encodeWavPcm16(rate,
                  Array.tabulate(4)(i => ((id + i) % 100).toShort))
              case 1 =>
                val w = (2 + id % 3).toInt
                graft.multimodal.Codecs.encodeBmp24(w, 2, (x, y) =>
                  (((id + x) % 256).toInt, ((id + y) % 256).toInt,
                    (id % 256).toInt))
              case 2 => s"plain text payload $id".getBytes("UTF-8")
              case _ if id % 8 == 3 =>
                // Minimal ISO-BMFF ftyp box: BE size 20, 'ftyp', a major
                // brand cycling through the registered families, minor
                // version 0, one compatible brand — the 20 bytes a
                // container sniffer actually reads.
                val brand = Seq("isom", "M4A ", "qt  ", "heic")(
                  ((id / 8) % 4).toInt)
                (Array[Byte](0, 0, 0, 20) ++ "ftyp".getBytes("US-ASCII") ++
                  brand.getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++
                  "isom".getBytes("US-ASCII"))
              case _ => Array.tabulate(8)(i => ((id * 7 + i) % 256).toByte)
            }
            (id, payload)
          }
        }.toDF("doc_id", "payload")
      val mime = Multimodal.sniffMime(col("payload"))
      media.select(col("doc_id"), mime.as("mime"),
        when(mime === "audio/wav",
          Multimodal.wavSampleRate(col("payload"))).as("sample_rate"),
        when(mime === "image/bmp",
          Multimodal.bmpWidth(col("payload"))).as("width"),
        Multimodal.mp4MajorBrand(col("payload")).as("brand"))
    }))

  val oracles: Map[String, String] = Map(
    "q_multimodal_decode" ->
      s"""WITH h AS (SELECT doc_id, $h60 AS h FROM documents)
         |SELECT doc_id AS media_id,
         |  CAST(64 + h % 512 AS INT) AS width,
         |  CAST(64 + (h // 512) % 512 AS INT) AS height,
         |  CAST(3 AS INT) AS channels,
         |  ((h // 262144) % 1000) / 1000.0 AS mean_luma
         |FROM h
         |WHERE ((h // 262144) % 1000) / 1000.0 >= 0.25""".stripMargin,
    "q_multimodal_features" ->
      s"""WITH h AS (SELECT doc_id, $h60 % 1048576 AS h FROM documents)
         |SELECT doc_id AS media_id,
         |  CAST(d AS INT) AS dim_idx,
         |  round(((h * 31 + d) % 1000) / 1000.0, 3) AS val
         |FROM h, range(0, 8) t(d)""".stripMargin,
    "q_multimodal_frames" ->
      """SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx
        |FROM documents, range(0, 20, 5) t(f)
        |WHERE doc_id % 3 = 0""".stripMargin,
    // Closed-form restatement of the synthesized PCM: integer squares sum
    // exactly (< 2^53), one float64 division, IEEE sqrt — what the real
    // byte-level decoder must reproduce.
    "q_wav_decode" ->
      """WITH ids AS (SELECT doc_id, 200 + doc_id % 57 AS n FROM documents),
        |s AS (SELECT doc_id, n, unnest(range(n)) AS i FROM ids),
        |v AS (SELECT doc_id, n,
        |  ((doc_id * 31 + i * 7919) % 65536) - 32768 AS smp FROM s)
        |SELECT doc_id,
        |  CAST(8000 + (doc_id % 5) * 4000 AS INT) AS sample_rate,
        |  CAST(1 AS INT) AS channels,
        |  CAST(16 AS INT) AS bits,
        |  CAST(n AS INT) AS n_samples,
        |  CAST(max(abs(smp)) AS INT) AS peak,
        |  round(sqrt(sum(smp * smp) / CAST(n AS DOUBLE)), 4) AS rms
        |FROM v GROUP BY doc_id, n""".stripMargin,
    // Per-frame restatement of the q_wav_decode planting: 64-sample
    // frames (trailing partial dropped), lag-window sign changes, exact
    // integer square-sums.
    "q_audio_frames" ->
      """WITH ids AS (SELECT doc_id, 200 + doc_id % 57 AS n FROM documents),
        |s AS (SELECT doc_id, n, unnest(range(n)) AS i FROM ids),
        |v AS (SELECT doc_id, CAST(i // 64 AS INT) AS frame_idx, i % 64 AS j,
        |  ((doc_id * 31 + i * 7919) % 65536) - 32768 AS smp
        |  FROM s WHERE i < (n // 64) * 64),
        |w AS (SELECT doc_id, frame_idx, j, smp,
        |  lag(smp) OVER (PARTITION BY doc_id, frame_idx ORDER BY j) AS prev
        |  FROM v)
        |SELECT doc_id, frame_idx, CAST(max(abs(smp)) AS INT) AS peak,
        |  CAST(count(CASE WHEN prev IS NOT NULL
        |    AND (smp >= 0) <> (prev >= 0) THEN 1 END) AS INT) AS zcr,
        |  round(sqrt(sum(smp * smp) / 64.0), 4) AS rms
        |FROM w GROUP BY doc_id, frame_idx""".stripMargin,

    // Constant blocks are 64 identical pixels, and the DC-only JPEG
    // round-trip is exact — so each block adds 64 to its planted value's
    // bin, closed-form.
    "q_image_histogram" ->
      """WITH ids AS (
        |  SELECT doc_id, 1 + doc_id % 3 AS bw, 1 + doc_id % 2 AS bh
        |  FROM documents),
        |bx AS (SELECT doc_id, bw, bh, unnest(range(bw)) AS x FROM ids),
        |b AS (SELECT doc_id, x, unnest(range(bh)) AS y FROM bx),
        |v AS (SELECT doc_id,
        |  CAST(((doc_id + 17 * x + 29 * y) % 256) // 32 AS INT) AS bin
        |  FROM b)
        |SELECT doc_id, bin, CAST(64 * count(*) AS BIGINT) AS n
        |FROM v GROUP BY doc_id, bin""".stripMargin,

    // Two identical frames of the planted tone → the peak is the planted
    // bin, closed form.
    "q_audio_fingerprint" ->
      """SELECT doc_id, CAST(unnest(range(2)) AS INT) AS frame_idx,
        |  CAST(3 + doc_id % 40 AS INT) AS peak_bin
        |FROM documents""".stripMargin,

    // Same planted pixels, same floor-div thumbnail sampling, same
    // integer luma; the gradient bits OR into two unsigned-safe halves.
    "q_image_phash" ->
      """WITH ids AS (
        |  SELECT doc_id, 8 + doc_id % 9 AS w, 4 + doc_id % 5 AS h
        |  FROM documents),
        |g AS (SELECT doc_id, w, h, unnest(range(8)) AS oy FROM ids),
        |gx AS (SELECT doc_id, w, h, oy, unnest(range(8)) AS ox FROM g),
        |b AS (SELECT doc_id, oy, ox,
        |  299 * ((doc_id + (ox * w // 9) + (oy * h // 8)) % 256)
        |    + 587 * ((doc_id + (oy * h // 8)) % 256)
        |    + 114 * ((doc_id + (ox * w // 9)) % 256) AS l0,
        |  299 * ((doc_id + ((ox + 1) * w // 9) + (oy * h // 8)) % 256)
        |    + 587 * ((doc_id + (oy * h // 8)) % 256)
        |    + 114 * ((doc_id + ((ox + 1) * w // 9)) % 256) AS l1
        |  FROM gx)
        |SELECT doc_id,
        |  CAST(bit_or(CASE WHEN l1 > l0 AND oy * 8 + ox < 32
        |    THEN CAST(1 AS BIGINT) << CAST(oy * 8 + ox AS INT)
        |    ELSE 0 END) AS BIGINT) AS dhash_lo,
        |  CAST(bit_or(CASE WHEN l1 > l0 AND oy * 8 + ox >= 32
        |    THEN CAST(1 AS BIGINT) << CAST(oy * 8 + ox - 32 AS INT)
        |    ELSE 0 END) AS BIGINT) AS dhash_hi
        |FROM b GROUP BY doc_id""".stripMargin,

    "q_bmp_decode" ->
      """WITH ids AS (
        |  SELECT doc_id, 8 + doc_id % 9 AS w, 4 + doc_id % 5 AS h
        |  FROM documents),
        |xs AS (SELECT doc_id, w, h, unnest(range(w)) AS x FROM ids),
        |px AS (SELECT doc_id, w, h, x, unnest(range(h)) AS y FROM xs),
        |l AS (SELECT doc_id, w, h,
        |  299 * ((doc_id + x + y) % 256) + 587 * ((doc_id + y) % 256)
        |    + 114 * ((doc_id + x) % 256) AS luma
        |  FROM px)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(24 AS INT) AS bpp,
        |  round(sum(luma) / (1000.0 * w * h), 4) AS mean_luma
        |FROM l GROUP BY doc_id, w, h""".stripMargin,
    // Planted pixels restated closed-form: RGB luma per-mille weights
    // for even ids, raw gray samples for odd; same single division.
    "q_png_decode" ->
      """WITH ids AS (
        |  SELECT doc_id, 8 + doc_id % 9 AS w, 4 + doc_id % 5 AS h
        |  FROM documents),
        |xs AS (SELECT doc_id, w, h, unnest(range(w)) AS x FROM ids),
        |px AS (SELECT doc_id, w, h, x, unnest(range(h)) AS y FROM xs),
        |l AS (SELECT doc_id, w, h,
        |  CASE WHEN doc_id % 2 = 0
        |    THEN 299 * ((doc_id + x + y) % 256) + 587 * ((doc_id + y) % 256)
        |      + 114 * ((doc_id + x) % 256)
        |    ELSE (doc_id + 3 * x + 7 * y) % 256 END AS luma
        |  FROM px)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(8 AS INT) AS bit_depth,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 0 END AS INT)
        |    AS color_type,
        |  round(CASE WHEN doc_id % 2 = 0 THEN sum(luma) / (1000.0 * w * h)
        |        ELSE sum(luma) / (1.0 * w * h) END, 4) AS mean_luma
        |FROM l GROUP BY doc_id, w, h""".stripMargin,

    // Constant-block planting restated closed-form: mean luma is the
    // plain average of the per-block planted values (each block is 64
    // identical pixels, and the DC-only round-trip is exact).
    "q_jpeg_decode" ->
      """WITH ids AS (
        |  SELECT doc_id, 1 + doc_id % 3 AS bw, 1 + doc_id % 2 AS bh
        |  FROM documents),
        |bx AS (SELECT doc_id, bw, bh, unnest(range(bw)) AS x FROM ids),
        |b AS (SELECT doc_id, bw, bh, x, unnest(range(bh)) AS y FROM bx),
        |v AS (SELECT doc_id, bw, bh,
        |  (doc_id + 17 * x + 29 * y) % 256 AS val FROM b)
        |SELECT doc_id, CAST(8 * bw AS INT) AS width,
        |  CAST(8 * bh AS INT) AS height, CAST(1 AS INT) AS components,
        |  round(sum(val) / (1.0 * bw * bh), 4) AS mean_luma
        |FROM v GROUP BY doc_id, bw, bh""".stripMargin,

    // Nearest-neighbor sampling restated closed-form: the 4×3 output
    // reads source pixel (ox·w//4, oy·h//3); same luma formula on those.
    "q_bmp_resize" ->
      """WITH ids AS (
        |  SELECT doc_id, 8 + doc_id % 9 AS w, 4 + doc_id % 5 AS h
        |  FROM documents),
        |xs AS (SELECT doc_id, w, h, unnest(range(4)) AS ox FROM ids),
        |px AS (SELECT doc_id, w, h, ox, unnest(range(3)) AS oy FROM xs),
        |sp AS (SELECT doc_id, (ox * w) // 4 AS x, (oy * h) // 3 AS y FROM px),
        |l AS (SELECT doc_id,
        |  299 * ((doc_id + x + y) % 256) + 587 * ((doc_id + y) % 256)
        |    + 114 * ((doc_id + x) % 256) AS luma
        |  FROM sp)
        |SELECT doc_id, CAST(4 AS INT) AS width, CAST(3 AS INT) AS height,
        |  CAST(sum(luma) AS BIGINT) AS luma_sum
        |FROM l GROUP BY doc_id""".stripMargin,
    // Closed-form restatement of the planting rule: what the byte-level
    // sniffer must conclude from the real payloads.
    "q_media_sniff" ->
      """SELECT doc_id,
        |  CASE doc_id % 4 WHEN 0 THEN 'audio/wav' WHEN 1 THEN 'image/bmp'
        |    WHEN 2 THEN 'application/octet-stream'
        |    ELSE CASE WHEN doc_id % 8 = 3 THEN
        |        CASE (doc_id // 8) % 4 WHEN 0 THEN 'video/mp4'
        |          WHEN 1 THEN 'audio/mp4' WHEN 2 THEN 'video/quicktime'
        |          ELSE 'image/heic' END
        |      ELSE 'application/octet-stream' END END AS mime,
        |  CASE WHEN doc_id % 4 = 0 THEN 8000 + (doc_id % 5) * 4000 END
        |    AS sample_rate,
        |  CASE WHEN doc_id % 4 = 1 THEN 2 + doc_id % 3 END AS width,
        |  CASE WHEN doc_id % 8 = 3 THEN
        |    CASE (doc_id // 8) % 4 WHEN 0 THEN 'isom' WHEN 1 THEN 'M4A '
        |      WHEN 2 THEN 'qt  ' ELSE 'heic' END END AS brand
        |FROM documents""".stripMargin)
}
