package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL pure-JVM codecs for the two container formats that need no
  * external library: RIFF/WAVE (PCM 16-bit) and BMP (24-bit
  * uncompressed). These are not stubs — `decodeWav` walks RIFF chunks
  * and decodes little-endian PCM; `decodeBmp` parses the
  * BITMAPINFOHEADER and iterates padded BGR rows. Formats that
  * genuinely require native libraries (JPEG, MP4, …) remain behind the
  * documented `DECODE_STUB` seam in [[Multimodal]]; these two give the
  * pipeline an end-to-end bytes→features path whose arithmetic an
  * independent engine can reproduce.
  *
  * All parsing is strict: wrong magic, truncated chunks, or unsupported
  * encodings throw `IllegalArgumentException` — a media scan routes
  * those to the dead-letter side, same as the parse engine does for
  * text.
  */
object Codecs {

  final case class WavInfo(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      nSamples: Int, peak: Int, rms: Double)

  final case class BmpInfo(
      width: Int, height: Int, bpp: Int, meanLuma: Double)

  // ---------------------------------------------------------------- WAV

  /** PCM 16-bit mono/stereo WAV encoder (RIFF + fmt + data chunks). */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short],
      channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Strict RIFF/WAVE parse + PCM decode: chunk walk (fmt before data,
    * unknown chunks skipped by their declared size), then peak / RMS
    * over the decoded samples. RMS sums integer squares (exact below
    * 2^53) and divides once, so any engine reproduces it bit-for-bit.
    */
  def decodeWav(bytes: Array[Byte]): WavInfo = decodeWavSamples(bytes)._1

  /** One audio frame's features: integer peak and zero-crossing count
    * (exact on any engine), float64 RMS from the exact integer
    * square-sum.
    */
  final case class AudioFrame(frameIdx: Int, peak: Int, zcr: Int, rms: Double)

  /** [[decodeWav]] plus the raw PCM samples — the input to framed
    * feature extraction.
    */
  def decodeWavSamples(bytes: Array[Byte]): (WavInfo, Array[Short]) = {
    require(bytes.length >= 12, "truncated RIFF header")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(tag(buf) == "RIFF", "not a RIFF container")
    buf.getInt // declared riff size (unchecked: streams often patch it)
    require(tag(buf) == "WAVE", "not a WAVE form")

    var sampleRate = -1; var channels = -1; var bits = -1
    var data: Array[Short] = null
    while (buf.remaining() >= 8 && (data == null || sampleRate < 0)) {
      val id = tag(buf); val size = buf.getInt
      require(size >= 0 && size <= buf.remaining(), s"chunk $id overruns payload")
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too small")
          val fmtEnd = buf.position() + size
          require(buf.getShort == 1, "only PCM supported")
          channels = buf.getShort.toInt
          sampleRate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          bits = buf.getShort.toInt
          require(bits == 16, "only 16-bit PCM supported")
          buf.position(fmtEnd)
        case "data" =>
          require(size % 2 == 0, "odd PCM data length")
          data = new Array[Short](size / 2)
          var i = 0
          while (i < data.length) { data(i) = buf.getShort; i += 1 }
        case _ => // skip unknown chunk (word-aligned)
          buf.position(buf.position() + size + (size & 1))
      }
    }
    require(sampleRate > 0 && data != null, "missing fmt or data chunk")
    var peak = 0; var sumSq = 0L
    data.foreach { s =>
      val v = math.abs(s.toInt)
      if (v > peak) peak = v
      sumSq += s.toLong * s.toLong
    }
    val rms = if (data.isEmpty) 0.0 else math.sqrt(sumSq / data.length.toDouble)
    (WavInfo(sampleRate, channels, bits, data.length, peak, rms), data)
  }

  /** Framed audio features — the per-frame slice of the audio
    * feature-extraction stage (VAD energy gates, silence trim, loudness
    * curves all start from exactly these): non-overlapping `frameSize`
    * windows, trailing partial frame dropped. Per frame: integer peak,
    * zero-crossing count (sign change between consecutive samples,
    * s ≥ 0 counting as positive), and RMS from the exact integer square
    * sum. All integer until the final sqrt, so any engine reproduces
    * the values.
    */
  def audioFrames(samples: Array[Short], frameSize: Int): Seq[AudioFrame] = {
    require(frameSize >= 2, "frame must hold at least 2 samples")
    val nFrames = samples.length / frameSize
    (0 until nFrames).map { f =>
      val base = f * frameSize
      var peak = 0; var zcr = 0; var sumSq = 0L
      var i = 0
      while (i < frameSize) {
        val s = samples(base + i).toInt
        val v = math.abs(s)
        if (v > peak) peak = v
        sumSq += s.toLong * s.toLong
        if (i > 0 && ((s >= 0) != (samples(base + i - 1).toInt >= 0))) zcr += 1
        i += 1
      }
      AudioFrame(f, peak, zcr, math.sqrt(sumSq / frameSize.toDouble))
    }
  }

  // ---------------------------------------------------------------- BMP

  /** 24-bit uncompressed bottom-up BMP encoder (BITMAPINFOHEADER, rows
    * padded to 4 bytes). `px(x, y)` returns (r, g, b) with y=0 the TOP
    * row — the encoder writes rows bottom-up as the format requires.
    */
  def encodeBmp24(width: Int, height: Int,
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataLen = (rowBytes + pad) * height
    val buf = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24).putInt(0).putInt(dataLen)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1
    while (y >= 0) { // bottom-up
      var x = 0
      while (x < width) {
        val (r, g, b) = px(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte) // BGR on disk
        x += 1
      }
      var p = 0
      while (p < pad) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** (width, height, dataOffset, stride) of a validated 24bpp BMP —
    * strict parse (magic, uncompressed, declared data offset honored,
    * padded bottom-up rows), shared with [[PerceptualHash]] for direct
    * pixel addressing. */
  private[multimodal] def bmpHeader(bytes: Array[Byte]): (Int, Int, Int, Int) =
    parseBmpHeader(bytes)

  private def parseBmpHeader(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    require(bytes.length >= 54, "truncated BMP header")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 'B'.toByte && buf.get() == 'M'.toByte, "not a BMP")
    buf.getInt; buf.getInt // file size, reserved
    val dataOffset = buf.getInt
    require(dataOffset >= 54 && dataOffset <= bytes.length,
      "pixel data offset outside payload")
    require(buf.getInt == 40, "only BITMAPINFOHEADER supported")
    val width = buf.getInt
    val height = buf.getInt
    require(width > 0 && height > 0, "top-down/degenerate BMP unsupported")
    buf.getShort // planes
    val bpp = buf.getShort.toInt
    require(bpp == 24, "only 24bpp supported")
    require(buf.getInt == 0, "compressed BMP unsupported")
    // Size math in Long: crafted width/height must fail the require, not
    // overflow Int into a bounds check that passes and an AIOOBE later.
    // Division form, not `strideL * height <=`: the PRODUCT itself wraps
    // Long for width/height both near 2^31, silently passing the check
    // it exists for.
    val strideL = { val rb = 3L * width; rb + (4 - rb % 4) % 4 }
    require(height.toLong <= (bytes.length.toLong - dataOffset) / strideL,
      "pixel data truncated")
    (width, height, dataOffset, strideL.toInt)
  }

  /** Nearest-neighbor BMP resize, pure JVM — the "thumbnail for the
    * vision encoder" step, byte-in/byte-out so it runs as the same
    * map-only `mapPartitions` stage as the decoders. Source pixel for
    * output (ox, oy) is (ox·w div outW, oy·h div outH) in the LOGICAL
    * coordinates of the encoder's callback, so planted closed-form
    * images stay closed-form after resizing (`q_bmp_resize`).
    */
  def resizeBmpNearest(bytes: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    require(outW > 0 && outH > 0, "degenerate output size")
    val (width, height, dataOffset, stride) = parseBmpHeader(bytes)
    def srcPx(ox: Int, oy: Int): (Int, Int, Int) = {
      // Long intermediates: ox*width in Int wraps for wide sources or
      // large upscale targets, driving a negative byte offset.
      val sx = (ox.toLong * width / outW).toInt
      val sy = (oy.toLong * height / outH).toInt
      // Logical row sy was written at file row (height-1-sy) (bottom-up).
      val off = dataOffset + (height - 1 - sy) * stride + 3 * sx
      ((bytes(off + 2) & 0xff, bytes(off + 1) & 0xff, bytes(off) & 0xff))
    }
    encodeBmp24(outW, outH, srcPx)
  }

  /** Decode a 24bpp BMP. Mean luma sums the integer weighted channels
    * (299·R + 587·G + 114·B per pixel — exact) and divides once by
    * 1000·n. */
  def decodeBmp(bytes: Array[Byte]): BmpInfo = {
    val (width, height, dataOffset, stride) = parseBmpHeader(bytes)
    val bpp = 24

    var lumaSum = 0L
    var y = 0
    while (y < height) {
      var off = dataOffset + y * stride
      var x = 0
      while (x < width) {
        val b = bytes(off) & 0xff
        val g = bytes(off + 1) & 0xff
        val r = bytes(off + 2) & 0xff
        lumaSum += 299L * r + 587L * g + 114L * b
        off += 3; x += 1
      }
      y += 1
    }
    BmpInfo(width, height, bpp,
      lumaSum / (1000.0 * width * height))
  }

  private def tag(buf: ByteBuffer): String = {
    val a = new Array[Byte](4); buf.get(a); new String(a, "US-ASCII")
  }

  // ---------------------------------------------------------------- PNG

  final case class PngInfo(
      width: Int, height: Int, bitDepth: Int, colorType: Int,
      channels: Int, meanLuma: Double)

  private val pngSignature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def pngCrc(typ: Array[Byte], data: Array[Byte]): Int = {
    val crc = new java.util.zip.CRC32()
    crc.update(typ); crc.update(data)
    crc.getValue.toInt
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val t = typ.getBytes("US-ASCII")
    out.write(ByteBuffer.allocate(4).putInt(data.length).array())
    out.write(t)
    out.write(data)
    out.write(ByteBuffer.allocate(4).putInt(pngCrc(t, data)).array())
  }

  private def encodePng(width: Int, height: Int, channels: Int,
      sample: (Int, Int) => Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0, "degenerate image size")
    val stride = width * channels
    // Scanlines: rows CYCLE through all five PNG filter types
    // (None/Sub/Up/Average/Paeth), so decoding exercises the whole
    // unfilter matrix, not just the trivial path.
    val raw = new Array[Byte](height * (1 + stride))
    val prev = new Array[Int](stride)
    val cur = new Array[Int](stride)
    for (y <- 0 until height) {
      // One callback evaluation per PIXEL, not per channel: sample(x, y)
      // allocates a fresh array, so looping channels outside it tripled
      // the encoder work on every planted image.
      for (x <- 0 until width) {
        val s = sample(x, y)
        var ch = 0
        while (ch < channels) {
          cur(x * channels + ch) = s(ch) & 0xff
          ch += 1
        }
      }
      val ft = y % 5
      raw(y * (1 + stride)) = ft.toByte
      for (x <- 0 until stride) {
        val a = if (x >= channels) cur(x - channels) else 0
        val b = prev(x)
        val c = if (x >= channels) prev(x - channels) else 0
        val f = ft match {
          case 0 => cur(x)
          case 1 => cur(x) - a
          case 2 => cur(x) - b
          case 3 => cur(x) - (a + b) / 2
          case 4 => cur(x) - paeth(a, b, c)
        }
        raw(y * (1 + stride) + 1 + x) = (f & 0xff).toByte
      }
      Array.copy(cur, 0, prev, 0, stride)
    }
    // Real zlib deflate (java.util.zip) — decode must really inflate.
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!defl.finished()) zOut.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val z = zOut.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    out.write(pngSignature)
    val colorType = if (channels == 1) 0 else 2
    val ihdr = ByteBuffer.allocate(13).putInt(width).putInt(height)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    writeChunk(out, "IHDR", ihdr.array())
    // IDAT split across two chunks: a conforming decoder must
    // concatenate the zlib stream across IDATs.
    val half = z.length / 2
    if (half > 0) {
      writeChunk(out, "IDAT", z.take(half))
      writeChunk(out, "IDAT", z.drop(half))
    } else writeChunk(out, "IDAT", z)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** 8-bit grayscale PNG (color type 0). */
  def encodePngGray8(width: Int, height: Int,
      px: (Int, Int) => Int): Array[Byte] =
    encodePng(width, height, 1, (x, y) => Array(px(x, y)))

  /** 8-bit RGB PNG (color type 2). */
  def encodePngRgb8(width: Int, height: Int,
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] =
    encodePng(width, height, 3, { (x, y) =>
      val (r, g, b) = px(x, y); Array(r, g, b)
    })

  /** Strict PNG decode for the subset the encoder emits — which is a
    * REAL decode path: signature check, chunk walk with CRC32
    * verification on every chunk, multi-IDAT zlib concatenation, actual
    * `java.util.zip.Inflater` inflate, and full five-way unfiltering
    * (None/Sub/Up/Average/Paeth). 8-bit grayscale and RGB,
    * non-interlaced; anything else throws, same dead-letter contract as
    * the other codecs. Mean luma sums integer-weighted channels
    * (299/587/114 per mille for RGB, raw samples for gray) and divides
    * once — engine-reproducible.
    */
  def decodePng(bytes: Array[Byte]): PngInfo = {
    require(bytes.length >= 8 && bytes.take(8).sameElements(pngSignature),
      "not a PNG signature")
    val buf = ByteBuffer.wrap(bytes, 8, bytes.length - 8)
    var w = -1; var h = -1; var depth = -1; var color = -1
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      require(buf.remaining >= 8, "truncated chunk header")
      val len = buf.getInt
      // Long arithmetic: `len + 8` in Int wraps negative for a crafted
      // len near Int.MaxValue, making the bound trivially true and the
      // allocation below a ~2 GB OOM instead of the contract's IAE.
      require(len >= 0 && buf.remaining >= len.toLong + 8, "truncated chunk")
      val typ = new Array[Byte](4); buf.get(typ)
      val data = new Array[Byte](len); buf.get(data)
      val crc = buf.getInt
      require(crc == pngCrc(typ, data),
        s"CRC mismatch in ${new String(typ, "US-ASCII")} chunk")
      new String(typ, "US-ASCII") match {
        case "IHDR" =>
          require(len == 13, "bad IHDR length")
          val ib = ByteBuffer.wrap(data)
          w = ib.getInt; h = ib.getInt
          depth = ib.get & 0xff; color = ib.get & 0xff
          val comp = ib.get; val filt = ib.get; val inter = ib.get
          require(w > 0 && h > 0, "degenerate dimensions")
          require(depth == 8, s"unsupported bit depth $depth")
          require(color == 0 || color == 2, s"unsupported color type $color")
          require(comp == 0 && filt == 0 && inter == 0,
            "unsupported compression/filter/interlace method")
          seenIhdr = true
        case "IDAT" =>
          require(seenIhdr, "IDAT before IHDR")
          idat.write(data)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunks skipped
      }
    }
    require(seenIhdr, "missing IHDR")
    val channels = if (color == 0) 1 else 3
    // Long-checked sizing: header-declared dims up to Int.MaxValue pass
    // the > 0 checks, and Int `w*channels` / `h*(1+stride)` would wrap
    // negative (NegativeArraySizeException escaping the IAE contract) or
    // allocate gigabytes from a tiny file. DEFLATE expands at most
    // ~1032:1, so the raw plane can never legitimately exceed that
    // multiple of the IDAT payload — a cheap, principled cap.
    val strideL = w.toLong * channels
    val rawL = (1L + strideL) * h
    require(rawL <= idat.size().toLong * 1032 + 64,
      s"declared dimensions ${w}x$h exceed any possible inflate of the " +
        s"${idat.size()}-byte IDAT payload")
    val stride = strideL.toInt
    val raw = new Array[Byte](rawL.toInt)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0; var n = 1
    while (off < raw.length && n != 0) {
      n = inf.inflate(raw, off, raw.length - off)
      off += n
    }
    val fullyConsumed = inf.finished()
    inf.end()
    require(off == raw.length && fullyConsumed,
      s"IDAT inflates to $off bytes, expected ${raw.length}")

    val prev = new Array[Int](stride)
    val cur = new Array[Int](stride)
    var lumaSum = 0L
    for (y <- 0 until h) {
      val ft = raw(y * (1 + stride)) & 0xff
      require(ft <= 4, s"unknown filter type $ft")
      for (x <- 0 until stride) {
        val fx = raw(y * (1 + stride) + 1 + x) & 0xff
        val a = if (x >= channels) cur(x - channels) else 0
        val b = prev(x)
        val c = if (x >= channels) prev(x - channels) else 0
        val v = ft match {
          case 0 => fx
          case 1 => fx + a
          case 2 => fx + b
          case 3 => fx + (a + b) / 2
          case 4 => fx + paeth(a, b, c)
        }
        cur(x) = v & 0xff
      }
      if (channels == 1) {
        var x = 0; while (x < stride) { lumaSum += cur(x); x += 1 }
      } else {
        var x = 0
        while (x < stride) {
          lumaSum += 299L * cur(x) + 587L * cur(x + 1) + 114L * cur(x + 2)
          x += 3
        }
      }
      Array.copy(cur, 0, prev, 0, stride)
    }
    val mean =
      if (channels == 1) lumaSum.toDouble / (w.toLong * h)
      else lumaSum / (1000.0 * w * h)
    PngInfo(w, h, depth, color, channels, mean)
  }
}
