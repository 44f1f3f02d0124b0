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
  def decodeWav(bytes: Array[Byte]): WavInfo = {
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
    WavInfo(sampleRate, channels, bits, data.length, peak, rms)
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

  /** Strict BMP parse: magic, 24bpp uncompressed, declared data offset
    * honored, padded bottom-up rows. Mean luma sums the integer
    * weighted channels (299·R + 587·G + 114·B per pixel — exact) and
    * divides once by 1000·n.
    */
  /** Strict shared header parse: (width, height, dataOffset, stride). */
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
    val strideL = { val rb = 3L * width; rb + (4 - rb % 4) % 4 }
    require(strideL * height <= bytes.length.toLong - dataOffset,
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
      val sx = ox * width / outW
      val sy = oy * height / outH
      // Logical row sy was written at file row (height-1-sy) (bottom-up).
      val off = dataOffset + (height - 1 - sy) * stride + 3 * sx
      ((bytes(off + 2) & 0xff, bytes(off + 1) & 0xff, bytes(off) & 0xff))
    }
    encodeBmp24(outW, outH, srcPx)
  }

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
}
