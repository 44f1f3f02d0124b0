package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import java.nio.{ByteBuffer, ByteOrder}

class CodecsSpec extends AnyFunSuite {

  test("WAV roundtrip: header fields, sample count, peak, RMS") {
    val samples = Array[Short](0, 100, -200, 32767, -32768, 5)
    val w = Codecs.decodeWav(Codecs.encodeWavPcm16(44100, samples))
    assert(w.sampleRate == 44100 && w.channels == 1 && w.bitsPerSample == 16)
    assert(w.nSamples == 6 && w.peak == 32768)
    val expectedRms = math.sqrt(
      samples.map(s => s.toLong * s).sum / samples.length.toDouble)
    assert(w.rms == expectedRms)
  }

  test("WAV decoder skips unknown chunks before data (word-aligned)") {
    val base = Codecs.encodeWavPcm16(8000, Array[Short](7, -7))
    // Splice a 3-byte LIST chunk (padded to 4) between fmt and data.
    val insertAt = 36 // end of fmt chunk
    val extra = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    extra.put("LIST".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte](1, 2, 3, 0))
    val spliced = base.take(insertAt) ++ extra.array() ++ base.drop(insertAt)
    // Patch RIFF size (offset 4).
    val bb = ByteBuffer.wrap(spliced).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val w = Codecs.decodeWav(spliced)
    assert(w.nSamples == 2 && w.peak == 7)
  }

  test("WAV decoder rejects malformed input") {
    intercept[IllegalArgumentException](Codecs.decodeWav(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](
      Codecs.decodeWav("RIFFxxxxJUNK".getBytes("US-ASCII")))
    // Valid container, non-PCM format code.
    val bad = Codecs.encodeWavPcm16(8000, Array[Short](1))
    val bb = ByteBuffer.wrap(bad).order(ByteOrder.LITTLE_ENDIAN)
    bb.putShort(20, 3.toShort) // fmt audioFormat -> IEEE float
    intercept[IllegalArgumentException](Codecs.decodeWav(bad))
  }

  test("BMP roundtrip incl. non-multiple-of-4 row padding") {
    // width 3 -> rowBytes 9 -> pad 3; distinct per-pixel values.
    val enc = Codecs.encodeBmp24(3, 2, (x, y) => (10 * x + y, 20 + x, 40 + y))
    val d = Codecs.decodeBmp(enc)
    assert(d.width == 3 && d.height == 2 && d.bpp == 24)
    val lumaSum = (for { y <- 0 until 2; x <- 0 until 3 } yield
      299L * (10 * x + y) + 587L * (20 + x) + 114L * (40 + y)).sum
    assert(d.meanLuma == lumaSum / (1000.0 * 6))
  }

  test("BMP decoder rejects malformed input") {
    intercept[IllegalArgumentException](Codecs.decodeBmp(new Array[Byte](10)))
    val good = Codecs.encodeBmp24(2, 2, (_, _) => (1, 2, 3))
    val notBmp = good.clone(); notBmp(0) = 'X'.toByte
    intercept[IllegalArgumentException](Codecs.decodeBmp(notBmp))
    val truncated = good.take(good.length - 4)
    intercept[IllegalArgumentException](Codecs.decodeBmp(truncated))
  }

  test("BMP decoder rejects crafted headers (Int-overflow width, bad offset)") {
    val good = Codecs.encodeBmp24(2, 2, (_, _) => (1, 2, 3))
    // width = 800M: rowBytes would overflow Int — must require-fail, not
    // crash with an out-of-bounds read.
    val wideW = good.clone()
    val bb = ByteBuffer.wrap(wideW).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(18, 800000000)
    intercept[IllegalArgumentException](Codecs.decodeBmp(wideW))
    // Negative / out-of-payload pixel data offset.
    val badOff = good.clone()
    ByteBuffer.wrap(badOff).order(ByteOrder.LITTLE_ENDIAN).putInt(10, -100)
    intercept[IllegalArgumentException](Codecs.decodeBmp(badOff))
  }

  test("nearest-neighbor resize: identity roundtrip, 2x upscale block structure") {
    // Same-size resize reproduces the image byte-for-byte.
    val src = Codecs.encodeBmp24(5, 3, (x, y) => (x * 10, y * 20, x + y))
    assert(Codecs.resizeBmpNearest(src, 5, 3).sameElements(src))

    // 2×2 → 4×4: each source pixel becomes a 2×2 block (sx = ox*2/4).
    val quad = Codecs.encodeBmp24(2, 2,
      (x, y) => (x * 100 + y * 7, 0, 0))
    val up = Codecs.resizeBmpNearest(quad, 4, 4)
    val d = Codecs.decodeBmp(up)
    assert(d.width == 4 && d.height == 4)
    // Mean luma of the upscale equals the source's (every pixel ×4).
    assert(math.abs(d.meanLuma - Codecs.decodeBmp(quad).meanLuma) < 1e-12)

    // Downscale samples the floor grid: 4×4 gradient → 2×2 keeps (0,0),
    // (2,0), (0,2), (2,2).
    val grad = Codecs.encodeBmp24(4, 4, (x, y) => (x, y, 0))
    val down = Codecs.decodeBmp(Codecs.resizeBmpNearest(grad, 2, 2))
    val expect = Seq((0, 0), (2, 0), (0, 2), (2, 2))
      .map { case (x, y) => 299L * x + 587L * y }.sum / (1000.0 * 4)
    assert(math.abs(down.meanLuma - expect) < 1e-12)

    intercept[IllegalArgumentException](Codecs.resizeBmpNearest(src, 0, 2))
  }

  test("PNG roundtrip: gray + RGB, every filter type exercised") {
    // height 10 → the encoder's y % 5 filter cycle covers all five
    // filter types twice; decode must unfilter each correctly.
    val gray = Codecs.decodePng(Codecs.encodePngGray8(7, 10,
      (x, y) => (x * 13 + y * 31) % 256))
    assert(gray.width == 7 && gray.height == 10)
    assert(gray.bitDepth == 8 && gray.colorType == 0 && gray.channels == 1)
    val expectGray = (for (x <- 0 until 7; y <- 0 until 10)
      yield (x * 13 + y * 31) % 256).sum / 70.0
    assert(gray.meanLuma == expectGray)

    val rgb = Codecs.decodePng(Codecs.encodePngRgb8(5, 10,
      (x, y) => ((x * 7) % 256, (y * 11) % 256, (x + y) % 256)))
    assert(rgb.colorType == 2 && rgb.channels == 3)
    val expectRgb = (for (x <- 0 until 5; y <- 0 until 10)
      yield 299L * ((x * 7) % 256) + 587L * ((y * 11) % 256) +
        114L * ((x + y) % 256)).sum / (1000.0 * 50)
    assert(rgb.meanLuma == expectRgb)
  }

  test("PNG decoder verifies chunk CRCs and stream length") {
    val ok = Codecs.encodePngGray8(6, 4, (x, y) => x + y)
    // Flip one byte inside the first IDAT payload → CRC must catch it.
    val idatOff = {
      // signature(8) + IHDR chunk (8 + 13 + 4) → first chunk after
      8 + 25 + 8 // + its own length/type header
    }
    val bad = ok.clone()
    bad(idatOff) = (bad(idatOff) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException](Codecs.decodePng(bad))
    assert(e.getMessage.contains("CRC"))
    // Truncated input rejected.
    intercept[IllegalArgumentException](
      Codecs.decodePng(ok.take(ok.length - 6)))
    // Bad signature rejected.
    intercept[IllegalArgumentException](
      Codecs.decodePng("not a png at all".getBytes("US-ASCII")))
  }

  test("PNG decoder concatenates the zlib stream across split IDATs") {
    // The encoder always splits IDAT in two when possible; a 1×1 image
    // exercises the degenerate single-chunk path too.
    val big = Codecs.decodePng(Codecs.encodePngGray8(40, 30, (x, y) => 200))
    assert(big.width == 40 && big.height == 30 && big.meanLuma == 200.0)
    val tiny = Codecs.decodePng(Codecs.encodePngGray8(1, 1, (_, _) => 42))
    assert(tiny.meanLuma == 42.0)
  }

  test("audio frames: peak/zcr/rms per frame, trailing partial dropped") {
    // 2.5 frames of 4 samples → 2 full frames.
    val pcm = Array[Short](100, -100, 100, -100, /* frame 0: zcr 3 */
      50, 60, 70, -80, /* frame 1: zcr 1 */
      7, 7) // trailing partial: dropped
    val f = Codecs.audioFrames(pcm, 4)
    assert(f.map(_.frameIdx) === Seq(0, 1))
    assert(f(0).peak === 100 && f(0).zcr === 3)
    assert(f(1).peak === 80 && f(1).zcr === 1)
    assert(f(0).rms === 100.0)
    assert(f(1).rms === math.sqrt((50 * 50 + 60 * 60 + 70 * 70 + 80 * 80) / 4.0))
  }

  test("audio frames: zero counts as positive for zero crossings") {
    // 0 >= 0 is positive: 0 → -1 crosses, -1 → 0 crosses, 0 → 1 doesn't.
    val f = Codecs.audioFrames(Array[Short](0, -1, 0, 1), 4)
    assert(f.head.zcr === 2)
  }

  test("audio frames: round-trips through the real WAV codec") {
    val pcm = Array.tabulate(130)(i => ((i * 997) % 8191 - 4096).toShort)
    val (info, decoded) = Codecs.decodeWavSamples(
      Codecs.encodeWavPcm16(16000, pcm))
    assert(info.nSamples === 130)
    assert(decoded.sameElements(pcm))
    assert(Codecs.audioFrames(decoded, 64).size === 2)
  }

  test("audio frames: short input yields no frames; tiny frame size rejected") {
    assert(Codecs.audioFrames(Array[Short](1, 2, 3), 4).isEmpty)
    intercept[IllegalArgumentException](Codecs.audioFrames(Array[Short](1), 1))
  }

  test("crafted size arithmetic fails the IAE contract cleanly: PNG " +
      "chunk-length wrap, PNG giant dims, BMP product wrap") {
    // PNG: signature + chunk length 0x7FFFFFFF — `len + 8` wraps Int,
    // which used to pass the remaining-bytes check and allocate ~2 GB.
    val pngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val wrapChunk = pngSig ++ Array[Byte](0x7f, -1, -1, -1) ++ "IHDR".getBytes
    intercept[IllegalArgumentException](Codecs.decodePng(wrapChunk))

    // PNG: valid-CRC IHDR declaring dims whose raw plane cannot fit any
    // inflate of the (empty) IDAT payload.
    val good = Codecs.encodePngGray8(2, 2, (_, _) => 7)
    val giant = good.clone()
    val gb = ByteBuffer.wrap(giant)
    gb.putInt(16, 715827883) // width: 3*w wraps Int
    // Recompute the IHDR CRC so the dim check (not the CRC) must reject.
    val typAndData = java.util.Arrays.copyOfRange(giant, 12, 12 + 4 + 13)
    val crc = new java.util.zip.CRC32(); crc.update(typAndData)
    gb.putInt(12 + 4 + 13, crc.getValue.toInt)
    intercept[IllegalArgumentException](Codecs.decodePng(giant))

    // BMP: width AND height near 2^31 — the old strideL*height guard
    // itself wrapped Long and passed.
    val bmp = Codecs.encodeBmp24(2, 2, (_, _) => (1, 2, 3))
    val wrapBmp = bmp.clone()
    val bb = ByteBuffer.wrap(wrapBmp).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(18, 1500000000); bb.putInt(22, 2100000000)
    intercept[IllegalArgumentException](Codecs.decodeBmp(wrapBmp))
  }
}
