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
}
