package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class JpegSpec extends AnyFunSuite {

  private def maxAbsErr(got: Array[Int], want: (Int, Int) => Int,
      w: Int, h: Int): Int =
    (0 until h).flatMap(y => (0 until w).map(x =>
      math.abs(got(y * w + x) - want(x, y)))).max

  test("constant 8x8 blocks round-trip EXACTLY at quant 8 (DC-only energy)") {
    val (w, h) = (24, 16)
    def block(x: Int, y: Int): Int = (7 + 17 * (x / 8) + 29 * (y / 8)) % 256
    val bytes = Jpeg.encodeGray(w, h, block, quant = 8)
    val (info, planes) = Jpeg.decodePixels(bytes)
    assert(info.width === w && info.height === h && info.components === 1)
    assert(maxAbsErr(planes(0), block, w, h) === 0)
    val exactMean = (for (by <- 0 until 2; bx <- 0 until 3)
      yield (7 + 17 * bx + 29 * by) % 256).sum / 6.0
    assert(info.meanLuma === exactMean)
  }

  test("general grayscale image round-trips within a small bounded error") {
    val (w, h) = (32, 24)
    def px(x: Int, y: Int): Int = ((x * 31 + y * 57 + (x * y) % 13) % 256)
    val bytes = Jpeg.encodeGray(w, h, px, quant = 1)
    val (info, planes) = Jpeg.decodePixels(bytes)
    assert(info.width === w && info.height === h)
    assert(maxAbsErr(planes(0), px, w, h) <= 8)
    val meanErr = (for (y <- 0 until h; x <- 0 until w)
      yield math.abs(planes(0)(y * w + x) - px(x, y)).toDouble).sum / (w * h)
    assert(meanErr <= 1.5)
  }

  test("color 4:4:4 round-trips within YCbCr conversion tolerance") {
    val (w, h) = (16, 16)
    def px(x: Int, y: Int): (Int, Int, Int) =
      ((x * 16) % 256, (y * 16) % 256, (x * 7 + y * 11) % 256)
    val bytes = Jpeg.encodeRgb(w, h, px, quant = 1)
    val (info, planes) = Jpeg.decodePixels(bytes)
    assert(info.components === 3)
    for (c <- 0 until 3) {
      val want = (x: Int, y: Int) => c match {
        case 0 => px(x, y)._1; case 1 => px(x, y)._2; case 2 => px(x, y)._3
      }
      assert(maxAbsErr(planes(c), want, w, h) <= 12,
        s"channel $c error too large")
    }
  }

  test("non-multiple-of-8 dimensions: edge padding encodes, decode crops") {
    val (w, h) = (13, 11)
    def px(x: Int, y: Int): Int = (x * 19 + y * 5) % 256
    val bytes = Jpeg.encodeGray(w, h, px, quant = 1)
    val (info, planes) = Jpeg.decodePixels(bytes)
    assert(info.width === 13 && info.height === 11)
    assert(planes(0).length === 13 * 11)
    assert(maxAbsErr(planes(0), px, w, h) <= 8)
  }

  test("restart markers: interval 2 decodes identically to no restarts") {
    val (w, h) = (40, 24) // 5x3 = 15 MCUs → 7 RST markers, ids cycle
    def px(x: Int, y: Int): Int = (x * 11 + y * 23 + 5) % 256
    val plain = Jpeg.decodePixels(Jpeg.encodeGray(w, h, px, quant = 4))
    val rst = Jpeg.decodePixels(Jpeg.encodeGray(w, h, px, quant = 4,
      restartInterval = 2))
    assert(rst._1 === plain._1)
    assert(rst._2(0).sameElements(plain._2(0)))
    // The restart stream really does contain RST markers.
    val bytes = Jpeg.encodeGray(w, h, px, quant = 4, restartInterval = 2)
    val rstCount = bytes.sliding(2).count(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7)
    assert(rstCount === 7)
  }

  test("mean luma matches the PNG convention on the same planted image") {
    // Same pixels through the lossless codec: at quant 1 the JPEG mean
    // must land within rounding noise of PNG's exact integer mean.
    val (w, h) = (16, 8)
    def px(x: Int, y: Int): Int = (x * 3 + y * 7) % 256
    val png = Codecs.decodePng(Codecs.encodePngGray8(w, h, px))
    val jpg = Jpeg.decode(Jpeg.encodeGray(w, h, px, quant = 1))
    assert(math.abs(png.meanLuma - jpg.meanLuma) <= 1.0)
  }

  test("strictness: truncation, bad SOI, and progressive SOF all throw") {
    val ok = Jpeg.encodeGray(16, 16, (x, y) => (x + y) % 256)
    intercept[IllegalArgumentException](Jpeg.decode(ok.take(20)))
    intercept[IllegalArgumentException](Jpeg.decode(Array[Byte](1, 2, 3, 4)))
    // Flip SOF0 (0xC0) to SOF2 (progressive): same layout, must be refused.
    val prog = ok.clone()
    var i = 0; var flipped = false
    while (i < prog.length - 1 && !flipped) {
      if ((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0) {
        prog(i + 1) = 0xc2.toByte; flipped = true
      }
      i += 1
    }
    assert(flipped)
    val e = intercept[IllegalArgumentException](Jpeg.decode(prog))
    assert(e.getMessage.contains("baseline"))
  }

  test("crafted SOF dims and truncated DQT/DHT segments fail cleanly, " +
      "never AIOOBE or gigabyte allocations") {
    // A real small JPEG, then surgically corrupt copies.
    val good = Jpeg.encodeGray(16, 16, (_, _) => 77, quant = 8)
    def findMarker(b: Array[Byte], m: Int): Int = {
      var i = 2
      while (i < b.length - 1 &&
        !((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == m)) i += 1
      i
    }
    // SOF0 dims 65535x65535: w*h wraps Int (or allocates GBs).
    val sof = findMarker(good, 0xc0)
    assert(sof < good.length - 1, "fixture must carry SOF0")
    val giant = good.clone()
    giant(sof + 5) = -1; giant(sof + 6) = -1 // height = 0xffff
    giant(sof + 7) = -1; giant(sof + 8) = -1 // width  = 0xffff
    intercept[IllegalArgumentException](Jpeg.decode(giant))
    // DQT with an undersized declared length: table bytes must not be
    // read from the next segment or past EOF.
    val dqt = findMarker(good, 0xdb)
    assert(dqt < good.length - 1, "fixture must carry DQT")
    val shortDqt = good.clone()
    shortDqt(dqt + 2) = 0; shortDqt(dqt + 3) = 6 // len 6 < 2 + 65
    intercept[IllegalArgumentException](Jpeg.decode(shortDqt))
  }
}
