package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class PerceptualHashSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int, shift: Int = 0)(
      f: (Int, Int) => Int): Array[Byte] =
    Codecs.encodeBmp24(w, h, (x, y) => {
      val v = (f(x, y) + shift).max(0).min(255)
      (v, v, v)
    })

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  test("deterministic and equal for identical images") {
    val img = gradient(40, 30)((x, y) => (x * 5 + y) % 200)
    assert(PerceptualHash.dHashBmp(img) == PerceptualHash.dHashBmp(img))
  }

  test("brightness shift leaves the hash unchanged; inversion flips it") {
    val base = gradient(36, 24)((x, _) => x * 4)
    val brighter = gradient(36, 24, shift = 40)((x, _) => x * 4)
    assert(PerceptualHash.dHashBmp(base) == PerceptualHash.dHashBmp(brighter))
    // Monotone-increasing rows → all gradient bits set; inverted → none.
    val (lo, hi) = PerceptualHash.dHashBmp(base)
    assert(lo == 0xFFFFFFFFL && hi == 0xFFFFFFFFL)
    val inverted = gradient(36, 24)((x, _) => 255 - x * 4)
    assert(PerceptualHash.dHashBmp(inverted) == ((0L, 0L)))
  }

  test("rescaling the same scene preserves the hash; noise moves few bits") {
    def scene(wScale: Int): Array[Byte] =
      gradient(9 * wScale, 8 * wScale)((x, y) =>
        ((x / wScale) * 13 + (y / wScale) * 7) % 220)
    val small = PerceptualHash.dHashBmp(scene(1))
    val big = PerceptualHash.dHashBmp(scene(4))
    assert(hamming(small, big) == 0, s"hamming ${hamming(small, big)}")

    // One corrupted source pixel can only touch a handful of gradients.
    val clean = gradient(18, 16)((x, y) => (x * 9 + y * 3) % 210)
    val noisy = Codecs.encodeBmp24(18, 16, (x, y) => {
      val v = if (x == 7 && y == 5) 255 else (x * 9 + y * 3) % 210
      (v, v, v)
    })
    val d = hamming(PerceptualHash.dHashBmp(clean), PerceptualHash.dHashBmp(noisy))
    assert(d <= 4, s"noise moved $d bits")
  }

  test("rejects non-BMP payloads") {
    intercept[IllegalArgumentException] {
      PerceptualHash.dHashBmp("not an image".getBytes("US-ASCII"))
    }
  }
}
