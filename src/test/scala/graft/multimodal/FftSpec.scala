package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class FftSpec extends AnyFunSuite {

  test("impulse transforms to a flat spectrum") {
    val re = Array.fill(16)(0.0); re(0) = 1.0
    val im = Array.fill(16)(0.0)
    Fft.transform(re, im)
    (0 until 16).foreach { k =>
      assert(math.abs(re(k) - 1.0) < 1e-12 && math.abs(im(k)) < 1e-12)
    }
  }

  test("Parseval: time energy equals spectrum energy / N") {
    val rnd = new scala.util.Random(3)
    val n = 128
    val x = Array.fill(n)(rnd.nextDouble() * 2 - 1)
    val re = x.clone(); val im = Array.fill(n)(0.0)
    Fft.transform(re, im)
    val tEnergy = x.map(v => v * v).sum
    val fEnergy = (0 until n).map(k => re(k) * re(k) + im(k) * im(k)).sum / n
    assert(math.abs(tEnergy - fEnergy) < 1e-9 * tEnergy)
  }

  test("on-bin sinusoids peak at their bin across the range") {
    for (bin <- Seq(1, 3, 17, 42, 100, 127)) {
      val s = Array.tabulate[Short](256)(t =>
        math.round(10000.0 * math.sin(2 * math.Pi * bin * t / 256.0)).toShort)
      assert(Fft.peakBin(s, 0, 256) == bin, s"bin $bin")
    }
  }

  test("the stronger of two tones wins; frames are independent") {
    val strongWeak = Array.tabulate[Short](256)(t =>
      (math.round(9000.0 * math.sin(2 * math.Pi * 11 * t / 256.0)) +
        math.round(2000.0 * math.sin(2 * math.Pi * 40 * t / 256.0))).toShort)
    assert(Fft.peakBin(strongWeak, 0, 256) == 11)
    // Two frames with different tones report per-frame peaks.
    val f0 = Array.tabulate[Short](256)(t =>
      math.round(8000.0 * math.sin(2 * math.Pi * 5 * t / 256.0)).toShort)
    val f1 = Array.tabulate[Short](256)(t =>
      math.round(8000.0 * math.sin(2 * math.Pi * 30 * t / 256.0)).toShort)
    assert(Fft.framePeaks(f0 ++ f1, 256) == Seq((0, 5), (1, 30)))
  }

  test("rejects non-power-of-two lengths") {
    intercept[IllegalArgumentException] {
      Fft.transform(new Array[Double](12), new Array[Double](12))
    }
    intercept[IllegalArgumentException] {
      Fft.framePeaks(new Array[Short](100), 100)
    }
  }
}
