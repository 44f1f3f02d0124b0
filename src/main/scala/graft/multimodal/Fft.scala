package graft.multimodal

/** Radix-2 FFT and spectral-peak extraction — the frequency-domain half
  * of audio fingerprinting (Wang 2003-style constellation points start
  * from exactly this: dominant spectral peaks per frame). Pure JVM,
  * iterative (bit-reversal permutation + butterfly passes), O(n log n),
  * no allocation beyond the caller's buffers.
  *
  * Determinism: the butterfly schedule is fixed, so identical inputs
  * produce bit-identical spectra on every JVM; peak selection compares
  * squared magnitudes with a lower-bin tie-break. Planted integer-period
  * sinusoids concentrate ALL energy in one bin, which is what lets
  * `q_audio_fingerprint` gate the whole decode→FFT→peak path against a
  * closed-form SQL oracle.
  */
object Fft {

  /** In-place FFT of the complex sequence (re, im); length must be a
    * power of two.
    */
  def transform(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length, "re/im length mismatch")
    require(n > 0 && (n & (n - 1)) == 0, s"FFT length must be a power of 2, got $n")

    // Bit-reversal permutation.
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }

    // Butterfly passes.
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val p = base + k
          val q = p + len / 2
          val vr = re(q) * cr - im(q) * ci
          val vi = re(q) * ci + im(q) * cr
          re(q) = re(p) - vr
          im(q) = im(p) - vi
          re(p) += vr
          im(p) += vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Dominant non-DC bin of `samples[offset, offset+n)`: argmax of |X_k|²
    * over k ∈ [1, n/2], ties to the lower bin. Rectangular window (the
    * closed-form-friendly choice; callers needing leakage control can
    * pre-window).
    */
  def peakBin(samples: Array[Short], offset: Int, n: Int): Int = {
    require(n >= 2, s"peakBin needs n >= 2 (no non-DC bin exists for n=$n)")
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    var i = 0
    while (i < n) { re(i) = samples(offset + i).toDouble; i += 1 }
    transform(re, im)
    var best = 1
    var bestMag = re(1) * re(1) + im(1) * im(1)
    var k = 2
    while (k <= n / 2) {
      val m = re(k) * re(k) + im(k) * im(k)
      if (m > bestMag) { best = k; bestMag = m }
      k += 1
    }
    best
  }

  /** (frameIdx, peakBin) per complete non-overlapping frame. */
  def framePeaks(samples: Array[Short], frameSize: Int): Seq[(Int, Int)] = {
    require(frameSize > 0 && (frameSize & (frameSize - 1)) == 0,
      s"frame size must be a power of 2, got $frameSize")
    (0 until samples.length / frameSize).map(f =>
      (f, peakBin(samples, f * frameSize, frameSize)))
  }
}
