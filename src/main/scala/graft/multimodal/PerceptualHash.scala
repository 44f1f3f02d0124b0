package graft.multimodal

/** Perceptual image hashing (dHash, the gradient variant): resize to a
  * 9×8 thumbnail through the REAL nearest-neighbor byte-level resize,
  * integer luma per pixel, one bit per horizontal gradient — 64 bits
  * that survive recompression, mild rescaling, and brightness shifts,
  * which byte-exact digests do not. Near-duplicate images then reduce to
  * a Hamming-distance join over BIGINT columns (`bit_count(a ^ b)`), the
  * same banded/bucketed relational machinery the text SimHash family
  * uses — no image bytes ever cross a shuffle.
  *
  * Everything is integer (the ×299/587/114 luma the other image oracles
  * use; floor-div resize sampling), so the hash is engine- and
  * run-exact: `q_image_phash` derives it closed-form in SQL from the
  * planted pixel function.
  */
object PerceptualHash {

  /** (low 32 bits, high 32 bits) of the 64-bit dHash of a 24bpp BMP.
    * Bit oy·8+ox is set when luma(ox+1, oy) > luma(ox, oy) in the 9×8
    * thumbnail. Split halves keep every consumer (including engines
    * whose BIGINT shift cannot reach bit 63) in unsigned-safe range.
    */
  def dHashBmp(bmp: Array[Byte]): (Long, Long) = {
    val thumb = Codecs.resizeBmpNearest(bmp, 9, 8)
    val (w, h, dataOffset, stride) = Codecs.bmpHeader(thumb)
    require(w == 9 && h == 8, s"thumbnail is ${w}x$h")
    def luma(x: Int, y: Int): Long = {
      // Logical row y sits at file row (h-1-y): BMPs store bottom-up.
      val off = dataOffset + (h - 1 - y) * stride + 3 * x
      299L * (thumb(off + 2) & 0xff) + 587L * (thumb(off + 1) & 0xff) +
        114L * (thumb(off) & 0xff)
    }
    var hash = 0L
    var oy = 0
    while (oy < 8) {
      var ox = 0
      while (ox < 8) {
        if (luma(ox + 1, oy) > luma(ox, oy))
          hash |= 1L << (oy * 8 + ox)
        ox += 1
      }
      oy += 1
    }
    (hash & 0xFFFFFFFFL, hash >>> 32)
  }
}
