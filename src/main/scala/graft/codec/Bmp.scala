package graft.codec

/** From-scratch Windows BMP (DIB) codec — the remaining uncompressed
  * legacy format a crawl's image population carries (screenshots, old
  * CMS uploads). With [[Tiff]] this closes out the uncompressed
  * containers; everything left fenced (WebP/AVIF) needs a real video
  * codec stack.
  *
  * Decode: BITMAPFILEHEADER + BITMAPINFOHEADER (40-byte) or the larger
  * V4/V5 headers (extra fields skipped), BI_RGB only; bit depths 8
  * (palette-resolved to RGB), 24 (BGR), and 32 (BGRX — alpha dropped);
  * bottom-up (positive height) and top-down (negative height) row
  * orders; 4-byte row stride padding. RLE compression, 1/4/16-bit
  * depths, and BI_BITFIELDS return `Left` (honest fences). Output shape
  * matches [[Jpeg.Image]] (always nc=3 — BMP is a color format).
  *
  * Encode (fixture/round-trip twin): 24-bit BI_RGB bottom-up, the
  * canonical BMP every tool writes. Lossless, so round-trips are
  * bit-exact and SQL oracles can state decoded pixels directly.
  */
object Bmp {

  def isBmp(b: Array[Byte]): Boolean =
    b != null && b.length >= 2 && b(0) == 'B' && b(1) == 'M'

  private def u16(b: Array[Byte], p: Int): Int = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], p: Int): Long = u16(b, p).toLong | (u16(b, p + 2).toLong << 16)
  private def s32(b: Array[Byte], p: Int): Int = u32(b, p).toInt

  def decode(b: Array[Byte]): Either[String, Jpeg.Image] =
    try decodeImpl(b)
    catch { case e: Exception => Left(s"bmp: ${e.getClass.getSimpleName}: ${e.getMessage}") }

  private def decodeImpl(b: Array[Byte]): Either[String, Jpeg.Image] = {
    if (!isBmp(b)) return Left("bmp: bad signature")
    if (b.length < 54) return Left("bmp: truncated header")
    val pixOff = u32(b, 10)
    val hdrSize = u32(b, 14).toInt
    if (hdrSize < 40) return Left(s"bmp: header size $hdrSize unsupported (BITMAPCOREHEADER)")
    val width = s32(b, 18)
    val rawHeight = s32(b, 22)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val planes = u16(b, 26)
    val bpp = u16(b, 28)
    val compression = u32(b, 30).toInt
    if (planes != 1) return Left("bmp: planes != 1")
    if (compression != 0) return Left(s"bmp: compression $compression unsupported (BI_RGB only)")
    if (width <= 0 || height == 0) return Left("bmp: bad dimensions")
    if (width.toLong * height > (1L << 28) / 4) return Left("bmp: image too large")
    if (bpp != 8 && bpp != 24 && bpp != 32)
      return Left(s"bmp: $bpp-bit depth unsupported (8/24/32 only)")

    // palette for 8-bit: colorsUsed BGRX entries right after the header
    var palette: Array[Byte] = null
    if (bpp == 8) {
      val used = {
        val cu = u32(b, 46).toInt
        if (cu == 0) 256 else cu
      }
      if (used < 1 || used > 256) return Left("bmp: bad palette size")
      val palOff = 14 + hdrSize
      if (palOff + 4 * used > b.length) return Left("bmp: palette overruns file")
      palette = new Array[Byte](256 * 3)
      var i = 0
      while (i < used) {
        palette(3 * i) = b(palOff + 4 * i + 2)     // R (stored BGRX)
        palette(3 * i + 1) = b(palOff + 4 * i + 1) // G
        palette(3 * i + 2) = b(palOff + 4 * i)     // B
        i += 1
      }
    }

    val bytesPerPx = bpp / 8
    val stride = ((width * bytesPerPx + 3) / 4) * 4
    if (pixOff < 0 || pixOff + stride.toLong * height > b.length)
      return Left("bmp: pixel data overruns file")
    val off = pixOff.toInt
    val out = new Array[Byte](width * height * 3)
    var row = 0
    while (row < height) {
      val srcRow = if (topDown) row else height - 1 - row
      val rp = off + srcRow * stride
      var x = 0
      while (x < width) {
        val dst = (row * width + x) * 3
        bpp match {
          case 8 =>
            val idx = b(rp + x) & 0xff
            out(dst) = palette(3 * idx)
            out(dst + 1) = palette(3 * idx + 1)
            out(dst + 2) = palette(3 * idx + 2)
          case 24 =>
            out(dst) = b(rp + 3 * x + 2)     // R (stored BGR)
            out(dst + 1) = b(rp + 3 * x + 1) // G
            out(dst + 2) = b(rp + 3 * x)     // B
          case _ => // 32: BGRX
            out(dst) = b(rp + 4 * x + 2)
            out(dst + 1) = b(rp + 4 * x + 1)
            out(dst + 2) = b(rp + 4 * x)
        }
        x += 1
      }
      row += 1
    }
    Right(Jpeg.Image(width, height, 3, out))
  }

  /** Encode interleaved RGB as the canonical 24-bit bottom-up BI_RGB BMP. */
  def encode(rgb: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(rgb.length == width * height * 3, "pixel buffer size mismatch")
    val stride = ((width * 3 + 3) / 4) * 4
    val dataLen = stride * height
    val out = new Array[Byte](54 + dataLen)
    def le16(p: Int, v: Int): Unit = { out(p) = (v & 0xff).toByte; out(p + 1) = ((v >> 8) & 0xff).toByte }
    def le32(p: Int, v: Int): Unit = { le16(p, v & 0xffff); le16(p + 2, (v >>> 16) & 0xffff) }
    out(0) = 'B'; out(1) = 'M'
    le32(2, 54 + dataLen) // file size
    le32(10, 54)          // pixel data offset
    le32(14, 40)          // BITMAPINFOHEADER
    le32(18, width)
    le32(22, height)      // positive: bottom-up
    le16(26, 1)           // planes
    le16(28, 24)          // bpp
    le32(30, 0)           // BI_RGB
    le32(34, dataLen)
    var row = 0
    while (row < height) {
      val rp = 54 + (height - 1 - row) * stride
      var x = 0
      while (x < width) {
        val src = (row * width + x) * 3
        out(rp + 3 * x) = rgb(src + 2)     // B
        out(rp + 3 * x + 1) = rgb(src + 1) // G
        out(rp + 3 * x + 2) = rgb(src)     // R
        x += 1
      }
      row += 1
    }
    out
  }
}
