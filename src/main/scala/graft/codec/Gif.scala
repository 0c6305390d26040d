package graft.codec

/** From-scratch GIF (87a/89a) codec — with [[Jpeg]] and [[Png]] this
  * covers the classic web image trio (WebP/AVIF need full VP8/AV1
  * stacks and stay honest fences at the sniffing layer).
  *
  * Decode: logical screen descriptor, global/local color tables,
  * extension-block skipping, the FIRST image frame via variable-width
  * LZW (clear/end codes, 4096-entry dictionary) including the 4-pass
  * interlace layout. Output is interleaved RGB through the palette.
  * Animation policy (later frames, disposal) is a consumer concern —
  * frame one is the thumbnail/feature-extraction payload.
  *
  * Encode (test/fixture twin): GIF87a, one frame, global palette,
  * real LZW with dictionary growth. Lossless given a ≤256-color
  * palette, so round-trips are bit-exact.
  */
object Gif {

  def isGif(b: Array[Byte]): Boolean =
    b != null && b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  def decode(b: Array[Byte]): Either[String, Jpeg.Image] =
    try decodeImpl(b)
    catch { case e: Exception => Left(s"gif: ${e.getClass.getSimpleName}: ${e.getMessage}") }

  private def u16(b: Array[Byte], p: Int): Int = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)

  private def decodeImpl(b: Array[Byte]): Either[String, Jpeg.Image] = {
    if (!isGif(b)) return Left("gif: bad signature")
    if (b.length < 13) return Left("gif: truncated header")
    val sw = u16(b, 6); val sh = u16(b, 8)
    if (sw <= 0 || sh <= 0) return Left("gif: bad screen size")
    val flags = b(10) & 0xff
    var p = 13
    var gct: Array[Byte] = null
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 7)
      if (p + 3 * n > b.length) return Left("gif: truncated global color table")
      gct = java.util.Arrays.copyOfRange(b, p, p + 3 * n)
      p += 3 * n
    }
    while (p < b.length) {
      (b(p) & 0xff) match {
        case 0x3b => return Left("gif: no image data before trailer")
        case 0x21 => // extension: label + sub-blocks
          p += 2
          while (p < b.length && (b(p) & 0xff) != 0) p += 1 + (b(p) & 0xff)
          p += 1
        case 0x2c => // image descriptor
          if (p + 10 > b.length) return Left("gif: truncated image descriptor")
          val iw = u16(b, p + 5); val ih = u16(b, p + 7)
          val iflags = b(p + 9) & 0xff
          val interlaced = (iflags & 0x40) != 0
          p += 10
          var pal = gct
          if ((iflags & 0x80) != 0) {
            val n = 2 << (iflags & 7)
            if (p + 3 * n > b.length) return Left("gif: truncated local color table")
            pal = java.util.Arrays.copyOfRange(b, p, p + 3 * n)
            p += 3 * n
          }
          if (pal == null) return Left("gif: no color table")
          if (iw <= 0 || ih <= 0 || iw.toLong * ih > (1L << 28) / 4)
            return Left("gif: bad frame size") // alloc ceiling, not just overflow guard
          if (p >= b.length) return Left("gif: missing LZW code size")
          val minCode = b(p) & 0xff
          p += 1
          if (minCode < 2 || minCode > 8) return Left("gif: bad LZW min code size")
          // gather sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while (p < b.length && (b(p) & 0xff) != 0) {
            val n = b(p) & 0xff
            if (p + 1 + n > b.length) return Left("gif: truncated data sub-block")
            data.write(b, p + 1, n)
            p += 1 + n
          }
          val indices = lzwDecode(data.toByteArray, minCode, iw * ih) match {
            case Right(ix) => ix
            case Left(e) => return Left(e)
          }
          // de-interlace + palette resolve
          val maxIdx = pal.length / 3
          val out = new Array[Byte](iw * ih * 3)
          val rowOrder: Array[Int] =
            if (!interlaced) Array.tabulate(ih)(identity)
            else {
              val o = new Array[Int](ih)
              var k = 0
              for (start <- Seq(0, 4, 2, 1); step <- Seq(Seq(8, 8, 4, 2)(Seq(0, 4, 2, 1).indexOf(start)))) {
                var y = start
                while (y < ih) { o(k) = y; k += 1; y += step }
              }
              o
            }
          var srcRow = 0
          while (srcRow < ih) {
            val dstY = rowOrder(srcRow)
            var x = 0
            while (x < iw) {
              val idx = indices(srcRow * iw + x) & 0xff
              if (idx >= maxIdx) return Left("gif: palette index out of range")
              val o = (dstY * iw + x) * 3
              out(o) = pal(3 * idx); out(o + 1) = pal(3 * idx + 1); out(o + 2) = pal(3 * idx + 2)
              x += 1
            }
            srcRow += 1
          }
          return Right(Jpeg.Image(iw, ih, 3, out))
        case other => return Left(f"gif: unknown block 0x$other%02x")
      }
    }
    Left("gif: no image frame")
  }

  /** Variable-width LZW decode (GIF flavor: little-endian bit packing,
    * clear/end codes, dictionary capped at 4096). */
  private def lzwDecode(data: Array[Byte], minCode: Int, nPixels: Int): Either[String, Array[Byte]] = {
    val clearCode = 1 << minCode
    val endCode = clearCode + 1
    val out = new Array[Byte](nPixels)
    var outPos = 0
    // dictionary as (prefix, suffix) pairs
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var dictSize = 0
    var codeWidth = 0
    def reset(): Unit = { dictSize = endCode + 1; codeWidth = minCode + 1 }
    reset()
    var bitPos = 0
    val nBits = data.length * 8
    def readCode(): Int = {
      if (bitPos + codeWidth > nBits) return -1
      var v = 0; var i = 0
      while (i < codeWidth) {
        val bp = bitPos + i
        v |= ((data(bp >> 3) >> (bp & 7)) & 1) << i
        i += 1
      }
      bitPos += codeWidth
      v
    }
    val stack = new Array[Byte](4096)
    var prev = -1
    while (outPos < nPixels) {
      val code = readCode()
      if (code < 0) return Left("gif: LZW stream truncated")
      if (code == clearCode) { reset(); prev = -1 }
      else if (code == endCode) {
        if (outPos < nPixels) return Left("gif: LZW ended early")
      } else {
        if (code >= dictSize && !(code == dictSize && prev >= 0))
          return Left("gif: LZW code out of range")
        // expand code (or the KwK special case) onto the stack
        var sp = 0
        var cur = code
        var firstByte: Byte = 0
        if (code == dictSize) { // KwK: prev string + its first byte
          cur = prev
          // placeholder; the appended byte equals prev's first byte
        }
        while (cur >= clearCode + 2) { // composite entry
          stack(sp) = suffix(cur); sp += 1
          cur = prefix(cur)
        }
        firstByte = cur.toByte // literal root
        stack(sp) = firstByte; sp += 1
        if (code == dictSize) {
          // emit prev's expansion then firstByte (already arranged: the
          // stack currently holds prev's string; append firstByte FIRST
          // in output order means pushing it at the BOTTOM — handle by
          // writing stack then the extra byte)
        }
        // write stack in reverse
        var i = sp - 1
        while (i >= 0 && outPos < nPixels) { out(outPos) = stack(i); outPos += 1; i -= 1 }
        if (code == dictSize && outPos < nPixels) { out(outPos) = firstByte; outPos += 1 }
        // grow dictionary
        if (prev >= 0 && dictSize < 4096) {
          prefix(dictSize) = prev
          suffix(dictSize) = firstByte
          dictSize += 1
          if (dictSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        }
        prev = code
      }
    }
    Right(out)
  }

  /** Encode indexed pixels (values < palette size) as a one-frame GIF87a.
    * `palette` is RGB triples, length a power of two in [4, 768]. */
  def encode(indices: Array[Byte], width: Int, height: Int, palette: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && indices.length == width * height, "bad image shape")
    require(palette.length % 3 == 0, "palette must be RGB triples")
    val nColors = palette.length / 3
    require(nColors >= 2 && nColors <= 256 && Integer.bitCount(nColors) == 1,
      "palette size must be a power of two in [2, 256]")
    val colorBits = Integer.numberOfTrailingZeros(nColors)
    val minCode = math.max(2, colorBits)
    val out = new java.io.ByteArrayOutputStream(indices.length / 2 + 64)
    out.write("GIF87a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(width); le16(height)
    out.write(0x80 | (colorBits - 1 max 0)) // GCT present, size bits
    out.write(0); out.write(0)
    out.write(palette, 0, palette.length)
    out.write(0x2c) // image descriptor
    le16(0); le16(0); le16(width); le16(height)
    out.write(0) // no LCT, not interlaced
    out.write(minCode)
    // --- LZW encode
    val clearCode = 1 << minCode
    val endCode = clearCode + 1
    val dict = new java.util.HashMap[Integer, Integer]() // (prev<<8|byte) -> code
    var dictSize = endCode + 1
    var codeWidth = minCode + 1
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L; var accN = 0
    def putCode(c: Int): Unit = {
      acc |= c.toLong << accN
      accN += codeWidth
      while (accN >= 8) { bits.write((acc & 0xff).toInt); acc >>>= 8; accN -= 8 }
    }
    putCode(clearCode)
    var prev = indices(0) & 0xff
    var i = 1
    while (i < indices.length) {
      val b = indices(i) & 0xff
      val key = (prev << 8) | b
      val hit = dict.get(key)
      if (hit != null) prev = hit.intValue()
      else {
        putCode(prev)
        if (dictSize < 4096) {
          dict.put(key, dictSize)
          if (dictSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
          dictSize += 1
        } else {
          putCode(clearCode)
          dict.clear()
          dictSize = endCode + 1
          codeWidth = minCode + 1
        }
        prev = b
      }
      i += 1
    }
    putCode(prev)
    putCode(endCode)
    if (accN > 0) bits.write((acc & 0xff).toInt)
    // sub-blocks
    val z = bits.toByteArray
    var off = 0
    while (off < z.length) {
      val n = math.min(255, z.length - off)
      out.write(n)
      out.write(z, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }
}
