package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.CcittG4

/** CCITT G4 (T.6) codec tests. Lossless, so round-trips must be
  * bit-exact; the independent oracle is the JDK's TIFF plugin
  * (TIFFFaxDecompressor / compressor — shares no code with ours):
  * our G4 bytes wrapped in a minimal TIFF must decode under ImageIO to
  * the source pixels, and the strip bytes ImageIO's writer emits with
  * "CCITT T.6" compression must decode under OUR decoder. */
class CcittSpec extends AnyFunSuite {

  // ---------------------------------------------------- minimal TIFF shims

  /** Wrap raw G4 data in a little-endian single-strip TIFF
    * (Photometric 0 = WhiteIsZero: the standard fax sense our codec's
    * 0=white/1=black maps onto directly). */
  private[graft] def wrapTiff(g4: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    out.write('I'); out.write('I'); le16(42); le32(8) // header, IFD at 8
    val nTags = 8
    val dataOff = 8 + 2 + nTags * 12 + 4
    le16(nTags)
    def tag(id: Int, typ: Int, count: Int, value: Int): Unit = {
      le16(id); le16(typ); le32(count); le32(value)
    }
    tag(256, 3, 1, w) // ImageWidth SHORT
    tag(257, 3, 1, h) // ImageLength
    tag(258, 3, 1, 1) // BitsPerSample
    tag(259, 3, 1, 4) // Compression = CCITT T.6
    tag(262, 3, 1, 0) // Photometric = WhiteIsZero
    tag(273, 4, 1, dataOff) // StripOffsets
    tag(278, 3, 1, h) // RowsPerStrip
    tag(279, 4, 1, g4.length) // StripByteCounts
    le32(0) // next IFD
    out.write(g4, 0, g4.length)
    out.toByteArray
  }

  /** Decode any bilevel TIFF via ImageIO; returns pixels with 1 = black. */
  private[graft] def jdkRead(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(im != null, "ImageIO failed to read TIFF")
    val w = im.getWidth; val h = im.getHeight
    val pix = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = im.getRGB(x, y)
      val lum = ((argb >> 16) & 0xff) + ((argb >> 8) & 0xff) + (argb & 0xff)
      pix(y * w + x) = if (lum < 384) 1 else 0
    }
    (w, h, pix)
  }

  /** Encode via ImageIO's TIFF writer with CCITT T.6 and pull the raw G4
    * strip back out of the container (tiny LE/BE-aware IFD walk). */
  private def jdkEncodeG4(pix: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until h; x <- 0 until w)
      im.setRGB(x, y, if (pix(y * w + x) == 1) 0x000000 else 0xffffff)
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionType("CCITT T.6")
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(im, null, null), p)
    ios.close(); wr.dispose()
    val t = bos.toByteArray
    // IFD walk for StripOffsets(273)/StripByteCounts(279)/Photometric(262)
    val le = t(0) == 'I'
    def u16(p: Int) = if (le) ((t(p) & 0xff) | ((t(p + 1) & 0xff) << 8))
      else (((t(p) & 0xff) << 8) | (t(p + 1) & 0xff))
    def u32(p: Int) = if (le) ((t(p) & 0xff) | ((t(p + 1) & 0xff) << 8) | ((t(p + 2) & 0xff) << 16) | ((t(p + 3) & 0xff) << 24))
      else (((t(p) & 0xff) << 24) | ((t(p + 1) & 0xff) << 16) | ((t(p + 2) & 0xff) << 8) | (t(p + 3) & 0xff))
    val ifd = u32(4)
    val n = u16(ifd)
    var off = -1; var len = -1; var photo = 0; var comp = -1; var rps = -1
    for (i <- 0 until n) {
      val e = ifd + 2 + i * 12
      val id = u16(e); val typ = u16(e + 2)
      val v = if (typ == 3) u16(e + 8) else u32(e + 8)
      id match {
        case 273 => off = v
        case 279 => len = v
        case 262 => photo = v
        case 259 => comp = v
        case 278 => rps = v
        case _ => ()
      }
    }
    assert(comp == 4, s"JDK wrote compression $comp, wanted 4")
    assert(rps == -1 || rps >= h, "multi-strip TIFF; test assumes one strip")
    assert(off >= 0 && len > 0)
    assert(photo == 0, s"JDK wrote photometric $photo; test assumes WhiteIsZero")
    java.util.Arrays.copyOfRange(t, off, off + len)
  }

  private def patterns(w: Int, h: Int, seed: Long): Seq[Array[Byte]] = {
    val r = new scala.util.Random(seed)
    Seq(
      Array.fill[Byte](w * h)(0), // all white
      Array.fill[Byte](w * h)(1), // all black
      Array.tabulate[Byte](w * h)(i => ((i % w) % 2).toByte), // vertical hairlines
      Array.tabulate[Byte](w * h)(i => ((i / w) % 2).toByte), // horizontal stripes
      Array.tabulate[Byte](w * h)(i => if ((i % w) / 8 % 2 == (i / w) / 4 % 2) 1 else 0), // checker
      Array.fill[Byte](w * h)(if (r.nextDouble() < 0.3) 1 else 0), // noise
      Array.tabulate[Byte](w * h)(i => if (i % w == w - 1) 1 else 0) // right edge
    )
  }

  test("encode -> decode round-trips bit-exactly (plain and byte-aligned)") {
    for ((w, h) <- Seq((17, 9), (64, 16), (1, 5), (200, 3));
         (pix, i) <- patterns(w, h, 10 + w).zipWithIndex;
         align <- Seq(false, true)) {
      val enc = CcittG4.encode(pix, w, h, align)
      val dec = CcittG4.decode(enc, w, h, align)
        .fold(e => fail(s"($w x $h pat $i align=$align): $e"), identity)
      assert(java.util.Arrays.equals(dec, pix), s"($w x $h pat $i align=$align) mismatch")
    }
  }

  test("our G4 bytes decode under the JDK TIFF fax decompressor") {
    for ((w, h) <- Seq((40, 12), (128, 24));
         (pix, i) <- patterns(w, h, 20 + w).zipWithIndex) {
      val tiff = wrapTiff(CcittG4.encode(pix, w, h), w, h)
      val (dw, dh, theirs) = jdkRead(tiff)
      assert(dw == w && dh == h)
      assert(java.util.Arrays.equals(theirs, pix), s"($w x $h pat $i) JDK disagrees")
    }
  }

  test("JDK-encoded G4 strips decode under our decoder") {
    for ((w, h) <- Seq((40, 12), (75, 20));
         (pix, i) <- patterns(w, h, 30 + w).zipWithIndex) {
      val g4 = jdkEncodeG4(pix, w, h)
      val ours = CcittG4.decode(g4, w, h)
        .fold(e => fail(s"($w x $h pat $i): $e"), identity)
      assert(java.util.Arrays.equals(ours, pix), s"($w x $h pat $i) we disagree with JDK bytes")
    }
  }

  test("long runs exercise the extended makeup codes (width > 2560)") {
    val w = 3000; val h = 4
    val pix = new Array[Byte](w * h)
    // row 0 all white; row 1 all black; row 2 black tail; row 3 sparse
    for (x <- 0 until w) pix(1 * w + x) = 1
    for (x <- 100 until w) pix(2 * w + x) = 1
    pix(3 * w + 2900) = 1
    val enc = CcittG4.encode(pix, w, h)
    val dec = CcittG4.decode(enc, w, h).fold(e => fail(e), identity)
    assert(java.util.Arrays.equals(dec, pix))
    val (_, _, theirs) = jdkRead(wrapTiff(enc, w, h))
    assert(java.util.Arrays.equals(theirs, pix), "JDK disagrees on long runs")
  }

  test("run-length code sweep vs JDK (every table row hit at least once)") {
    // makeup boundaries step by 64; stride 61 (coprime) plus explicit
    // boundary runs covers every makeup entry and a spread of terminators.
    // This sweep is what caught the 2368+ extended-makeup width bug.
    val runs = (60 to 2700 by 61) ++ Seq(63, 64, 127, 128, 191, 192, 1664, 1728, 1792,
      1856, 1920, 1984, 2304, 2368, 2432, 2496, 2560, 2624, 2700)
    for (r <- runs) {
      val w = r + 7
      val pixB = new Array[Byte](w); for (x <- 0 until r) pixB(x) = 1
      val pixW = new Array[Byte](w); for (x <- r until w) pixW(x) = 1
      for ((pix, lbl) <- Seq((pixB, "black"), (pixW, "white"))) {
        val (_, _, theirs) = jdkRead(wrapTiff(CcittG4.encode(pix, w, 1), w, 1))
        assert(java.util.Arrays.equals(theirs, pix), s"$lbl run $r: JDK disagrees")
      }
    }
  }

  test("malformed input fails closed") {
    assert(CcittG4.decode(null, 8, 8).isLeft)
    assert(CcittG4.decode(Array[Byte](), 8, 8).isLeft)
    val good = CcittG4.encode(patterns(32, 8, 40).apply(5), 32, 8)
    assert(CcittG4.decode(good, 32, 8).isRight)
    for (n <- Seq(0, 1, good.length / 2))
      assert(CcittG4.decode(java.util.Arrays.copyOf(good, n), 32, 8).isLeft, s"prefix $n decoded")
    // random garbage must terminate (Left or wrong pixels, never a hang)
    val r = new scala.util.Random(7)
    for (_ <- 0 until 20) {
      val junk = Array.fill[Byte](64)(r.nextInt(256).toByte)
      CcittG4.decode(junk, 40, 10)
    }
    succeed
  }
}
