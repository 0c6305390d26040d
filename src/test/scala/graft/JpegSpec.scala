package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.{Jpeg, JpegEncoder}

/** Differential + exactness tests for the from-scratch baseline JPEG
  * codec. The independent oracle is the JDK's ImageIO JPEG plugin (a
  * libjpeg-derived implementation that shares no code with ours):
  *  - bytes OUR encoder emits must decode under ImageIO, and ImageIO's
  *    pixels must match OUR decoder's within an IDCT tolerance;
  *  - bytes ImageIO's *writer* emits (its default 4:2:0 subsampling)
  *    must decode under OUR decoder to ImageIO-matching pixels.
  * The DC-only "exact class" (flat 8x8 blocks, exactQuant) must
  * round-trip bit-exactly — that's the invariant the q192/q193/q194
  * oracles lean on.
  */
class JpegSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def imageIoDecode(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(im != null, "ImageIO failed to decode our encoder's bytes")
    im
  }

  private def maxDiffGray(bytes: Array[Byte], ours: Jpeg.Image): Int = {
    val ref = imageIoDecode(bytes)
    assert(ref.getWidth == ours.width && ref.getHeight == ours.height)
    var worst = 0
    for (y <- 0 until ours.height; x <- 0 until ours.width) {
      val g = ref.getRaster.getSample(x, y, 0)
      val o = ours.pixels(y * ours.width + x) & 0xff
      worst = math.max(worst, math.abs(g - o))
    }
    worst
  }

  private def maxDiffRgb(bytes: Array[Byte], ours: Jpeg.Image): Int = {
    val ref = imageIoDecode(bytes)
    assert(ref.getWidth == ours.width && ref.getHeight == ours.height)
    var worst = 0
    for (y <- 0 until ours.height; x <- 0 until ours.width) {
      val argb = ref.getRGB(x, y)
      val base = (y * ours.width + x) * 3
      worst = math.max(worst, math.abs(((argb >> 16) & 0xff) - (ours.pixels(base) & 0xff)))
      worst = math.max(worst, math.abs(((argb >> 8) & 0xff) - (ours.pixels(base + 1) & 0xff)))
      worst = math.max(worst, math.abs((argb & 0xff) - (ours.pixels(base + 2) & 0xff)))
    }
    worst
  }

  // ------------------------------------------------------------ exact class

  test("flat-block grayscale with exactQuant round-trips bit-exactly") {
    val r = rng(1)
    for (trial <- 0 until 5) {
      val bw = 1 + r.nextInt(6); val bh = 1 + r.nextInt(6)
      val w = bw * 8; val h = bh * 8
      val pix = new Array[Byte](w * h)
      for (by <- 0 until bh; bx <- 0 until bw) {
        val v = r.nextInt(256).toByte
        for (y <- 0 until 8; x <- 0 until 8) pix((by * 8 + y) * w + bx * 8 + x) = v
      }
      val bytes = JpegEncoder.encodeGray(pix, w, h, JpegEncoder.exactQuant)
      val im = Jpeg.decode(bytes).fold(e => fail(s"trial $trial: $e"), identity)
      assert(im.width == w && im.height == h && im.nComponents == 1)
      assert(java.util.Arrays.equals(im.pixels, pix), s"trial $trial not bit-exact")
      // and the independent decoder agrees exactly on the flat class too
      assert(maxDiffGray(bytes, im) == 0, s"trial $trial: ImageIO disagrees on flat blocks")
    }
  }

  test("flat-block YCbCr 4:4:4 with exactQuant: decoded RGB matches the documented fixed-point conversion") {
    // single 8x8 block, flat planes -> decoded RGB must equal the closed form
    def closedForm(yv: Int, cb: Int, cr: Int): (Int, Int, Int) = {
      def cl(v: Int) = math.max(0, math.min(255, v))
      val r = yv + ((91881 * (cr - 128) + 32768) >> 16)
      val g = yv - ((22554 * (cb - 128) + 46802 * (cr - 128) + 32768) >> 16)
      val b = yv + ((116130 * (cb - 128) + 32768) >> 16)
      (cl(r), cl(g), cl(b))
    }
    val r = rng(2)
    for (_ <- 0 until 20) {
      val yv = r.nextInt(256); val cb = r.nextInt(256); val cr = r.nextInt(256)
      val mk = (v: Int) => Array.fill[Byte](64)(v.toByte)
      val bytes = JpegEncoder.encodeYcbcr444(mk(yv), mk(cb), mk(cr), 8, 8,
        JpegEncoder.exactQuant, JpegEncoder.exactQuant)
      val im = Jpeg.decode(bytes).fold(e => fail(e), identity)
      val (er, eg, eb) = closedForm(yv, cb, cr)
      assert((im.pixels(0) & 0xff, im.pixels(1) & 0xff, im.pixels(2) & 0xff) == ((er, eg, eb)))
      // every pixel identical (flat image)
      for (i <- 0 until 64)
        assert((im.pixels(3 * i) & 0xff) == er && (im.pixels(3 * i + 1) & 0xff) == eg &&
          (im.pixels(3 * i + 2) & 0xff) == eb)
    }
  }

  // --------------------------------------------------------- differential

  test("CMYK (Adobe transform 0): exact class round-trips, RGB = s*k/255 closed form") {
    val r = rng(17)
    for (trial <- 0 until 4) {
      val bw = 1 + r.nextInt(3); val bh = 1 + r.nextInt(3)
      val w = bw * 8; val h = bh * 8
      val planes = Array.fill(4)(new Array[Byte](w * h))
      val blockVals = Array.ofDim[Int](4, bh, bw)
      for (ci <- 0 until 4; by <- 0 until bh; bx <- 0 until bw) {
        val v = r.nextInt(256)
        blockVals(ci)(by)(bx) = v
        for (y <- 0 until 8; x <- 0 until 8)
          planes(ci)((by * 8 + y) * w + bx * 8 + x) = v.toByte
      }
      val bytes = JpegEncoder.encodeCmyk444(planes(0), planes(1), planes(2), planes(3),
        w, h, transform = 0, JpegEncoder.exactQuant)
      val im = Jpeg.decode(bytes).fold(e => fail(s"trial $trial: $e"), identity)
      assert(im.width == w && im.height == h && im.nComponents == 3)
      for (y <- 0 until h; x <- 0 until w) {
        val (by, bx) = (y / 8, x / 8)
        val k = blockVals(3)(by)(bx)
        val base = (y * w + x) * 3
        for (ch <- 0 until 3) {
          val want = blockVals(ch)(by)(bx) * k / 255
          assert((im.pixels(base + ch) & 0xff) == want, s"trial $trial ch$ch ($x,$y)")
        }
      }
      // header-only scan labels 4 components
      assert(Jpeg.dimensions(bytes).toOption.get == ((w, h, 4)))
      // INDEPENDENT pin: the JDK reader can't color-manage CMYK but CAN
      // return the raw 4-band raster — it must equal our stored planes
      val rdr = javax.imageio.ImageIO.getImageReadersByFormatName("jpeg").next()
      rdr.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      val ras = rdr.readRaster(0, null)
      assert(ras.getNumBands == 4 && ras.getWidth == w && ras.getHeight == h)
      for (y <- 0 until h; x <- 0 until w; ci <- 0 until 4)
        assert(ras.getSample(x, y, ci) == blockVals(ci)(y / 8)(x / 8),
          s"trial $trial ImageIO raster band $ci ($x,$y)")
      rdr.dispose()
    }
  }

  test("YCCK (Adobe transform 2): YCbCr legs run the fixed-point matrix, K passes through") {
    // flat single block: closed-form YCbCr->RGB then *k/255
    def cl(v: Int) = math.max(0, math.min(255, v))
    for ((yv, cb, cr, k) <- Seq((120, 128, 128, 255), (90, 60, 200, 128),
      (255, 0, 0, 17), (5, 250, 5, 0))) {
      val w = 8; val h = 8
      def flat(v: Int) = Array.fill[Byte](w * h)(v.toByte)
      val bytes = JpegEncoder.encodeCmyk444(flat(yv), flat(cb), flat(cr), flat(k),
        w, h, transform = 2, JpegEncoder.exactQuant)
      val im = Jpeg.decode(bytes).fold(e => fail(e), identity)
      val c0 = cl(yv + ((91881 * (cr - 128) + 32768) >> 16))
      val c1 = cl(yv - ((22554 * (cb - 128) + 46802 * (cr - 128) + 32768) >> 16))
      val c2 = cl(yv + ((116130 * (cb - 128) + 32768) >> 16))
      assert((im.pixels(0) & 0xff) == c0 * k / 255, s"($yv,$cb,$cr,$k) R")
      assert((im.pixels(1) & 0xff) == c1 * k / 255, s"($yv,$cb,$cr,$k) G")
      assert((im.pixels(2) & 0xff) == c2 * k / 255, s"($yv,$cb,$cr,$k) B")
    }
  }

  test("Adobe transform 0 on 3 components: planes are RGB, no matrix") {
    // hand-splice: take an encodeYcbcr444 stream (which carries JFIF
    // APP0) and verify an Adobe APP14 transform-0 prefix flips the
    // interpretation — planes must come back verbatim as R,G,B
    val w = 8; val h = 8
    def flat(v: Int) = Array.fill[Byte](w * h)(v.toByte)
    val base = JpegEncoder.encodeYcbcr444(flat(77), flat(150), flat(33), w, h,
      JpegEncoder.exactQuant, JpegEncoder.exactQuant)
    // splice APP14 right after SOI
    val app14 = Array[Byte](0xff.toByte, 0xee.toByte, 0, 14) ++
      "Adobe".getBytes("US-ASCII") ++ Array[Byte](0, 100, 0, 0, 0, 0, 0)
    val spliced = base.take(2) ++ app14 ++ base.drop(2)
    val im = Jpeg.decode(spliced).fold(e => fail(e), identity)
    assert((im.pixels(0) & 0xff) == 77 && (im.pixels(1) & 0xff) == 150 &&
      (im.pixels(2) & 0xff) == 33)
    // without the marker the same stream color-converts (sanity)
    val im2 = Jpeg.decode(base).fold(e => fail(e), identity)
    assert((im2.pixels(0) & 0xff) != 77 || (im2.pixels(1) & 0xff) != 150)
  }

  test("cmyk fuzz: 400 mutations never throw") {
    val r = rng(23)
    val planes = Array.fill(4)(Array.tabulate[Byte](16 * 16)(i => (i * 5).toByte))
    val seed = JpegEncoder.encodeCmyk444(planes(0), planes(1), planes(2), planes(3),
      16, 16, transform = 0)
    for (_ <- 0 until 400) {
      val m = seed.clone()
      m(r.nextInt(m.length)) = r.nextInt(256).toByte
      Jpeg.decode(m)
    }
    succeed
  }

  test("our gray encode -> our decode vs ImageIO, random pixels, tolerance <= 2") {
    val r = rng(3)
    for (q <- Seq(50, 75, 95)) {
      val w = 40; val h = 24 // non-multiple-of-8 width on purpose
      val pix = Array.fill[Byte](w * h)(r.nextInt(256).toByte)
      val bytes = JpegEncoder.encodeGray(pix, w, h, JpegEncoder.scaledQuant(JpegEncoder.stdLumaQuant, q))
      val im = Jpeg.decode(bytes).fold(e => fail(e), identity)
      val d = maxDiffGray(bytes, im)
      assert(d <= 2, s"quality $q: max per-sample diff $d vs ImageIO")
    }
  }

  test("our RGB 4:4:4 encode -> our decode vs ImageIO, tolerance <= 3") {
    val r = rng(4)
    val w = 33; val h = 17
    val rgb = Array.fill[Byte](w * h * 3)(r.nextInt(256).toByte)
    val bytes = JpegEncoder.encodeRgb444(rgb, w, h, quality = 85)
    val im = Jpeg.decode(bytes).fold(e => fail(e), identity)
    assert(im.nComponents == 3)
    val d = maxDiffRgb(bytes, im)
    assert(d <= 3, s"max per-channel diff $d vs ImageIO")
  }

  test("ImageIO-encoded RGB (default 4:2:0) decodes under our decoder, smooth image, tolerance <= 8") {
    val w = 64; val h = 48
    val buf = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val rr = (x * 255) / (w - 1)
      val gg = (y * 255) / (h - 1)
      val bb = ((x + y) * 255) / (w + h - 2)
      buf.setRGB(x, y, (rr << 16) | (gg << 8) | bb)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(buf, "jpeg", bos))
    val bytes = bos.toByteArray
    val im = Jpeg.decode(bytes).fold(e => fail(e), identity)
    assert(im.width == w && im.height == h && im.nComponents == 3)
    val d = maxDiffRgb(bytes, im)
    assert(d <= 8, s"max per-channel diff $d vs ImageIO on its own 4:2:0 bytes")
  }

  test("restart markers: DRI-encoded stream round-trips the exact class") {
    val r = rng(5)
    val bw = 5; val bh = 3
    val w = bw * 8; val h = bh * 8
    val pix = new Array[Byte](w * h)
    for (by <- 0 until bh; bx <- 0 until bw) {
      val v = r.nextInt(256).toByte
      for (y <- 0 until 8; x <- 0 until 8) pix((by * 8 + y) * w + bx * 8 + x) = v
    }
    for (dri <- Seq(1, 2, 7)) {
      val bytes = JpegEncoder.encodeGray(pix, w, h, JpegEncoder.exactQuant, dri = dri)
      val im = Jpeg.decode(bytes).fold(e => fail(s"dri=$dri: $e"), identity)
      assert(java.util.Arrays.equals(im.pixels, pix), s"dri=$dri not bit-exact")
      assert(maxDiffGray(bytes, im) == 0, s"dri=$dri: ImageIO disagrees")
    }
  }

  test("header-only dimensions scan agrees with full decode") {
    val pix = Array.fill[Byte](24 * 16)(7)
    val bytes = JpegEncoder.encodeGray(pix, 24, 16)
    assert(Jpeg.dimensions(bytes) == Right((24, 16, 1)))
    val rgb = Array.fill[Byte](8 * 8 * 3)(9)
    assert(Jpeg.dimensions(JpegEncoder.encodeRgb444(rgb, 8, 8)) == Right((8, 8, 3)))
  }

  // ----------------------------------------------------------- progressive

  private def imageIoEncode(im: java.awt.image.BufferedImage, progressive: Boolean,
      quality: Float = 0.8f): Array[Byte] = {
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    if (progressive) p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(im, null, null), p)
    ios.close(); wr.dispose()
    bos.toByteArray
  }

  private def hasSof2(b: Array[Byte]): Boolean =
    (0 until b.length - 1).exists(i => (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xc2)

  test("progressive grayscale (ImageIO-written) decodes, tolerance <= 2") {
    val r = rng(11)
    val w = 45; val h = 30 // non-multiples of 8
    val buf = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      buf.getRaster.setSample(x, y, 0, r.nextInt(256))
    val bytes = imageIoEncode(buf, progressive = true)
    assert(hasSof2(bytes), "ImageIO did not write a progressive file")
    val im = Jpeg.decode(bytes).fold(e => fail(e), identity)
    assert(im.width == w && im.height == h && im.nComponents == 1)
    val d = maxDiffGray(bytes, im)
    assert(d <= 2, s"max per-sample diff $d vs ImageIO on progressive gray")
  }

  test("progressive RGB 4:2:0 (ImageIO-written) decodes, smooth image, tolerance <= 8") {
    val w = 72; val h = 40
    val buf = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val rr = (x * 255) / (w - 1)
      val gg = 255 - (y * 255) / (h - 1)
      val bb = ((x * y) * 255) / ((w - 1) * (h - 1))
      buf.setRGB(x, y, (rr << 16) | (gg << 8) | bb)
    }
    val bytes = imageIoEncode(buf, progressive = true)
    assert(hasSof2(bytes), "ImageIO did not write a progressive file")
    val im = Jpeg.decode(bytes).fold(e => fail(e), identity)
    assert(im.width == w && im.height == h && im.nComponents == 3)
    val d = maxDiffRgb(bytes, im)
    assert(d <= 8, s"max per-channel diff $d vs ImageIO on progressive 4:2:0")
  }

  test("progressive and sequential decodes of the same source agree closely") {
    val r = rng(12)
    val w = 32; val h = 32
    val buf = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      buf.getRaster.setSample(x, y, 0, 60 + r.nextInt(100))
    val seqB = imageIoEncode(buf, progressive = false, quality = 0.95f)
    val progB = imageIoEncode(buf, progressive = true, quality = 0.95f)
    assert(!hasSof2(seqB) && hasSof2(progB))
    val a = Jpeg.decode(seqB).fold(e => fail(e), identity)
    val b = Jpeg.decode(progB).fold(e => fail(e), identity)
    // same encoder input + same quality: decoded outputs nearly identical
    var worst = 0
    for (i <- a.pixels.indices)
      worst = math.max(worst, math.abs((a.pixels(i) & 0xff) - (b.pixels(i) & 0xff)))
    assert(worst <= 4, s"sequential vs progressive drift $worst")
  }

  test("our progressive encoder: exact class round-trips bit-exactly and ImageIO agrees") {
    val r = rng(13)
    for (trial <- 0 until 3) {
      val bw = 2 + r.nextInt(4); val bh = 2 + r.nextInt(3)
      val w = bw * 8; val h = bh * 8
      val pix = new Array[Byte](w * h)
      for (y <- 0 until bh; x <- 0 until bw) {
        val v = r.nextInt(256).toByte
        for (yy <- 0 until 8; xx <- 0 until 8) pix((y * 8 + yy) * w + x * 8 + xx) = v
      }
      val bytes = JpegEncoder.encodeGrayProgressive(pix, w, h, JpegEncoder.exactQuant)
      assert(hasSof2(bytes))
      val im = Jpeg.decode(bytes).fold(e => fail(s"trial $trial: $e"), identity)
      assert(java.util.Arrays.equals(im.pixels, pix), s"trial $trial not bit-exact")
      assert(maxDiffGray(bytes, im) == 0, s"trial $trial: ImageIO disagrees")
    }
  }

  test("our progressive encoder: random pixels, ImageIO differential <= 2") {
    val r = rng(14)
    val w = 41; val h = 26
    val pix = Array.fill[Byte](w * h)(r.nextInt(256).toByte)
    val bytes = JpegEncoder.encodeGrayProgressive(pix, w, h,
      JpegEncoder.scaledQuant(JpegEncoder.stdLumaQuant, 85))
    val im = Jpeg.decode(bytes).fold(e => fail(e), identity)
    val d = maxDiffGray(bytes, im)
    assert(d <= 2, s"max per-sample diff $d vs ImageIO on our progressive bytes")
    // and it agrees with our own sequential encode of the same source
    val seq = Jpeg.decode(JpegEncoder.encodeGray(pix, w, h,
      JpegEncoder.scaledQuant(JpegEncoder.stdLumaQuant, 85))).fold(e => fail(e), identity)
    assert(java.util.Arrays.equals(im.pixels, seq.pixels),
      "progressive and sequential encodes of identical coefficients must decode identically")
  }

  // ------------------------------------------------------------------ exif

  test("EXIF orientation: splice, read back, absent cases") {
    val base = JpegEncoder.encodeGray(Array.fill[Byte](64)(99), 8, 8)
    assert(Jpeg.exifOrientation(base).isEmpty) // no APP1
    for (o <- 1 to 8) {
      val tagged = JpegEncoder.withExifOrientation(base, o)
      assert(Jpeg.exifOrientation(tagged) == Some(o), s"orientation $o")
      // still decodes identically with the extra segment in place
      val im = Jpeg.decode(tagged).fold(e => fail(e), identity)
      assert(im.pixels.forall(_ == 99.toByte))
      // and ImageIO still accepts the spliced file
      assert(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(tagged)) != null)
    }
    assert(Jpeg.exifOrientation(null).isEmpty)
    assert(Jpeg.exifOrientation("junk".getBytes).isEmpty)
  }

  test("applyOrientation: all 8 cases on an asymmetric image") {
    // 3x2 gray image:  0 1 2
    //                  3 4 5
    val im = Jpeg.Image(3, 2, 1, Array[Byte](0, 1, 2, 3, 4, 5))
    def pix(i: Jpeg.Image): Seq[Int] = i.pixels.map(_ & 0xff).toSeq
    assert(pix(Jpeg.applyOrientation(im, 1)) == Seq(0, 1, 2, 3, 4, 5))
    assert(pix(Jpeg.applyOrientation(im, 2)) == Seq(2, 1, 0, 5, 4, 3)) // mirror H
    assert(pix(Jpeg.applyOrientation(im, 3)) == Seq(5, 4, 3, 2, 1, 0)) // rot180
    assert(pix(Jpeg.applyOrientation(im, 4)) == Seq(3, 4, 5, 0, 1, 2)) // mirror V
    val t5 = Jpeg.applyOrientation(im, 5) // transpose -> 2x3
    assert(t5.width == 2 && t5.height == 3 && pix(t5) == Seq(0, 3, 1, 4, 2, 5))
    val t6 = Jpeg.applyOrientation(im, 6) // rot90 CW -> 2x3
    assert(t6.width == 2 && t6.height == 3 && pix(t6) == Seq(3, 0, 4, 1, 5, 2))
    val t7 = Jpeg.applyOrientation(im, 7) // transverse -> 2x3
    assert(t7.width == 2 && t7.height == 3 && pix(t7) == Seq(5, 2, 4, 1, 3, 0))
    val t8 = Jpeg.applyOrientation(im, 8) // rot270 CW -> 2x3
    assert(t8.width == 2 && t8.height == 3 && pix(t8) == Seq(2, 5, 1, 4, 0, 3))
    // rot90 of rot270 is identity
    assert(pix(Jpeg.applyOrientation(Jpeg.applyOrientation(im, 6), 8)) == pix(im))
    // RGB channels move together
    val rgb = Jpeg.Image(2, 1, 3, Array[Byte](1, 2, 3, 4, 5, 6))
    assert(pix(Jpeg.applyOrientation(rgb, 2)) == Seq(4, 5, 6, 1, 2, 3))
  }

  // --------------------------------------------------------------- fences

  test("malformed inputs are Left, never exceptions") {
    assert(Jpeg.decode(null).isLeft)
    assert(Jpeg.decode(Array[Byte]()).isLeft)
    assert(Jpeg.decode(Array[Byte](1, 2, 3)).isLeft)
    assert(Jpeg.decode("plain text".getBytes("UTF-8")).isLeft)
    val good = JpegEncoder.encodeGray(Array.fill[Byte](64)(50), 8, 8)
    assert(Jpeg.decode(good).isRight)
    // truncations into the header / table segments must fail closed
    // (dropping ONLY the trailing EOI still decodes — all entropy data is
    // present; same permissive stance as libjpeg, asserted here so the
    // behavior is pinned either way)
    for (n <- Seq(2, 4, 20, good.length / 2)) {
      val res = Jpeg.decode(java.util.Arrays.copyOf(good, n))
      assert(res.isLeft, s"prefix $n decoded")
    }
    assert(Jpeg.decode(java.util.Arrays.copyOf(good, good.length - 1)).isRight)
    // flipping SOF0 to SOF2 on a baseline stream yields a MALFORMED
    // progressive file (its scan band 0..63 is illegal for SOF2): must
    // fail closed, not mis-decode
    val prog = good.clone()
    val i = (0 until prog.length - 1).find(k => (prog(k) & 0xff) == 0xff && (prog(k + 1) & 0xff) == 0xc0).get
    prog(i + 1) = 0xc2.toByte
    assert(Jpeg.decode(prog).isLeft)
    // a real lossless fence that remains: arithmetic coding (SOF9)
    val arith = good.clone(); arith(i + 1) = 0xc9.toByte
    val r = Jpeg.decode(arith)
    assert(r.isLeft && r.swap.exists(_.contains("unsupported")))
  }

  test("stripMetadata: EXIF/COM drop, pixels bit-identical, structure preserved") {
    val pix = Array.tabulate[Byte](24 * 16)(i => ((i * 5) % 256).toByte)
    val base = JpegEncoder.encodeGray(pix, 24, 16, JpegEncoder.exactQuant)
    val tagged = JpegEncoder.withComment(
      JpegEncoder.withExifOrientation(base, 6), "GPS 51.5N 0.1W secret")
    assert(Jpeg.exifOrientation(tagged).contains(6))
    val clean = Jpeg.stripMetadata(tagged).fold(e => fail(e), identity)
    assert(Jpeg.exifOrientation(clean).isEmpty)
    assert(!new String(clean.map(_.toChar)).contains("secret"))
    val a = Jpeg.decode(tagged).fold(e => fail(e), identity)
    val b = Jpeg.decode(clean).fold(e => fail(e), identity)
    assert(java.util.Arrays.equals(a.pixels, b.pixels))
    // a metadata-free file passes through byte-identically
    assert(java.util.Arrays.equals(Jpeg.stripMetadata(base).fold(e => fail(e), identity), base))
    // ImageIO still reads the scrubbed file
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(clean))
    assert(ref != null && ref.getWidth == 24 && ref.getHeight == 16)
    // malformed inputs fail closed
    assert(Jpeg.stripMetadata(null).isLeft)
    assert(Jpeg.stripMetadata(Array[Byte](0xff.toByte, 0xd8.toByte, 1, 2)).isLeft)
    for (n <- Seq(3, 10, tagged.length / 4))
      assert(Jpeg.stripMetadata(java.util.Arrays.copyOf(tagged, n)).isLeft ||
        n > 40, s"prefix $n")
  }

  test("entropy-garbage body fails closed rather than looping") {
    val good = JpegEncoder.encodeGray(Array.fill[Byte](128 * 128)(0), 128, 128)
    val bad = good.clone()
    val r = rng(6)
    // scribble over the middle of the entropy segment
    for (k <- good.length / 2 until math.min(good.length / 2 + 200, good.length - 2))
      bad(k) = r.nextInt(256).toByte
    Jpeg.decode(bad) // must terminate; Left or Right both acceptable
    succeed
  }
}
