package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.Bmp

/** BMP codec tests. Lossless + uncompressed, so everything is bit-exact;
  * the independent oracle is the JDK's ImageIO BMP plugin, exercised in
  * both directions (including its 8-bit paletted and 32-bit output). */
class BmpSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def imageIoBmp(im: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(im, "bmp", bos))
    bos.toByteArray
  }

  test("encode -> decode round-trips bit-exactly (odd widths exercise stride padding)") {
    val r = rng(1)
    for ((w, h) <- Seq((17, 9), (64, 16), (1, 1), (3, 200), (5, 7))) {
      val pix = Array.fill[Byte](w * h * 3)(r.nextInt(256).toByte)
      val im = Bmp.decode(Bmp.encode(pix, w, h)).fold(e => fail(e), identity)
      assert(im.width == w && im.height == h && im.nComponents == 3, s"$w x $h")
      assert(java.util.Arrays.equals(im.pixels, pix), s"$w x $h")
    }
  }

  test("our BMP bytes decode under ImageIO bit-exactly") {
    val r = rng(2)
    val w = 41; val h = 23
    val pix = Array.fill[Byte](w * h * 3)(r.nextInt(256).toByte)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Bmp.encode(pix, w, h)))
    assert(ref != null && ref.getWidth == w && ref.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = ref.getRGB(x, y)
      val base = (y * w + x) * 3
      assert(((argb >> 16) & 0xff) == (pix(base) & 0xff), s"r at $x,$y")
      assert(((argb >> 8) & 0xff) == (pix(base + 1) & 0xff))
      assert((argb & 0xff) == (pix(base + 2) & 0xff))
    }
  }

  test("ImageIO-written BMPs decode bit-exactly under ours (24-bit, paletted, gray)") {
    for ((typ, label) <- Seq(
        (java.awt.image.BufferedImage.TYPE_3BYTE_BGR, "bgr24"),
        (java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, "pal8"),
        (java.awt.image.BufferedImage.TYPE_BYTE_GRAY, "gray8"))) {
      val w = 57; val h = 33
      val buf = new java.awt.image.BufferedImage(w, h, typ)
      for (y <- 0 until h; x <- 0 until w)
        buf.setRGB(x, y, (((x * 4) % 256) << 16) | (((y * 7) % 256) << 8) | ((x + y) % 256))
      val im = Bmp.decode(imageIoBmp(buf)).fold(e => fail(s"$label: $e"), identity)
      assert(im.width == w && im.height == h && im.nComponents == 3, label)
      for (y <- 0 until h; x <- 0 until w) {
        val base = (y * w + x) * 3
        if (label == "gray8") {
          // TYPE_BYTE_GRAY's getRGB applies a linear->sRGB conversion the
          // FILE doesn't carry (the writer stores raw raster samples with
          // an identity palette) — compare against the raster
          val v = buf.getRaster.getSample(x, y, 0)
          assert((im.pixels(base) & 0xff) == v, s"$label r at $x,$y")
          assert((im.pixels(base + 1) & 0xff) == v && (im.pixels(base + 2) & 0xff) == v)
        } else {
          val argb = buf.getRGB(x, y) // indexed model quantizes; compare to THEIR pixels
          assert((im.pixels(base) & 0xff) == ((argb >> 16) & 0xff), s"$label r at $x,$y")
          assert((im.pixels(base + 1) & 0xff) == ((argb >> 8) & 0xff), s"$label g at $x,$y")
          assert((im.pixels(base + 2) & 0xff) == (argb & 0xff), s"$label b at $x,$y")
        }
      }
    }
  }

  test("top-down BMPs (negative height) decode correctly") {
    // build by patching our bottom-up encoder output: negate height and
    // reverse the stored row order
    val w = 6; val h = 4
    val pix = Array.tabulate[Byte](w * h * 3)(i => (i * 7 % 256).toByte)
    val up = Bmp.encode(pix, w, h)
    val stride = ((w * 3 + 3) / 4) * 4
    val down = up.clone()
    // height := -h (two's complement little-endian)
    val neg = -h
    down(22) = (neg & 0xff).toByte; down(23) = ((neg >> 8) & 0xff).toByte
    down(24) = ((neg >> 16) & 0xff).toByte; down(25) = ((neg >> 24) & 0xff).toByte
    for (r <- 0 until h)
      System.arraycopy(up, 54 + (h - 1 - r) * stride, down, 54 + r * stride, stride)
    val im = Bmp.decode(down).fold(e => fail(e), identity)
    assert(java.util.Arrays.equals(im.pixels, pix))
  }

  test("fences and malformed inputs fail closed") {
    assert(Bmp.decode(null).isLeft)
    assert(Bmp.decode(Array[Byte]('B', 'M', 3)).isLeft)
    val good = Bmp.encode(Array.fill[Byte](8 * 8 * 3)(7), 8, 8)
    assert(Bmp.decode(good).isRight)
    for (n <- Seq(2, 14, 30, good.length / 2, good.length - 3))
      assert(Bmp.decode(java.util.Arrays.copyOf(good, n)).isLeft, s"prefix $n decoded")
    // 16-bit depth is a documented fence
    val bad = good.clone(); bad(28) = 16
    assert(Bmp.decode(bad).isLeft)
    // RLE8 compression is a documented fence
    val rle = good.clone(); rle(30) = 1
    assert(Bmp.decode(rle).isLeft)
  }
}
