package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.Png

/** PNG codec tests. Lossless, so everything is bit-exact; the
  * independent oracle is the JDK's ImageIO PNG plugin, which exercises
  * all five row filters (its encoder picks adaptively) and the
  * palette/alpha color types our encoder doesn't emit. */
class PngSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def imageIoPng(im: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(im, "png", bos))
    bos.toByteArray
  }

  test("encode -> decode round-trips bit-exactly (gray and RGB)") {
    val r = rng(1)
    for ((w, h, nc) <- Seq((17, 9, 1), (64, 16, 3), (1, 1, 1), (3, 200, 3))) {
      val pix = Array.fill[Byte](w * h * nc)(r.nextInt(256).toByte)
      val im = Png.decode(Png.encode(pix, w, h, nc)).fold(e => fail(e), identity)
      assert(im.width == w && im.height == h && im.nComponents == nc)
      assert(java.util.Arrays.equals(im.pixels, pix))
    }
  }

  test("our PNG bytes decode under ImageIO bit-exactly") {
    val r = rng(2)
    val w = 40; val h = 25
    val pix = Array.fill[Byte](w * h * 3)(r.nextInt(256).toByte)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Png.encode(pix, w, h, 3)))
    assert(ref != null && ref.getWidth == w && ref.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = ref.getRGB(x, y)
      val base = (y * w + x) * 3
      assert(((argb >> 16) & 0xff) == (pix(base) & 0xff))
      assert(((argb >> 8) & 0xff) == (pix(base + 1) & 0xff))
      assert((argb & 0xff) == (pix(base + 2) & 0xff))
    }
  }

  test("ImageIO-written PNGs (adaptive filters) decode bit-exactly under ours") {
    val r = rng(3)
    // smooth gradients make ImageIO's encoder pick Sub/Up/Average/Paeth
    for ((typ, nc) <- Seq(
        (java.awt.image.BufferedImage.TYPE_BYTE_GRAY, 1),
        (java.awt.image.BufferedImage.TYPE_INT_RGB, 3))) {
      val w = 57; val h = 33
      val buf = new java.awt.image.BufferedImage(w, h, typ)
      for (y <- 0 until h; x <- 0 until w) {
        if (nc == 1) buf.getRaster.setSample(x, y, 0, (x * 2 + y * 3 + r.nextInt(4)) % 256)
        else buf.setRGB(x, y, (((x * 4) % 256) << 16) | (((y * 7) % 256) << 8) | ((x + y) % 256))
      }
      val bytes = imageIoPng(buf)
      val im = Png.decode(bytes).fold(e => fail(e), identity)
      assert(im.width == w && im.height == h && im.nComponents == nc)
      for (y <- 0 until h; x <- 0 until w) {
        if (nc == 1)
          assert((im.pixels(y * w + x) & 0xff) == buf.getRaster.getSample(x, y, 0))
        else {
          val argb = buf.getRGB(x, y)
          val base = (y * w + x) * 3
          assert((im.pixels(base) & 0xff) == ((argb >> 16) & 0xff), s"r at $x,$y")
          assert((im.pixels(base + 1) & 0xff) == ((argb >> 8) & 0xff))
          assert((im.pixels(base + 2) & 0xff) == (argb & 0xff))
        }
      }
    }
  }

  test("RGBA and palette PNGs (ImageIO-written) decode: alpha dropped, palette resolved") {
    // RGBA
    val w = 20; val h = 12
    val argbIm = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until h; x <- 0 until w)
      argbIm.setRGB(x, y, ((x * 30 % 256) << 24) | ((x * 9 % 256) << 16) | ((y * 11 % 256) << 8) | ((x + y) % 256))
    val im = Png.decode(imageIoPng(argbIm)).fold(e => fail(e), identity)
    assert(im.nComponents == 3)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = argbIm.getRGB(x, y)
      val base = (y * w + x) * 3
      assert((im.pixels(base) & 0xff) == ((argb >> 16) & 0xff))
    }
    // palette (TYPE_BYTE_INDEXED writes color type 3)
    val pal = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until h; x <- 0 until w) pal.setRGB(x, y, if ((x + y) % 2 == 0) 0xff0000 else 0x0000ff)
    val pim = Png.decode(imageIoPng(pal)).fold(e => fail(e), identity)
    assert(pim.nComponents == 3)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = pal.getRGB(x, y) // the indexed model may approximate colors; compare to ITS pixels
      val base = (y * w + x) * 3
      assert((pim.pixels(base) & 0xff) == ((argb >> 16) & 0xff))
      assert((pim.pixels(base + 2) & 0xff) == (argb & 0xff))
    }
  }

  test("fences and malformed inputs fail closed") {
    assert(Png.decode(null).isLeft)
    assert(Png.decode(Array[Byte](1, 2, 3)).isLeft)
    val good = Png.encode(Array.fill[Byte](64)(7), 8, 8, 1)
    assert(Png.decode(good).isRight)
    for (n <- Seq(7, 8, 20, good.length / 2, good.length - 5))
      assert(Png.decode(java.util.Arrays.copyOf(good, n)).isLeft, s"prefix $n decoded")
    // corrupt a data byte -> CRC must catch it
    val bad = good.clone(); bad(30) = (bad(30) ^ 0x40).toByte
    assert(Png.decode(bad).isLeft)
    // 16-bit depth is a documented fence: patch IHDR bit depth + its CRC impossible
    // without recomputing — simpler: build via ImageIO with TYPE_USHORT_GRAY
    val deep = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    val r = Png.decode(imageIoPng(deep))
    assert(r.isLeft && r.swap.exists(_.contains("unsupported")))
  }
}
