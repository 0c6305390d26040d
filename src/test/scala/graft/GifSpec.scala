package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.Gif

/** GIF codec tests: bit-exact LZW round-trips plus both-direction
  * differentials against the JDK's independent ImageIO GIF plugin. */
class GifSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  private val palette16: Array[Byte] =
    Array.tabulate(16 * 3)(i => ((i / 3) * 17 match { // 16 distinct gray-ish triples
      case v if i % 3 == 0 => v
      case v if i % 3 == 1 => 255 - v
      case v => (v * 3) % 256
    }).toByte)

  private def rgbOf(indices: Array[Byte], pal: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](indices.length * 3)
    for (i <- indices.indices) {
      val ix = indices(i) & 0xff
      out(3 * i) = pal(3 * ix); out(3 * i + 1) = pal(3 * ix + 1); out(3 * i + 2) = pal(3 * ix + 2)
    }
    out
  }

  test("encode -> decode round-trips bit-exactly") {
    val r = rng(1)
    for ((w, h) <- Seq((13, 7), (64, 33), (1, 1), (300, 2))) {
      val idx = Array.fill[Byte](w * h)(r.nextInt(16).toByte)
      val im = Gif.decode(Gif.encode(idx, w, h, palette16)).fold(e => fail(s"($w x $h): $e"), identity)
      assert(im.width == w && im.height == h && im.nComponents == 3)
      assert(java.util.Arrays.equals(im.pixels, rgbOf(idx, palette16)), s"($w x $h) mismatch")
    }
  }

  test("long runs grow the LZW dictionary through width bumps and clears") {
    val r = rng(2)
    val w = 200; val h = 120 // 24k pixels: thousands of dict entries
    val idx = new Array[Byte](w * h)
    for (i <- idx.indices)
      idx(i) = (if (i % 97 < 60) (i / 37) % 16 else r.nextInt(16)).toByte
    val bytes = Gif.encode(idx, w, h, palette16)
    val im = Gif.decode(bytes).fold(e => fail(e), identity)
    assert(java.util.Arrays.equals(im.pixels, rgbOf(idx, palette16)))
  }

  test("our GIF bytes decode under ImageIO bit-exactly") {
    val r = rng(3)
    val w = 40; val h = 22
    val idx = Array.fill[Byte](w * h)(r.nextInt(16).toByte)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Gif.encode(idx, w, h, palette16)))
    assert(ref != null && ref.getWidth == w && ref.getHeight == h)
    val want = rgbOf(idx, palette16)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = ref.getRGB(x, y)
      val base = (y * w + x) * 3
      assert(((argb >> 16) & 0xff) == (want(base) & 0xff), s"r at $x,$y")
      assert(((argb >> 8) & 0xff) == (want(base + 1) & 0xff), s"g at $x,$y")
      assert((argb & 0xff) == (want(base + 2) & 0xff), s"b at $x,$y")
    }
  }

  test("ImageIO-written GIFs decode bit-exactly under ours") {
    val w = 31; val h = 19
    val buf = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until h; x <- 0 until w)
      buf.setRGB(x, y, Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff, 0x000000)((x * y + x) % 5))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(buf, "gif", bos))
    val im = Gif.decode(bos.toByteArray).fold(e => fail(e), identity)
    assert(im.width == w && im.height == h && im.nComponents == 3)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = buf.getRGB(x, y)
      val base = (y * w + x) * 3
      assert((im.pixels(base) & 0xff) == ((argb >> 16) & 0xff), s"r at $x,$y")
      assert((im.pixels(base + 1) & 0xff) == ((argb >> 8) & 0xff), s"g at $x,$y")
      assert((im.pixels(base + 2) & 0xff) == (argb & 0xff), s"b at $x,$y")
    }
  }

  test("malformed inputs fail closed") {
    assert(Gif.decode(null).isLeft)
    assert(Gif.decode("GIF89a".getBytes).isLeft)
    assert(Gif.decode("not a gif".getBytes).isLeft)
    val good = Gif.encode(Array.fill[Byte](64)(3), 8, 8, palette16)
    assert(Gif.decode(good).isRight)
    for (n <- Seq(5, 6, 12, good.length / 2))
      assert(Gif.decode(java.util.Arrays.copyOf(good, n)).isLeft, s"prefix $n decoded")
  }

  // ------------------------------------------------------------ animation

  /** Reference compositor: apply FrameSpecs to a black canvas the way a
    * browser would — independent of both our encoder and decoder. */
  private def composite(sw: Int, sh: Int, pal: Array[Byte],
      frames: Seq[Gif.FrameSpec]): Seq[Array[Byte]] = {
    val canvas = new Array[Byte](sw * sh * 3)
    var prevDisposal = 0
    var prevRect: (Int, Int, Int, Int) = null
    var prevCanvas: Array[Byte] = null
    frames.map { f =>
      prevDisposal match {
        case 2 if prevRect != null =>
          val (pl, pt, pw, ph) = prevRect
          for (y <- pt until pt + ph; x <- pl until pl + pw; c <- 0 until 3)
            canvas((y * sw + x) * 3 + c) = 0
        case 3 if prevCanvas != null => prevCanvas.copyToArray(canvas)
        case _ => ()
      }
      val saved = if (f.disposal == 3) canvas.clone() else null
      for (y <- 0 until f.height; x <- 0 until f.width) {
        val idx = f.indices(y * f.width + x) & 0xff
        if (idx != f.transIdx) {
          val o = ((f.top + y) * sw + f.left + x) * 3
          canvas(o) = pal(3 * idx); canvas(o + 1) = pal(3 * idx + 1); canvas(o + 2) = pal(3 * idx + 2)
        }
      }
      prevDisposal = f.disposal; prevRect = (f.left, f.top, f.width, f.height)
      prevCanvas = saved
      canvas.clone()
    }
  }

  private def animSpecs(seed: Int): (Int, Int, Seq[Gif.FrameSpec]) = {
    val sw = 12; val sh = 8
    val base = Gif.FrameSpec(
      Array.tabulate[Byte](sw * sh)(i => ((seed + i % sw + i / sw) % 8).toByte),
      0, 0, sw, sh, delayCs = 5, disposal = 1)
    val patch = Gif.FrameSpec(
      Array.tabulate[Byte](4 * 3)(i => (8 + (seed + i % 4 + i / 4) % 8).toByte),
      4, 2, 4, 3, delayCs = 6, disposal = 1 + seed % 3, transIdx = 15)
    val patch2 = Gif.FrameSpec(
      Array.tabulate[Byte](2 * 2)(i => ((seed + 3 + i % 2 + i / 2) % 8).toByte),
      0, 0, 2, 2, delayCs = 7, disposal = 1)
    (sw, sh, Seq(base, patch, patch2))
  }

  test("animated round-trip: composited frames match the reference model for all disposals") {
    for (seed <- 0 until 6) {
      val (sw, sh, specs) = animSpecs(seed)
      val bytes = Gif.encodeAnimated(sw, sh, palette16, loop = seed % 5, specs)
      val anim = Gif.decodeFrames(bytes).fold(e => fail(e), identity)
      assert(anim.width == sw && anim.height == sh && anim.nFrames == 3, s"seed $seed")
      assert(anim.loop == seed % 5 && anim.delaysCs == Vector(5, 6, 7))
      assert(anim.durationCs == 18)
      val want = composite(sw, sh, palette16, specs)
      for (k <- 0 until 3)
        assert(java.util.Arrays.equals(anim.frames(k).pixels, want(k)),
          s"seed $seed frame $k (disposal ${1 + seed % 3})")
    }
  }

  test("our animated GIFs read frame-by-frame under ImageIO with matching rects") {
    val (sw, sh, specs) = animSpecs(1)
    val bytes = Gif.encodeAnimated(sw, sh, palette16, loop = 2, specs)
    val rd = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    rd.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    assert(rd.getNumImages(true) == 3)
    for ((f, k) <- specs.zipWithIndex) {
      val im = rd.read(k)
      assert(im.getWidth == f.width && im.getHeight == f.height, s"frame $k dims")
      for (y <- 0 until f.height; x <- 0 until f.width) {
        val idx = f.indices(y * f.width + x) & 0xff
        if (idx != f.transIdx) { // their reader maps transparent to alpha 0
          val argb = im.getRGB(x, y)
          assert(((argb >> 16) & 0xff) == (palette16(3 * idx) & 0xff), s"frame $k r at $x,$y")
          assert(((argb >> 8) & 0xff) == (palette16(3 * idx + 1) & 0xff))
          assert((argb & 0xff) == (palette16(3 * idx + 2) & 0xff))
        } else assert((im.getRGB(x, y) >>> 24) == 0, s"frame $k alpha at $x,$y")
      }
    }
    rd.dispose()
  }

  test("single-frame decode still reads animated files (first frame, own rect)") {
    val (sw, sh, specs) = animSpecs(2)
    val bytes = Gif.encodeAnimated(sw, sh, palette16, loop = 0, specs)
    val im = Gif.decode(bytes).fold(e => fail(e), identity)
    assert(im.width == sw && im.height == sh)
  }

  test("animation fences: frame outside canvas, runaway frame counts") {
    val bad = Gif.FrameSpec(Array.fill[Byte](4)(0), 11, 7, 2, 2, 1, 1)
    intercept[IllegalArgumentException] {
      Gif.encodeAnimated(12, 8, palette16, 0, Seq(bad))
    }
    val (sw, sh, specs) = animSpecs(0)
    val bytes = Gif.encodeAnimated(sw, sh, palette16, 0, specs)
    assert(Gif.decodeFrames(bytes, maxFrames = 2).isLeft)
    for (n <- Seq(10, 30, bytes.length / 2, bytes.length - 2))
      assert(Gif.decodeFrames(java.util.Arrays.copyOf(bytes, n)).isLeft, s"prefix $n decoded")
  }
}
