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
}
