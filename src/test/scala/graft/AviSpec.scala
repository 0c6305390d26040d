package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.{Avi, Jpeg, JpegEncoder}

/** AVI/MJPEG container tests. The container is lossless (frame bytes
  * stored verbatim), so round-trips are bit-exact; the JPEG payloads
  * inside are covered by JpegSpec's ImageIO differential. No independent
  * JDK AVI parser exists, so the container evidence is round-trip
  * bit-identity, structural splice tolerance, and the mutation fuzz. */
class AviSpec extends AnyFunSuite {

  private def flatJpeg(v: Int, w: Int = 16, h: Int = 16): Array[Byte] = {
    val pix = Array.fill[Byte](w * h)(v.toByte)
    JpegEncoder.encodeGray(pix, w, h, JpegEncoder.exactQuant)
  }

  test("encode -> decode round-trips frame bytes bit-exactly") {
    val frames = (0 until 5).map(i => flatJpeg(40 * i))
    val bytes = Avi.encode(frames, 16, 16, 33367) // ~29.97 fps
    val v = Avi.decode(bytes).fold(e => fail(e), identity)
    assert(v.width == 16 && v.height == 16 && v.nFrames == 5)
    assert(v.usPerFrame == 33367 && v.durationUs == 5L * 33367)
    for (i <- 0 until 5)
      assert(java.util.Arrays.equals(v.frames(i), frames(i)), s"frame $i")
  }

  test("odd-length frame payloads keep word alignment") {
    // force odd lengths by appending a trailing comment byte to the JPEGs
    val frames = (0 until 4).map { i =>
      val f = flatJpeg(30 * i + 5)
      if (f.length % 2 == 0) f :+ 0xd9.toByte else f // ensure some odd
    }
    assert(frames.exists(_.length % 2 == 1), "test needs an odd frame")
    val v = Avi.decode(Avi.encode(frames, 16, 16, 40000)).fold(e => fail(e), identity)
    for (i <- frames.indices)
      assert(java.util.Arrays.equals(v.frames(i), frames(i)), s"frame $i")
  }

  test("frames decode as JPEGs to the expected pixels") {
    val v = Avi.decode(Avi.encode(Seq(flatJpeg(96), flatJpeg(200)), 16, 16, 40000))
      .fold(e => fail(e), identity)
    for ((expected, i) <- Seq(96, 200).zipWithIndex) {
      val im = Jpeg.decode(v.frames(i)).fold(e => fail(e), identity)
      assert(im.width == 16 && im.height == 16)
      assert(im.pixels.forall(p => (p & 0xff) == expected), s"frame $i")
    }
  }

  test("unknown chunks (JUNK, odd-sized) are skipped") {
    val base = Avi.encode(Seq(flatJpeg(10), flatJpeg(20)), 16, 16, 40000)
    // splice 'JUNK' (size 5, padded to 6) right after the RIFF header
    val junk = "JUNK".getBytes("US-ASCII") ++ Array[Byte](5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = new Array[Byte](base.length + junk.length)
    System.arraycopy(base, 0, spliced, 0, 12)
    System.arraycopy(junk, 0, spliced, 12, junk.length)
    System.arraycopy(base, 12, spliced, 12 + junk.length, base.length - 12)
    // fix RIFF size
    val newSize = base.length - 8 + junk.length
    spliced(4) = (newSize & 0xff).toByte; spliced(5) = ((newSize >> 8) & 0xff).toByte
    spliced(6) = ((newSize >> 16) & 0xff).toByte; spliced(7) = ((newSize >> 24) & 0xff).toByte
    val v = Avi.decode(spliced).fold(e => fail(e), identity)
    assert(v.nFrames == 2)
  }

  test("fences and malformed inputs fail closed") {
    assert(Avi.decode(null).isLeft)
    assert(Avi.decode("RIFFxxxxWAVE".getBytes("US-ASCII")).isLeft)
    val good = Avi.encode(Seq(flatJpeg(50)), 16, 16, 40000)
    assert(Avi.decode(good).isRight)
    for (n <- Seq(4, 12, 40, good.length / 2, good.length - 3))
      assert(Avi.decode(java.util.Arrays.copyOf(good, n)).isLeft, s"prefix $n decoded")
    // a non-MJPG vids handler is a documented fence
    val h264 = good.clone()
    val idx = { // find 'vids' then patch the following fourcc
      var i = -1
      var p = 0
      while (i < 0 && p + 8 <= h264.length) {
        if (h264(p) == 'v' && h264(p + 1) == 'i' && h264(p + 2) == 'd' && h264(p + 3) == 's') i = p
        p += 1
      }
      i
    }
    assert(idx > 0)
    "H264".getBytes("US-ASCII").copyToArray(h264, idx + 4)
    val r = Avi.decode(h264)
    assert(r.isLeft && r.swap.exists(_.contains("unsupported")))
  }
}
