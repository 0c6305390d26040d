package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.codec.{Ico, Png}

/** ICO/CUR favicon container: directory walk + PNG-entry decode (the
  * PNG leg rides the ImageIO-differential-pinned Png codec). */
class IcoSpec extends AnyFunSuite {

  private def grayPng(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] =
    Png.encode(Array.tabulate[Byte](w * h)(i => f(i % w, i / w).toByte), w, h, 1)

  test("directory walk: largest entry wins, PNG dims override the 0=256 byte") {
    val small = grayPng(8, 6, (x, y) => x * 20 + y)
    val big = grayPng(256, 256, (x, y) => x ^ y) // dir bytes read 0 = 256
    val ico = Ico.synthesize("icon", Seq((small, 8, 6, 32), (big, 256, 256, 32)))
    val info = Ico.info(ico).fold(e => fail(e), identity)
    assert(info.kind == "icon" && info.nEntries == 2)
    assert(info.entries(1).width == 256 && info.entries(1).height == 256)
    val im = Ico.decodeLargest(ico).fold(e => fail(e), identity)
    assert(im.width == 256 && im.height == 256)
    assert((im.pixels(3 * 256 + 5) & 0xff) == (5 ^ 3))
    // mediaInfo + decodeImage dispatch
    val mi = graft.ops.Multimodal.mediaInfo(ico)
    assert(mi.kind == "image" && mi.format == "ico" && mi.width == 256 && mi.decodable)
    assert(graft.ops.Multimodal.decodeImage(ico).exists(_.width == 256))
    val cur = Ico.synthesize("cursor", Seq((small, 8, 6, 32)))
    assert(graft.ops.Multimodal.mediaInfo(cur).format == "cur")
  }

  test("classic DIB entries label but fence decode") {
    // non-PNG payload bytes in an entry
    val dib = new Array[Byte](64)
    val ico = Ico.synthesize("icon", Seq((dib, 16, 16, 8)))
    val info = Ico.info(ico).fold(e => fail(e), identity)
    assert(!info.entries(0).isPng && info.entries(0).width == 16)
    assert(Ico.decodeLargest(ico).swap.exists(_.contains("DIB")))
    val mi = graft.ops.Multimodal.mediaInfo(ico)
    assert(mi.format == "ico" && !mi.decodable)
  }

  test("hostile payloads and fuzz never throw") {
    assert(Ico.info(Array[Byte](0, 0, 1, 0, -1, -1)).isLeft) // 65535 entries
    assert(Ico.info("random".getBytes).isLeft)
    val good = Ico.synthesize("icon", Seq((grayPng(8, 8, (x, y) => x + y), 8, 8, 32)))
    for (n <- Seq(3, 6, 20, good.length / 2))
      Ico.info(java.util.Arrays.copyOf(good, n))
    val rng = new scala.util.Random(5)
    (0 until 500).foreach { _ =>
      val m = good.clone()
      m(rng.nextInt(m.length)) = rng.nextInt(256).toByte
      Ico.info(m); Ico.decodeLargest(m); graft.ops.Multimodal.mediaInfo(m)
    }
    succeed
  }
}
