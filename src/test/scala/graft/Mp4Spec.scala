package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.codec.Mp4

/** MP4/ISO-BMFF box-level labeling: hand-built structures per ISO
  * 14496-12 (box sizes, version-0/1 headers, 16.16 fixed dims). */
class Mp4Spec extends AnyFunSuite {

  test("synthesized movie: brand, duration, tracks, video dims") {
    val b = Mp4.synthesize("mp42", timescale = 1000, duration = 5400,
      videoW = 640, videoH = 360, extraAudioTrack = true)
    assert(Mp4.isMp4(b))
    val mi = Mp4.info(b).toOption.get
    assert(mi.brand == "mp42")
    assert(mi.durationMs == 5400L) // timescale 1000 → ms verbatim
    assert(mi.nTracks == 2)
    assert(mi.videoW == 640 && mi.videoH == 360)
  }

  test("non-millisecond timescale converts exactly (integer division)") {
    val b = Mp4.synthesize("isom", timescale = 90000, duration = 123456,
      videoW = 1920, videoH = 1080)
    val mi = Mp4.info(b).toOption.get
    assert(mi.durationMs == 123456L * 1000 / 90000)
    assert(mi.videoW == 1920 && mi.videoH == 1080 && mi.nTracks == 1)
  }

  test("HEIF stills: ispe dims via meta/iprp/ipco, largest wins, brands label") {
    // AVIF with a primary ispe and a smaller thumbnail ispe
    val avif = Mp4.synthesizeHeif("avif", Seq((640, 480), (64, 48)))
    val ai = Mp4.info(avif).toOption.get
    assert(ai.brand == "avif" && ai.videoW == 640 && ai.videoH == 480, ai.toString)
    assert(ai.durationMs == 0L && ai.nTracks == 0)
    // thumbnail listed FIRST must still lose to the larger primary
    val rev = Mp4.info(Mp4.synthesizeHeif("heic", Seq((32, 24), (800, 600)))).toOption.get
    assert(rev.brand == "heic" && rev.videoW == 800 && rev.videoH == 600)
    // mediaInfo dispatch: image kind, avif/heic formats, decode fenced
    val mi = graft.ops.Multimodal.mediaInfo(avif)
    assert(mi.kind == "image" && mi.format == "avif" && mi.width == 640 &&
      mi.height == 480 && !mi.decodable, mi.toString)
    val hi = graft.ops.Multimodal.mediaInfo(Mp4.synthesizeHeif("heic", Seq((12, 7))))
    assert(hi.kind == "image" && hi.format == "heic" && hi.width == 12 && hi.height == 7)
    // a non-image brand with no moov stays a typed error
    assert(Mp4.info(Mp4.synthesizeHeif("isom", Seq((10, 10)))).isLeft)
    // fuzz: mutated HEIF bytes never throw
    val rng = new scala.util.Random(7)
    (0 until 300).foreach { _ =>
      val m = avif.clone()
      m(rng.nextInt(m.length)) = rng.nextInt(256).toByte
      Mp4.info(m); graft.ops.Multimodal.mediaInfo(m)
    }
  }

  test("typed errors: junk, truncation, hostile box sizes; fuzz never throws") {
    assert(Mp4.info("not an mp4 at all".getBytes).isLeft)
    val good = Mp4.synthesize("mp42", 600, 1200, 320, 240)
    (0 until good.length by 11).foreach { n =>
      Mp4.info(java.util.Arrays.copyOf(good, n)) // must not throw
    }
    // hostile: a box claiming a huge size must fail, not allocate
    val hostile = good.clone()
    hostile(0) = 0x7f; hostile(1) = -1; hostile(2) = -1; hostile(3) = -1
    assert(Mp4.info(hostile).left.exists(_.contains("bad box size")))
    val rng = new scala.util.Random(17)
    (0 until 300).foreach { _ =>
      val m = good.clone()
      m(rng.nextInt(m.length)) = rng.nextInt(256).toByte
      Mp4.info(m) // must not throw
    }
  }
}
