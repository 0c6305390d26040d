package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.codec.Mp3

/** MP3 header labeling: hand-derived vectors straight from the ISO
  * 11172-3 tables (no independent MP3 implementation exists in this
  * environment; the op is header parsing only — audio decode is fenced). */
class Mp3Spec extends AnyFunSuite {

  test("MPEG1 layer III 128kbps/44100: frame length and duration hand-check") {
    // brIdx 9 in the V1L3 table = 128 kbps; srIdx 0 = 44100
    val b = Mp3.synthesize(n = 10, versionBits = 3, layer = 3, brIdx = 9, srIdx = 0, mono = true)
    // frame length = 144 * 128000 / 44100 = 417 bytes (floor, no padding)
    assert(b.length == 10 * 417, s"${b.length}")
    val mi = Mp3.info(b).toOption.get
    assert(mi.version == "MPEG1" && mi.layer == 3)
    assert(mi.bitrateKbps == 128 && mi.sampleRate == 44100 && mi.channels == 1)
    assert(mi.nFrames == 10)
    // duration = 10 * 1152 * 1000 / 44100 = 261 ms (11520000 / 44100)
    assert(mi.durationMs == 261L)
  }

  test("MPEG2 layer III halves the samples per frame") {
    val b = Mp3.synthesize(n = 8, versionBits = 2, layer = 3, brIdx = 8, srIdx = 1, mono = false)
    val mi = Mp3.info(b).toOption.get
    assert(mi.version == "MPEG2" && mi.sampleRate == 24000 && mi.channels == 2)
    // V2L3 table idx 8 = 64 kbps; 8 frames * 576 samples / 24000 Hz = 192 ms
    assert(mi.bitrateKbps == 64)
    assert(mi.durationMs == 8L * 576 * 1000 / 24000)
  }

  test("ID3v2 prefix is skipped via its syncsafe size") {
    val b = Mp3.synthesize(n = 4, versionBits = 3, layer = 3, brIdx = 5, srIdx = 2,
      mono = true, id3Size = 1000)
    assert(b(0) == 'I' && b(1) == 'D' && b(2) == '3')
    val mi = Mp3.info(b).toOption.get
    assert(mi.nFrames == 4 && mi.sampleRate == 32000 && mi.bitrateKbps == 64)
  }

  test("trailing junk after valid frames is tolerated; leading junk is not") {
    val good = Mp3.synthesize(n = 3, versionBits = 3, layer = 3, brIdx = 9, srIdx = 0, mono = true)
    val withTail = good ++ "TAGjunkjunkjunk".getBytes("US-ASCII")
    assert(Mp3.info(withTail).toOption.get.nFrames == 3)
    val withHead = "junk".getBytes("US-ASCII") ++ good
    assert(Mp3.info(withHead).left.exists(_.contains("no frame sync")))
  }

  test("typed errors: free bitrate, reserved fields, truncation, fuzz never throws") {
    val good = Mp3.synthesize(n = 3, versionBits = 3, layer = 3, brIdx = 9, srIdx = 0, mono = true)
    // free-format bitrate: zero the bitrate index of frame 1
    val free = good.clone(); free(2) = (free(2) & 0x0f).toByte
    assert(Mp3.info(free).left.exists(_.contains("free-format")))
    // reserved version bits (01)
    val rv = good.clone(); rv(1) = 0xe8.toByte
    assert(Mp3.info(rv).isLeft)
    (0 until good.length by 13).foreach { n =>
      Mp3.info(java.util.Arrays.copyOf(good, n)) // must not throw
    }
    val rng = new scala.util.Random(5)
    (0 until 300).foreach { _ =>
      val m = good.clone()
      m(rng.nextInt(m.length)) = rng.nextInt(256).toByte
      Mp3.info(m) // must not throw
    }
    (0 until 100).foreach { _ =>
      val junk = new Array[Byte](rng.nextInt(64))
      rng.nextBytes(junk)
      Mp3.info(junk)
    }
  }
}
