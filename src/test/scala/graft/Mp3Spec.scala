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

  test("mixed-sample-rate stream: duration is exact per frame, not samples/rate0") {
    // 4 frames at 44100 then 4 frames at 48000 (a concatenated-VBR shape):
    // exact duration = 4·1152/44100 + 4·1152/48000 s = 104.489… + 96 ms → 200 ms.
    // The old Σsamples/rate0 formula read 9216·1000/44100 = 208 ms.
    val b = Mp3.synthesize(4, 3, 3, 9, 0, mono = true) ++
      Mp3.synthesize(4, 3, 3, 9, 1, mono = true)
    val mi = Mp3.info(b).toOption.get
    assert(mi.nFrames == 8 && mi.sampleRate == 44100) // first-frame labeling
    assert(mi.durationMs == 200L, mi.toString)
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

  test("id3 tags: v2.3 and v2.4 frames across all three text encodings") {
    val b3 = Mp3.synthesizeId3(3, Seq(
      ("TIT2", "Der Titel \u00e9t\u00e9", 0), // latin-1
      ("TPE1", "Some Artist", 3), // utf-8
      ("TALB", "\u65e5\u672c\u306e\u30a2\u30eb\u30d0\u30e0", 1), // utf-16 + BOM
      ("TYER", "1999", 0)))
    val t3 = Mp3.id3Tags(b3).toOption.get
    assert(t3.title == "Der Titel \u00e9t\u00e9")
    assert(t3.artist == "Some Artist")
    assert(t3.album == "\u65e5\u672c\u306e\u30a2\u30eb\u30d0\u30e0")
    assert(t3.year == "1999")
    val b4 = Mp3.synthesizeId3(4, Seq(("TIT2", "v24 title", 3), ("TDRC", "2015-03", 3)))
    val t4 = Mp3.id3Tags(b4).toOption.get
    assert(t4.title == "v24 title" && t4.year == "2015-03" && t4.artist == "")
  }

  test("id3 tags: padding stop, hostile sizes, fuzz never throws") {
    val good = Mp3.synthesizeId3(3, Seq(("TIT2", "t", 0)))
    // enlarge the declared tag size → trailing zeros read as padding
    val padded = good ++ new Array[Byte](64)
    padded(9) = (padded(9) + 64).toByte
    assert(Mp3.id3Tags(padded).toOption.get.title == "t")
    val hostile = good.clone()
    hostile(14) = 0x7f; hostile(15) = -1; hostile(16) = -1; hostile(17) = -1
    assert(Mp3.id3Tags(hostile).left.exists(_.contains("bad frame size")))
    val rng = new scala.util.Random(29)
    (0 until 300).foreach { _ =>
      val m = good.clone()
      m(rng.nextInt(m.length)) = rng.nextInt(256).toByte
      Mp3.id3Tags(m) // must not throw
    }
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
