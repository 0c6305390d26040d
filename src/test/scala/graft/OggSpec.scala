package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.codec.Ogg

/** OGG container labeling: hand-built pages per RFC 3533 / 7845. */
class OggSpec extends AnyFunSuite {

  test("opus: duration from the final granule minus pre-skip at 48 kHz") {
    val b = Ogg.synthesize("opus", channels = 2, rate = 48000, preSkip = 312,
      nDataPages = 5, finalGranule = 96312)
    assert(Ogg.isOgg(b))
    val oi = Ogg.info(b).toOption.get
    assert(oi.codec == "opus" && oi.channels == 2 && oi.sampleRate == 48000)
    assert(oi.nPages == 6)
    // (96312 - 312) * 1000 / 48000 = 2000 ms
    assert(oi.durationMs == 2000L)
  }

  test("vorbis: granule clock is the stream's own sample rate") {
    val b = Ogg.synthesize("vorbis", channels = 1, rate = 22050,
      preSkip = 0, nDataPages = 3, finalGranule = 44100)
    val oi = Ogg.info(b).toOption.get
    assert(oi.codec == "vorbis" && oi.channels == 1 && oi.sampleRate == 22050)
    assert(oi.durationMs == 2000L)
  }

  test("multiplexed container: nPages counts only the tracked first-BOS stream") {
    // stream A (serial 77, the synthesize default) + stream B with every
    // page's serial patched to 88 — a grouped audio+video shape. Labeling
    // must report A's page count and duration, not the container total.
    val a = Ogg.synthesize("opus", 2, 48000, 0, nDataPages = 5, finalGranule = 96000)
    val b = Ogg.synthesize("vorbis", 1, 22050, 0, nDataPages = 3, finalGranule = 999999)
    var p = 0
    while (p + 27 <= b.length) { // walk B's pages, patch serial LE32 at +14
      val nSegs = b(p + 26) & 0xff
      var bodyLen = 0
      (0 until nSegs).foreach(k => bodyLen += b(p + 27 + k) & 0xff)
      b(p + 14) = 88; b(p + 15) = 0; b(p + 16) = 0; b(p + 17) = 0
      p += 27 + nSegs + bodyLen
    }
    val oi = Ogg.info(a ++ b).toOption.get
    assert(oi.codec == "opus" && oi.nPages == 6, oi.toString) // not 10
    assert(oi.durationMs == 2000L) // A's granule clock, unpolluted by B's
  }

  test("typed errors and fuzz: truncation and mutation never throw") {
    assert(Ogg.info("not ogg".getBytes).isLeft)
    val good = Ogg.synthesize("opus", 2, 48000, 0, 4, 48000)
    (0 until good.length by 9).foreach { n =>
      Ogg.info(java.util.Arrays.copyOf(good, n)) // must not throw
    }
    val rng = new scala.util.Random(23)
    (0 until 300).foreach { _ =>
      val m = good.clone()
      m(rng.nextInt(m.length)) = rng.nextInt(256).toByte
      Ogg.info(m) // must not throw
    }
  }
}
