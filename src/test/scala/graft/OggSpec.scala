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
