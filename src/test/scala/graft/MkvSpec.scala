package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.codec.Mkv

/** Matroska/WebM EBML labeling: synthesis-twin round-trip + structure
  * hostility (no independent Matroska implementation exists here; IDs
  * transcribed from the public spec, posture documented in scaladoc). */
class MkvSpec extends AnyFunSuite {

  test("webm video+audio round-trips all labeled fields") {
    val b = Mkv.synthesize("webm", 1000000L, 2500.0,
      Some(("V_VP9", 1280, 720)), Some(("A_OPUS", 48000, 2)))
    val ki = Mkv.info(b).fold(e => fail(e), identity)
    assert(ki.docType == "webm" && ki.durationMs == 2500L && ki.nTracks == 2)
    assert(ki.videoCodec == "V_VP9" && ki.videoW == 1280 && ki.videoH == 720)
    assert(ki.audioCodec == "A_OPUS" && ki.audioRate == 48000 && ki.audioChannels == 2)
  }

  test("timestamp scale scales duration; float rates truncate; first track wins") {
    // 0.5 ms ticks
    val b = Mkv.synthesize("matroska", 500000L, 4000.0, Some(("V_AV1", 64, 48)), None)
    val ki = Mkv.info(b).fold(e => fail(e), identity)
    assert(ki.docType == "matroska" && ki.durationMs == 2000L)
    assert(ki.audioCodec == "" && ki.audioRate == 0)
    // audio-only
    val a = Mkv.info(Mkv.synthesize("webm", 1000000L, 100.0,
      None, Some(("A_VORBIS", 44100, 1)))).fold(e => fail(e), identity)
    assert(a.videoCodec == "" && a.audioCodec == "A_VORBIS" && a.audioRate == 44100)
  }

  test("mediaInfo dispatches webm/mkv by doc type and track kinds") {
    val v = graft.ops.Multimodal.mediaInfo(Mkv.synthesize("webm", 1000000L, 1500.0,
      Some(("V_VP8", 320, 240)), Some(("A_OPUS", 48000, 2))))
    assert(v.kind == "video" && v.format == "webm" && v.width == 320 &&
      v.height == 240 && v.durationMs == 1500L && !v.decodable, v.toString)
    val a = graft.ops.Multimodal.mediaInfo(Mkv.synthesize("webm", 1000000L, 800.0,
      None, Some(("A_OPUS", 48000, 1))))
    assert(a.kind == "audio" && a.format == "webm" && a.sampleRate == 48000)
    val m = graft.ops.Multimodal.mediaInfo(Mkv.synthesize("matroska", 1000000L, 1.0,
      Some(("V_MPEG4/ISO/AVC", 64, 64)), None))
    assert(m.format == "mkv")
  }

  test("typed errors and fuzz: bad ids/sizes/nesting, truncation, never throws") {
    assert(Mkv.info("not ebml".getBytes).isLeft)
    val good = Mkv.synthesize("webm", 1000000L, 1000.0,
      Some(("V_VP9", 640, 480)), Some(("A_OPUS", 48000, 2)))
    for (n <- Seq(4, 6, 10, good.length / 2))
      Mkv.info(java.util.Arrays.copyOf(good, n)) // Left or partial, never throws
    val rng = new scala.util.Random(7)
    (0 until 800).foreach { _ =>
      val m = good.clone()
      m(rng.nextInt(m.length)) = rng.nextInt(256).toByte
      Mkv.info(m); graft.ops.Multimodal.mediaInfo(m)
    }
    succeed
  }
}
