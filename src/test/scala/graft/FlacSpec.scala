package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.codec.{Flac, VorbisComment, Ogg}

/** FLAC labeling + VorbisComment harvest: hand-derived STREAMINFO
  * packings per RFC 9639 (no independent FLAC implementation exists in
  * this environment; labeling only — audio decode is fenced). */
class FlacSpec extends AnyFunSuite {

  test("STREAMINFO packing round-trips across rates/depths incl. 36-bit totals") {
    for ((rate, chn, bits, total) <- Seq(
      (44100, 2, 16, 44100L * 271 + 17), (48000, 1, 24, 0L),
      (96000, 2, 8, (1L << 35) + 12345), (8000, 8, 32, 1L),
      (192000, 2, 20, (1L << 36) - 1))) {
      val b = Flac.synthesize(rate, chn, bits, total, Nil)
      val fi = Flac.info(b).fold(e => fail(e), identity)
      assert(fi.sampleRate == rate && fi.channels == chn && fi.bitsPerSample == bits)
      assert(fi.totalSamples == total)
      assert(fi.durationMs == total * 1000L / rate)
      assert(fi.title == "" && fi.artist == "")
    }
  }

  test("vorbis comments: keys case-normalized, first value wins, unicode survives") {
    val b = Flac.synthesize(44100, 2, 16, 44100, Seq(
      "Title" -> "Héllo 世界", "ARTIST" -> "a", "artist" -> "b",
      "ALBUM" -> "x=y=z", "DATE" -> "2001", "OTHER" -> "ignored"))
    val fi = Flac.info(b).fold(e => fail(e), identity)
    assert(fi.title == "Héllo 世界")
    assert(fi.artist == "a") // first occurrence wins
    assert(fi.album == "x=y=z") // '=' split at FIRST equals only
    assert(fi.date == "2001")
  }

  test("ogg comment harvest: OpusTags and vorbis type-3, multi-segment lacing") {
    for (codec <- Seq("opus", "vorbis")) {
      val big = "z" * 700 // forces 255,255,190 lacing within one page
      val b = Ogg.synthesize(codec, 2, 48000, 0, 2, 48000,
        tags = Seq("TITLE" -> "T1", "COMMENT" -> big))
      val t = Ogg.tags(b).fold(e => fail(s"$codec: $e"), identity)
      assert(t("TITLE") == "T1" && t("COMMENT") == big, codec)
      // info() still reads the stream correctly with the extra page
      val oi = Ogg.info(b).fold(e => fail(e), identity)
      assert(oi.codec == codec && oi.durationMs == (if (codec == "opus") 1000L else 1000L))
    }
    // a tag-less stream reports a typed error, not an empty map
    val plain = Ogg.synthesize("opus", 2, 48000, 0, 2, 48000)
    assert(Ogg.tags(plain).isLeft)
  }

  test("mediaInfo labels flac") {
    val b = Flac.synthesize(22050, 1, 16, 22050L * 7, Nil)
    val mi = graft.ops.Multimodal.mediaInfo(b)
    assert(mi.kind == "audio" && mi.format == "flac" && mi.sampleRate == 22050 &&
      mi.channels == 1 && mi.durationMs == 7000L && !mi.decodable, mi.toString)
  }

  test("typed errors and fuzz: hostile lengths, truncation, never throws") {
    assert(Flac.info("not flac".getBytes).isLeft)
    val good = Flac.synthesize(44100, 2, 16, 1000, Seq("TITLE" -> "t"))
    for (n <- Seq(4, 8, 20, good.length / 2))
      assert(Flac.info(java.util.Arrays.copyOf(good, n)).isLeft, s"prefix $n")
    // hostile vorbis-comment entry length (overflows the block)
    assert(VorbisComment.parse(Array[Byte](4, 0, 0, 0, 'v', 'v', 'v', 'v',
      1, 0, 0, 0, -1, -1, -1, 0x7f), 0, 16).isLeft)
    val rng = new scala.util.Random(99)
    (0 until 600).foreach { _ =>
      val m = good.clone()
      m(rng.nextInt(m.length)) = rng.nextInt(256).toByte
      Flac.info(m); graft.ops.Multimodal.mediaInfo(m)
    }
    succeed
  }
}
