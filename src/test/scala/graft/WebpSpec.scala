package graft

import java.util.Base64
import org.scalatest.funsuite.AnyFunSuite
import graft.codec.{Jpeg, WebpVp8l}

/** WebP-lossless codec pinned against the system libwebp: the frozen
  * fixtures (fixtures/webp_goldens_v1.jsonl) were produced by
  * scripts/gen_webp_fixtures.py, which (a) encodes deterministic
  * patterns with libwebp's own lossless encoder (full transform /
  * cache / meta coverage chosen by the reference implementation) and
  * (b) handcrafts VP8L streams validated through libwebp's decoder
  * before freezing (distance-map probes, color-cache hit, meta prefix
  * dispatch). Regenerate only via the script; any drift here is codec
  * drift, not fixture drift. */
class WebpSpec extends AnyFunSuite {

  private case class Fx(name: String, w: Int, h: Int, webp: Array[Byte],
      rgba: Array[Byte], lossy: Boolean)

  private def loadFixtures(): Seq[Fx] = {
    val src = scala.io.Source.fromFile("fixtures/webp_goldens_v1.jsonl", "UTF-8")
    try {
      src.getLines().map { line =>
        def field(k: String): String = {
          val i = line.indexOf("\"" + k + "\":")
          val vstart = line.indexOf('"', i + k.length + 3) + 1
          line.substring(vstart, line.indexOf('"', vstart))
        }
        def intField(k: String): Int = {
          val i = line.indexOf("\"" + k + "\":") + k.length + 3
          line.substring(i).dropWhile(!_.isDigit).takeWhile(_.isDigit).toInt
        }
        Fx(field("name"), intField("w"), intField("h"),
          Base64.getDecoder.decode(field("webp_b64")),
          Base64.getDecoder.decode(field("rgba_b64")),
          line.contains("\"kind\": \"lossy\"") || line.contains("\"kind\":\"lossy\""))
      }.toList
    } finally src.close()
  }

  private def toRgba(im: Jpeg.Image): Array[Byte] = {
    val out = new Array[Byte](im.width * im.height * 4)
    var i = 0
    while (i < im.width * im.height) {
      im.nComponents match {
        case 4 =>
          System.arraycopy(im.pixels, i * 4, out, i * 4, 4)
        case 3 =>
          out(i * 4) = im.pixels(i * 3)
          out(i * 4 + 1) = im.pixels(i * 3 + 1)
          out(i * 4 + 2) = im.pixels(i * 3 + 2)
          out(i * 4 + 3) = 0xff.toByte
        case 1 =>
          out(i * 4) = im.pixels(i); out(i * 4 + 1) = im.pixels(i)
          out(i * 4 + 2) = im.pixels(i); out(i * 4 + 3) = 0xff.toByte
      }
      i += 1
    }
    out
  }

  test("every libwebp-pinned fixture decodes byte-identically") {
    val fxs = loadFixtures().filterNot(_.lossy)
    assert(fxs.size >= 18, "fixture file truncated?")
    fxs.foreach { fx =>
      WebpVp8l.decode(fx.webp) match {
        case Right(im) =>
          assert(im.width == fx.w && im.height == fx.h, s"${fx.name}: dims")
          assert(java.util.Arrays.equals(toRgba(im), fx.rgba),
            s"${fx.name}: PIXEL DRIFT vs libwebp")
        case Left(err) => fail(s"${fx.name}: decode failed: $err")
      }
    }
  }

  test("info() agrees with WebPGetInfo on every fixture incl. lossy/VP8X") {
    val fxs = loadFixtures()
    assert(fxs.exists(_.lossy), "lossy fixtures missing?")
    fxs.foreach { fx =>
      WebpVp8l.info(fx.webp) match {
        case Right((w, h, lossless)) =>
          assert(w == fx.w && h == fx.h, s"${fx.name}: info dims $w x $h")
          assert(lossless == !fx.lossy, s"${fx.name}: lossless flag")
        case Left(err) => fail(s"${fx.name}: info failed: $err")
      }
      if (fx.lossy) {
        if (fx.name.startsWith("vp8hdr")) {
          // round-4 header-only stub (10-byte frame header, no frame
          // data): still labels via info(), and the real decoder now
          // reports the truncation as a typed error
          assert(WebpVp8l.decode(fx.webp).isLeft, s"${fx.name}: stub decoded?")
        } else {
          // round 5: lossy decodes for real through the Vp8 key-frame
          // decoder (itself fixture-pinned bit-exactly in Vp8Spec)
          val im = WebpVp8l.decode(fx.webp).fold(e => fail(s"${fx.name}: lossy decode: $e"), identity)
          assert(im.width == fx.w && im.height == fx.h && im.nComponents == 3, fx.name)
        }
      }
    }
  }

  test("distance map equals the libwebp-extracted table entry for entry") {
    // extracted empirically by scripts/gen_webp_fixtures.py: a length-1
    // backref per code 1..120 decoded through libwebp, source pixel
    // recovered from its unique color
    val expected = Seq(
      (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
      (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
      (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
      (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
      (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
      (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
      (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
      (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
      (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
      (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
      (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
      (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
      (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
      (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
      (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))
    val got = WebpVp8l.DistanceMap.map(e => ((e & 0xff) - 128, e >> 8)).toSeq
    assert(got == expected)
  }

  test("encoder twin round-trips rgb and rgba (incl. 1x1 and odd sizes)") {
    val rng = new scala.util.Random(42)
    for ((w, h, nc) <- Seq((1, 1, 3), (3, 2, 3), (16, 16, 3), (7, 5, 4), (33, 9, 4))) {
      val pix = new Array[Byte](w * h * nc)
      rng.nextBytes(pix)
      val webp = WebpVp8l.encode(pix, w, h, nc)
      WebpVp8l.decode(webp) match {
        case Right(im) =>
          assert(im.width == w && im.height == h, s"$w x $h dims")
          if (nc == 3) {
            assert(im.nComponents == 3)
            assert(java.util.Arrays.equals(im.pixels, pix), s"$w x $h rgb roundtrip")
          } else {
            // alpha flag set only if some alpha != 255
            val rt = toRgba(im)
            val want = new Array[Byte](w * h * 4)
            System.arraycopy(pix, 0, want, 0, pix.length)
            assert(java.util.Arrays.equals(rt, want), s"$w x $h rgba roundtrip")
          }
        case Left(err) => fail(s"$w x $h: $err")
      }
    }
  }

  test("constant-channel images use 0-bit simple codes and round-trip") {
    val w = 9; val h = 4
    val pix = Array.tabulate(w * h * 3) { i =>
      if (i % 3 == 0) 77.toByte else if (i % 3 == 1) (i / 3).toByte else 200.toByte
    }
    val webp = WebpVp8l.encode(pix, w, h, 3)
    val im = WebpVp8l.decode(webp).toOption.get
    assert(java.util.Arrays.equals(im.pixels, pix))
  }

  test("typed errors: truncated VP8, bad signature, truncation, hostile dims") {
    // an empty VP8 chunk is now a TRUNCATION error from the real decoder
    assert(WebpVp8l.decode("RIFF\u0000\u0000\u0000\u0000WEBPVP8 \u0000\u0000\u0000\u0000"
      .getBytes("ISO-8859-1")).isLeft)
    assert(WebpVp8l.decode("nope".getBytes).isLeft)
    assert(WebpVp8l.decode(Array.emptyByteArray).isLeft)
    // 16384x16384 = 2^28 pixels > cap: the header alone must fail fast
    val payload = Array[Byte](0x2f, -1, -1, -1, 0x1f, 0, 0, 0, 0, 0)
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = (0 until 4).foreach(k => out.write((v >> (8 * k)) & 0xff))
    out.write("RIFF".getBytes("US-ASCII")); le32(4 + 8 + payload.length)
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8L".getBytes("US-ASCII")); le32(payload.length)
    out.write(payload, 0, payload.length)
    val r = WebpVp8l.decode(out.toByteArray)
    assert(r.left.exists(e => e.contains("too large") || e.contains("overrun")), r)
  }

  test("animated webp: opaque frames composite last-writer-wins with dispose") {
    val cw = 12; val ch = 8
    def solid(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] =
      Array.tabulate(w * h * 3)(i => (i % 3 match {
        case 0 => r; case 1 => g; case _ => b
      }).toByte)
    // frame 1: full canvas red; frame 2: 4x4 green at (2,2) no-blend;
    // frame 3: 4x2 blue at (6,4) with disposeBg, then frame 4 tiny white
    val frames = Seq(
      (0, 0, cw, ch, solid(cw, ch, 200, 0, 0), 3, 40, true, false),
      (2, 2, 4, 4, solid(4, 4, 0, 200, 0), 3, 50, true, false),
      (6, 4, 4, 2, solid(4, 2, 0, 0, 200), 3, 60, true, true),
      (0, 0, 2, 2, solid(2, 2, 255, 255, 255), 3, 70, true, false))
    val data = WebpVp8l.encodeAnimated(cw, ch, 5, frames)
    val anim = WebpVp8l.decodeFrames(data).toOption.getOrElse(fail("decode failed"))
    assert(anim.width == cw && anim.height == ch && anim.nFrames == 4)
    assert(anim.loop == 5 && anim.durationsMs == Vector(40, 50, 60, 70))
    // reference composite
    val ref = new Array[Int](cw * ch) // ARGB
    def place(x0: Int, y0: Int, w: Int, h: Int, px: Array[Byte]): Unit =
      for (y <- 0 until h; x <- 0 until w) {
        val i = (y * w + x) * 3
        ref((y0 + y) * cw + (x0 + x)) = 0xff000000 |
          ((px(i) & 0xff) << 16) | ((px(i + 1) & 0xff) << 8) | (px(i + 2) & 0xff)
      }
    def snapshotEq(k: Int): Unit = {
      val got = anim.frames(k).pixels
      for (i <- 0 until cw * ch) {
        val want = ref(i)
        val g = ((got(i * 4 + 3) & 0xff) << 24) | ((got(i * 4) & 0xff) << 16) |
          ((got(i * 4 + 1) & 0xff) << 8) | (got(i * 4 + 2) & 0xff)
        assert(g == want, s"frame $k pixel $i: got ${g.toHexString} want ${want.toHexString}")
      }
    }
    place(0, 0, cw, ch, solid(cw, ch, 200, 0, 0)); snapshotEq(0)
    place(2, 2, 4, 4, solid(4, 4, 0, 200, 0)); snapshotEq(1)
    place(6, 4, 4, 2, solid(4, 2, 0, 0, 200)); snapshotEq(2)
    // frame 3 disposed its rect to TRANSPARENT before frame 4
    for (y <- 4 until 6; x <- 6 until 10) ref(y * cw + x) = 0
    place(0, 0, 2, 2, solid(2, 2, 255, 255, 255)); snapshotEq(3)
  }

  test("animated webp: alpha blending is deterministic and bounded") {
    val cw = 6; val ch = 4
    val opaque = Array.tabulate(cw * ch * 4)(i => (i % 4 match {
      case 0 => 100; case 1 => 150; case 2 => 200; case _ => 255
    }).toByte)
    val translucent = Array.tabulate(cw * ch * 4)(i => (i % 4 match {
      case 0 => 255; case 1 => 0; case 2 => 0; case _ => 128
    }).toByte)
    val frames = Seq(
      (0, 0, cw, ch, opaque, 4, 10, false, false),
      (0, 0, cw, ch, translucent, 4, 10, false, false)) // alpha-blend over
    val anim = WebpVp8l.decodeFrames(
      WebpVp8l.encodeAnimated(cw, ch, 0, frames)).toOption.get
    val f = anim.frames(1).pixels
    // blended red channel: (255*128*255 + 100*255*127) / (128*255 + 255*127)
    val aOut255 = 128 * 255 + 255 * (255 - 128)
    val wantR = (255 * 128 * 255 + 100 * 255 * (255 - 128)) / aOut255
    assert((f(0) & 0xff) == wantR, s"got ${f(0) & 0xff} want $wantR")
    assert((f(3) & 0xff) == (aOut255 + 127) / 255)
  }

  test("animated webp: LOSSY (VP8) frames composite through the pinned decoder") {
    // hand-rolled container: VP8X + ANIM + two ANMF frames whose payloads
    // are Vp8Synth all-DC key frames (decode = uniform 130 RGB)
    val out = new java.io.ByteArrayOutputStream()
    def le24(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write(v & 0xff); o.write((v >> 8) & 0xff); o.write((v >> 16) & 0xff)
    }
    def le32(o: java.io.ByteArrayOutputStream, v: Int): Unit = { le24(o, v); o.write((v >> 24) & 0xff) }
    def chunk(tag: String, payload: Array[Byte]): Unit = {
      out.write(tag.getBytes("US-ASCII")); le32(out, payload.length)
      out.write(payload, 0, payload.length)
      if ((payload.length & 1) == 1) out.write(0)
    }
    val cw = 20; val ch = 12
    val vp8x = new java.io.ByteArrayOutputStream()
    vp8x.write(0x12); vp8x.write(0); vp8x.write(0); vp8x.write(0)
    le24(vp8x, cw - 1); le24(vp8x, ch - 1)
    val body = new java.io.ByteArrayOutputStream()
    def anmf(x: Int, y: Int, fw: Int, fh: Int, dur: Int): Array[Byte] = {
      val a = new java.io.ByteArrayOutputStream()
      le24(a, x / 2); le24(a, y / 2); le24(a, fw - 1); le24(a, fh - 1)
      le24(a, dur); a.write(2) // no-blend
      val payload = graft.codec.Vp8Synth.synthesize(fw, fh, 40, 10)
      a.write("VP8 ".getBytes("US-ASCII")); le32(a, payload.length)
      a.write(payload, 0, payload.length)
      if ((payload.length & 1) == 1) a.write(0)
      a.toByteArray
    }
    // assemble container bytes
    val riff = new java.io.ByteArrayOutputStream()
    chunk("VP8X", vp8x.toByteArray)
    val animB = new java.io.ByteArrayOutputStream()
    (0 until 4).foreach(_ => animB.write(0)); animB.write(0); animB.write(0)
    chunk("ANIM", animB.toByteArray)
    chunk("ANMF", anmf(0, 0, cw, ch, 40))
    chunk("ANMF", anmf(4, 2, 8, 6, 60))
    val payload = out.toByteArray
    val full = new java.io.ByteArrayOutputStream()
    full.write("RIFF".getBytes("US-ASCII")); le32(full, 4 + payload.length)
    full.write("WEBP".getBytes("US-ASCII"))
    full.write(payload, 0, payload.length)
    val bytes = full.toByteArray
    val anim = WebpVp8l.decodeFrames(bytes).fold(e => fail(e), identity)
    assert(anim.frames.length == 2 && anim.width == cw && anim.height == ch)
    assert(anim.durationsMs == Seq(40, 60))
    // frame 1: whole canvas uniform 130, opaque
    val f0 = anim.frames(0)
    for (i <- 0 until cw * ch) {
      assert((f0.pixels(4 * i) & 0xff) == 130 && (f0.pixels(4 * i + 3) & 0xff) == 255,
        s"frame0 px $i")
    }
    // frame 2 composites the 8x6 sub-frame (same color — still uniform)
    assert(anim.frames(1).pixels.grouped(4).forall(p => (p(0) & 0xff) == 130))
  }

  test("mutation fuzz: corrupted streams degrade to typed errors, never throw") {
    val fxs = loadFixtures().take(6)
    val rng = new scala.util.Random(1337)
    var errs = 0
    fxs.foreach { fx =>
      (0 until 120).foreach { k =>
        val mutated = fx.webp.clone()
        k % 3 match {
          case 0 => // flip a random byte
            val i = rng.nextInt(mutated.length)
            mutated(i) = (mutated(i) ^ (1 << rng.nextInt(8))).toByte
          case 1 => // truncate
            val n = rng.nextInt(mutated.length)
            val t = java.util.Arrays.copyOf(mutated, n)
            WebpVp8l.decode(t) // must not throw
          case _ => // garbage tail region
            val i = rng.nextInt(mutated.length)
            mutated(i) = rng.nextInt(256).toByte
        }
        WebpVp8l.decode(mutated) match { // must not throw
          case Left(_) => errs += 1
          case Right(_) => () // a mutation may still decode; that's fine
        }
      }
    }
    assert(errs > 0) // the sweep actually exercised failure paths
  }
}
