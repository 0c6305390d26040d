package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.Wav
import graft.ops.Multimodal

/** WAV PCM codec + dHash kernel tests. The independent oracle for WAV is
  * the JDK's javax.sound.sampled stack (shares no code with ours): our
  * encoder's bytes must parse under AudioSystem with identical format
  * fields and sample data. */
class WavSpec extends AnyFunSuite {

  private def saw(n: Int, seed: Int): Array[Short] =
    Array.tabulate(n)(i => (((seed * 13 + i * 17) % 2001) - 1000).toShort)

  test("float32 WAV (format 3): documented scaling, javax.sound differential <= 1") {
    val vals = Array(0.0f, 1.0f, -1.0f, 0.5f, -0.25f, 0.123456f, 1.5f, -2.0f,
      Float.NaN, 1e-6f, -0.999f, 0.99999f)
    val bytes = Wav.encodeFloat(vals, 1, 16000)
    val au = Wav.decode(bytes).fold(e => fail(e), identity)
    assert(au.channels == 1 && au.sampleRate == 16000 && au.bitsPerSample == 32)
    // documented convention: rint(f*32767), clamped; NaN -> 0
    val want = vals.map { f =>
      if (f.isNaN) 0
      else math.max(-32768L, math.min(32767L, Math.rint(f.toDouble * 32767.0).toLong)).toInt
    }
    assert(au.samples.map(_.toInt).sameElements(want),
      au.samples.mkString(",") + " vs " + want.mkString(","))
    // javax.sound reads the same container and converts to 16-bit PCM;
    // allow <=1 count for converter rounding differences on in-range values
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    assert(ais.getFormat.getEncoding.toString.toUpperCase.contains("FLOAT"))
    val target = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED, 16000f, 16, 1, 2, 16000f, false)
    val conv = javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais)
    val buf = conv.readAllBytes()
    assert(buf.length == vals.length * 2)
    var maxDiff = 0
    // out-of-range floats excluded: the JDK converter WRAPS them while we
    // clamp (the libsndfile-style convention, asserted exactly above)
    for (i <- vals.indices if !vals(i).isNaN && math.abs(vals(i)) <= 1.0f) {
      val jdk = ((buf(2 * i) & 0xff) | (buf(2 * i + 1) << 8)).toShort.toInt
      maxDiff = math.max(maxDiff, math.abs(jdk - au.samples(i)))
    }
    assert(maxDiff <= 1, s"maxDiff=$maxDiff vs javax.sound")
    // stereo float + mediaInfo duration
    val st = Wav.encodeFloat(Array.tabulate(800)(i => math.sin(i / 10.0).toFloat), 2, 8000)
    val au2 = Wav.decode(st).fold(e => fail(e), identity)
    assert(au2.channels == 2 && au2.nFrames == 400)
    val mi = graft.ops.Multimodal.mediaInfo(st)
    assert(mi.kind == "audio" && mi.durationMs == 400L * 1000 / 8000, mi.toString)
  }

  test("encode -> decode round-trips exactly (mono and stereo)") {
    for ((ch, n, rate) <- Seq((1, 480, 8000), (2, 960, 44100), (1, 1, 16000))) {
      val s = saw(n * ch, n + ch)
      val a = Wav.decode(Wav.encode(s, ch, rate)).fold(e => fail(e), identity)
      assert(a.channels == ch && a.sampleRate == rate && a.bitsPerSample == 16)
      assert(a.samples.toSeq == s.toSeq)
      assert(a.nFrames == n)
    }
  }

  test("our WAV bytes parse under javax.sound with identical samples") {
    val s = saw(800, 3)
    val bytes = Wav.encode(s, 1, 16000)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val f = ais.getFormat
    assert(f.getChannels == 1 && f.getSampleRate == 16000f && f.getSampleSizeInBits == 16)
    assert(!f.isBigEndian)
    val raw = ais.readAllBytes()
    assert(raw.length == s.length * 2)
    for (i <- s.indices) {
      val v = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
      assert(v == s(i), s"sample $i")
    }
  }

  test("chunk walk: unknown chunks, odd sizes, fmt after LIST") {
    val s = saw(100, 5)
    val base = Wav.encode(s, 1, 8000)
    // splice a 3-byte (odd) junk chunk between WAVE and fmt
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 12)
    out.write("junk".getBytes("US-ASCII")); out.write(Array[Byte](3, 0, 0, 0)); out.write(Array[Byte](1, 2, 3, 0)) // padded
    out.write(base, 12, base.length - 12)
    val spliced = out.toByteArray
    // fix RIFF size
    val total = spliced.length - 8
    spliced(4) = (total & 0xff).toByte; spliced(5) = ((total >> 8) & 0xff).toByte
    spliced(6) = ((total >> 16) & 0xff).toByte; spliced(7) = ((total >> 24) & 0xff).toByte
    val a = Wav.decode(spliced).fold(e => fail(e), identity)
    assert(a.samples.toSeq == s.toSeq)
  }

  test("fences: non-PCM, wrong depth, truncation, garbage") {
    assert(Wav.decode(null).isLeft)
    assert(Wav.decode("RIFFxxxxWAVE".getBytes).isLeft) // no chunks
    assert(Wav.decode("not audio at all".getBytes).isLeft)
    val good = Wav.encode(saw(50, 1), 1, 8000)
    assert(Wav.decode(good).isRight)
    for (n <- Seq(4, 12, 20, good.length - 7))
      assert(Wav.decode(java.util.Arrays.copyOf(good, n)).isLeft, s"prefix $n")
    // format 3 with non-32-bit samples is malformed (float requires 32)
    val floatBad = good.clone(); floatBad(20) = 3
    assert(Wav.decode(floatBad).swap.exists(_.contains("32-bit")))
    val bits32 = good.clone(); bits32(34) = 32 // 32-bit PCM stays a fence
    assert(Wav.decode(bits32).swap.exists(_.contains("unsupported")))
  }

  test("features: exact energy / peak / duration") {
    val s = Array[Short](3, -4, 0, 12000)
    val a = Wav.decode(Wav.encode(s, 1, 8000)).fold(e => fail(e), identity)
    val (energy, peak, dur) = Wav.features(a)
    assert(energy == 9L + 16L + 0L + 144000000L)
    assert(peak == 12000L)
    assert(dur == 4L * 1000000L / 8000L)
  }

  // ------------------------------------------------------------- dHash

  test("dhash64: flat image hashes to 0, gradient to all-ones rows") {
    val flat = Array.fill[Byte](72 * 64)(100)
    assert(Multimodal.dhash64(flat, 72, 64) == 0L)
    // strictly increasing cell means every comparison fires: hash = -1
    val grad = Array.tabulate[Byte](72 * 64)(i => ((i % 72) * 3).toByte)
    assert(Multimodal.dhash64(grad, 72, 64) == -1L)
  }

  test("dhash64: block-aligned 72x64 image reduces to block values") {
    // flat 8x8 blocks: cell(cx,cy) = block value; compute expected hash
    // directly from the block matrix
    val v = Array.tabulate(8, 9)((by, bx) => (by * 31 + bx * 17) % 256)
    val pix = new Array[Byte](72 * 64)
    for (by <- 0 until 8; bx <- 0 until 9; y <- 0 until 8; x <- 0 until 8)
      pix((by * 8 + y) * 72 + bx * 8 + x) = v(by)(bx).toByte
    var want = 0L
    for (r <- 0 until 8; c <- 0 until 8)
      if (v(r)(c + 1) > v(r)(c)) want |= 1L << (r * 8 + c)
    assert(Multimodal.dhash64(pix, 72, 64) == want)
  }

  test("boxResize: block-aligned reduction, channel independence, floor means") {
    import graft.codec.Jpeg
    // 4x2 gray: boxes of 2x2 -> 2x1 thumbnail of floor means
    val g = Jpeg.Image(4, 2, 1, Array[Byte](10, 20, 30, 40, 50, 60, 70, 80))
    val t = Multimodal.boxResize(g, 2, 1)
    assert(t.width == 2 && t.height == 1)
    assert((t.pixels(0) & 0xff) == (10 + 20 + 50 + 60) / 4)
    assert((t.pixels(1) & 0xff) == (30 + 40 + 70 + 80) / 4)
    // floor: mean 2.75 -> 2
    val f = Jpeg.Image(2, 2, 1, Array[Byte](2, 3, 3, 3))
    assert((Multimodal.boxResize(f, 1, 1).pixels(0) & 0xff) == 2)
    // RGB channels independent
    val rgb = Jpeg.Image(2, 1, 3, Array[Byte](10, 100, 200.toByte, 20, 110, 210.toByte))
    val tr = Multimodal.boxResize(rgb, 1, 1)
    assert((tr.pixels(0) & 0xff, tr.pixels(1) & 0xff, tr.pixels(2) & 0xff) == ((15, 105, 205)))
    // full-size resize is identity
    val id = Multimodal.boxResize(g, 4, 2)
    assert(java.util.Arrays.equals(id.pixels, g.pixels))
  }

  test("dhash64 is robust to small brightness shifts") {
    val r = new scala.util.Random(9)
    val blocks = Array.fill(8, 9)(r.nextInt(200))
    def img(shift: Int): Array[Byte] = {
      val pix = new Array[Byte](72 * 64)
      for (by <- 0 until 8; bx <- 0 until 9; y <- 0 until 8; x <- 0 until 8)
        pix((by * 8 + y) * 72 + bx * 8 + x) = (blocks(by)(bx) + shift).toByte
      pix
    }
    assert(Multimodal.dhash64(img(0), 72, 64) == Multimodal.dhash64(img(20), 72, 64))
  }

  test("8-bit and 24-bit PCM normalize to signed 16-bit, matching javax.sound frames") {
    // hand-build a WAV of arbitrary depth (our encoder writes 16-bit only)
    def buildWav(payload: Array[Byte], bits: Int, rate: Int): Array[Byte] = {
      val out = new Array[Byte](44 + payload.length)
      def put4(p: Int, s: String): Unit = for (i <- 0 until 4) out(p + i) = s.charAt(i).toByte
      def le16(p: Int, v: Int): Unit = { out(p) = (v & 0xff).toByte; out(p + 1) = ((v >> 8) & 0xff).toByte }
      def le32(p: Int, v: Int): Unit = { le16(p, v & 0xffff); le16(p + 2, (v >>> 16) & 0xffff) }
      put4(0, "RIFF"); le32(4, 36 + payload.length); put4(8, "WAVE")
      put4(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, 1); le32(24, rate)
      le32(28, rate * bits / 8); le16(32, bits / 8); le16(34, bits)
      put4(36, "data"); le32(40, payload.length)
      payload.copyToArray(out, 44)
      out
    }
    // 8-bit: unsigned bytes
    val u8 = Array.tabulate[Byte](300)(i => ((i * 37 + 11) % 256).toByte)
    val w8 = buildWav(u8, 8, 8000)
    val a8 = Wav.decode(w8).fold(e => fail(e), identity)
    assert(a8.bitsPerSample == 8 && a8.samples.length == 300)
    for (i <- 0 until 300)
      assert(a8.samples(i) == (((u8(i) & 0xff) - 128) << 8).toShort, s"8-bit at $i")
    // javax.sound agrees the file is 8-bit unsigned PCM with these frames
    val ais8 = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(w8))
    assert(ais8.getFormat.getSampleSizeInBits == 8)
    assert(ais8.getFormat.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
    val their8 = ais8.readAllBytes()
    assert(java.util.Arrays.equals(their8, u8))
    // 24-bit: signed little-endian triples -> top 16 bits
    val vals = Array.tabulate(200)(i => ((i * 131071 + 77) % 16000001) - 8000000)
    val p24 = new Array[Byte](600)
    for (i <- 0 until 200) {
      p24(3 * i) = (vals(i) & 0xff).toByte
      p24(3 * i + 1) = ((vals(i) >> 8) & 0xff).toByte
      p24(3 * i + 2) = ((vals(i) >> 16) & 0xff).toByte
    }
    val w24 = buildWav(p24, 24, 16000)
    val a24 = Wav.decode(w24).fold(e => fail(e), identity)
    assert(a24.bitsPerSample == 24 && a24.samples.length == 200)
    for (i <- 0 until 200)
      assert(a24.samples(i) == (vals(i) >> 8).toShort, s"24-bit at $i (${vals(i)})")
    val ais24 = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(w24))
    assert(ais24.getFormat.getSampleSizeInBits == 24)
    val their24 = ais24.readAllBytes()
    assert(java.util.Arrays.equals(their24, p24))
    // 12-bit stays a fence
    assert(Wav.decode(buildWav(new Array[Byte](12), 12, 8000)).isLeft)
  }

  test("decimate: floor-mean boxes, ragged tail, negative floor semantics") {
    def audio(ss: Seq[Int]) = Wav.Audio(1, 48000, 16, ss.map(_.toShort).toArray)
    // hand vector: (-1 + -2 + 4)/3 floor = 0? (1/3 -> 0); (-5 -5 -5) -> -5;
    // tail (7) -> 7; negative floor: (-1 -2 -4)/3 = -7/3 -> -3
    val d1 = Wav.decimate(audio(Seq(-1, -2, 4, -5, -5, -5, 7)), 3)
    assert(d1.samples.toSeq == Seq[Short](0, -5, 7) && d1.sampleRate == 16000)
    val d2 = Wav.decimate(audio(Seq(-1, -2, -4)), 3)
    assert(d2.samples.toSeq == Seq[Short](-3)) // floor(-7/3) = -3, not -2
    // factor 1 is identity
    val a = audio(Seq(5, -6, 7))
    assert(Wav.decimate(a, 1) eq a)
    // brute force on random streams incl. ragged tails
    val r = new scala.util.Random(13)
    for (_ <- 0 until 20) {
      val n = 50 + r.nextInt(40)
      val f = 2 + r.nextInt(5)
      val ss = Seq.fill(n)(r.nextInt(2001) - 1000)
      val want = ss.grouped(f).map(g => math.floorDiv(g.map(_.toLong).sum, g.length)).toSeq
      assert(Wav.decimate(audio(ss), f).samples.map(_.toLong).toSeq == want, s"n=$n f=$f")
    }
  }

  test("analysis: zero crossings, longest silence run, clipping (hand vector + brute force)") {
    def audio(ss: Seq[Int]) = Wav.Audio(1, 16000, 16, ss.map(_.toShort).toArray)
    // hand vector: signs + - - + 0(+) -, silence run {0} length 1, one clip
    val (zc, sil, clip) = Wav.analysis(audio(Seq(500, -500, -200, 300, 0, -995)),
      silenceThresh = 100, clipThresh = 990)
    assert(zc == 3)   // +- , -+ , 0->-995 (0 counts as >= 0 so 300->0 is no cross)
    assert(sil == 1)  // only the 0 sample
    assert(clip == 1) // -995
    // empty and single-sample edges
    assert(Wav.analysis(audio(Nil)) == ((0L, 0L, 0L)))
    assert(Wav.analysis(audio(Seq(50))) == ((0L, 1L, 0L)))
    // brute force on random streams
    val r = new scala.util.Random(11)
    for (_ <- 0 until 20) {
      val ss = Seq.fill(200)(r.nextInt(2001) - 1000)
      val zcB = ss.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0))
      val silB = {
        var best = 0; var run = 0
        for (s <- ss) { if (math.abs(s) <= 100) { run += 1; best = math.max(best, run) } else run = 0 }
        best
      }
      val clipB = ss.count(s => math.abs(s) >= 990)
      assert(Wav.analysis(audio(ss)) == ((zcB.toLong, silB.toLong, clipB.toLong)))
    }
  }
}
