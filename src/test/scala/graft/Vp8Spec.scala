package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.codec.Vp8

/** VP8 key-frame decoder conformance: every fixture in
  * fixtures/vp8_goldens_v1.jsonl is a libwebp-encoded stream together
  * with libwebp's OWN WebPDecodeYUV output (scripts/gen_vp8_fixtures.py).
  * VP8 decode is fully-specified integer math, so the bar is BIT-EXACT
  * plane equality on all 47 streams — spanning qualities 0..100,
  * non-MB-multiple and 1x1 dims, 1/4/8 token partitions, segmentation,
  * both loop filters, sharpness levels, and filter-off. */
class Vp8Spec extends AnyFunSuite {

  private case class Fx(name: String, w: Int, h: Int, webp: Array[Byte],
      y: Array[Byte], u: Array[Byte], v: Array[Byte])

  private lazy val fixtures: Seq[Fx] = {
    val src = scala.io.Source.fromFile("fixtures/vp8_goldens_v1.jsonl")
    try src.getLines().filter(_.nonEmpty).map { line =>
      def field(k: String): String = {
        val m = ("\"" + k + "\"\\s*:\\s*\"([^\"]*)\"").r.findFirstMatchIn(line)
        m.map(_.group(1)).getOrElse(
          ("\"" + k + "\"\\s*:\\s*(\\d+)").r.findFirstMatchIn(line).get.group(1))
      }
      val dec = java.util.Base64.getDecoder
      Fx(field("name"), field("w").toInt, field("h").toInt,
        dec.decode(field("webp_b64")), dec.decode(field("y_b64")),
        dec.decode(field("u_b64")), dec.decode(field("v_b64")))
    }.toList
    finally src.close()
  }

  private def vp8Payload(webp: Array[Byte]): (Int, Int) = {
    var p = 12
    while (p + 8 <= webp.length) {
      val tag = new String(webp, p, 4, "US-ASCII")
      val size = (webp(p + 4) & 0xff) | ((webp(p + 5) & 0xff) << 8) |
        ((webp(p + 6) & 0xff) << 16) | ((webp(p + 7) & 0xff) << 24)
      if (tag == "VP8 ") return (p + 8, size)
      p += 8 + size + (size & 1)
    }
    fail("no VP8 chunk")
  }

  private def diffReport(name: String, plane: String, want: Array[Byte],
      got: Array[Byte], w: Int): String = {
    if (want.length != got.length)
      return s"$name/$plane: length ${got.length} != ${want.length}"
    var i = 0
    var n = 0
    var first = -1
    while (i < want.length) {
      if (want(i) != got(i)) { if (first < 0) first = i; n += 1 }
      i += 1
    }
    if (n == 0) ""
    else s"$name/$plane: $n/${want.length} bytes differ, first at ($first%=${first % w},/${first / w}) " +
      s"want=${want(first) & 0xff} got=${got(first) & 0xff}"
  }

  test("all fixtures decode bit-exactly vs libwebp WebPDecodeYUV") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    for (fx <- fixtures) {
      val (off, len) = vp8Payload(fx.webp)
      Vp8.decode(fx.webp, off, len) match {
        case Left(e) => failures += s"${fx.name}: decode error $e"
        case Right(yuv) =>
          if (yuv.width != fx.w || yuv.height != fx.h)
            failures += s"${fx.name}: dims ${yuv.width}x${yuv.height} != ${fx.w}x${fx.h}"
          else {
            val cw = (fx.w + 1) / 2
            Seq(
              diffReport(fx.name, "y", fx.y, yuv.y, fx.w),
              diffReport(fx.name, "u", fx.u, yuv.u, cw),
              diffReport(fx.name, "v", fx.v, yuv.v, cw)
            ).filter(_.nonEmpty).foreach(failures += _)
          }
      }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} failing fixtures (of ${fixtures.size}):\n" +
        failures.take(20).mkString("\n"))
  }

  test("synthesis twin: all-DC/all-EOB frames decode to uniform 128 YUV / 130 RGB") {
    // libwebp itself validated these streams at build time (the
    // generator cross-check decoded them to all-128 under WebPDecodeYUV);
    // here the pinned decoder must agree at every quantizer/filter level
    for ((w, h, q, f) <- Seq((17, 9, 40, 20), (33, 17, 0, 0), (48, 32, 127, 63),
      (1, 1, 10, 5), (16, 16, 80, 0))) {
      val payload = graft.codec.Vp8Synth.synthesize(w, h, q, f)
      val yuv = Vp8.decode(payload, 0, payload.length).fold(e => fail(s"$w x $h: $e"), identity)
      assert(yuv.width == w && yuv.height == h)
      assert(yuv.y.forall(_ == 128.toByte), s"$w x $h y-plane")
      assert(yuv.u.forall(_ == 128.toByte) && yuv.v.forall(_ == 128.toByte))
      // through the container + documented BT.601: every pixel 130
      val im = graft.codec.WebpVp8l.decode(graft.codec.Vp8Synth.wrapWebp(payload))
        .fold(e => fail(e), identity)
      assert(im.nComponents == 3 && im.pixels.forall(p => (p & 0xff) == 130))
    }
    // synth stream fuzz never throws
    val seed = graft.codec.Vp8Synth.synthesize(24, 18, 50, 30)
    val rng = new scala.util.Random(17)
    (0 until 300).foreach { _ =>
      val m = seed.clone()
      m(rng.nextInt(m.length)) = rng.nextInt(256).toByte
      Vp8.decode(m, 0, m.length)
    }
  }

  test("typed errors: junk, truncation, non-keyframe, oversize dims") {
    assert(Vp8.decode("nonsense bytes here".getBytes, 0, 19).isLeft)
    val (off, len) = vp8Payload(fixtures.head.webp)
    val good = fixtures.head.webp
    for (n <- Seq(1, 5, 9, len / 2))
      assert(Vp8.decode(good, off, n).isLeft, s"len $n decoded")
    // flip the keyframe bit
    val m = good.clone(); m(off) = (m(off) | 1).toByte
    assert(Vp8.decode(m, off, len).isLeft)
  }

  test("fuzz: 600 mutations never throw") {
    val rng = new scala.util.Random(41)
    val fx = fixtures.find(_.name == "grad_64x48_q75").getOrElse(fixtures.head)
    val (off, len) = vp8Payload(fx.webp)
    (0 until 600).foreach { _ =>
      val m = fx.webp.clone()
      m(off + rng.nextInt(len)) = rng.nextInt(256).toByte
      Vp8.decode(m, off, len) // Left or Right, never throw
    }
    succeed
  }
}
