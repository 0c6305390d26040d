package graft.codec

/** From-scratch JBIG2 (ITU-T T.88) decoder for the subset that carries
  * scanned-document PDFs' generic-region payloads, plus an encoder twin
  * for round-trip testing and oracle fixtures.
  *
  * Scope (honest fences, per the X7 error-as-data rule):
  *  - EMBEDDED organization only (what PDF's /JBIG2Decode carries: bare
  *    segments, no file header), with optional /JBIG2Globals prepended.
  *  - Generic region segments, BOTH codings:
  *      * MMR = 1 → ITU-T T.6 two-dimensional coding, decoded by the
  *        repo's [[CcittG4]] — which is differential-tested against the
  *        JDK's independent TIFF-fax implementation, so this leg is
  *        externally pinned end to end.
  *      * MMR = 0 → MQ arithmetic coding (T.88 Annex E) with generic
  *        templates 0–3 and TPGDON typical prediction, NOMINAL adaptive
  *        pixels only (what real encoders emit; non-nominal AT is a
  *        typed error, not a wrong decode — see note below).
  *  - Symbol dictionaries / text regions / halftones / refinement are
  *    typed errors ("jbig2: <feature> unsupported").
  *
  * Verification posture: no independent JBIG2 implementation exists in
  * this environment (no jbig2dec/poppler/mupdf; the JDK has none), so
  * unlike the other codecs the MQ path cannot be differential-pinned.
  * What IS pinned: (a) the MMR leg rides the JDK-pinned G4 decoder;
  * (b) encoder/decoder round-trips across all templates, TPGDON, and
  * multi-segment pages; (c) the MQ coder is exercised against the
  * T.88-style software-conventions invariants (byte stuffing after
  * 0xFF, carry propagation) by construction tests; (d) mutation fuzz
  * never throws. The Qe state table is transcribed from T.88 Table E.1.
  *
  * Context packing note: the per-pixel context is a bijective packing
  * of the template neighborhood; ANY fixed bijection decodes a
  * conformant stream identically because MQ statistics are per-context
  * and the relabeling is consistent — except the TPGDON pseudo-context,
  * whose VALUE is normative. With nominal AT, raster-order packing
  * (MSB = top-left) coincides with the spec's figures, so the published
  * pseudo-contexts (0x9B25 / 0x0795 / 0xE5 / 0x195) apply; that is why
  * non-nominal AT is fenced rather than guessed.
  *
  * Reference behavior being replaced: the reference rasterizes scanned
  * PDFs for a vision LLM (/root/reference/mvp/utils/pdf_processor.py);
  * this library instead decodes the dominant scanned-page codec
  * deterministically (T24 ships JBIG2 payloads with typed metadata;
  * this turns them into pixels).
  */
object Jbig2 {

  // ------------------------------------------------------------ MQ coder

  // T.88 Table E.1: (Qe, NMPS, NLPS, SWITCH)
  private val Qe = Array(
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601)
  private val Nmps = Array(
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46)
  private val Nlps = Array(
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14,
    15, 16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29,
    30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46)
  private val Switch = Array(
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  /** MQ arithmetic decoder (T.88 E.3). Context state lives in the
    * caller-owned arrays (index, mps) so region decoders can keep many
    * contexts. Bytes past the end read as 0xFF per the convention. */
  final class MQDecoder(data: Array[Byte], off: Int, len: Int) {
    private var bp = off
    private val end = off + len
    private var c = 0L
    private var a = 0
    private var ct = 0
    private def byteAt(i: Int): Int = if (i < end) data(i) & 0xff else 0xff
    // INITDEC
    c = byteAt(bp).toLong << 16
    byteIn()
    c <<= 7; ct -= 7; a = 0x8000

    private def byteIn(): Unit = {
      if (byteAt(bp) == 0xff) {
        if (byteAt(bp + 1) > 0x8f) { c += 0xff00; ct = 8 }
        else { bp += 1; c += byteAt(bp).toLong << 9; ct = 7 }
      } else { bp += 1; c += byteAt(bp).toLong << 8; ct = 8 }
    }

    def decode(ix: Array[Int], mps: Array[Byte], cx: Int): Int = {
      val i = ix(cx)
      val qe = Qe(i)
      a -= qe
      var d = 0
      if (((c >>> 16) & 0xffff) < qe) {
        // LPS path or MPS exchange
        if (a < qe) { d = mps(cx); ix(cx) = Nmps(i) }
        else {
          d = 1 - mps(cx)
          if (Switch(i) == 1) mps(cx) = (1 - mps(cx)).toByte
          ix(cx) = Nlps(i)
        }
        a = qe
        renorm()
      } else {
        c -= qe.toLong << 16
        if ((a & 0x8000) == 0) {
          if (a < qe) {
            d = 1 - mps(cx)
            if (Switch(i) == 1) mps(cx) = (1 - mps(cx)).toByte
            ix(cx) = Nlps(i)
          } else { d = mps(cx); ix(cx) = Nmps(i) }
          renorm()
        } else d = mps(cx)
      }
      d
    }

    private def renorm(): Unit = {
      var go = true
      while (go) {
        if (ct == 0) byteIn()
        a <<= 1; c = (c << 1) & 0xffffffffL; ct -= 1
        go = (a & 0x8000) == 0
      }
    }
  }

  /** MQ arithmetic encoder (T.88 E.2) — the round-trip twin. The B
    * register is the last element of `buf`; element 0 is a sentinel
    * pre-start byte that absorbs a first-byteout carry (stripped at
    * flush when untouched — the stuffing rule means a carry can never
    * propagate past any 0xFF, so one sentinel suffices). */
  final class MQEncoder {
    private val buf = scala.collection.mutable.ArrayBuffer[Int](0)
    private var c = 0L
    private var a = 0x8000
    private var ct = 12

    def encode(ix: Array[Int], mps: Array[Byte], cx: Int, d: Int): Unit = {
      val i = ix(cx)
      val qe = Qe(i)
      if (d == mps(cx)) { // CODEMPS
        a -= qe
        if ((a & 0x8000) == 0) {
          if (a < qe) a = qe else c += qe
          ix(cx) = Nmps(i)
          renorm()
        } else c += qe
      } else { // CODELPS
        a -= qe
        if (a < qe) c += qe else a = qe
        if (Switch(i) == 1) mps(cx) = (1 - mps(cx)).toByte
        ix(cx) = Nlps(i)
        renorm()
      }
    }

    private def renorm(): Unit = {
      var go = true
      while (go) {
        a <<= 1; c <<= 1; ct -= 1
        if (ct == 0) byteOut()
        go = (a & 0x8000) == 0
      }
    }

    private def byteOut(): Unit = {
      if (buf.last == 0xff) { // stuffing: only 7 bits follow an 0xFF
        buf += ((c >> 20) & 0x7f).toInt; c &= 0xfffff; ct = 7
      } else {
        if (c < 0x8000000L) { buf += ((c >> 19) & 0xff).toInt; c &= 0x7ffff; ct = 8 }
        else {
          buf(buf.length - 1) += 1 // carry into B
          if (buf.last == 0xff) { c &= 0x7ffffff; buf += ((c >> 20) & 0x7f).toInt; c &= 0xfffff; ct = 7 }
          else { buf += ((c >> 19) & 0xff).toInt; c &= 0x7ffff; ct = 8 }
        }
      }
    }

    def flush(): Array[Byte] = {
      // SETBITS
      val tempC = c + a
      c |= 0xffff
      if (c >= tempC) c -= 0x8000
      c <<= ct; byteOut()
      c <<= ct; byteOut()
      // strip the sentinel if the first byteout never carried into it;
      // trailing bytes that would read as 0xFF are supplied virtually by
      // the decoder's past-end convention, so no explicit terminator
      val start = if (buf(0) == 0) 1 else 0
      buf.drop(start).map(_.toByte).toArray
    }
  }

  // ------------------------------------------------------------ templates

  // fixed neighborhoods per template (dx, dy), nominal AT included, in
  // raster order (row -2, row -1, row 0), MSB = first listed
  private val Templates: Array[Array[(Int, Int)]] = Array(
    // template 0: 16 px, AT nominal A1(3,-1) A2(-3,-1) A3(2,-2) A4(-2,-2)
    Array((-2, -2), (-1, -2), (0, -2), (1, -2), (2, -2),
      (-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1), (3, -1),
      (-4, 0), (-3, 0), (-2, 0), (-1, 0)),
    // template 1: 13 px, AT nominal A1(3,-1)
    Array((-1, -2), (0, -2), (1, -2), (2, -2),
      (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1), (3, -1),
      (-3, 0), (-2, 0), (-1, 0)),
    // template 2: 10 px, AT nominal A1(2,-1)
    Array((-1, -2), (0, -2), (1, -2),
      (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
      (-2, 0), (-1, 0)),
    // template 3: 10 px, single line, AT nominal A1(2,-1)
    Array((-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
      (-4, 0), (-3, 0), (-2, 0), (-1, 0)))

  private val TpgdonContext = Array(0x9b25, 0x0795, 0xe5, 0x195)

  /** Nominal AT coordinates per template, as serialized in the segment. */
  private val NominalAt: Array[Array[(Int, Int)]] = Array(
    Array((3, -1), (-3, -1), (2, -2), (-2, -2)),
    Array((3, -1)), Array((2, -1)), Array((2, -1)))

  // ------------------------------------------------------------ generic region

  /** Decode one arithmetic generic region into a row-major bit-per-byte
    * bitmap (1 = black). */
  private def decodeGenericArith(data: Array[Byte], off: Int, len: Int,
      w: Int, h: Int, template: Int, tpgdon: Boolean): Array[Byte] = {
    val tpl = Templates(template)
    val ctxSize = math.max(1 << tpl.length, TpgdonContext(template) + 1)
    val ix = new Array[Int](ctxSize)
    val mps = new Array[Byte](ctxSize)
    val dec = new MQDecoder(data, off, len)
    val bm = new Array[Byte](w * h)
    var ltp = 0
    var y = 0
    while (y < h) {
      if (tpgdon) {
        val sltp = dec.decode(ix, mps, TpgdonContext(template))
        ltp ^= sltp
      }
      if (tpgdon && ltp == 1) {
        // typical row: copy the row above (all-0 for the first row)
        if (y > 0) System.arraycopy(bm, (y - 1) * w, bm, y * w, w)
      } else {
        var x = 0
        while (x < w) {
          var cx = 0
          var k = 0
          while (k < tpl.length) {
            val (dx, dy) = tpl(k)
            val xx = x + dx; val yy = y + dy
            val bit =
              if (xx < 0 || xx >= w || yy < 0) 0
              else bm(yy * w + xx)
            cx = (cx << 1) | bit
            k += 1
          }
          bm(y * w + x) = dec.decode(ix, mps, cx).toByte
          x += 1
        }
      }
      y += 1
    }
    bm
  }

  /** Encode a bitmap as one arithmetic generic region (twin of
    * [[decodeGenericArith]]). */
  private def encodeGenericArith(bm: Array[Byte], w: Int, h: Int,
      template: Int, tpgdon: Boolean): Array[Byte] = {
    val tpl = Templates(template)
    val ctxSize = math.max(1 << tpl.length, TpgdonContext(template) + 1)
    val ix = new Array[Int](ctxSize)
    val mps = new Array[Byte](ctxSize)
    val enc = new MQEncoder
    var ltp = 0
    var y = 0
    while (y < h) {
      if (tpgdon) {
        // typical iff the row equals the previous row (first row: all-0)
        var typical = true
        var x = 0
        while (x < w && typical) {
          val prev = if (y > 0) bm((y - 1) * w + x) else 0: Byte
          if (bm(y * w + x) != prev) typical = false
          x += 1
        }
        val want = if (typical) 1 else 0
        enc.encode(ix, mps, TpgdonContext(template), want ^ ltp)
        ltp = want
      }
      if (!(tpgdon && ltp == 1)) {
        var x = 0
        while (x < w) {
          var cx = 0
          var k = 0
          while (k < tpl.length) {
            val (dx, dy) = tpl(k)
            val xx = x + dx; val yy = y + dy
            val bit =
              if (xx < 0 || xx >= w || yy < 0) 0
              else bm(yy * w + xx)
            cx = (cx << 1) | bit
            k += 1
          }
          enc.encode(ix, mps, cx, bm(y * w + x))
          x += 1
        }
      }
      y += 1
    }
    enc.flush()
  }

  // ------------------------------------------------------------ segments

  private val MaxPixels = (1L << 28) / 4

  private def be32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  /** Decode an EMBEDDED JBIG2 stream (PDF /JBIG2Decode payload, with the
    * /JBIG2Globals stream, if any, simply prepended — globals carry no
    * page association that matters for the supported subset). Returns a
    * 1-component image: 0 = white, 255 = black (ink), matching the
    * usual 1-bit → gray convention used by the CCITT path. */
  def decode(data: Array[Byte], globals: Array[Byte] = Array.emptyByteArray): Either[String, Jpeg.Image] =
    try decodeImpl(if (globals.isEmpty) data else globals ++ data)
    catch { case e: Exception => Left(s"jbig2: ${e.getClass.getSimpleName}: ${e.getMessage}") }

  private def decodeImpl(b: Array[Byte]): Either[String, Jpeg.Image] = {
    var p = 0
    var pageW = -1
    var pageH = -1
    var page: Array[Byte] = null
    var sawRegion = false
    while (p < b.length) {
      if (p + 11 > b.length) return Left("jbig2: truncated segment header")
      // segment number (4) + flags (1)
      val flags = b(p + 4) & 0xff
      val segType = flags & 0x3f
      val pageAssoc4 = (flags & 0x40) != 0
      var q = p + 5
      // referred-to segments
      val rts0 = b(q) & 0xff
      var refCount = rts0 >> 5
      if (refCount == 7) {
        refCount = (be32(b, q) & 0x1fffffff).toInt
        q += 4 + (refCount + 8) / 8 // retain bits
      } else q += 1
      // referred segment numbers: size by THIS segment's number
      val segNum = be32(b, p)
      val refSize = if (segNum <= 256) 1 else if (segNum <= 65536) 2 else 4
      q += refCount * refSize
      q += (if (pageAssoc4) 4 else 1)
      if (q + 4 > b.length) return Left("jbig2: truncated segment header")
      val dataLen = be32(b, q)
      q += 4
      if (dataLen == 0xffffffffL) return Left("jbig2: unknown segment length unsupported")
      if (dataLen > Int.MaxValue || q + dataLen > b.length)
        return Left("jbig2: truncated segment data")
      val dEnd = q + dataLen.toInt

      segType match {
        case 48 => // page info
          if (dataLen < 19) return Left("jbig2: short page info")
          pageW = be32(b, q).toInt
          pageH = be32(b, q + 4).toInt // striped pages carry -1: canvas
          // is then grown from region extents when the first region lands
          if (pageW <= 0) return Left("jbig2: bad page width")
          if (pageH > 0 && pageW.toLong * pageH > MaxPixels)
            return Left("jbig2: image too large")
          if (pageH > 0) page = new Array[Byte](pageW * pageH)
        case 36 | 38 | 39 => // immediate generic region (incl. lossless)
          if (dataLen < 18) return Left("jbig2: short region segment")
          val rw = be32(b, q).toInt
          val rh = be32(b, q + 4).toInt
          val rx = be32(b, q + 8).toInt
          val ry = be32(b, q + 12).toInt
          val combOp = b(q + 16) & 0x7
          if (rw <= 0 || rh <= 0 || rw.toLong * rh > MaxPixels)
            return Left("jbig2: bad region size")
          var r = q + 17
          val gFlags = b(r) & 0xff
          r += 1
          val mmr = (gFlags & 1) != 0
          val template = (gFlags >> 1) & 3
          val tpgdon = (gFlags & 8) != 0
          val bitmap: Array[Byte] =
            if (mmr) {
              CcittG4.decode(java.util.Arrays.copyOfRange(b, r, dEnd), rw, rh) match {
                case Right(px) =>
                  // CcittG4.decode yields 0/1 per pixel? normalize below
                  px
                case Left(err) => return Left(s"jbig2: mmr: $err")
              }
            } else {
              val atCount = if (template == 0) 4 else 1
              val at = (0 until atCount).map { k =>
                (b(r + 2 * k).toInt, b(r + 2 * k + 1).toInt)
              }
              r += 2 * atCount
              if (at != NominalAt(template).toSeq)
                return Left("jbig2: non-nominal AT pixels unsupported")
              decodeGenericArith(b, r, dEnd - r, rw, rh, template, tpgdon)
            }
          sawRegion = true
          if (page == null) {
            // absent or striped (-1 height) page info: the canvas grows
            // from region extents
            if (pageW <= 0) pageW = rx + rw
            pageH = math.max(pageH, ry + rh)
            if (pageW.toLong * pageH > MaxPixels || rx + rw > pageW)
              return Left("jbig2: image too large")
            page = new Array[Byte](pageW * pageH)
          } else if (ry + rh > pageH || rx + rw > pageW) {
            return Left("jbig2: region outside page")
          }
          // composite (OR / REPLACE both reduce to OR on a 0 page;
          // AND/XOR/XNOR over scanned pages are rare — fence honestly)
          if (combOp > 1 && combOp != 4) return Left("jbig2: unsupported combination operator")
          var yy = 0
          while (yy < rh) {
            var xx = 0
            while (xx < rw) {
              val v = bitmap(yy * rw + xx)
              if (v != 0) page((ry + yy) * pageW + (rx + xx)) = 1
              xx += 1
            }
            yy += 1
          }
        case 0 => return Left("jbig2: symbol dictionary unsupported")
        case 4 | 6 | 7 => return Left("jbig2: text region unsupported")
        case 16 | 20 | 22 | 23 => return Left("jbig2: halftone unsupported")
        case 40 | 42 | 43 => return Left("jbig2: refinement region unsupported")
        case _ => () // page end / stripe end / tables / extensions: skip
      }
      p = dEnd
    }
    if (!sawRegion || page == null) return Left("jbig2: no decodable region")
    // 1 = black ink → 255 (match the CCITT/gray convention: ink = dark)
    val out = new Array[Byte](page.length)
    var i = 0
    while (i < page.length) { out(i) = if (page(i) != 0) 255.toByte else 0; i += 1 }
    Right(Jpeg.Image(pageW, pageH, 1, out))
  }

  // ------------------------------------------------------------ encoder twin

  /** Encode a bitmap (row-major, nonzero = black) as an embedded JBIG2
    * stream: page info + one immediate lossless generic region. */
  def encode(bitmap: Array[Byte], w: Int, h: Int,
      template: Int = 0, tpgdon: Boolean = false, mmr: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && bitmap.length == w * h, "bitmap size mismatch")
    require(template >= 0 && template <= 3, "bad template")
    val norm = bitmap.map(v => (if (v != 0) 1 else 0).toByte)
    val out = new java.io.ByteArrayOutputStream()
    def be(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) { out.write(((v >> (8 * k)) & 0xff).toInt); k -= 1 }
    }
    // page info segment (#1, type 48, page 1)
    be(1, 4); out.write(48); out.write(0); out.write(1)
    be(19, 4)
    be(w, 4); be(h, 4); be(0, 4); be(0, 4); out.write(0); be(0, 2)
    // immediate lossless generic region (#2, type 39, page 1)
    val payload = {
      val body = new java.io.ByteArrayOutputStream()
      def bbe(v: Long, n: Int): Unit = {
        var k = n - 1
        while (k >= 0) { body.write(((v >> (8 * k)) & 0xff).toInt); k -= 1 }
      }
      bbe(w, 4); bbe(h, 4); bbe(0, 4); bbe(0, 4); body.write(0) // region info, OR
      val gFlags = (if (mmr) 1 else 0) | (template << 1) | (if (tpgdon) 8 else 0)
      body.write(gFlags)
      if (!mmr) {
        NominalAt(template).foreach { case (x, y) => body.write(x & 0xff); body.write(y & 0xff) }
        body.write(encodeGenericArith(norm, w, h, template, tpgdon))
      } else {
        body.write(CcittG4.encode(norm, w, h))
      }
      body.toByteArray
    }
    be(2, 4); out.write(39); out.write(0); out.write(1)
    be(payload.length, 4)
    out.write(payload, 0, payload.length)
    // end of page (#3, type 49)
    be(3, 4); out.write(49); out.write(0); out.write(1); be(0, 4)
    out.toByteArray
  }
}
