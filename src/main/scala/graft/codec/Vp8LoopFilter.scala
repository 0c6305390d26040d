package graft.codec

/** VP8 loop filters (RFC 6386 §15.2–15.4), operating in place on the
  * MB-padded planes in the normative order: per MB (raster), left MB
  * edge → inner vertical edges → top MB edge → inner horizontal edges,
  * luma then chroma (normal filter only — the simple filter touches
  * luma edges exclusively). All arithmetic is the spec's signed-char
  * pipeline: pixels map to [-128,127], every intermediate clamps back
  * into that range, results map back to [0,255]. */
private[codec] object LoopFilter {

  @inline private def s(v: Int): Int = v - 128 // u2s
  @inline private def u(v: Int): Int = { // s2u with signed-char clamp
    val c = if (v < -128) -128 else if (v > 127) 127 else v
    c + 128
  }
  @inline private def c8(v: Int): Int = if (v < -128) -128 else if (v > 127) 127 else v

  /** §15.2 filter_mask over 8 pixels across the edge. */
  @inline private def filterYes(interior: Int, edge: Int,
      p3: Int, p2: Int, p1: Int, p0: Int, q0: Int, q1: Int, q2: Int, q3: Int): Boolean =
    (math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2) <= edge &&
      math.abs(p3 - p2) <= interior && math.abs(p2 - p1) <= interior &&
      math.abs(p1 - p0) <= interior &&
      math.abs(q3 - q2) <= interior && math.abs(q2 - q1) <= interior &&
      math.abs(q1 - q0) <= interior

  @inline private def hevYes(thresh: Int, p1: Int, p0: Int, q0: Int, q1: Int): Boolean =
    math.abs(p1 - p0) > thresh || math.abs(q1 - q0) > thresh

  /** §15.2 common adjustment; returns the F adjuster. Works on a 4-pixel
    * window given as signed values; writes adjusted p0/q0 back through
    * the setter. */
  private def commonAdjust(useOuter: Boolean, plane: Array[Byte],
      i1: Int, i0: Int, j0: Int, j1: Int): Int = {
    val P1 = s(plane(i1) & 0xff); val P0 = s(plane(i0) & 0xff)
    val Q0 = s(plane(j0) & 0xff); val Q1 = s(plane(j1) & 0xff)
    val a = c8((if (useOuter) c8(P1 - Q1) else 0) + 3 * (Q0 - P0))
    val f = c8(a + 4) >> 3
    val e = c8(a + 3) >> 3
    plane(j0) = u(Q0 - f).toByte
    plane(i0) = u(P0 + e).toByte
    f
  }

  /** Normal sub-block edge filter over one pixel line crossing the edge.
    * idx(k) maps k=-4..3 (p3..q3) to plane indices. */
  private def subblockEdge(plane: Array[Byte], base: Int, step: Int,
      hev: Int, interior: Int, edge: Int): Unit = {
    val p3 = plane(base - 4 * step) & 0xff; val p2 = plane(base - 3 * step) & 0xff
    val p1 = plane(base - 2 * step) & 0xff; val p0 = plane(base - step) & 0xff
    val q0 = plane(base) & 0xff; val q1 = plane(base + step) & 0xff
    val q2 = plane(base + 2 * step) & 0xff; val q3 = plane(base + 3 * step) & 0xff
    if (filterYes(interior, edge, p3, p2, p1, p0, q0, q1, q2, q3)) {
      val h = hevYes(hev, p1, p0, q0, q1)
      val f = commonAdjust(h, plane, base - 2 * step, base - step, base, base + step)
      if (!h) {
        val a = (f + 1) >> 1
        plane(base + step) = u(s(plane(base + step) & 0xff) - a).toByte
        plane(base - 2 * step) = u(s(plane(base - 2 * step) & 0xff) + a).toByte
      }
    }
  }

  /** Normal MB edge filter (§15.3) over one pixel line. */
  private def mbEdgeFilter(plane: Array[Byte], base: Int, step: Int,
      hev: Int, interior: Int, edge: Int): Unit = {
    val p3 = plane(base - 4 * step) & 0xff; val p2 = plane(base - 3 * step) & 0xff
    val p1 = plane(base - 2 * step) & 0xff; val p0 = plane(base - step) & 0xff
    val q0 = plane(base) & 0xff; val q1 = plane(base + step) & 0xff
    val q2 = plane(base + 2 * step) & 0xff; val q3 = plane(base + 3 * step) & 0xff
    if (filterYes(interior, edge, p3, p2, p1, p0, q0, q1, q2, q3)) {
      if (!hevYes(hev, p1, p0, q0, q1)) {
        val P2 = s(p2); val P1 = s(p1); val P0 = s(p0)
        val Q0 = s(q0); val Q1 = s(q1); val Q2 = s(q2)
        val w = c8(c8(P1 - Q1) + 3 * (Q0 - P0))
        var a = c8((27 * w + 63) >> 7)
        plane(base) = u(Q0 - a).toByte
        plane(base - step) = u(P0 + a).toByte
        a = c8((18 * w + 63) >> 7)
        plane(base + step) = u(Q1 - a).toByte
        plane(base - 2 * step) = u(P1 + a).toByte
        a = c8((9 * w + 63) >> 7)
        plane(base + 2 * step) = u(Q2 - a).toByte
        plane(base - 3 * step) = u(P2 + a).toByte
      } else {
        commonAdjust(true, plane, base - 2 * step, base - step, base, base + step)
      }
    }
  }

  /** Simple filter edge (§15.4): luma only, outer taps always. */
  private def simpleEdge(plane: Array[Byte], base: Int, step: Int, edge: Int): Unit = {
    val p1 = plane(base - 2 * step) & 0xff; val p0 = plane(base - step) & 0xff
    val q0 = plane(base) & 0xff; val q1 = plane(base + step) & 0xff
    if ((math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2) <= edge)
      commonAdjust(true, plane, base - 2 * step, base - step, base, base + step)
  }

  /** Simple loop filter for one MB. */
  def simpleMb(y: Array[Byte], yS: Int, mbX: Int, mbY: Int,
      mbEdge: Int, inEdge: Int, inner: Boolean): Unit = {
    val x0 = mbX * 16; val y0 = mbY * 16
    if (mbX > 0) {
      var r = 0
      while (r < 16) { simpleEdge(y, (y0 + r) * yS + x0, 1, mbEdge); r += 1 }
    }
    if (inner) {
      var e = 4
      while (e <= 12) {
        var r = 0
        while (r < 16) { simpleEdge(y, (y0 + r) * yS + x0 + e, 1, inEdge); r += 1 }
        e += 4
      }
    }
    if (mbY > 0) {
      var cc = 0
      while (cc < 16) { simpleEdge(y, y0 * yS + x0 + cc, yS, mbEdge); cc += 1 }
    }
    if (inner) {
      var e = 4
      while (e <= 12) {
        var cc = 0
        while (cc < 16) { simpleEdge(y, (y0 + e) * yS + x0 + cc, yS, inEdge); cc += 1 }
        e += 4
      }
    }
  }

  /** Normal loop filter for one MB: luma + chroma. */
  def normalMb(y: Array[Byte], yS: Int, uPl: Array[Byte], vPl: Array[Byte], cS: Int,
      mbX: Int, mbY: Int, mbEdge: Int, inEdge: Int, interior: Int, hev: Int,
      inner: Boolean): Unit = {
    val x0 = mbX * 16; val y0 = mbY * 16
    val cx0 = mbX * 8; val cy0 = mbY * 8
    // left MB edge
    if (mbX > 0) {
      var r = 0
      while (r < 16) { mbEdgeFilter(y, (y0 + r) * yS + x0, 1, hev, interior, mbEdge); r += 1 }
      r = 0
      while (r < 8) {
        mbEdgeFilter(uPl, (cy0 + r) * cS + cx0, 1, hev, interior, mbEdge)
        mbEdgeFilter(vPl, (cy0 + r) * cS + cx0, 1, hev, interior, mbEdge)
        r += 1
      }
    }
    // inner vertical edges
    if (inner) {
      var e = 4
      while (e <= 12) {
        var r = 0
        while (r < 16) { subblockEdge(y, (y0 + r) * yS + x0 + e, 1, hev, interior, inEdge); r += 1 }
        e += 4
      }
      var r = 0
      while (r < 8) {
        subblockEdge(uPl, (cy0 + r) * cS + cx0 + 4, 1, hev, interior, inEdge)
        subblockEdge(vPl, (cy0 + r) * cS + cx0 + 4, 1, hev, interior, inEdge)
        r += 1
      }
    }
    // top MB edge
    if (mbY > 0) {
      var cc = 0
      while (cc < 16) { mbEdgeFilter(y, y0 * yS + x0 + cc, yS, hev, interior, mbEdge); cc += 1 }
      cc = 0
      while (cc < 8) {
        mbEdgeFilter(uPl, cy0 * cS + cx0 + cc, cS, hev, interior, mbEdge)
        mbEdgeFilter(vPl, cy0 * cS + cx0 + cc, cS, hev, interior, mbEdge)
        cc += 1
      }
    }
    // inner horizontal edges
    if (inner) {
      var e = 4
      while (e <= 12) {
        var cc = 0
        while (cc < 16) { subblockEdge(y, (y0 + e) * yS + x0 + cc, yS, hev, interior, inEdge); cc += 1 }
        e += 4
      }
      var cc = 0
      while (cc < 8) {
        subblockEdge(uPl, (cy0 + 4) * cS + cx0 + cc, cS, hev, interior, inEdge)
        subblockEdge(vPl, (cy0 + 4) * cS + cx0 + cc, cS, hev, interior, inEdge)
        cc += 1
      }
    }
  }
}
