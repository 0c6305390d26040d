#!/usr/bin/env python3
"""Generate frozen WebP-lossless (VP8L) test fixtures pinned against the
system libwebp (the independent reference implementation — the same
differential discipline the JPEG/PNG/GIF/TIFF codecs get from ImageIO).

Outputs fixtures/webp_goldens_v1.jsonl with records:
  {"name", "w", "h", "webp_b64", "rgba_b64"}
where webp_b64 decodes (per libwebp) to exactly rgba_b64.

Two fixture families:
 1. libwebp-ENCODED images of deterministic patterns (the encoder picks
    predictors / subtract-green / color-cache / palette / meta prefix
    codes on its own, so these pin the decoder's full feature surface);
 2. HANDCRAFTED VP8L bitstreams (this script's own bit-writer) that are
    first validated by libwebp's decoder, pinning the spec corners the
    encoder may not emit for small images: simple-code symbol order,
    max_symbol semantics, color-cache hits, every distance-map code
    1..120, meta prefix dispatch.

Also prints the empirically-extracted 120-entry distance map so the
Scala table (WebpVp8l.DistanceMap) can be asserted against it.
"""
import base64
import ctypes
import json
import os
import sys

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                               ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
lib.WebPEncodeLosslessRGBA.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPEncodeRGBA.restype = ctypes.c_size_t
lib.WebPEncodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int, ctypes.c_float,
                               ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPGetInfo.restype = ctypes.c_int
lib.WebPGetInfo.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.argtypes = [ctypes.c_void_p]


def get_info(data: bytes):
    w = ctypes.c_int()
    h = ctypes.c_int()
    ok = lib.WebPGetInfo(data, len(data), ctypes.byref(w), ctypes.byref(h))
    return (w.value, h.value) if ok else None


def encode_lossy(rgba: bytes, w: int, h: int, q: float = 75.0) -> bytes:
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGBA(rgba, w, h, w * 4, q, ctypes.byref(out))
    assert n > 0, "libwebp lossy encode failed"
    data = bytes(ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8 * n)).contents)
    lib.WebPFree(out)
    return data


def decode(data: bytes):
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        return None
    out = bytes(ctypes.cast(p, ctypes.POINTER(ctypes.c_uint8 * (w.value * h.value * 4))).contents)
    lib.WebPFree(p)
    return w.value, h.value, out


def encode_lossless(rgba: bytes, w: int, h: int) -> bytes:
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeLosslessRGBA(rgba, w, h, w * 4, ctypes.byref(out))
    assert n > 0, "libwebp encode failed"
    data = bytes(ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8 * n)).contents)
    lib.WebPFree(out)
    return data


# ---------------------------------------------------------------- patterns

def lcg_bytes(seed, n):
    out = bytearray(n)
    s = seed & 0xFFFFFFFF
    for i in range(n):
        s = (s * 1103515245 + 12345) & 0xFFFFFFFF
        out[i] = (s >> 16) & 0xFF
    return bytes(out)


def pattern(name, w, h):
    px = bytearray(w * h * 4)
    if name == "gradient":
        for y in range(h):
            for x in range(w):
                i = (y * w + x) * 4
                px[i] = (x * 255 // max(w - 1, 1))
                px[i + 1] = (y * 255 // max(h - 1, 1))
                px[i + 2] = ((x + y) * 255 // max(w + h - 2, 1))
                px[i + 3] = 255
    elif name == "palette4":
        cols = [(255, 0, 0, 255), (0, 255, 0, 255), (0, 0, 255, 255), (32, 32, 32, 255)]
        for y in range(h):
            for x in range(w):
                c = cols[(x // 3 + y // 2) % 4]
                px[(y * w + x) * 4:(y * w + x) * 4 + 4] = bytes(c)
    elif name == "palette17":
        cols = [((c * 41) % 256, (c * 67) % 256, (c * 101) % 256, 255) for c in range(17)]
        for y in range(h):
            for x in range(w):
                c = cols[(x * 3 + y) % 17]
                px[(y * w + x) * 4:(y * w + x) * 4 + 4] = bytes(c)
    elif name == "palette13":
        cols = [((c * 37) % 256, (c * 83) % 256, (c * 139) % 256, 255) for c in range(13)]
        for y in range(h):
            for x in range(w):
                c = cols[(x + 2 * y) % 13]
                px[(y * w + x) * 4:(y * w + x) * 4 + 4] = bytes(c)
    elif name == "noise":
        r = lcg_bytes(42, w * h * 3)
        for i in range(w * h):
            px[i * 4:i * 4 + 3] = r[i * 3:i * 3 + 3]
            px[i * 4 + 3] = 255
    elif name == "alpha_noise":
        # alpha kept >= 100: the default encoder config (exact=0) is free
        # to zero RGB under fully-transparent pixels, which would break
        # the lossless roundtrip assertion
        r = lcg_bytes(7, w * h * 4)
        px[:] = r
        for i in range(w * h):
            px[i * 4 + 3] = 100 + (r[i * 4 + 3] % 156)
    elif name == "smooth":
        # photo-ish smooth field: encourages predictor transform
        import math
        for y in range(h):
            for x in range(w):
                i = (y * w + x) * 4
                px[i] = int(127 + 120 * math.sin(x / 9.0) * math.cos(y / 7.0)) & 0xFF
                px[i + 1] = int(127 + 120 * math.sin((x + y) / 11.0)) & 0xFF
                px[i + 2] = int(127 + 120 * math.cos(x / 13.0 + y / 5.0)) & 0xFF
                px[i + 3] = 255
    elif name == "repeat":
        # long horizontal runs: encourages LZ77 backrefs + color cache
        tile = lcg_bytes(9, 16 * 4)
        for y in range(h):
            for x in range(w):
                i = (y * w + x) * 4
                px[i:i + 4] = tile[(x % 16) * 4:(x % 16) * 4 + 4]
    elif name == "const":
        for i in range(w * h):
            px[i * 4:i * 4 + 4] = bytes((90, 140, 200, 255))
    else:
        raise ValueError(name)
    return bytes(px)


# ---------------------------------------------------------------- bit writer

class BW:
    def __init__(self):
        self.bits = []

    def put(self, v, n):  # LSB-first
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def code(self, c, n):  # prefix code, MSB of code first
        for i in range(n - 1, -1, -1):
            self.bits.append((c >> i) & 1)

    def bytes(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i // 8] |= b << (i % 8)
        return bytes(out)


def wrap_riff(vp8l: bytes) -> bytes:
    ch = len(vp8l)
    total = 4 + 8 + ch + (ch & 1)
    out = b"RIFF" + total.to_bytes(4, "little") + b"WEBP" + b"VP8L" + ch.to_bytes(4, "little") + vp8l
    if ch & 1:
        out += b"\x00"
    return out


def green9_writer(bw, cache_syms=()):
    """Green code: 256 literals at 9 bits, symbol 256 (length-1) at 1 bit
    OR (when cache_syms given) that cache symbol at 1 bit instead.
    Returns emit(sym) for literals and the 1-bit special symbol."""
    special = cache_syms[0] if cache_syms else 256
    bw.put(0, 1)  # not simple
    bw.put(19 - 4, 4)  # all 19 code-length codes present
    # lengths for order [17,18,0,1,2,3,4,5,16,6,7,8,9,10,11,12,13,14,15]
    # we need: 9 -> some len, 1 -> some len, 18 (zero runs), 16 (repeats), 0 -> for gaps
    # code-length alphabet used: {0, 1, 9, 16, 18}
    # assign lengths: make a canonical code over them: {0:3, 1:3, 9:2, 16:2, 18:2}
    # kraft: 2*2^-3 + 3*2^-2 = 0.25 + 0.75 = 1.0 OK
    clen = {0: 3, 1: 3, 9: 2, 16: 2, 18: 2}
    order = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
    for s in order:
        bw.put(clen.get(s, 0), 3)
    bw.put(0, 1)  # no max_symbol cap
    # canonical codes over (len, sym): len2: 9,16,18 -> 00,01,10 ; len3: 0,1 -> 110,111
    cl_code = {9: (0, 2), 16: (1, 2), 18: (2, 2), 0: (6, 3), 1: (7, 3)}

    def emit_cl(sym):
        c, n = cl_code[sym]
        bw.code(c, n)

    # alphabet = 256 + 24 + cache_size; lengths: 0..255 -> 9, special -> 1
    emit_cl(9)  # symbol 0 length 9
    rem = 255
    while rem > 0:  # repeat previous (9) in runs of 3..6
        take = min(6, rem if rem <= 6 or rem - 6 >= 3 else rem - 3)
        emit_cl(16)
        bw.put(take - 3, 2)
        rem -= take
    # zeros from 256 to special-1, then special -> 1
    gap = special - 256
    while gap > 0:
        if gap < 3:
            for _ in range(gap):
                emit_cl(0)
            gap = 0
        elif gap <= 10:
            emit_cl(17) if False else None
            # keep it simple: emit explicit zeros via symbol 0 runs of 1
            for _ in range(gap):
                emit_cl(0)
            gap = 0
        else:
            emit_cl(18)
            take = min(138, gap if gap <= 138 or gap - 138 >= 11 else gap - 11)
            bw.put(take - 11, 7)
            gap -= take
    emit_cl(1)  # the special symbol at length 1
    # trailing zeros through the end of the alphabet (the decoder reads
    # lengths until the full alphabet is covered)
    alphabet = 256 + 24 + (16 if cache_syms else 0)
    tail = alphabet - special - 1
    while tail > 0:
        if tail < 3:
            for _ in range(tail):
                emit_cl(0)
            tail = 0
        elif tail <= 10:
            for _ in range(tail):
                emit_cl(0)
            tail = 0
        else:
            take = min(138, tail if tail <= 138 or tail - 138 >= 11 else tail - 11)
            emit_cl(18)
            bw.put(take - 11, 7)
            tail -= take

    # canonical over {special:1, 0..255:9}: special='0'; literal s -> 256+s
    def emit(sym):
        if sym == special:
            bw.code(0, 1)
        else:
            bw.code(256 + sym, 9)
    return emit


def literal8_writer(bw):
    """R/B/A code: full 256-symbol 8-bit code."""
    bw.put(0, 1)
    bw.put(12 - 4, 4)
    lens = [0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 1]  # 16->1 at idx8, 8->1 at idx11
    for l in lens:
        bw.put(l, 3)
    bw.put(0, 1)
    # {8:'0', 16:'1'}
    bw.code(0, 1)  # symbol value 8
    rem = 255
    while rem > 0:
        take = min(6, rem if rem <= 6 or rem - 6 >= 3 else rem - 3)
        bw.code(1, 1)
        bw.put(take - 3, 2)
        rem -= take
    return lambda sym: bw.code(sym, 8)


def simple1_writer(bw, sym):
    bw.put(1, 1)
    bw.put(0, 1)
    if sym < 2:
        bw.put(0, 1)
        bw.put(sym, 1)
    else:
        bw.put(1, 1)
        bw.put(sym, 8)
    return lambda s: None


def dist_symbol_for(code):
    """(symbol, extra_bits, extra_val) emitting prefix value `code`."""
    if code <= 4:
        return code - 1, 0, 0
    for sym in range(4, 40):
        extra = (sym - 2) >> 1
        off = (2 + (sym & 1)) << extra
        if off + 1 <= code <= off + (1 << extra):
            return sym, extra, code - 1 - off
    raise ValueError(code)


def handcraft_backref(w, h, probe_pos, dist_code):
    """Literal stream with one length-1 backref at probe_pos using
    `dist_code`; pixel i has green=i&0xff red=(i>>8) for identification."""
    bw = BW()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)  # alpha unused
    bw.put(0, 3)
    bw.put(0, 1)  # no transforms
    bw.put(0, 1)  # no cache
    bw.put(0, 1)  # no meta
    g = green9_writer(bw)
    r = literal8_writer(bw)
    b = literal8_writer(bw)
    a = simple1_writer(bw, 255)
    sym, extra, ev = dist_symbol_for(dist_code)
    d = simple1_writer(bw, sym)
    for i in range(w * h):
        if i == probe_pos:
            g(256)  # length prefix code 0 -> length 1
            # distance symbol: 0 bits (single-symbol code)
            if extra:
                bw.put(ev, extra)
        else:
            g(i & 0xFF)
            r((i >> 8) & 0xFF)
            b(0)
    return wrap_riff(b"\x2f" + bw.bytes())


def handcraft_cache(w, h):
    """Color-cache stream: literals, then a cache hit for pixel 0."""
    cache_bits = 4
    bw = BW()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)
    bw.put(0, 3)
    bw.put(0, 1)  # no transforms
    bw.put(1, 1)  # cache
    bw.put(cache_bits, 4)
    bw.put(0, 1)  # no meta
    px0 = (255 << 24) | (10 << 16) | (20 << 8) | 30  # argb of first literal
    idx = ((0x1E35A7BD * px0) & 0xFFFFFFFF) >> (32 - cache_bits)
    g = green9_writer(bw, cache_syms=(280 + idx,))
    r = literal8_writer(bw)
    b = literal8_writer(bw)
    a = simple1_writer(bw, 255)
    d = simple1_writer(bw, 0)
    expect = bytearray()
    for i in range(w * h):
        if i == w * h - 1:
            g(280 + idx)  # cache hit -> pixel 0's color
            expect += bytes((10, 20, 30, 255))
        else:
            g(20 + (i % 3))
            r(10)
            b(30)
            if i == 0:
                pass  # px0 = (255,10,20,30) wait g must be 20 for px0
            expect += bytes((10, 20 + (i % 3), 30, 255))
    return wrap_riff(b"\x2f" + bw.bytes()), bytes(expect)


def handcraft_meta(w, h):
    """Two prefix groups via an entropy image: left tiles group 0
    (full red code), right tiles group 1 (constant red 200)."""
    meta_bits = 2  # 4x4 tiles
    bw = BW()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)
    bw.put(0, 3)
    bw.put(0, 1)  # no transforms
    bw.put(0, 1)  # no cache
    bw.put(1, 1)  # meta prefix codes
    bw.put(meta_bits - 2, 3)
    tw = (w + 3) // 4
    th = (h + 3) // 4
    # entropy image (level != 0): no transforms; cache bit; codes; pixels
    bw.put(0, 1)  # no cache in entropy image
    eg = green9_writer(bw)
    er = literal8_writer(bw)
    eb = literal8_writer(bw)
    ea = simple1_writer(bw, 0)
    ed = simple1_writer(bw, 0)
    for i in range(tw * th):
        x = i % tw
        group = 1 if x >= tw // 2 else 0
        eg(group)  # green = low 8 bits of group id
        er(0)      # red = high bits
        eb(0)
    # group 0 codes: full literal codes
    g0 = green9_writer(bw)
    r0 = literal8_writer(bw)
    b0 = literal8_writer(bw)
    a0 = simple1_writer(bw, 255)
    d0 = simple1_writer(bw, 0)
    # group 1 codes: constant red 200
    g1 = green9_writer(bw)
    r1_emit = simple1_writer(bw, 200)
    b1 = literal8_writer(bw)
    a1 = simple1_writer(bw, 255)
    d1 = simple1_writer(bw, 0)
    expect = bytearray()
    for i in range(w * h):
        x = i % w
        group = 1 if (x // 4) >= tw // 2 else 0
        gr = (i * 3) & 0xFF
        bl = (i * 5) & 0xFF
        if group == 0:
            g0(gr)
            r0((i * 7) & 0xFF)
            b0(bl)
            expect += bytes(((i * 7) & 0xFF, gr, bl, 255))
        else:
            g1(gr)
            # red: 0 bits (constant 200)
            b1(bl)
            expect += bytes((200, gr, bl, 255))
    return wrap_riff(b"\x2f" + bw.bytes()), bytes(expect)


def main():
    out_path = os.path.join(os.path.dirname(__file__), "..", "fixtures", "webp_goldens_v1.jsonl")
    records = []

    # family 1: libwebp-encoded patterns
    cases = [
        ("gradient", 32, 32), ("gradient", 63, 33), ("palette4", 24, 16),
        ("palette13", 40, 21), ("noise", 48, 48), ("alpha_noise", 16, 16),
        ("smooth", 96, 96), ("repeat", 64, 32), ("const", 8, 8),
        ("gradient", 1, 1), ("noise", 3, 2), ("smooth", 129, 65),
        # round-4 widening: larger images push libwebp into more meta-
        # huffman groups / bigger color caches; palette17 sits just above
        # the 16-color bundling threshold; degenerate strips stress the
        # prediction borders
        ("smooth", 200, 200), ("noise", 150, 150), ("repeat", 256, 64),
        ("palette17", 50, 33), ("gradient", 1, 64), ("gradient", 64, 1),
        ("alpha_noise", 77, 41), ("smooth", 255, 3),
    ]
    for name, w, h in cases:
        rgba = pattern(name, w, h)
        webp = encode_lossless(rgba, w, h)
        dec = decode(webp)
        assert dec == (w, h, rgba), f"libwebp roundtrip failed for {name} {w}x{h}"
        records.append({"name": f"enc_{name}_{w}x{h}", "w": w, "h": h,
                        "webp_b64": base64.b64encode(webp).decode(),
                        "rgba_b64": base64.b64encode(rgba).decode()})

    # family 1b: LOSSY encodes — header-info fixtures only (pixels stay
    # fenced; the Scala info() must agree with WebPGetInfo). The
    # with-alpha case makes libwebp emit a VP8X + ALPH container,
    # pinning the VP8X canvas path.
    for name, w, h, alpha in [("smooth", 40, 24, False), ("gradient", 17, 31, False),
                              ("alpha_noise", 20, 20, True)]:
        rgba = pattern(name, w, h)
        lossy = encode_lossy(rgba, w, h)
        gi = get_info(lossy)
        assert gi == (w, h), f"WebPGetInfo disagreed for lossy {name}: {gi}"
        records.append({"name": f"lossy_{name}_{w}x{h}", "w": w, "h": h,
                        "kind": "lossy",
                        "webp_b64": base64.b64encode(lossy).decode(),
                        "rgba_b64": ""})
    # synthetic VP8-header-only stream (the q250-style closed-form shape):
    # frame tag + start code + 14-bit dims, no valid coefficient data —
    # WebPGetInfo must still read the dims (it parses only the header)
    def vp8_header_only(w, h):
        payload = bytes([0x10, 0x00, 0x00, 0x9D, 0x01, 0x2A,
                         w & 0xFF, (w >> 8) & 0x3F, h & 0xFF, (h >> 8) & 0x3F])
        ch = len(payload)
        total = 4 + 8 + ch + (ch & 1)
        out = (b"RIFF" + total.to_bytes(4, "little") + b"WEBP" +
               b"VP8 " + ch.to_bytes(4, "little") + payload)
        return out + (b"\x00" if ch & 1 else b"")
    for (w, h) in [(33, 21), (100, 7)]:
        data = vp8_header_only(w, h)
        gi = get_info(data)
        assert gi == (w, h), f"WebPGetInfo rejected synthetic VP8 header: {gi}"
        records.append({"name": f"vp8hdr_{w}x{h}", "w": w, "h": h,
                        "kind": "lossy",
                        "webp_b64": base64.b64encode(data).decode(),
                        "rgba_b64": ""})

    # family 2a: distance-map probes (also extract the table)
    table = []
    w, h = 16, 16
    probe = 8 * 16 + 8
    for code in range(1, 121):
        data = handcraft_backref(w, h, probe, code)
        dec = decode(data)
        assert dec is not None, f"libwebp rejected handcrafted dist probe {code}"
        dw, dh, rgba = dec
        assert (dw, dh) == (w, h)
        g = rgba[probe * 4 + 1]
        r = rgba[probe * 4]
        src = (r << 8) | g
        dist = probe - src
        assert 1 <= dist <= probe, f"code {code}: bad dist {dist}"
        y = (dist + 7) // 16
        x = dist - 16 * y
        table.append((x, y))
        if code in (1, 2, 60, 120):  # keep a few as decoder fixtures
            records.append({"name": f"hc_dist_{code}", "w": w, "h": h,
                            "webp_b64": base64.b64encode(data).decode(),
                            "rgba_b64": base64.b64encode(rgba).decode()})

    # family 2b: color cache probe
    data, expect = handcraft_cache(8, 8)
    dec = decode(data)
    assert dec is not None, "libwebp rejected cache probe"
    assert dec[2] == expect, "cache probe mismatch vs libwebp"
    records.append({"name": "hc_cache", "w": 8, "h": 8,
                    "webp_b64": base64.b64encode(data).decode(),
                    "rgba_b64": base64.b64encode(expect).decode()})

    # family 2c: meta prefix probe
    data, expect = handcraft_meta(16, 8)
    dec = decode(data)
    assert dec is not None, "libwebp rejected meta probe"
    assert dec[2] == expect, "meta probe mismatch vs libwebp"
    records.append({"name": "hc_meta", "w": 16, "h": 8,
                    "webp_b64": base64.b64encode(data).decode(),
                    "rgba_b64": base64.b64encode(expect).decode()})

    with open(out_path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {len(records)} fixtures to {out_path}")
    print("distance map (dx,dy), codes 1..120:")
    print(table)


if __name__ == "__main__":
    main()
