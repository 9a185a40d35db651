"""Lossless WebP (VP8L) decode — pure stdlib + numpy, no external codec.

Closes the WebP leg of the multimodal decode gate (see
``multimodal._decode_image_real``): VP8L is canonical-prefix coding +
LZ77 backward references + a color cache + four reversible transforms
(predictor / cross-color / subtract-green / color-indexing), all
implementable exactly without a codec library. The LOSSY ``VP8 `` leg
(boolean arithmetic coding + intra prediction + loop filter) decodes
natively too — vp8.py, pinned bit-exact against the reference decoder
at both the YUV and RGBA surfaces.

Wire format per the public container/bitstream specs (RFC 9649; the
format is also documented at developers.google.com/speed/webp). The
120-entry short-distance map below was extracted from the system
libwebp binary's ``kCodeToPlane`` table and is pinned in
tests/test_webp.py against the real library decoding the same streams.

Scale note: this decoder is per-symbol Python — built for the
test/repair path of a 100 TB media pipeline (validate layouts, decode
fixtures, quarantine hostile payloads), not bulk pixel throughput. At
deploy scale bulk decode routes through a native codec behind the same
``mapInPandas`` Arrow boundary; every structural property (schema,
batching, refusal semantics) is identical between the two, which is
what the tests pin.

Hostile-payload contract (same as decode_bmp/decode_png/decode_jpeg):
any malformed, truncated, over-subscribed, or dimension-bombing stream
raises ``ValueError`` BEFORE any large allocation — never a crash, an
OOM, or an unbounded loop.
"""

from __future__ import annotations

from array import array

# 16 Mpx, deliberately TIGHTER than the JPEG/TIFF legs' 64 Mpx: those
# decoders are numpy-vectorized, but VP8L is a per-symbol Python loop, so
# the cap bounds hostile CPU (a dimension-bombing stream costs tens of
# seconds, not minutes) as well as the pixel buffer (array('I'): 4 B/px,
# 67 MB at the cap). Real lossless WebP (icons/screenshots/textures)
# sits far below this.
_MAX_PIXELS = 1 << 24

# Short-distance codes 1..120 map to a 2-D neighborhood offset (dx, dy);
# dist = dy * width + dx, clamped to >= 1. Extracted byte-for-byte from
# libwebp's kCodeToPlane ((code >> 4) = dy, 8 - (code & 0xF) = dx).
_DIST_MAP = [
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
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]

# code-length-code symbol transmission order (shared with deflate's idea,
# different constant): symbols 16/17/18 are the repeat codes
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15]


class _Bits:
    """LSB-first bit reader (VP8L convention: bits fill from the low end
    of each successive byte)."""

    __slots__ = ("buf", "pos", "val", "n")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.val = 0
        self.n = 0

    def u(self, k: int) -> int:
        while self.n < k:
            if self.pos >= len(self.buf):
                raise ValueError("VP8L bitstream truncated")
            self.val |= self.buf[self.pos] << self.n
            self.pos += 1
            self.n += 8
        out = self.val & ((1 << k) - 1)
        self.val >>= k
        self.n -= k
        return out


def _build_code(code_lengths) -> tuple:
    """Canonical prefix code from per-symbol lengths (deflate-style
    assignment: codes in (length, symbol) order). Returns ``(0, sym)``
    for a single-symbol code — VP8L reads ZERO bits for those — else
    ``(max_len, {(len, code): sym})`` walked MSB-first bit by bit."""
    nz = sorted((ln, s) for s, ln in enumerate(code_lengths) if ln > 0)
    if not nz:
        raise ValueError("VP8L prefix code has no symbols")
    if len(nz) == 1:
        return (0, nz[0][1])
    table: dict = {}
    code = 0
    cur_len = nz[0][0]
    for ln, sym in nz:
        code <<= ln - cur_len
        cur_len = ln
        if code >= (1 << ln):
            raise ValueError("over-subscribed VP8L prefix code")
        table[(ln, code)] = sym
        code += 1
    return (cur_len, table)


def _read_sym(br: _Bits, code: tuple) -> int:
    max_len, table = code
    if max_len == 0:
        return table  # single-symbol code: zero bits consumed
    acc = 0
    for ln in range(1, max_len + 1):
        acc = (acc << 1) | br.u(1)
        sym = table.get((ln, acc))
        if sym is not None:
            return sym
    raise ValueError("invalid VP8L prefix-coded symbol")


def _read_prefix_code(br: _Bits, alphabet_size: int) -> tuple:
    """One prefix code: either the 1-/2-symbol 'simple' form or full
    code-length-coded lengths (with 16/17/18 repeats and the optional
    max_symbol cap)."""
    if br.u(1):  # simple
        num_symbols = br.u(1) + 1
        first_wide = br.u(1)
        s0 = br.u(8) if first_wide else br.u(1)
        lengths = [0] * alphabet_size
        if s0 >= alphabet_size:
            raise ValueError("VP8L simple-code symbol out of alphabet")
        lengths[s0] = 1
        if num_symbols == 2:
            s1 = br.u(8)
            if s1 >= alphabet_size:
                raise ValueError("VP8L simple-code symbol out of alphabet")
            if s1 == s0:
                # a duplicate would silently collapse the two-symbol code
                # to a ZERO-bit one and desynchronize every later read —
                # garbage pixels accepted as a clean decode (libwebp
                # rejects this form too)
                raise ValueError("VP8L simple-code duplicate symbol")
            lengths[s1] = 1
        return _build_code(lengths)
    num_cl = 4 + br.u(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.u(3)
    cl_code = _build_code(cl_lengths)
    if br.u(1):  # explicit cap on transmitted symbols
        length_nbits = 2 + 2 * br.u(3)
        max_symbol = 2 + br.u(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_nz = 8
    i = 0
    while i < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        c = _read_sym(br, cl_code)
        if c < 16:
            lengths[i] = c
            i += 1
            if c:
                prev_nz = c
        else:
            if c == 16:
                rep, fill = 3 + br.u(2), prev_nz
            elif c == 17:
                rep, fill = 3 + br.u(3), 0
            else:
                rep, fill = 11 + br.u(7), 0
            if i + rep > alphabet_size:
                raise ValueError("VP8L code-length repeat overruns alphabet")
            for _ in range(rep):
                lengths[i] = fill
                i += 1
    return _build_code(lengths)


def _ss(size: int, bits: int) -> int:
    """Sub-sample size: tiles of 2^bits pixels, last one partial."""
    return (size + (1 << bits) - 1) >> bits


def _lz_val(br: _Bits, code: int) -> int:
    """LZ77 prefix-coded value (shared by copy lengths and distances)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.u(extra) + 1


def _plane_to_dist(code: int, width: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    d = dy * width + dx
    return d if d >= 1 else 1


def _read_code_group(br: _Bits, cache_bits: int) -> list:
    green_size = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    return [
        _read_prefix_code(br, green_size),   # green + lengths + cache
        _read_prefix_code(br, 256),          # red
        _read_prefix_code(br, 256),          # blue
        _read_prefix_code(br, 256),          # alpha
        _read_prefix_code(br, 40),           # distance
    ]


def _decode_pixels(br: _Bits, w: int, h: int, allow_meta: bool) -> array:
    """The entropy-coded ARGB plane shared by the main image, the entropy
    image, the transform images, and the palette: color cache + (meta)
    prefix-code groups + the literal/backref/cache-ref symbol loop.
    Returns a flat row-major array('I') of uint32 ARGB ints."""
    cache_bits = br.u(4) if br.u(1) else 0
    if cache_bits > 11:
        raise ValueError(f"VP8L color-cache bits {cache_bits} out of range")
    meta_idx = None
    meta_bits = meta_w = 0
    n_groups = 1
    if allow_meta and br.u(1):
        meta_bits = br.u(3) + 2
        meta_w, meta_h = _ss(w, meta_bits), _ss(h, meta_bits)
        meta_img = _decode_pixels(br, meta_w, meta_h, allow_meta=False)
        meta_idx = [(p >> 8) & 0xFFFF for p in meta_img]
        n_groups = max(meta_idx) + 1
    groups = [_read_code_group(br, cache_bits) for _ in range(n_groups)]
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cache_shift = 32 - cache_bits if cache_bits else 0

    n = w * h
    # array('I') not a list: 4 B/px unboxed vs ~8-28 B/px of pointer +
    # boxed int — the pixel buffer is the decode's dominant allocation
    out = array("I", bytes(4 * n))
    pos = x = y = 0
    g = groups[0]
    while pos < n:
        if meta_idx is not None:
            g = groups[meta_idx[(y >> meta_bits) * meta_w + (x >> meta_bits)]]
        s = _read_sym(br, g[0])
        if s < 256:  # literal: G then R, B, A
            r = _read_sym(br, g[1])
            b = _read_sym(br, g[2])
            a = _read_sym(br, g[3])
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            if cache is not None:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> cache_shift] = px
            pos += 1
            x += 1
            if x == w:
                x = 0
                y += 1
        elif s < 280:  # LZ77 backward reference
            length = _lz_val(br, s - 256)
            dist = _plane_to_dist(_lz_val(br, _read_sym(br, g[4])), w)
            if dist > pos:
                raise ValueError("VP8L backward reference before image start")
            if pos + length > n:
                raise ValueError("VP8L backward reference overruns image")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                if cache is not None:
                    cache[((0x1E35A7BD * px) & 0xFFFFFFFF)
                          >> cache_shift] = px
                pos += 1
            x = pos % w
            y = pos // w
        else:  # color-cache reference
            if cache is None:
                raise ValueError("VP8L cache reference without a color cache")
            idx = s - 280
            if idx >= len(cache):
                raise ValueError("VP8L cache index out of range")
            px = cache[idx]
            out[pos] = px
            pos += 1
            x += 1
            if x == w:
                x = 0
                y += 1
    return out


def _s8(v: int) -> int:
    v &= 0xFF
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    # both operands signed 8-bit; arithmetic >> matches libwebp
    return (_s8(t) * _s8(c)) >> 5


def _avg2(a: int, b: int, shift: int) -> int:
    return (((a >> shift) & 0xFF) + ((b >> shift) & 0xFF)) >> 1


def _inv_predictor(px: array, w: int, h: int, bits: int, timg: array) -> None:
    """Spatial-predictor inverse, in place: residual + prediction mod 256
    per channel. Mode per 2^bits tile from the transform image's green
    channel; row 0 / column 0 force L / T; pixel 0 predicts opaque black.
    The top-right neighbor of a rightmost-column pixel wraps (flat index
    idx - w + 1 = the CURRENT row's first pixel, already decoded) — the
    same arithmetic the reference implementation performs."""
    tiles_w = _ss(w, bits)

    def add(pos: int, pred: int) -> None:
        v = px[pos]
        px[pos] = (
            (((v >> 24) + (pred >> 24)) & 0xFF) << 24
            | ((((v >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16
            | ((((v >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8
            | (((v & 0xFF) + (pred & 0xFF)) & 0xFF)
        )

    for y in range(h):
        row = y * w
        for x in range(w):
            pos = row + x
            if y == 0 and x == 0:
                add(pos, 0xFF000000)
                continue
            if y == 0:
                add(pos, px[pos - 1])
                continue
            if x == 0:
                add(pos, px[pos - w])
                continue
            mode = (timg[(y >> bits) * tiles_w + (x >> bits)] >> 8) & 0xFF
            left = px[pos - 1]
            top = px[pos - w]
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = left
            elif mode == 2:
                pred = top
            elif mode == 3:
                pred = px[pos - w + 1]
            elif mode == 4:
                pred = px[pos - w - 1]
            elif mode in (5, 6, 7, 8, 9, 10):
                tr = px[pos - w + 1]
                tl = px[pos - w - 1]
                if mode == 5:
                    pred = 0
                    for sh in (0, 8, 16, 24):
                        pred |= (
                            (_avg2(left, tr, sh) + ((top >> sh) & 0xFF)) >> 1
                        ) << sh
                elif mode == 6:
                    pred = sum(_avg2(left, tl, sh) << sh
                               for sh in (0, 8, 16, 24))
                elif mode == 7:
                    pred = sum(_avg2(left, top, sh) << sh
                               for sh in (0, 8, 16, 24))
                elif mode == 8:
                    pred = sum(_avg2(tl, top, sh) << sh
                               for sh in (0, 8, 16, 24))
                elif mode == 9:
                    pred = sum(_avg2(top, tr, sh) << sh
                               for sh in (0, 8, 16, 24))
                else:  # 10
                    pred = 0
                    for sh in (0, 8, 16, 24):
                        pred |= (
                            (_avg2(left, tl, sh) + _avg2(top, tr, sh)) >> 1
                        ) << sh
            elif mode == 11:  # Select
                tl = px[pos - w - 1]
                p_left = p_top = 0
                for sh in (0, 8, 16, 24):
                    pc = (((top >> sh) & 0xFF) + ((left >> sh) & 0xFF)
                          - ((tl >> sh) & 0xFF))
                    p_left += abs(pc - ((left >> sh) & 0xFF))
                    p_top += abs(pc - ((top >> sh) & 0xFF))
                # strict <: on a tie the reference decoder takes TOP
                pred = left if p_left < p_top else top
            elif mode == 12:  # ClampAddSubtractFull
                tl = px[pos - w - 1]
                pred = 0
                for sh in (0, 8, 16, 24):
                    v = (((left >> sh) & 0xFF) + ((top >> sh) & 0xFF)
                         - ((tl >> sh) & 0xFF))
                    pred |= (0 if v < 0 else 255 if v > 255 else v) << sh
            elif mode == 13:  # ClampAddSubtractHalf
                tl = px[pos - w - 1]
                pred = 0
                for sh in (0, 8, 16, 24):
                    ave = _avg2(left, top, sh)
                    d = ave - ((tl >> sh) & 0xFF)
                    # C integer division truncates toward zero
                    half = d // 2 if d >= 0 else -((-d) // 2)
                    v = ave + half
                    pred |= (0 if v < 0 else 255 if v > 255 else v) << sh
            else:
                raise ValueError(f"invalid VP8L predictor mode {mode}")
            add(pos, pred)


def _inv_color(px: array, w: int, h: int, bits: int, timg: array) -> None:
    """Cross-color-transform inverse, in place: red += f(green);
    blue += f(green) + f(new red); multipliers per tile (green_to_red in
    the tile pixel's blue channel, green_to_blue in green, red_to_blue
    in red)."""
    tiles_w = _ss(w, bits)
    for y in range(h):
        row = y * w
        trow = (y >> bits) * tiles_w
        for x in range(w):
            pos = row + x
            v = px[pos]
            m = timg[trow + (x >> bits)]
            g2r = m & 0xFF
            g2b = (m >> 8) & 0xFF
            r2b = (m >> 16) & 0xFF
            green = (v >> 8) & 0xFF
            red = (((v >> 16) & 0xFF) + _ct_delta(g2r, green)) & 0xFF
            blue = ((v & 0xFF) + _ct_delta(g2b, green)
                    + _ct_delta(r2b, red)) & 0xFF
            px[pos] = (v & 0xFF00FF00) | (red << 16) | blue


def _inv_subtract_green(px: array) -> None:
    for i, v in enumerate(px):
        g = (v >> 8) & 0xFF
        r = (((v >> 16) & 0xFF) + g) & 0xFF
        b = ((v & 0xFF) + g) & 0xFF
        px[i] = (v & 0xFF00FF00) | (r << 16) | b


def _inv_color_index(px: array, reduced_w: int, h: int, pbits: int,
                     palette: array, full_w: int) -> array:
    """Palette lookup (+ sub-byte index unbundling when pbits > 0).
    Out-of-range indices decode to 0x00000000 per the spec."""
    npal = len(palette)
    if pbits == 0:
        return array(
            "I",
            (palette[(v >> 8) & 0xFF] if ((v >> 8) & 0xFF) < npal else 0
             for v in px),
        )
    per = 1 << pbits          # indices bundled per reduced pixel
    ibits = 8 >> pbits        # bits per index
    mask = (1 << ibits) - 1
    out = array("I", bytes(4 * full_w * h))
    for y in range(h):
        src_row = y * reduced_w
        dst_row = y * full_w
        for x in range(full_w):
            bundle = (px[src_row + (x >> pbits)] >> 8) & 0xFF
            idx = (bundle >> ((x & (per - 1)) * ibits)) & mask
            out[dst_row + x] = palette[idx] if idx < npal else 0
    return out


def _decode_image_stream(br: _Bits, w: int, h: int) -> array:
    """A VP8L *image stream* (transforms + entropy-coded pixels) with
    known dimensions → flat row-major ARGB array.  Shared by the VP8L
    chunk body (after its signature/size header) and the
    lossless-compressed ``ALPH`` alpha plane, whose stream carries no
    header (dimensions are implicit from the lossy frame)."""
    # transforms appear once each, in stream order; inverses apply in
    # REVERSE order. Color-indexing shrinks the coded width for
    # everything read after it (pixel bundling).
    transforms = []
    seen = set()
    cur_w = w
    while br.u(1):
        t = br.u(2)
        if t in seen:
            raise ValueError(f"duplicate VP8L transform {t}")
        seen.add(t)
        if t == 0 or t == 1:  # predictor / cross-color: per-tile image
            bits = br.u(3) + 2
            timg = _decode_pixels(br, _ss(cur_w, bits), _ss(h, bits),
                                  allow_meta=False)
            transforms.append(("pred" if t == 0 else "color", bits, timg))
        elif t == 2:
            transforms.append(("sgreen",))
        else:  # color indexing: delta-coded palette + width reduction
            ncolors = br.u(8) + 1
            pbits = (3 if ncolors <= 2 else 2 if ncolors <= 4
                     else 1 if ncolors <= 16 else 0)
            pal = _decode_pixels(br, ncolors, 1, allow_meta=False)
            for i in range(1, ncolors):  # component-wise running sum
                p, q = pal[i], pal[i - 1]
                pal[i] = ((((p >> 24) + (q >> 24)) & 0xFF) << 24
                          | ((((p >> 16) & 0xFF) + ((q >> 16) & 0xFF))
                             & 0xFF) << 16
                          | ((((p >> 8) & 0xFF) + ((q >> 8) & 0xFF))
                             & 0xFF) << 8
                          | (((p & 0xFF) + (q & 0xFF)) & 0xFF))
            transforms.append(("cindex", pbits, pal, cur_w))
            cur_w = _ss(cur_w, pbits)

    px = _decode_pixels(br, cur_w, h, allow_meta=True)
    for t in reversed(transforms):
        if t[0] == "cindex":
            px = _inv_color_index(px, cur_w, h, t[1], t[2], t[3])
            cur_w = t[3]
        elif t[0] == "sgreen":
            _inv_subtract_green(px)
        elif t[0] == "pred":
            _inv_predictor(px, cur_w, h, t[1], t[2])
        else:
            _inv_color(px, cur_w, h, t[1], t[2])
    return px


def _decode_vp8l(body: bytes):
    """The VP8L chunk payload → (H, W, 4) uint8 RGBA."""
    import numpy as np

    if not body or body[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _Bits(body[1:])
    w = br.u(14) + 1
    h = br.u(14) + 1
    br.u(1)  # alpha-is-used hint (informational)
    if br.u(3) != 0:
        raise ValueError("unknown VP8L bitstream version")
    if w * h > _MAX_PIXELS:
        raise ValueError(f"VP8L dimensions {w}x{h} out of bounds")
    px = _decode_image_stream(br, w, h)
    argb = np.asarray(px, dtype=np.uint32).reshape(h, w)
    rgba = np.empty((h, w, 4), np.uint8)
    rgba[..., 0] = (argb >> 16) & 0xFF
    rgba[..., 1] = (argb >> 8) & 0xFF
    rgba[..., 2] = argb & 0xFF
    rgba[..., 3] = argb >> 24
    return rgba


def _decode_alpha(body: bytes, w: int, h: int):
    """``ALPH`` chunk (lossy-with-alpha, VP8X container) → (H, W) uint8
    alpha plane.  Compression 0 is a raw row-major plane; compression 1
    is a header-less VP8L image stream whose GREEN channel carries the
    alpha values.  Filtering methods 1-3 (horizontal / vertical /
    gradient) are inverted exactly per the container spec; nonzero
    reserved bits or unknown methods are refused — decode exactly or
    refuse, never drop an alpha plane silently."""
    import numpy as np

    if not body:
        raise ValueError("WebP ALPH chunk is empty")
    hdr = body[0]
    comp = hdr & 3
    filt = (hdr >> 2) & 3
    pre = (hdr >> 4) & 3
    if (hdr >> 6) or comp > 1 or pre > 1:
        raise ValueError("WebP ALPH header out of spec")
    data = body[1:]
    if comp == 0:
        if len(data) < w * h:
            raise ValueError("WebP ALPH raw plane truncated")
        alpha = np.frombuffer(data[:w * h], np.uint8).reshape(h, w)
        alpha = alpha.astype(np.int32)
    else:
        px = _decode_image_stream(_Bits(data), w, h)
        alpha = ((np.asarray(px, dtype=np.uint32).reshape(h, w) >> 8)
                 & 0xFF).astype(np.int32)
    if filt == 0:
        return alpha.astype(np.uint8)
    out = np.zeros((h, w), np.int32)
    # row 0 is always horizontally predicted from a 0 seed; mod-256
    # addition chains are plain cumsums masked at the end
    out[0] = np.cumsum(alpha[0], dtype=np.int64) & 0xFF
    if filt == 1:  # horizontal: left; leftmost pixel predicts from above
        # column 0 is its own vertical chain (each row's seed), then
        # every row is an independent cumsum from that seed
        col0 = np.cumsum(alpha[:, 0], dtype=np.int64) & 0xFF
        out[:, 0] = col0
        if w > 1:
            sums = np.cumsum(alpha[1:, 1:], axis=1, dtype=np.int64)
            out[1:, 1:] = (col0[1:, None] + sums) & 0xFF
    elif filt == 2:  # vertical: above
        out[1:] = alpha[1:]
        out[:] = np.cumsum(out, axis=0, dtype=np.int64) & 0xFF
    else:  # gradient: clip(left + above - above-left)
        for y in range(1, h):
            left = tl = top = out[y - 1, 0]
            prev = out[y - 1]
            row = alpha[y]
            for x in range(w):
                top = prev[x]
                g = left + top - tl
                g = 0 if g < 0 else (255 if g > 255 else g)
                left = (row[x] + g) & 0xFF
                tl = top
                out[y, x] = left
    return out.astype(np.uint8)


def decode_webp(payload: bytes):
    """REAL image decode for WebP — walks the RIFF container and decodes
    lossless ``VP8L`` with the pure-python/numpy pipeline above, or
    lossy ``VP8 `` key frames with the native vp8.py decoder (bool
    arithmetic coding + intra prediction + loop filter + fancy-upsample
    RGBA conversion, reference-pinned bit-exact). Returns (H, W, 4)
    uint8 RGBA; malformed containers raise ``ValueError``."""
    import struct

    if len(payload) < 16 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    alpha_body = None
    while pos + 8 <= len(payload):
        fourcc = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = pos + 8
        if body + size > len(payload):
            raise ValueError(f"WebP chunk {fourcc!r} overruns the payload")
        if fourcc == b"VP8L":
            return _decode_vp8l(payload[body:body + size])
        if fourcc == b"ANIM":
            # animated WebP nests its frames' VP8/VP8L chunks inside
            # ANMF payloads — a still decoder must refuse explicitly,
            # not fall through to a misleading "no image chunk" error
            raise ValueError(
                "animated WebP is not supported (still images only)"
            )
        if fourcc == b"ALPH":
            # lossy-with-alpha (VP8X): remember the plane, decode it
            # against the VP8 frame's dimensions when that chunk arrives
            alpha_body = payload[body:body + size]
        if fourcc == b"VP8 ":
            from .vp8 import decode_vp8_yuv, yuv420_to_rgba

            rgba = yuv420_to_rgba(
                *decode_vp8_yuv(payload[body:body + size]))
            if alpha_body is not None:
                rgba[:, :, 3] = _decode_alpha(
                    alpha_body, rgba.shape[1], rgba.shape[0])
            return rgba
        pos = body + size + (size & 1)  # chunks pad to even offsets
    raise ValueError("WebP container has no VP8L/VP8 image chunk")
