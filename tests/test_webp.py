"""Lossless WebP (VP8L) decoder tests.

Two independent verification layers:

1. **Embedded fixtures** (always run): three real VP8L payloads produced
   by the reference encoder, with formulaic expected pixels — no codec
   library needed to verify the decoder on a machine without libwebp.
2. **Reference-decoder oracle** (skipped when the system libwebp shared
   library is absent): encode a diverse image battery with the REAL
   encoder via ctypes and require bit-exact agreement between
   ``decode_webp`` and ``WebPDecodeRGBA`` on every stream — this
   exercises the predictor/cross-color/subtract-green/color-indexing
   transforms, the color cache, LZ77 short-distance codes, and the meta
   prefix-code (entropy image) path with ground truth, not a
   self-round-trip.

Hostile-payload contract mirrors the other decoders: truncation,
dimension bombs, and malformed streams raise ValueError before any
large allocation; lossy VP8 raises NotImplementedError (genuine codec
gate).
"""

from __future__ import annotations

import ctypes
import struct

import numpy as np
import pytest

from enterprise_data_warehouse_spark.operators.webp import (
    _DIST_MAP,
    decode_webp,
)

try:  # the oracle is optional; the embedded-fixture layer is not
    _LIB = ctypes.CDLL("libwebp.so.7")
    _U8P = ctypes.POINTER(ctypes.c_uint8)
    _LIB.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    _LIB.WebPEncodeLosslessRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(_U8P),
    ]
    _LIB.WebPDecodeRGBA.restype = _U8P
    _LIB.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
except OSError:  # pragma: no cover - exercised only off-container
    _LIB = None

needs_libwebp = pytest.mark.skipif(
    _LIB is None, reason="system libwebp not available for oracle runs"
)


def _encode(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    out = _U8P()
    n = _LIB.WebPEncodeLosslessRGBA(
        np.ascontiguousarray(img).tobytes(), w, h, w * 4, ctypes.byref(out)
    )
    assert n > 0
    return ctypes.string_at(out, n)


def _ref_decode(payload: bytes) -> np.ndarray:
    w, h = ctypes.c_int(), ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(
        payload, len(payload), ctypes.byref(w), ctypes.byref(h)
    )
    assert p
    return np.frombuffer(
        ctypes.string_at(p, w.value * h.value * 4), np.uint8
    ).reshape(h.value, w.value, 4)


# --- embedded fixtures (reference-encoder output, formulaic pixels) ----

FLAT = bytes.fromhex(  # 8x5 solid (10,200,30,255)
    "524946461e000000574542505650384c110000002f04c001000750e42ad4a3ff"
    "8188e87f0000"
)
GRAD = bytes.fromhex(  # 16x16 (x*16, y*16, (x+y)*8, 255)
    "524946462c000000574542505650384c200000002f0fc00300998ce87f6c0a51"
    "8882f73f2024204cf0ffb0a80e44c40480d5bb00"
)
NOISE = bytes.fromhex(  # 12x10 LCG pattern (see _noise_expected)
    "5249464640000000574542505650384c340000002f09c00210990a44f43f3611"
    "d1ff0091b68d7f346733347c782e244843bba8fe512090786634e81e0281042f"
    "d939e64a5c67cd67"
)


def _noise_expected() -> np.ndarray:
    v = (np.arange(12 * 10, dtype=np.uint64) * 1103515245 + 12345) % 256
    return np.stack(
        [v, (v * 7) % 256, (v * 13) % 256, np.maximum((v * 3) % 256, 1)], -1
    ).astype(np.uint8).reshape(12, 10, 4)


def test_fixture_flat():
    got = decode_webp(FLAT)
    assert got.shape == (8, 5, 4)
    assert (got == np.array([10, 200, 30, 255], np.uint8)).all()


def test_fixture_gradient():
    got = decode_webp(GRAD)
    yy, xx = np.mgrid[0:16, 0:16]
    want = np.stack(
        [(xx * 16) % 256, (yy * 16) % 256, ((xx + yy) * 8) % 256,
         np.full((16, 16), 255)], -1
    ).astype(np.uint8)
    assert (got == want).all()


def test_fixture_noise():
    assert (decode_webp(NOISE) == _noise_expected()).all()


def test_distance_map_contract():
    """120 distinct in-neighborhood offsets; prefix ordered by squared
    distance (the spec's 'closest first'); every dist >= 1 on any width."""
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120
    assert _DIST_MAP[0] == (0, 1) and _DIST_MAP[-1] == (8, 7)
    for dx, dy in _DIST_MAP:
        assert 0 <= dy <= 7 and -7 <= dx <= 8
        assert dy > 0 or dx > 0
    norms = [dx * dx + dy * dy for dx, dy in _DIST_MAP[:92]]
    assert norms == sorted(norms)


# --- hostile payloads --------------------------------------------------


def test_truncations_raise_value_error():
    for payload in (FLAT, GRAD, NOISE):
        full = decode_webp(payload)
        for cut in range(len(payload)):
            try:
                out = decode_webp(payload[:cut])
            except (ValueError, NotImplementedError):
                continue
            # only legal escape: the cut trimmed nothing but the RIFF
            # even-padding byte, so the complete chunk decodes identically
            assert cut >= len(payload) - 1 and (out == full).all(), cut


def test_dimension_bomb_rejected_before_allocation():
    import struct

    body = bytes([0x2F]) + struct.pack(
        "<I", 16383 | (16383 << 14)
    )[:4]
    bomb = (b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WEBP"
            + b"VP8L" + struct.pack("<I", len(body)) + body)
    with pytest.raises(ValueError, match="out of bounds"):
        decode_webp(bomb)


def test_pixel_cap_boundary_is_16mpx():
    """Pin the VP8L pixel cap at exactly 16 Mpx (r09 ADVICE): deliberately
    TIGHTER than the 64 Mpx numpy-vectorized legs (multimodal.py) because
    VP8L decodes per-symbol in Python. 4096×4096 = the cap passes the
    dimension gate (and fails LATER, on the truncated stream); one row
    more is refused with the out-of-bounds message."""
    import struct

    from enterprise_data_warehouse_spark.operators.webp import _MAX_PIXELS

    assert _MAX_PIXELS == 1 << 24

    def header(w, h):
        v = (w - 1) | ((h - 1) << 14)  # alpha=0, version=0
        return bytes([0x2F]) + struct.pack("<I", v)

    body = header(4096, 4097)  # one row over the cap
    bomb = (b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WEBP"
            + b"VP8L" + struct.pack("<I", len(body)) + body)
    with pytest.raises(ValueError, match="out of bounds"):
        decode_webp(bomb)

    body = header(4096, 4096)  # exactly at the cap: gate passes
    at_cap = (b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WEBP"
              + b"VP8L" + struct.pack("<I", len(body)) + body)
    with pytest.raises(ValueError) as ei:
        decode_webp(at_cap)  # truncated stream fails, but past the gate
    assert "out of bounds" not in str(ei.value)


def test_non_webp_and_empty_rejected():
    with pytest.raises(ValueError, match="not a WebP"):
        decode_webp(b"RIFFxxxxWAVEdata")
    with pytest.raises(ValueError, match="not a WebP"):
        decode_webp(b"")
    # container with no image chunk
    with pytest.raises(ValueError, match="no VP8L"):
        decode_webp(b"RIFF\x06\x00\x00\x00WEBPXXXX\x00\x00\x00\x00")


def test_lossy_vp8_truncated_chunk_refused_cleanly():
    """Lossy VP8 decodes natively now (tests/test_vp8.py pins it); a
    truncated/garbage VP8 chunk must still refuse with ValueError, never
    crash or hang — the same hostile-payload contract as VP8L."""
    lossy = (b"RIFF\x10\x00\x00\x00WEBP" + b"VP8 "
             + b"\x04\x00\x00\x00" + b"\x00" * 4)
    with pytest.raises(ValueError):
        decode_webp(lossy)


def test_bitflip_never_hangs_or_crashes():
    for payload in (GRAD, NOISE):
        for i in range(12, len(payload)):
            mutated = (payload[:i] + bytes([payload[i] ^ 0xFF])
                       + payload[i + 1:])
            try:
                out = decode_webp(mutated)
                assert out.dtype == np.uint8  # decoded to SOME image: fine
            except (ValueError, NotImplementedError):
                pass  # refused cleanly: also fine


# --- reference-decoder oracle ------------------------------------------


def _battery(rng) -> dict:
    yy, xx = np.mgrid[0:64, 0:64]
    imgs = {
        "noise": rng.integers(0, 256, (13, 17, 4), dtype=np.uint8),
        "flat": np.full((32, 40, 4), (10, 200, 30, 255), np.uint8),
        "smooth": np.stack(
            [(xx * 3) % 256, (yy * 2) % 256, ((xx + yy) // 2) % 256,
             np.full((64, 64), 255)], -1).astype(np.uint8),
        "row": rng.integers(0, 256, (1, 100, 4), dtype=np.uint8),
        "col": rng.integers(0, 256, (100, 1, 4), dtype=np.uint8),
        "one": np.array([[[7, 8, 9, 255]]], np.uint8),
    }
    # palettes at every bundling width: 2 -> 3 bits/px ... 200 -> none
    for ncol in (2, 4, 5, 16, 17, 200):
        pal = rng.integers(0, 256, (ncol, 4), dtype=np.uint8)
        imgs[f"pal{ncol}"] = pal[rng.integers(0, ncol, (21, 33))]
    # repeated patches: LZ77 long-distance references
    im = rng.integers(0, 256, (80, 96, 4), dtype=np.uint8)
    im[40:60, 40:60] = im[10:30, 10:30]
    imgs["patched"] = im
    for im in imgs.values():  # default encoder rewrites invisible RGB
        im[..., 3] = np.maximum(im[..., 3], 1)
    return imgs


@needs_libwebp
def test_oracle_battery_bit_exact():
    rng = np.random.default_rng(42)
    for name, img in _battery(rng).items():
        payload = _encode(img)
        got = decode_webp(payload)
        want = _ref_decode(payload)
        assert got.shape == want.shape, name
        assert (got == want).all(), name


@needs_libwebp
def test_oracle_composite_meta_prefix_codes():
    """Quadrants with wildly different statistics push the encoder into
    meta prefix codes (a coded entropy image selecting per-tile code
    groups) plus predictor + cross-color — the deepest decode path."""
    rng = np.random.default_rng(7)
    for size in (120, 200, 256):
        H, W = size, size + 40
        yy, xx = np.mgrid[0:H, 0:W]
        img = np.zeros((H, W, 4), np.uint8)
        img[:, :, 3] = 255
        h2, w2 = H // 2, W // 2
        img[:h2, :w2] = np.dstack(
            [(xx[:h2, :w2] * 2) % 256, (yy[:h2, :w2] * 2) % 256,
             np.zeros((h2, w2)), np.full((h2, w2), 255)]).astype(np.uint8)
        img[:h2, w2:, 0] = rng.integers(0, 256, (h2, W - w2))
        img[h2:, :w2] = 77
        v = ((xx[h2:, w2:] + yy[h2:, w2:]) % 3).astype(np.uint8)
        img[h2:, w2:, :3] = np.stack([v * 80, v * 60, v * 100], -1)
        payload = _encode(img)
        got = decode_webp(payload)
        want = _ref_decode(payload)
        assert (got == want).all(), size


@needs_libwebp
def test_oracle_select_predictor_tiebreak():
    """Red noise over constant green/blue drives predictor mode 11
    (Select) into Manhattan-distance ties, where the reference picks TOP
    — the regression this battery caught during development."""
    rng = np.random.default_rng(3)
    img = np.zeros((120, 160, 4), np.uint8)
    img[:, :, 3] = 255
    img[:, :, 0] = rng.integers(0, 256, (120, 160))
    payload = _encode(img)
    assert (decode_webp(payload) == _ref_decode(payload)).all()


@needs_libwebp
def test_oracle_random_sweep():
    rng = np.random.default_rng(11)
    for i in range(60):
        h = int(rng.integers(1, 50))
        w = int(rng.integers(1, 50))
        kind = i % 5
        if kind == 0:
            im = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        elif kind == 1:
            ncol = int(rng.integers(1, 30))
            pal = rng.integers(0, 256, (ncol, 4), dtype=np.uint8)
            im = pal[rng.integers(0, ncol, (h, w))]
        elif kind == 2:
            im = np.tile(rng.integers(0, 256, (1, w, 4), np.uint8),
                         (h, 1, 1))
        elif kind == 3:
            yy, xx = np.mgrid[0:h, 0:w]
            im = np.stack(
                [(xx * 5) % 256, (yy * 3) % 256, ((xx ^ yy)) % 256,
                 np.full((h, w), 255)], -1).astype(np.uint8)
        else:
            im = np.zeros((h, w, 4), np.uint8)
            im[:, :, 3] = 255
            im[:, :, 0] = rng.integers(0, 256, (h, w))
        im[:, :, 3] = np.maximum(im[:, :, 3], 1)
        payload = _encode(im)
        assert (decode_webp(payload) == _ref_decode(payload)).all(), \
            (i, h, w, kind)


@needs_libwebp
def test_decode_image_real_dispatches_webp():
    from enterprise_data_warehouse_spark.operators.multimodal import (
        _decode_image_real,
    )

    img = np.full((12, 9, 4), (40, 50, 60, 255), np.uint8)
    out = _decode_image_real(_encode(img), 6, 4)
    assert out.shape == (4, 6, 4)
    assert (out == np.array([40, 50, 60, 255], np.uint8)).all()


class _BitWriter:
    """LSB-first writer matching webp._Bits's read convention."""

    def __init__(self):
        self.val = 0
        self.n = 0

    def w(self, v: int, k: int):
        self.val |= (v & ((1 << k) - 1)) << self.n
        self.n += k

    def bytes(self) -> bytes:
        return self.val.to_bytes((self.n + 7) // 8 or 1, "little")


def _container(body: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_simple_code_duplicate_symbol_rejected():
    """A 2-symbol 'simple' prefix code repeating the SAME symbol would
    collapse to a zero-bit code and desynchronize every later read —
    garbage pixels returned as a clean decode. It must be refused
    (libwebp's tree builder under-subscribes and errors on it too)."""
    bw = _BitWriter()
    bw.w(1, 14)  # w-1 (w=2)
    bw.w(1, 14)  # h-1 (h=2)
    bw.w(0, 1)   # alpha hint
    bw.w(0, 3)   # version
    bw.w(0, 1)   # no transforms
    bw.w(0, 1)   # no color cache
    bw.w(0, 1)   # no meta prefix image
    bw.w(1, 1)   # first prefix code: simple form
    bw.w(1, 1)   # num_symbols = 2
    bw.w(1, 1)   # first symbol is 8-bit
    bw.w(5, 8)   # s0 = 5
    bw.w(5, 8)   # s1 = 5 — the duplicate
    body = bytes([0x2F]) + bw.bytes()
    with pytest.raises(ValueError, match="duplicate symbol"):
        decode_webp(_container(body))


@needs_libwebp
def test_simple_code_duplicate_symbol_oracle_rejects_too():
    bw = _BitWriter()
    for v, k in ((1, 14), (1, 14), (0, 1), (0, 3), (0, 1), (0, 1), (0, 1),
                 (1, 1), (1, 1), (1, 1), (5, 8), (5, 8)):
        bw.w(v, k)
    payload = _container(bytes([0x2F]) + bw.bytes())
    w, h = ctypes.c_int(), ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(
        payload, len(payload), ctypes.byref(w), ctypes.byref(h)
    )
    assert not p  # NULL: the reference decoder refuses the stream as well
