"""Lossy-WebP (VP8 key-frame) decoder tests — three layers, mirroring
the VP8L/TIFF suites' strategy:

1. **Embedded fixtures** (always run, no library needed): real
   reference-encoder streams plus synthetic streams from the in-file
   minimal encoder, each with the reference decoder's YUV planes AND
   RGBA output captured at generation time — decode must be BIT-EXACT
   at both surfaces.
2. **System-libwebp oracle battery** (skip-gated, like the libtiff
   cross-check): live random/structured sweeps across sizes and
   qualities, plus a synthetic knob matrix driving every header path
   the simple encoder API never produces (simple filter, sharpness,
   loop-filter deltas, 2/4/8 token partitions, skip flags, segmentation
   with absolute+delta quant/filter features).
3. **Hostile payloads**: truncations, bitflips, dimension bombs, bad
   tags — ValueError or clean decode after bounded work, never a hang.

The in-file encoder implements the §7.2 boolean arithmetic ENCODER and
emits arbitrary valid key frames with CHOSEN coefficients (no forward
transform or RDO) — the image is whatever the coefficients reconstruct
to, and the reference decoder supplies ground truth.
"""

from __future__ import annotations

import base64
import struct
import time
import zlib

import numpy as np
import pytest

import enterprise_data_warehouse_spark.operators.vp8 as V
from enterprise_data_warehouse_spark.operators.vp8 import (
    decode_vp8_yuv,
    yuv420_to_rgba,
)
from enterprise_data_warehouse_spark.operators.webp import decode_webp

try:  # the oracle is optional; the embedded-fixture layer is not
    import ctypes

    _LIB = ctypes.CDLL("libwebp.so.7")
    _U8P = ctypes.POINTER(ctypes.c_uint8)
    _LIB.WebPEncodeRGB.restype = ctypes.c_size_t
    _LIB.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(_U8P),
    ]
    _LIB.WebPDecodeYUV.restype = _U8P
    _LIB.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(_U8P), ctypes.POINTER(_U8P),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _LIB.WebPDecodeRGBA.restype = _U8P
    _LIB.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _LIB.WebPFree.argtypes = [ctypes.c_void_p]
except OSError:  # pragma: no cover - exercised only off-container
    _LIB = None

needs_libwebp = pytest.mark.skipif(
    _LIB is None, reason="system libwebp not available for oracle runs"
)


def _oracle_encode_rgb(img: np.ndarray, quality: float) -> bytes:
    h, w, _ = img.shape
    out = _U8P()
    n = _LIB.WebPEncodeRGB(
        np.ascontiguousarray(img).tobytes(), w, h, w * 3, quality,
        ctypes.byref(out),
    )
    assert n > 0
    data = ctypes.string_at(out, n)
    _LIB.WebPFree(out)
    return data


def _oracle_yuv(data: bytes):
    w, h = ctypes.c_int(), ctypes.c_int()
    stride, uvs = ctypes.c_int(), ctypes.c_int()
    up, vp = _U8P(), _U8P()
    yp = _LIB.WebPDecodeYUV(
        data, len(data), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(up), ctypes.byref(vp),
        ctypes.byref(stride), ctypes.byref(uvs),
    )
    assert yp, "oracle refused the stream"
    cw, ch = (w.value + 1) // 2, (h.value + 1) // 2
    y = np.ctypeslib.as_array(yp, (h.value, stride.value))[:, :w.value].copy()
    u = np.ctypeslib.as_array(up, (ch, uvs.value))[:, :cw].copy()
    v = np.ctypeslib.as_array(vp, (ch, uvs.value))[:, :cw].copy()
    _LIB.WebPFree(yp)
    return y, u, v


def _oracle_rgba(data: bytes):
    w, h = ctypes.c_int(), ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert p
    arr = np.ctypeslib.as_array(p, (h.value, w.value, 4)).copy()
    _LIB.WebPFree(p)
    return arr


def _vp8_body(data: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        if fourcc == b"VP8 ":
            return data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


# ---------------------------------------------------------------------------
# Minimal VP8 key-frame encoder (tests only)
# ---------------------------------------------------------------------------

class _BoolEnc:
    """Boolean arithmetic encoder (§7.2) — the exact dual of the
    decoder's renormalization, carry propagated through the emitted
    bytes."""

    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self):
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        if i >= 0:
            self.out[i] += 1

    def bit(self, prob: int, value: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if value:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, n: int, v: int) -> None:
        for k in range(n - 1, -1, -1):
            self.bit(128, (v >> k) & 1)

    def signed_literal(self, n: int, v: int) -> None:
        self.literal(n, abs(v))
        self.bit(128, 1 if v < 0 else 0)

    def flagged(self, n: int, v: int) -> None:
        if v:
            self.bit(128, 1)
            self.signed_literal(n, v)
        else:
            self.bit(128, 0)

    def tree(self, tree, probs, sym: int, start: int = 0) -> None:
        path = self._find(tree, start, sym)
        assert path is not None, (sym, start)
        for node, b in path:
            self.bit(probs[node >> 1], b)

    def _find(self, tree, i, sym, path=()):
        for b in (0, 1):
            nxt = tree[i + b]
            if nxt <= 0:
                if -nxt == sym:
                    return path + ((i, b),)
            else:
                r = self._find(tree, nxt, sym, path + ((i, b),))
                if r is not None:
                    return r
        return None

    def flush(self) -> bytes:
        c = self.bit_count
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xFFFFFFFF
        c >>= 3
        while c > 0:
            v = (v << 8) & 0xFFFFFFFF
            c -= 1
        for _ in range(4):
            self.out.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self.out)


def _encode_block_tokens(be, probs, plane, ctx, first, coeffs16) -> int:
    scan = [coeffs16[V._ZIGZAG[n]] for n in range(16)]
    last_nz = -1
    for n in range(first, 16):
        if scan[n]:
            last_nz = n
    p_base = plane * 264
    n = first
    start = 0
    if last_nz < first:
        p = p_base + V._BANDS[n] * 33 + ctx * 11
        be.tree(V._TOKEN_TREE, probs[p:p + 11], V._EOB_TOK, 0)
        return 0
    while n <= last_nz:
        v = scan[n]
        a = abs(v)
        p = p_base + V._BANDS[n] * 33 + ctx * 11
        pr = probs[p:p + 11]
        if a == 0:
            be.tree(V._TOKEN_TREE, pr, 0, start)
            ctx, start = 0, 2
            n += 1
            continue
        if a <= 4:
            be.tree(V._TOKEN_TREE, pr, a, start)
        else:
            for cat in (V._CAT6, V._CAT5, V._CAT4, V._CAT3, V._CAT2,
                        V._CAT1):
                if a >= cat:
                    break
            be.tree(V._TOKEN_TREE, pr, cat, start)
            extra = a - cat
            cps = V._CAT_PROBS[cat]
            for k, cp in enumerate(cps):
                be.bit(cp, (extra >> (len(cps) - 1 - k)) & 1)
        be.bit(128, 1 if v < 0 else 0)
        ctx = 1 if a == 1 else 2
        start = 0
        n += 1
    if last_nz < 15:
        p = p_base + V._BANDS[n] * 33 + ctx * 11
        be.tree(V._TOKEN_TREE, probs[p:p + 11], V._EOB_TOK, 0)
    return 1


def _encode_frame(mb_w, mb_h, mbs, *, filter_type=0, filter_level=20,
                  sharpness=0, n_parts=1, use_skip=0, skip_prob=200,
                  seg=None, lf_deltas=None, q=40,
                  q_deltas=(0, 0, 0, 0, 0)) -> bytes:
    """Emit a VP8 chunk body for the given per-MB records (raster):
    {seg, skip, ymode, sub[16], uv, coeffs[25][16 raw ints]}."""
    width, height = mb_w * 16, mb_h * 16
    probs = list(V._COEFF_PROBS)

    be = _BoolEnc()
    be.literal(1, 0)  # color space
    be.literal(1, 0)  # clamping
    be.bit(128, 1 if seg else 0)
    if seg:
        be.bit(128, 1)  # update map
        be.bit(128, 1)  # update feature data
        be.bit(128, seg["abs"])
        for v in seg["quant"]:
            be.flagged(7, v)
        for v in seg["lf"]:
            be.flagged(6, v)
        for p in seg["tree_probs"]:
            be.bit(128, 1)
            be.literal(8, p)
    be.bit(128, filter_type)
    be.literal(6, filter_level)
    be.literal(3, sharpness)
    if lf_deltas:
        be.bit(128, 1)
        be.bit(128, 1)
        for v in lf_deltas["ref"]:
            be.flagged(6, v)
        for v in lf_deltas["mode"]:
            be.flagged(6, v)
    else:
        be.bit(128, 0)
    be.literal(2, {1: 0, 2: 1, 4: 2, 8: 3}[n_parts])
    be.literal(7, q)
    for d in q_deltas:
        be.flagged(4, d)
    be.bit(128, 1)  # refresh entropy probs
    for i in range(1056):
        be.bit(V._COEFF_UPDATE_PROBS[i], 0)
    be.bit(128, use_skip)
    if use_skip:
        be.literal(8, skip_prob)

    above_sub = [[V._B_DC] * 4 for _ in range(mb_w)]
    for mb_y in range(mb_h):
        left_sub = [V._B_DC] * 4
        for mb_x in range(mb_w):
            mb = mbs[mb_y * mb_w + mb_x]
            if seg:
                be.tree(V._MB_SEGMENT_TREE, seg["tree_probs"], mb["seg"])
            if use_skip:
                be.bit(skip_prob, mb["skip"])
            be.tree(V._KF_YMODE_TREE, V._KF_YMODE_PROB, mb["ymode"])
            if mb["ymode"] == V._B_PRED:
                sub = mb["sub"]
                for i in range(16):
                    a = above_sub[mb_x][i & 3] if i < 4 else sub[i - 4]
                    l = left_sub[i >> 2] if (i & 3) == 0 else sub[i - 1]
                    row = (V._CTX_ROW[a] * 10 + V._CTX_ROW[l]) * 9
                    be.tree(V._BMODE_TREE, V._KF_BMODE_PROB[row:row + 9],
                            sub[i])
                above_sub[mb_x] = sub[12:16]
                left_sub = [sub[3], sub[7], sub[11], sub[15]]
            else:
                imp = V._IMPLIED_SUB[mb["ymode"]]
                above_sub[mb_x] = [imp] * 4
                left_sub = [imp] * 4
            be.tree(V._UV_MODE_TREE, V._KF_UV_MODE_PROB, mb["uv"])
    part0 = be.flush()

    parts = [_BoolEnc() for _ in range(n_parts)]
    above_nz = [[0] * 9 for _ in range(mb_w)]
    for mb_y in range(mb_h):
        left_nz = [0] * 9
        be_t = parts[mb_y % n_parts]
        for mb_x in range(mb_w):
            mb = mbs[mb_y * mb_w + mb_x]
            a_nz = above_nz[mb_x]
            has_y2 = mb["ymode"] != V._B_PRED
            if use_skip and mb["skip"]:
                for i in range(8):
                    a_nz[i] = left_nz[i] = 0
                if has_y2:
                    a_nz[8] = left_nz[8] = 0
                continue
            if has_y2:
                ctx = a_nz[8] + left_nz[8]
                nz = _encode_block_tokens(be_t, probs, 1, ctx, 0,
                                          mb["coeffs"][24])
                a_nz[8] = left_nz[8] = nz
                ptype, first = 0, 1
            else:
                ptype, first = 3, 0
            ynz = [[0] * 4 for _ in range(4)]
            for i in range(16):
                r, c = i >> 2, i & 3
                up = a_nz[c] if r == 0 else ynz[r - 1][c]
                lf = left_nz[r] if c == 0 else ynz[r][c - 1]
                ynz[r][c] = _encode_block_tokens(
                    be_t, probs, ptype, up + lf, first, mb["coeffs"][i])
            for c in range(4):
                a_nz[c] = ynz[3][c]
            for r in range(4):
                left_nz[r] = ynz[r][3]
            for p_i, base in ((0, 16), (1, 20)):
                cnz = [[0] * 2 for _ in range(2)]
                for i in range(4):
                    r, c = i >> 1, i & 1
                    up = a_nz[4 + 2 * p_i + c] if r == 0 else cnz[0][c]
                    lf = left_nz[4 + 2 * p_i + r] if c == 0 else cnz[r][0]
                    cnz[r][c] = _encode_block_tokens(
                        be_t, probs, 2, up + lf, 0, mb["coeffs"][base + i])
                a_nz[4 + 2 * p_i] = cnz[1][0]
                a_nz[4 + 2 * p_i + 1] = cnz[1][1]
                left_nz[4 + 2 * p_i] = cnz[0][1]
                left_nz[4 + 2 * p_i + 1] = cnz[1][1]
    token_bytes = [p.flush() for p in parts]

    tag = (1 << 4) | (len(part0) << 5)  # key frame, version 0, shown
    body = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    body += b"\x9d\x01\x2a" + struct.pack("<HH", width, height) + part0
    for tb in token_bytes[:-1]:
        body += struct.pack("<I", len(tb))[:3]
    return body + b"".join(token_bytes)


def _wrap_webp(body: bytes) -> bytes:
    chunk = body + (b"\x00" if len(body) & 1 else b"")
    riff = b"WEBP" + b"VP8 " + struct.pack("<I", len(body)) + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _rand_mb(rng, seg=0, skip=0, amp=6):
    if rng.random() < 0.5:
        ymode = V._B_PRED
        sub = [int(rng.integers(0, 10)) for _ in range(16)]
    else:
        ymode, sub = int(rng.integers(1, 5)), [0] * 16
    coeffs = []
    for _ in range(25):
        c = [0] * 16
        for _ in range(int(rng.integers(0, 8))):
            c[int(rng.integers(0, 16))] = int(rng.integers(-amp, amp + 1))
        coeffs.append(c)
    if skip:
        coeffs = [[0] * 16 for _ in range(25)]
    return {"seg": seg, "skip": skip, "ymode": ymode, "sub": sub,
            "uv": int(rng.integers(1, 5)), "coeffs": coeffs}


# ---------------------------------------------------------------------------
# Embedded fixtures: streams + the reference decoder's YUV and RGBA
# outputs, captured at generation time (zlib+base64).  These run with
# no codec library present.
# ---------------------------------------------------------------------------

FIXTURES = {
  "real_mixed_32x48_q60": dict(
    stream="eNoBYAGf/lJJRkZYAQAAV0VCUFZQOCBMAQAAsAYAnQEqMAAgAD61UKBMpySjIiVsyOAWiWo7gA1wgQDeD64ArW3ME85ewB0Vf2A9hhwmosLrsy9TbM/aSwAA643/Di5k392x9NOV1+OcZWTEs+DcwhnD+Xkmu0dte4ExHYpwlMyzLwtUzcUzKJ8OH/ngOq8JcRY+jOPBRqbhFugQ2hTfOe8c0M/yb40S1G/56HYoWFcJ8G8l5jtJ+xqKiZmPR7SxY3LuvHtJYVN/J1udwzm+R8wd/wcvvjUM0v8gKr45CEKX1+gFjBmPROcqeO8jCOwwCwkgbDJh765F3OZYD3yiH7P5CpWD6GtZi4GF5V3yL8zzUEssZKx26MP/T6LVjUx7/f82JKjB1W07gYfx2CVkdhnPTF3ev2n4JxedZJ7PZ/EPooef6NGH/z6f/9cGv+PT9zCK1gBzCUMSA57BrgrkQt4HsKAAAAC9KaUq",
    y_shape=(32, 48), y="eNqrq0MF9TAQdjApqc9xef7EuH0dOhMmFcwJNJ1dEldXh0N9ead+xZx1DQXmNhkbMvanrmwvuBvaY2kXg0u9a4BJ6cKunFkWKbOCvaZH7ly7vb88pq6yB5f66Iwiz5WdZ3yrdkX1zZ+SFG0um3SwzjlyNi71286unuqztvJk/5rdmQEVpZo9LaWLF8akReJSvzY5IzG8oez66cfbY+LiZ67Ykx0d3lrjOhmXeofIjanb87I2T6t1L1zTsMz6bmRqp1F0+hlc6s1tXWavb5o2vXJTeW/VusCT/S5ukUUTDD1wqS+7nZ7U59zvXTqxZZFPZv90jdC8ZVo7MpJwqc/sm7c2cHvIzoa47Jg8m5L5hd618dlJfmW41Lfa73CYPlsx3zqwoFjxXG22Vd3keYkpk6fhUl8Rtzz9yJyj/qVlBhPOV3d4bS5Z1JnUbrgTl3rLiQsCaqICVnmtmzUnIjeizNlwbu7U1IZQ7Orr6qY05i+c63x44vUtM13zZm6tXblo7uTozYuasauvrZuwLa9oXUCie3JRtsfByg1ZniXLiq28Pe2xq6+prc4ri+4uKp/WsWx5ctGcFqfVCzusl8+bvktIVFJGRV1bz9zKztHTJyA4Jj4lI6+oqra+pbNn8vQ585evWr95195Dx06fu3z9zoOnL7Crr6whTX0FierLq0fVj6qnhXoAj5/t2A==",
    u_shape=(16, 24), u="eNpraECA+srktubs/Gn1yW09SMIN3clTcgqnxpY05LQ3Ioun9ES3dCzvaqjsK65EFt/S2Fietzx7TmfJjARk8ayq0oWLZ82tmNzRVYcsXro4J6Ylq7qmtLC1CVm8rqCxAyReFzWnAlm8efGMIqA5Vf0TG1DUQ0FtwxACAHRXwEc=",
    v_shape=(16, 24), v="eNpraEAC/Rlp3Y0TQ2u6piQjCzfszGuqqinqSC/tK0QWzsxI7sgp7WsqK+1DUd7XXFnfUJ84aX7XlHZk8aKO2sm1W9LSawtTa5DFi2smzGhfPLFiQvGiWGTx2gk59RUTF7enVLeEI4tPnjF5RkTnhJ6E8omtDUMcAAAil7/u",
    rgba_shape=(32, 48, 4), rgba="eNrt12lQFOYdx/GMnZiM7TiJk1Rn7IS0auIRjCRIghwBVA65REUWZDewLvflrgssLOwBLJes3Pdys6wEMMq5eGARCwFRLEWbarAhNtbUiU2dTsYmtt9u8rIv2plkdvqGF8+r583n+T/P8/s/j0ajQfMjhlar/e8jR40g0J9Pp64QE+GFj9yOxNPxvBj4NtUXziFLSMdYVkak0IXfXW+ntTCGjb9aQ6ypj6O9ZkIzMunoqiQk0Aa3zT/hUpUBbYION4mUA5V1P8r+v/25KNKzqCkqwmPdGkqPC6k8m0v1XDPiagVHlMnYbt+Gk9024mMPc3GsFVmsGzPz/eyWJlE8MYm8upzodDFffT2JMOgNTulKcHnNFRsXb+ziEqzr1+hwddqHyN0X8UurMB4NprOnm9SGCoRpR2jozmfrznW8HyWgubUH76AAnAPXU9WThL/QHfPsJZquDNE9P0x+uwyFKozY/QJOKEqI1+Qhb7Ju/TU5WoLCQkmWiDCIDxPlsJnukX5S60u5tTSNl58tsrwYzNev4BusoKiij8azZVQapUjEewkJ82Htrk088+pz+CT7M3lzDH2mCm97F/xDgynrabWqX5mfTt9vjUx+eZnu86fRd1ayUbSRhtkK0tWJ/OH3N8kx1NA8NsPw5FMixAYC9x4hNzWVLPkxfmHzMjkN+cgqtYhVWXSc/pDhzhZiD+4jOlpAYJivVf1ZedmYxnsstQvFXybFLVnEjsTtxNWGIVcm8MX9vzCz9AlLT2HgEgQeqObIYSligZhT9b2M9pzn6tRHxCbEExQaycEgIXWafMrTZHi6bsZgUFnVn5tdjuu2WMJ8CjCPzhMaE8XANTPvK4REJwkZGz9DbXsh6bladjnKkSQZMUwMI9UrMBun8HvlEHwCxzxDkQqFNOTrcVvrTIpPJHLJXu4tdVnVn5dVzs5XI3B9LYa9O/0xtrUyeGEITWEuLQ3NtDc2kamUM26eIj+6l+r8KwiLtdRND+LjI+GLj76hX32a0G2++Dk6WfInmOyYk7SWmNj++s/w9nrRqn5VrpqULCn3//Yn4iWWmouCKa/R4eLkRGd+P8H2UjIS2unIn2IoaoxrJ+9i75WMe1oOGa3NlHaYeOXnDhzal0BUSiYtg+d5fpM9Z2YWECWKEEn8rXv+LfdXkOpLXosCY1cbFwdH2O+/i9lfDxP3XiSLZx9SnDpAsvcJOjxLKHk3g5SoKtY5B3I4T07pQDsJUjUeu0NI0RXhGS0hRKrALyaRnQf2IdGmWtevU6KokvO625tcHP/M0qcO8YElO83NKux/+gwnJALctuwi4j0BbaHRGIVRvPH8S3x654/ICjKIkEbguH0Lhao09G2FNPU0cixYTFJYImpjE9L+ZqvnT2JOAgHiUPp6rxMv0nBnboqBdi0P57qI2LsJrfQYBSnH8Vv3HJd1Urg+S7VMRmlJHm5ejkyMnSZNEU7LSD7FVcdR7o/GoGrk2Xe2cuKz31i5f6nZYr+V6vqTDHS0c8hrD2m5afgKA/Dz3YP57Fnc9nhzfmSQ0YYcpmvVaN09qDwiRuLvhzwzhc1eb/OCwwvUDMmIS/Wky9LjIkVaQuryWCPztJr/u7kctYamujr06hx0kjjOtZpoMfbylqsX89c/pqaqlVtfWjJm4io9hmrC7XZQK0hiqriTW8MXyNZmUHF5EN1YO+VDGqpaVYj2J3L+3G2Kz/UiaMmyml+tVqNTaTDqa7nTP4c+pIyyMANXTXcJdzmK4kAY3s5uuMfrCMrsIP5oCYd3RPLQ/Hdqo2uY+/ACcXEx/DJoP/66AurMoyTLlbhuduGgUyDuu/dg6/yO1fwqlQqdUsvJ41p0IhUVkS3I3AoxKc0UiwupTJDRVddASpXlXTG8RF/3bZIOFJEXaWCoapxa1Qmcd71L46UJigbHySzr5M0dnlw8NcyIwYiproXZyzOsWLGClStXsmrVKlavXs3atWtZv349NjY2bNiwAVtbW+zs7HBwcMDR0REPDw88PT3x9fUlICAAgUBAeHg4YrHY8iaJJikpCZnl/imVSrQqtSU7cinN0VOja6ShsI22ChPGOiN9LW18YDTR1X+BU8MTmEemmBidtWTrAjeuLLBw7RoLN28wv3iX+aXPWfz8Iff//IjHD7/iH399zLdfP+Gf3/zLav7MzMzv9+C7vSgoKECv11Nm+afU19fT1NRER0cHpi4TZ86cYWBggNHRUcbGxpicnGR6Zoq5G1e/99++/TGLi4vcu3ePBw8e8OiRZQ2PH/PkyROefvvUav6MjIwf7p+etvgt9V+Yt/hv/1/8CoWC7OzsH+6fm7P4F5b9y/5l/7J/2b/sX/Yv+5f9/+H/N7t35xU=",
  ),
  "real_noise_17x23_q30": dict(
    stream="eNoBWgGl/lJJRkZSAQAAV0VCUFZQOCBGAQAAEAgAnQEqFwARAD8RdLNSrCakorAYCAGAIglsAJ0ygxg5IdtAfzP9gMsA/QDrPfTYZ4GEgcsF7ME5jNg8hBFEmbGZEtf9kvH8MAD49Bkw/UHOQvxYen5pjpMGb/tqjTDwr04y0+SVkKntfUxeVjkAZfKdktUaMAkCflUw0X7VaRyW+xgVfpxeJAAiibkLTwVcR2LCqtJPFTuu8FN0DEYU61SMTtGMlRYuGpwa8SSIkQBzAnI+rhWONFzXaWoz3GRaMBxsUC68+Qi4QKGubuIb3QnQ5ZjHl5HrWxl1uaj6wQzmUx9bxMhyIGui71C3/52WDcfOoYj7r/bZvAehrOUn6F5yBlPzI7Ln+cZW6UWnbcvWuDaRgr+EAa46A4VRwd6WAxjgWRnPSC9cBul8xfp5R91Z+T/g6RQde1LwDZ7+uQsFrJAAAADW0Jws",
    y_shape=(17, 23), y="eNoBhwF4/rKQiZ/Nrn+DpmKAw7C2Zo1yLI6Em5qNqY5FmFxseJJsozFfoYNe5mubf5pwe3StoEp9kUCDfUxkZoiPljRBjqFOnGWsS7u8lV5sz62WR6y9m1WOV29sfFNLj2Fdgs1rilJna6CGp2FXloiwXLRKZoyga3qWkSaiWnlUT6JSgVx0MoaYOM2djLi8lLJNaYZEd2p3ppOFnWQ5bFVuo5QxWzTWmpKlcpqSa45bfHNpdEt0KXltvnFsoZJeqJtkXJ27nl5DVHG+v0pFTbxRo6q0g4B0pG3MlGwajXKzr3ixmsSZtajVP4gzj1DIXVXLaE+Thn5ao2JDfM61wZxTlqdYt4xqi7xxbVWYTlrZnY+gkpY1uaKvU4GTWVefkUCOn1uS1Wqqtea+TJa2nT2QV2SYQuOxt8WBlnWAjFZrqWaFfGxUxV6FpHCblWpSmJWYanY2QjO2fYtLfzCbVX3EYGVLbbEzga7GbcuMYJm7mVuon6KllWmawGyUrIJZnEhNs1hUcbZRxLVbv2RLbsbb",
    u_shape=(9, 12), u="eNoBbACT/3mJX6CtmGeRgFmsXouQiV2YnHWUgolkkk+pcJh5oomYh6FhopJ/aYdkp5ibjJOlhZVlYYuTfD5zVXq1zp+kj25UnI9mZWmTW4FqZHKzin1icH2cmEuOrZWmeZ2Ghotcu6FToIGPolWvh5KCjehCOB4=",
    v_shape=(9, 12), v="eNprmdyWEplk15c716+uBcie6DZ3cnlr72wQ27eusXDCspwmEHt2YcGh4ozmioUzNqQVVLZP6O0vD26sbc+c0F5ZsLKrqqmsqqAfxG7KTitrm1BxCKSmvHdCfW1FUe7S9IbOfr91cwFbxTYA",
    rgba_shape=(17, 23, 4), rgba="eNoNlPtPE4YChU1usizZftzNrvGHLXoxm87gdMYNlXFhGy+lVJRXi11BLAJWLC0tIEWF1gKF0mJLW6SFYkHeRaDVUR6DAdYpOh/XqROybMb5mMu927ItWfat/8F3vpNz5oLDeJpNeKtbmXGe4+lDH+MzNvLqPewzX0M1Af+W+xCYJ7E8e4LkRQea515EhxS0GQaQllfwzw2vMtScifV0HoqRGxz036LSo+KSbwi30Up65G4umj3IMnZSoBAi0uso9s4SW+pDO/YLq7ZLeaOsDNmSlaxOOeKMIngB4qNKWvts2LRZDLtrSa2sJ73BQfHxXCZH5hlzXUS0VYxd3oK3ycm2ne9Q0FaIxFJKdFwBeyVneVvdjrBrCH27kV57M7GrY0jcmIHxjBv3UC+pH3+Ez+UgPz+Nz/x9iD6IZ2l+mjufLzFqmEAZX0W5tJIH336N/WoblSN6tsWlcC6wjPX+X6h9V8lOSmekxoos7igVuWaOyCqpDrOKYw+RHrUHt7WEIznRqBKKaTDF8OSbzziV0cR5zRSijwXkHhaxW62kPOgn3WPi1BezROebiRPqcNsuYNG58PtX2J9WTSjsVrQ1G2O8meHj/XQPn0ZStpsTpU48XhFdNiVbXn6fL2xL5AuTUFcX8q4ojzXiXMrnPURI91BSewGh0Ir8mIP1axNo0vo5bw6xY108P137nbmGO3i1AYKhKQK3ZmixBZm7NM2+D/dwIquMruONJO94E1X1AZLUR8nWaxkct9DuMFClC2DufIwg9wzbIsS0J7jQbQo7zDXi6V+k0T7LmnVpCPeeIiIihZVHcKF5kaHTPq64+2mWZRNsK6PToSJVXYimoxVJRhxGjZLCYzb2HT5DXoWOlGgBI6kmRKu2Uac4waeKEgJfPUSiCHcp9eFx/UxN6w1qo2u455jnsqWJhvStmOLXsujUEri+SO1ogERpEVuiE4lNy0GmySf0tZF7N+uQbX+b3MgNZH+ymptXz7I/KZoh7xzDPX/RNw5Z+j/oyx/FIW7hS1c3JsleWLzEZGMVOaUyVq15Da3TjkytwT+zgH+ql+O125lbOMrAuRK++8rLhDuHh1MnCPWb+P/yM7ZsUqHSPWHVO/V4Ti6REVXN8hXIT6lAFvspj27fZ68yk83ijTg8BVjrD2MobyZLoOD8wCAZsmQ2J7xOjS4Z7nTx45iBJyEPQx1WkhPlmJ2zdAbC3e+uZXrifxjrJzl0sAGTsZP5KwtIwzvL0yQgSd3AuM1Ixs5ccpKrefQYbP3daLtL6BwvxW/JZ9YiZ8fGfzAXGqd9YIaBiesk7n8fjd5G49kukkUCEkXR2MMMjR4lO3b9C3dTAxPWEPI4A911QZ4v/8nBw6V4J3vou23jGfPcut6BIH495m49vdc+Rz+4wOooKTr7MIniKLKLEmjz1vJe7Fq+Z4Xx2V6WA35+m/wOe9EVegyP0RbZ0GtNNDY7SUoXIFGl0DvVhKQ4iVMmDfLTFaSrjrE9U0rw7q8kZ7bQYItidExJVfFB+px+WlrnUYhaMbx1hAeaRboNK7TYHyAtLEepriIyIpnYzZm8tzaSy9OTVJysps7SQsJ/hNRV1bBp/Sv0dLgQfNSCzhDD/budFGbvoUikZteuGkpFo/zo/IGcl4RYjgXxXXjKwt2nSEvKeHDnOe26XkpSKhm2BAnN3aPN7SNtv5zAYIDZ8BdedjmZdvyAo3WUQwWFuPo0zP93BFGxOZzlJmPhH7ZUOFDEqLnYfJ2tMSVECiQEFs6RvS+GAzEVnMzp58bYMolJBxhceUFP6DbqhDTwLdHwSS1/A5Rq8R8=",
  ),
  "real_grad_16x16_q95": dict(
    stream="eNoL8nRzs2FgYAh3dQoIC7BQMACyLzAyzGXUEmAQYGBo4FBdwmDEwLRBSYGB4d//fztqFVPO5Vzaf0n8h8j/u/MOSQcA1QMARDcVDA==",
    y_shape=(16, 16), y="eNoTkNe18YpML2udsmjj/nN3XguMMD4AzRN9gQ==",
    u_shape=(8, 8), u="eNpraKAMAAAQfCAB",
    v_shape=(8, 8), v="eNpraKAMAAAQfCAB",
    rgba_shape=(16, 16, 4), rgba="eNrty+EUQCEMgNEpTCGFFFIIIYYpxDCEKaSQQgopfJ2H8c7Z/X9FBFWllEKtldYavXfGGJgZc07cnYhgrcXem3MO914+kj9//t/+B9v2fZ8=",
  ),
  "synth_knobs_64x48": dict(
    stream="eNoBjARz+1JJRkaEBAAAV0VCUFZQOCB4BAAAkAcAnQEqQAAwADoxGYYiIlIVrQdK4uFEMJQCAAoQ+bxprk+XFpur+WnDDTuEqk5N5dz3n7+iVcZJuAJG5V9rDzMnu0VmSKgBAAoCAHMAAMmXF/5s9/0rBu/x4H8qUHqUp/nJ+oP8Euv8uI/ypQK1/o/lIrl/fb3MBfsDRP81VaqO31In77bf/kGf3iAtf5fHvEY/e//E4l/5vCAQt3+EKKfz/8C6EF8zJf/wyofP5O6f/z/8HL/inzpwoWb/wvq/8J38/TH9P+Sacev9ZR3Tf/KUxn/znf5mGP7pf/mkLF3+CVf8aQCZoyH8vfDQcd/Z+C7+bcf4OLteHCZ5ZvpzU/5YZu/T+f+1oG5u3wNH/e/4FjfbFHweBeRRuz/x3LBZVFbiQv8m0m/32yInggIGP+bNf62r/n/+d5/eiiv/O/4SaFzz9pQe/3gMGfqMgBA/su/7JkAxPxAf4Tv9EyAA9/z/6OCgt/0OTP6Qn/lKACL/md3EACv7f9EJ/5zsfkFqtgxQGiqnITIps/N+NCXGBJc7xHz88Bvty7nY/bQylr/b+E/Y+r9JfwCM9eBIaCr+uAcF/bwu5hwAFrOV8mb59//idg9f+iUAAaoU3/seM/aE/5gP8G0D2qf5ndfCX/js/2Gb/zo/WUcP5up/lKgHX5+v/0OLLgDJCwtqp668hM2MSSCAk/ADhu4BePvmusbUfvgt/8qNL7USH55+3mL5RiTAzRBP7njcYL0+Ofnvnfd6byQch+fCPg8a3Z+w176G09/AFmMEpf8zuf/E79yYakBw/nBn8X3/6l/Pn5oL9xOFbj/md+bA/8Eou/nQv86FSDf3P/vBbuDRf3cF20Mo0+1/2vD+9/+CdP+Q21/E7mfzN3cg/ypQKpn3/ipU+eqp/Qy/yzOiUsv51w9/p/x/5bP+J3AtGn8nf1/4/7eo//JKAqP2ZjAz+9sieP4NoCn9nAKa2q1f+Tpd4bRyABo/UQ9383XzbGfu/K5//P/pf/x53+f9i3+WkX5UxZ/vK0/39z2nz9OeaP9//jQj/53lopP8KQGoKuv/fERj+EUj0/9Q/k7s8f75RL8Ic9v8JD+3ryC6389vj26j+vX1of+oD796N/80APcb/dZR/9P+5MgDMD9n/s4BbMygMf8/+TvJ3H/ioWYf+bMEtAR/YhkR/Wf/Jv+6/i/+b1D3Q/bd/5bYap/neS3y/Ruv4nfLdf3jNP5z40hv3qj/NYJ/P/2Kf5lJPeY2/l3b+buSrf5mePZ25/zglwuSf5yH/l1V28b0s5kZ+X29/uA/xa8ZSNf8tn/NEMLjf/8dn/K/P5zv+BaA3+YD/ODP5zv+f/YlF3r/9CAkEMv81netV328Ezj8ogB+BH9ogelVf9j7lUVO76EorfxCq7zVC3v4i1AFQKQ7x2e10gZr11nO7PRSwGYPoC9/1aw8fI1NfLiJEAK8eJwAtxwL/gJwFR/NQH/w0fx9HUglswgAUP8r8JsRb/xhfM/8qHmbNRY/m4X/YiBhr+FwEafAAAAAADKFgwc=",
    y_shape=(48, 64), y="eNqV1XlQU3cCwPE39ai6au06rTvsTqtdEd0qKCteqIChBBMIRyAhByEJBBKSQC6SkEASyJ28HJBAIEEQBIlyioAgEOUSAS88Kl4VD9Z2dWt3nA6uTudtcPafTbuzk+/Me+/3z+e93+/NOxSK/0qg8JzcL6lhWUECLnCeCxM1dJx2EAgEPDGzplFowqhsdjXNIBAUFVkQdJFELlf4tK2wp19hlmgM+lu3RTDu/Oz8kzv35ubmWh91zz94//w5xWknUQ0GgX7f6Swss0Di6x9b0Ak6iVml+o8fvTHd9/LlyzcLP0Dzj5+/f1CkBkGi17sQg3w8lcr04WYzIvO6mVUjUX+YP4Itkgiz7Ha7zaxBxZgwJgZZ7lRk5XF1dZ1yq5KTSfPxxSIQLBqIjx+QKT05SExCXGxKDHH3rhM0KScrUsWXMloL0oySKc772ct8tEFAy/bxBpDHq6pis12lnRs9XG8J8FP1B7WsAh7um+wkAVpikKvrOgbBZ+fadcVSXjbDx4sllZX5+S4X27Ox0wQ6HI6J6+wC6+NyXU6FXSulO5Wmvuue57aTA3qnq8bwa6/W8pW2+IGBZKynVHCmr6u3u6bTOXplNKetbmpufPrMOen4426I2+4muBqvaGTYfN/7j2JwZAabTas100PqRhOkuTXYQllhqY56OrqUbrXSgaNzMff7mtx4a/+oUJ/kyxXdBtRmm1rtUMKQztSWvDHPw66rt6dHhkauTN3un5npV8xNV9ZONnceJz7Jw8l4Vl+/GWXo9nrbYZM9EeP13Tfd4zPTI4MPe54M9s3MtDbcaG3k3e9zPE3qChMkayy+61dz6CidxaLr4sShaicTssVOnI4tLtVycUZGjtVK3vVVZYm6ZXK4qyEaZks/hvfxUq4gi7Xo3fr4LRc7DYLsFFo6XQvniFF8Nz2DKWDsj288V1F89kYTNjwWU6D4lWexWKC3T2PKJ4oCkbNPJq9/d/XdwAsIgu6NffvgxzRtQQhb6E7jIQFgaxgs9X95XJZAY5IcfwU9ffTLPHQLuvZi1A5Bd4dvo74msXmVScxoAPjok69CFp95vbxUU+J9dRU6mZDLErJAW3mZRUCJJj8dWvYpAGwAwoDVHwNAgHe4Ka/XEMnhhBoai4M2rACA37VhMJZqtVxqGVS4e20yLi2p+OXnVeasdC6VPuxWsyJiYyOWB2JySEFB2Rwkkn3i+wsFkIY629ojOW4K18EY1dUMVxk/uVkwaNXatLkrsXkRtYaCdUxvFpWQeeCPE8DhLjPACAriikNCFL3f39TdujvWD102oQAgmVLNYICGIiba6/U8tgSkWCXb6ajGByZvtHyZTgCYtzN2rlnv9YxtUum2jGbpAZgWZL/u964Gtr8A09aWJSus7NEPFjcfpYHlUIdSf0cW3W61lllDkfnmIDI5CKCDyEUfQU2P4g9YvmndBX9bwSdmHMADgJhhJihzbxYBjgKZvsoKgma1A9SD4On7pYlms1mHCw7GHWSil4QBFCAxNTm56901FZoBOI2QYRMC+UU4qXccq0qeOk+brOhiiUR5TDabtbj2HUQSzTvOz8XjWV/sS0SnsQSZWCQpqe3nSXmj2VN2/ocUGmIJLWQcG3vFXXGVnURehhKVlhYKxWKR0Bs/t9Yj9haLx8duDYFjiHm89BQSEtfzy4z25uCriZn3yalrSAFF6lJ0Va1k2jalWccn0LKIJCwWkxCPSBVtgiXgyWTCkt3BS8R/3gD7hAIE4ZMQ6IGF6ZKWsc9eGSHj1rWrafliK6NIRXM9hd5EqbBEHIG6pp2fFA/fcxOoW0VIT89A/4URKd8SIF2dFr4avhWlqnt8x3ppRPcCas8G8TRyRlmenRscTq8e0fwJJJFINGH5VrReqyyZ+sxJ5pLJeYSdDERMbGwMPJ0b8Hu2cGNsBXd7Rwd3srwaDwQBwPZFX6mAr90LLF9LIVJYgpmNHI0OtEjWouw0oZCRspMRvjc7O/Lg4bINOcGBieLx+txM7l+N5x8JVyxhswG5k6Ps9NRkPhV8BKBJOaxdIrYhCp5IJYfBnnFzc/PxOxlRERkZR7Z9rAGy02OCUxtk+2tqSL2PNEDk/pUrww6K89zNzuPu6h0rVlE2fXkwNiIesz6UJAs8jKMlLQ/XhKoi4DHJyfCvd+zYcWbfysPqq/XY0zWiN1Avmb5+6dI/8F2yphwKhZMb/jnihKJiePLS7Uf9l+79bWr46rwJmh2Jg8lhh+LiYsLDwsLwW8KKRt5+Z38NTRRC0KwtEYFIre/IFZ0bGjp36Mv4Lugd9K83C94vBbTwz7cQ9ONPEOTZLYch4+PijkZHRR0KC04svfz2uXNIq/4ZmpE2YhITCR0n4ZFClUoYDnx1aP7i0PT1aw/noX+MNbx/MnEBmqqYQ0UoQ+Pi4pAIBALpPcY577dnVfZR2S++VRM3BgQEOnlMI4z4LGJnKEoZ3tKwcPZDnYu7jrO/kcX7T1rcHI7yD3uc8ZhGplhnB1DDf+91geVn/08On5THjLjOTU5b1cUW0+tynthfb2Tyjh3xIESm3ukFl/pC8yk/fW/DqcvpU3aP8Yz07k/e/L1+tcbUsqpJfrfapbowMzU11u+n56ZnKQFzTO98m4tbX1/f1O6nT4mEU4Hypeyepnl9VVVVvb++ZLsxaw2wdBnN1n1m6BXb4e/642y68twjCZl7ace6LY08k78+qp1dXy+xFiZ5TyDBlLL89XgRv0coo+7J9J7Avsce4bevd6rR2QRuLchzmfkSht/e1cUq3mxAiGjIQqx7t8FfTzk+iDEcyPwwf82+TpK/nt3akJjWCMAF1Fi2pIQp9df/G1hMXWs=",
    u_shape=(24, 32), u="eNprbISAzWUWG3dl5Bzae2pz2yEguLBly4VbC5a9hEo3FmyWWFqtod2wvjJ/RgMQtFVVtdn1r22Dyees7m9+11tzZPLKTSuPAMG+U6f2zd1x7SlMvsTgv3aXndeyzjmb9i8DghlbtsyIf/wyFyYfEaT9v6CsrqV9XlbTuvz8dcsOzdq2+Pm63TD5rfNF5i6YVFcQGzCh2SchwSdettqSIT+cAybvuTxsb0HdpAVHpq2qWXLx4pKJl0t3HAvN3QOTX/bFQbulrqwgpiGhJS01NS0vuCpubuSkthogWL+h5/f/yWf///j/YHv////924HA5k5t8pwPH+a0A0FFkes6nf99Rn37Flw4tGnToQtAsKopanevpWUvSL690n7e3/9mrvp39hVm+vpmFgJBzpQ90Xc7O++CzL+yv+bq/3PtTmf/n+0punSpqAcIblnN3KxWVaUGclvuuspd+/7Pcr53ov7Zgfv/93x58+BGNxCUf0vfDJK/3b7AJ/msJIPa0hhde+MwSXl1Y2uQvOjSTD2QfFbE+b0fPuaVPjzd9PL/gw/Xbj9+/x0k/z9s4n+Q/JyDad0X72qG1Z5uar0YExczubu+HCS/m2VywzwgyP40PaoRB/ABgo6rVeW45OcCwYa1QfNxydcCwdkJpnsa8YBds3vy8Mm3/hdahE/++Yp6R3zy//9oS+KSAwDEkKPL",
    v_shape=(24, 32), v="eNprbISA4j3rAroaZvS3L66evnH69I13/l9p2QgEUOlG40w7BtvkvY/O/9/yddGDB4seTdszZxEQwOQ9Z89wuj07TU1H3FTBT0DAz4Y7ItgPCGDyUy9v8SpKzIsr1p7oGZqXF8oQHegUCgQw+ehQhs6Ovrae3inzlszoSVkRPvXC0y+dj8/D5P/n333c0tHU1lQU493S1tcoPvd064y54Vtg8sfVJs9aIn8nLCqrcWKWToWXjE9aVCFDsSFMvqqYdfkCiRsB/h72FmFqi5QTGBjqRBgYxGDyYbYMFbUM94NNAzVdGWO8zBnqJHM8pKU9YPL1SxmOLbFebpeu2uw4j89OplbOksHIwMAIJr+82HXXGc6vhiZlEtGMDLIexxgYrET8/ERg8jkVDEsmaT+tKwitSQg7HxjDMNfClyElhSHn8YxusPvSGZZPttgRqymvp5LpUBXI5+yrpm7J4Fl6bl0TSL69mHXLLLXTYdml6YVJlsVeyQwMuUkMOlpN686WwuSXcT/1LqrJqwjXy7BnyEpjkMlgCOme8TgHZv5ahh/O1ob2pv5qCeYh8qI2/byJuWfm7Pfur3M1qcABXGf878iZsuYqLvmwjj8z8ckfXXzMBZ/5VRuOTpw6xdYGl/zyhk+6nZ2pqbjkgwN/RFZWzp2HSz6lu9M1N+/oMVzyAG6LVZk=",
    rgba_shape=(48, 64, 4), rgba="eNrVmmdUVuf27R/j8aR4PEmMGpNo7CUaExv2hgUVFEVRUFABKVKkdxCkdxBBinQRBQGVpggoomBBxa7YS+wmmmgSc/4af3eB3vPlfvv74Q4ZY469fd/97r3Xetaaa869DQ4IJvh/CSeneFy9T3O2Ep5F7SGqveKY9SccydFlhkc8JumviPQD86mbWao/j97dlRzYROJyNwy6JRGj/5LKSDi5AW4GQIM9rJjYiJFWPk7TvQkdFUBG71ry+t7jrBOcXgtp2q+oWwFJnS9yfzwwVjBY8LlAHYfvX3Dlu8ekTZdj9KBqAtzWhfUfb6JiWCGHph6kcdIjTo6W6w7lfx17C7yCN6D6LsDKq4SfCi7zckceW8PaE5s/nOFpG9HIvcOq+Lv4R+/hwm97efhbEhmuQ3Du350C7QI4KvdcIzgsqBAUCxoFzYImQYNA8sJuQYTg4Nv9q4JaQbnkrd15mCT7Y57xTG3l3r+KeKpznz1mkKD7mENL/wd3FcHLgL/YNiybtJ4ZlA4/yd5RcrrR7xa/XUwwBTxHuyKfEXrBjNGbx7KaDvTdr2h7OQt1qJE+ZYXolHqxC19usIhiL0VKD8XtsVZQJvcdJZD1J0TgJYGfke1ZgdQU+9/GevJtTkoFhYI9gjuCasHwIphQxq9Ghdw1y6W6jy33jPM5aFtJplEMzdGhrB3cD7Y0s1NnCwnf5ZA+bCfpIzazdXL+O8XvuSmGSQe8UU7TGW2dy/77YLR/Au13fESHJwWoqlIm5FUzzMaIMa4f8OVwqf9XHpSbdGXdtxPZMyGNPbP30qBdRfOUBPYOt+GEfzrH/PJ5YlnPI4tj1LhXU+hcRGBfG0I6mdJsVU7UD66UeZcTOzearUODqF2aT0FSHQF+WYRp+5E+P5ZI42QyAhKp2urIyapwklzj2ebXTJr1fUIWnMVtVgGec7PeKX7raA+GbjJmbnkkkeHHiLOu4uTBwwxaMhrlqoffLcg0lDKf+5Kn5bdwNZ/JjLlfM37FTDobRtLGIAdlGMjHq0JRSzz41Fn6SdMGNcEWq/2/08+lHO3gK2h4X+RTz6OoRVkM2PyEnpGXmRr2E+NtjxMldTIq6DLKvZYBO14xa+0DaqSGZjue535Le/0H8h/8zow1NfTU24OJ1JuW8IyG8WtGLX+3+g9ICsWi0B2D4OVsWO7LNY/DnHe7i5dRHsOiLXHdvZPqBa/AU0pUjeDk8UqWBC1iVKwH/0qsR228IPcdKLmyo8evz+l285XEuJ7B+b+gkhtR2ZfpEnUXZXcKZbEHlXgD5XMYlf5U/n2UngnP6FrxN6rkd6k16C19YiIUGCj9MyMbtkr87jd/w/bcEyZnvmC4cMjQQOjvAV1X/803Li/eKX4fLxf8/ayoSrLnaYAOZ6csZv+Qn5GWwLHejR/SenKw8RbffDyMouOhuJeMxrlkHM7VbhhXNGFQ+oCMR3+z4bVQd1YOH2bvwyb1V049gVnbhMq3vqSLzxEWFf+FwbY/mb3xPuOjL9HH4yBLS/+mz9ZrqNNX6S9xrha43gT5GXOEIwwkD06Pf2PKriCWHChj6Xbpzc2y9jEwSNajm+9Weob7vVP8UeFrSYi2Z53TCA75fk5z6ALMByVSJzWZfmMv3zh8y1iz2ey5uAubnDEYJnUkr3klRZc2kHHkPHmHn7HjwBWCttfidOExZhVXOCMcf0/mQams5Ui7A0TuhaBtTzlwCa49h13Cg5USZ4rwv99FyduuanQkZmFBMoQPX8p2sf0hUmQ/afcldFbMY31eDeG5MmKOgJsjOEuyNBcGYOTp9E7xe0e4MmRFV2aFfcOS2A4sKOxO/zOaDD8Zi0Pafwj2+oOo0BySN3hiazeJAYMV+UXBnDq3n9kzF7HWIwEnUx/y0/aiOyeINY55ZDqEk2XlS7ZzBlleNdhrb2NfjvSvxjzWhvuj7W6Cf8ZWNgVewMKgGtVmDGpxMrfuwtJussiSL6IF9m9wtGMETwzvcD0F7m6CAxrwy8xXZH22hdM6Z98p/tBAX+rrthK8cRU9rLqidBXDH7VhYu1I1jn8QYOt6BXncmaNGsHiiZMpTU3DWGcO+3buxNfKltuNTVyplyF/9wlNJcd4euoe/7l6gV/PHOFe/QluVTXzc9Uz/jz6G7+cqefxwyoqzm/k4qMT/N30gjO7nqKTXNwqCW6IXrjoJuLBWnbipaGsZXA6XxFBtY0TXd1atUPqlIfkd8/k4dQibo9IhEUl7xT/ltUJ+Csttvzbh8SQ7ZQez6Bmc1vO+nzM8zlbeGHwnKVd7UkL3cWW2HIMNI1YMlef6rIiPOyMuHa6gsMHN3D30Q6K9vlQf3sbh59eY/fDe+TeucjWK/v4+c8GmurD4a9qzjat4/ixKB4+yOfpnXyyGkOYflfmu4iC0kYDHmcspnnaUhF9Evf2CM4mjYSny4iZpvilYDNa32jg6bGcZQs+ocnv3zwLUO8U/277JBhfwsMB+dgsyWO87hwurvlCyKg7LMjkmU4Tj9N/wd0ikZGzzRmvvZyalBKeH73E3NkzMLJdin2gNfE7Apls04fVm6zR8vVDJzKN+RkJrMj1ZUXQDHRWDsA70wdDJxNWWSxjY3IAkZut6BfST7SHQi1X+O3VZFPIjxxxMOdJRhJ3rqVy4rYtx04NY/feAYyS2uy98EPsagwZ46vYvqeXzON3iz97tSMXZ8xkn74xQ1yj6RcZQnr8DM6sXcQlq0McN77MnYQG1kdFyAybjdIQpi7+CdZdIjSqFK3AAkbb7aC/wXqmOPgzeaUzi8yzCAipZeJkXaydXbH0j6H7Ii/6RDVieQB0TE4ze1EZY7w30j09BiXzVzloo8wDCd11i11HDrEuJ5VlkVmkHf6ZJuHK4P1VqIT+KG/FP23a03/1CEYlrmXsppx3ij/B1Z4dRprELF/CYL9yPospwrTEkvDsxRT7Z3LAqYTRSjFVcwhDm+IIfn2ReoNYXEQLaGhZs/mtpE17IHPr1zdyf5+kRxQDVcdP8lC2z9/K4by3ErlM5topiSlH9hNbLE+cDe3rS1CbDqHmrOaLFHeGpHvhVX+D3svyGOsjM9Ja8q8tdaInWCxYNELWwxcVvOOd4g/yDCHAPAx741KktOntfZOvz61C43wPUrK/40igFlGTxmOy0oSPih0ZsStEfFwUZ+e7kVCeLbz1JydomdkPJBfPW21QIfc40moJbnCsZaaJ+C/kEQZijMY1buT//omyZzFVhCPaaO1I6YMPUbunoeqXykw0w7ImnO4rdWmzIRsVtBKlL3EbCWYKdDqjVohGXT2H4MDA/yJxfQKx0TEErQ0gNDiEqLA4QvyTCPbNwN1B1m9NKsH+ccSEbSLQrQxnmwZWWFxFd8XvzLeGr30foG6t59NHxoQWLWF/mDtV3rswd6xAxWegVrqQoSGrKHVcceYcSvywGiH4VtCxI2rIRNn/BGU6HtVHPhvaFvW9bPsLZHaqcQL1FpMESxUfFk7EULLR7rK91ILU+Ckz1H7D1llkUmTHmJ9ELzaKF3EfgLL6GjVXAzVxOGp0J9HaHancXcLCBTqt2JAYS052KpERgQQF+uDnFcWGiCM0it8KdjlGmWjvg1W32Rh9nsCVYCn+euI8+HSW2LC4P1vHrtI15iPRJebrYNUUMBMKnileVAULfOSAeIHkymPtT3wdsQVlORdlKz2sd0bu5xmqQ77o/80o33WijyNRGeIJDE3lO1O6+RQyyn+XxB0laycQLfGZnMxZOsf7EfSJaySs5R7OutEr4kexh0cxvn6Gqb/JZ6UvZW1kK8WlLA/yaY14BhsbrK0sycnKaEXLfm5ONilJibi5OKE724iSvNu4W+2mUfRUctRBosMT2BjXQLQdLJ8t51IZdNO/zI+ezdJb6SjRIUp8q558/5nKwUNTtPjiN/F/4C5W3wDOTQNj21d0XnsetVD84/f2ePzUci5ZK/HyhtIUw1o0fZdRqA1nUdOTZL2S6Br2M9+uk88ni7eeJdhzjB/IZQ23SP9D8pz2FCv+YKWYaBfqcHlyWDoE+Qw+lJpTvidQvV2kxpajPBNQoXHkZORjbeHYivWxKayLTsLfJxS7Vc7M1zGkpLgKd2d/Gg81EbvOB9c1I7F30mWNbSMxgT+xYNV8olJTCVom5+8kHJTdgApZxa7i9XCimQb7A6zz/5MxQnZTMyFg0jmSZ1xl7lrRtxniRwIeStwm9CuR348rYqj1c1RfqYHPHFCdPZmxXP795U7UWEG8eJ1xpbRPlWO3CGYk8m/PJGxOnKFLvtS4zUxUwDe0O+eIuiB+qagYSbvo49OoUdIvEwQGguDuUnMTaFuQwkJdEyrLGlqxcrkjgWti8fUIJzNlGwf2HRE+iKKxsYaAQFtKKv2ZLjxi4diN9RElpEe3MNUrmgqPsnUh+Iu2tpFPvqydj+kU8frpM7jnbkphaAFahS+ZI/pT94NQHL/NYKTUy7Cdr1E/eNPJpUjuaaPUuPSC6skIt1ym54vXM8hFy1zWv3e09JWg4JLUruQmQjgv4ph45nTMHCrZcUy843E5R+xU8ULSU859UTH2WMi9fNQs5ymRXtnUTWalxO4vyBYeGPxP4ZWh+LiHYW3uTmJcDkv0LQgPTMTGwoOfrv8qdRDZyjVZ6Rl4eFgTGK5PbPZAsovnk7yugAyvh5RZiidZAQlS4zKq0agLRLvhW6rXd+a5u2ihpAlwq5aeecKNS+5xXR8eLn6ISV41XzakoCKXoBYIH89WdAzoJfcu91cwXbhiyht+tBKeHivbSlnTWbJNXoZaLxwXsoKO1gbcLKxunQdmMj/UTZmDWaIJKpJaf9Ppbhnq6F+tnNC7bhNKS37vPkRqX645w0vO3YCx4UoO1h7l3Kkr6M83IiIkDl3tRVy+cIsjdZexWBrDJZHU6Rt2s29fGas9++EdMA1vh2y85j0lbLhw41DhOunzSRav+SRrAX1zFZGOigMLFWv/ofAQza88r9NeOEFSw9Vex9BzX8unmw35MGc6/wz7gYFuwxkVI/WrI/e4WmaAV2+Za4NkrSah9hmhasxRm/WEE2XGhQqHx+nw5arp1JTVtsbvzkXh+WTUH/9BNV9ivszNb86l0E++W9nCiT4OdA9ZjbLQlbx+jsrdjrIP4tyZ0+gv0GOa5mSuXr5EWckO0jemcv3qZewto5g7ppgVMy5IHRiiPSEIb09nQoOiCHV6gJdIbUddwXywWwJTfOTau+P5oGY6vuGdqLD8nsIFMdjoXWeq9HdwPZweDE8GPiJiVR4LY7z4Ytlg+jgupqdFKh1mC+/38pe5Z0WHpVP4zEPmYKgh38d44i16xUzfnC/kQm1DLVCr5tHOfQ0L7r55jLjrdSXGxfp4SD/OEROcLp+Z8pgx4owdRWUo/xF0s5N16KpoE6Mp/S95ft6PwJhAIoP8sdWcxX7hv92ZWYR4unGz+RwZ8WVcPQRRzq/5QHngZtbIkgXSV8ZBrNS+iP5YmCXlPV485aQxwvcGt6QHw4WnxjLRUBGk2Y2Mhef5uIXXpT7aTxXd1ukuDcKTbprbmbQ0FtW2PWqKsegA6VuVjZaDrFXHPFSPyaJXFgunjmfaskI6qjFMVqaMN0jj82WxfLg4WHRvDn0kTm/BzhclOEptrLq8FxsRkGqQrmgj2f4+Tr7fw7DaeNSYCW+0RIuOOCA1dl1hGuLFprgNVE9cxfW5flStDmPN4pWUpQpZPfnPf/XW+O/CifA8hf68lSxd6ITB1HL0J91Ef9YLue8i0oTLB3jI9aIljpjZjJfaN/1aOLCqZa7loL+jZRtM5NBMsr/LZNG0K/Ra/li0qfD09DjhM/le7zWdhUPUd6JZfwyhc/oj+U0qA0RftBtws/U8vYddkfyU0EHy3yf3NR/ff8Gi1sfj95m/J46Al/ewe/krXfaXygxEvOHvDKJS6ugSPaRQVKb0UYXwbLqtrJMvXptTWGMhSTdP55dhLtipfhh+O5I1RqsoTN3CucZrRAXl89kHs1gfInpisZPAAWO9KFYu3oKrTZ3oRGjzj+u00ZdcXNhLu+alhGZ0oNZzAOwV3aEc0C0XfWhfyUbDIJIn2qJtWER/P9E8PlLzesJt8TI7V+0VbSO6ZEWjcIBwr4UP7bQL6L38Il+FSi56+Leea77VecYFXkWNFF3ka0OHG8J728Pkt6PRenqSWQK1NUz6/iK9rtrS74ZoT3+ZHT3cRCcPeKOBBwrmziAgOwV/cwf+sk7nroYLvzhnUm4dzCKNqVLzPRn2ldSokjpUwpuqNyaLImT9HUTTTxcdMA0v9+XcuCzxf5DC4LUyq+7o8Mkvio1liktJikIfuc7HAnsP5lWcIXGuHtUm4zCLG87ApB584SP1P08xLL6P6Dw5bl53BkRo8X1CO9paK9qKt1UWijEXhPemKyaE96CN5lsdv6Y3Azf5YCtO6bPntahayU+Fh3CQ5EJvMnrlHgQwT3SpxFCTKz0ofT+tpfaHyrFdpe8UrmFBlCfnUqflzNP50jFRNWJITlCZkscKowD+uC3caib6QX3UOgvna8ZhPC8eKysDHB10GNq7Lz52RZgs+Q3djPsoiVltUhjIvReI39ggemOgRhuZNXai1KBosSl75vyAfkBfhm8cKr55EJ+MV+ivGUxf3XZ8qdOLca7jmOrdju4tsc96o/37NQ0Tf6AYGdGbod4yJ+3/LXpTPI/PYjSv7Ec1yMzz00I928OX96Snwpxwf7hHfNU2Bh5p8d5ynhDhv4D+b87ZkgdXxfCRGsTa+1A8V3ogQBrEp5RfPXOpztzG1ooKMmXbp/e3//UdJnMr6Kyi+KKNOWN6RqPT+xDjOt1k3EDoaCC9uUCO81CsMv+EEybGGCg9RvaS2et1hnYBogX7mqGnPqTbkDC0EqRuvt2LsxsM6r+d4cMq6DfsCMM1TzFuehH9JglnDRRvMFrWVUvWVDOewDrp4R/KUR+GSL2L5mvcyxyeoXWxln+4W2PW3MjEsxJ/dSwOb18v6TyW60SLbsidJd5XPNV4ma2drGQW5ODt6Mbu5M2UWgbKgNpJ8yAran4wwXGRCSZedpjbGzFyVDc+bq+YMVWb4vTfCV79mPRQmWXS01fFwJ8pEo9+UMpGNPggcbELxb3+/kTq6LRcXBa9SWafsexKuNw0q2p9l3X6GgSJsf+3zI2O34GRcGdnjTo++vEQX2mep9u0Oj6fLLw1SjhhrKzv7Hqp/0a6GLwSX3BQuPwSbYWixV7h9/YVmkHlztbXiS3PFCbI7FP7D7Zec0frs4KDjL4iuipRasRX+mHBNTppw+6cQk4WVxO3yJa6BTJJgmRIJxzjUt0xth87wQ8j5vLFRxOYPTaSfTtf8P/8PRH8Ci9fv3l16cZ11pHWMpHh8XXE2rf+rW95ztGyc+rNu7zXLY9n5Ts1toGBibJdaYlyk/50kVp1knVym9Lqz5WRk+jGQJnXfnKM8Nc0OW6sgRznw5cVxayWtZc04C/odW03U7lJm+M5fHAks/UZyd2WnnsqOvjkPxnIV6I3x8rM8aDL0iB+XJHCneyjXE6qxWbgfLy+mMUvo8O4vzCZiKBkDETnfD9U9JL6ni/Veob2yuXB3+Ld5TrbL9Vx4OafnDonNkf82plbb15ZpkhwScI3x+4GcDHDu/VhzjO5vt3/yJy+8zZfRdcIyctpff6jTLZKTYYwsNIXZSa94/P5G/gJ3EXHW0oOzMWvOYund9aj/UptPjObinKUWe44BdPaQimxv5n/UGZGhivdLm9nzt+i12KcGRYUz2/ifU8+fUnvs1+gitUbLf211P9X4v/7dRVzeJKGyTlsmp7Ccat9ZLSxIUN686rcbzvRwT0H9mHk17roDLqGWGLhTA+sL+9B/1q4VPpvZB47xY6aRxTt+5msI81EXd1G/NVUdjRkU793J4eqqiivO0JC01WSGi5yvLyRs2X72d5wgLQTx0ltvE7y8csknakh6fx2Us+9QXLL9kw5mScOkH7iCImnD5F0up6c4/vJPb6PtFM1gn2458r8LsrDuTQPu4o8TIvSWV2eh9vOPNYWFLI+czcxm1u+c8Jhrwv+25MJ35JHtOQ/eksWKT9ac9wulwthlRy1yOShViJnFouObtsJh+2bWjlvgWijc8Xwu8yCNNGDdjXbWFJug3WlNVtO7KSkfv//N6zLzXonLN8yk7hqSzat1yN7fBdY48sGibk+zYzofBtiC9bRcORv6oRIClrM7c9QGxzPDsOlFJmbcqi68r2Of/SReQxL/A5Xv+E8jTTnssROWCQhP7bFz3cBfqmZlOyFRy0PUn6C62t3ct1UjP46KYQ1pTRuKX+v4/f86Swe+2soLhHeL33A7x+KSQ15zF3HIq5WP8Y/qokikQUxJhK8hMxjGaa3m988rD4OF3Y0vtfxR+Q24hcmPBNUw/OYGwQrcVSmzZSYFvHgqszNhNdslOGV6HiVO1WPeHVDWPuUuMvyF60vXU/svfRex1+q60PSWHM2aNlx1Gwdy6T+71tmMHzabJJO/syv92G/DO78+AdYubkQ1KSLy1ljnGou4l/xmuzac+91/FkDdAjqOJKAHhMoGG/EfIn/sntCK+9P84njYAEcaHmwfQ88k+MwOG3ImOtmDDldh+6x+6w/3PRex5/iFczUz3rR6BRH2RgzTCXuyYJ/ter9L/CacYAK0efNeVC25yqBTw6TLJpL5dkw82gWqaf2v9fx62rOojg2jUq3WG47pXJxqC3J7SdgMkmHFcu80OzizNqpB6gNEisvwtqgbD16t2LpstkM7d1RZDbte6/jt+w9nuubqwhdYc+t6ELRg4XcnLUGz9xkxqUGM117FZqdfHEfC5tjQT9jNF1CFNqb1zB+TRRbjrzf/O8y05AIB29Wu7txc8cB/h7uxZNZgYxxMUXpT0B7ZQz6GsVofHQFC51mYrbr0VVXEVLgT9+JM9lRX/9exz/U2hC/fYXYV+USExJJU4f5XOtvic6yJYwMTyVmI0S7w2qjF+TF/8bm6DCiXDTYsGYEnrZDqD5Y9F7H39nDEPO6zYRcEg9ot5qbcwNwVV/hl7SOfy3yxcgSFs4AjaHNrLE+ht9EPZ5m2WDTS1Ed3Yv6urT3Ov7BniasFT+z+3Qjy3T02eO5jpn9RvCj10rUdFvG6sHwwdD5U1g1+zpHnZYR0/Jct7ADWQsVx2vj3+v4pwTZk1pfSVFBEcaaczHXWUx26XbUpy3/XyAILVl/zUnQtwe4zH3NIbOxPLMXjWCgaHJSnN4X9V7H/38A71L3uA==",
  ),
  "synth_normal_48x32": dict(
    stream="eNoBPAPD/FJJRkY0AwAAV0VCUFZQOCAoAwAAUAQAnQEqMAAgAAynFCHBGopklmgADbBNAzx9jGUws2DL9Ft+3NLZ8A9CesCeAHIuAWQWVrAbj738NGLIml2SzevLM1A3CJUqxvEGwfc/P2co5zjlKsrr0sYEBCUDvzqE+tAkWbqX/85U/LBr+dc4foePTq9/EtP/Kh/+tgZ/B689uNAiP5neZq/6IT/smQAHsNor3H3p8+1FhtS78/yAcD5uz0e/EG8SJOgkABGfwCslhv6eYSjhKXS+AR6kk+GVg7+6loHffPjA+xO98tvP6Eq4X/vKdeQC91DHZqwUPzMEdFJjP/gk/4S//NIADN+q7/g3BPr+JP/4lf/X/mUBG/tXd692kX+34T/BpSD/+PoEae0EBn/yvr/9FaRP05X33x/84Cx/CDn/MiyT/ZE/M/97/8Ttgef8dT/yDMg/z/uvFSoN+mk/l8f5nfkGf30+fv83un+FI/iZGj/eqP78tfzCBmTO/43fyl/Uf+Z2uR+e23/4X07xnATP853/NYwAWP5S/+FcAhmn/Diz/KyS3vBZR/zO8dZ+Efwu/83GP+++blx/n1MPk7RLpz/Li/Yr/G2vj+mSf73/45T2fzkP+8eX0v/K5//J3tGT8b3x7JzP54lD+/6Zd5X/HgfLP28shfll7ix/L1fcxuf8/+f+zv+NOP+Z344yYB6/EwGX3dABClw8ShwiJ/qVtT/kAzEEtkWf83MudrfCf+wBP5Bmir9dgib/g0G9ez7/Xue20hbsIQfv56BSh9/8pGR/vfuny3X+YB+gf/wMN8zybT/L4/k7YGvf1Z91OyWyGbufs0/kOtzgw/aUcP1S+lP9KPyYW05/dIV6gGPUKf+f/l1D2fv6UEz91+b+/inwF/yhNin7+VgiP1KCBl3Ef6NH/YHb/l3czZ/wjt/wTeH6rn+nf/jlf98p9/e/7fIu2f79bH+Uv/97/8c+D93/f//nAkH93IZ/xw8/9Lj/ehP+FI/m8pfvRV/Cke37XnkP/xktj83nv/L4s7H1IAKn+Z3ls/5sNYejna/1D+/d358E9GP+wgIG/5nd0v/x2f8/+5W/ZQoiP8TtD1IYUFAazj0=",
    y_shape=(32, 48), y="eNo9lGlQU2cUhg+uWFFjRxEccQO0pcPWoIDUoogoSETExCIkAirbKBCQJIQEshAUIzGMQA2GJSxlV5ZUlkYUpVSECJTqoGg3pVItVdC2Su2cfrcVnz9n5rvPeef95t65Ekl6uo7N1slMaB1CDdq38cyBwsFD0KkkRFUwqKEcgYqTXft9eqVSiYSt07H9XJmFGVm4hcu0X0z5e7kXRiMIn4psqBFRCqw4wEhbKYFD/NORsSp+KzItXEIFe1WhUT7i9rtaguAShxpafZLzgPY3QMov47B1E/tcyvlKdAGzoxcHL+J5WnB+WRIhIHsDNZIO1UJ/7m5O9s729sBogn/sufZ2zWF5S74B8WWNs1CRLDEcljlBaSmAXcAeLy9PD1e6k1NiTk4q1c/EOojffZiV/yM+XT12/1qMIladnHNMxBkVCEYDHIKqEhKOxRwJ53Bc+/q2BBPAhiXIYcXkNwdX4TnDw7ZkdayCmZJUBLdvw77qW/UNDfXVFbqiorDS0piDBJ9ojUEeE5M/9Ho4I6x8akKSrBDaKY71jCCOVNf048jI8HcDfT092+P1TaqUiIN2ItMDMB9mGB/3qi30jCNw8nOAB9DZovsA0X1pVbtR0TB4/nFjhVISnZ2tSgkRM+IdwXMu5dfjs+9P9HenWdiIsurjYS4fcRW8sER1ikZeL4/nxadlZxeL609v/AeMlF8jv6L/OjfxltwFSxTPEXH0ag/Oeb1W06CuZEYpOwoU8WkDaZMlnaXVg5TfaiL5QgpQIxu/gspbCKg/U911HfEZ3sWCRd3daiG/siF53KhvrGvUchEYMx/J54JpcDN9OS9Urw9VxYpBffmymkdI3ASoEJyp7E572GIgC/g7FsofzVwpOd04ljXDvI2HyCu9/cBRRmgjMI2cv6n48dw7JdSC1ZQW6r6CD/siAZwrUwHs7QGYjOWhBOo7rISsIRLfiReMBeVkIQ8L6qJBpPEVP8aga9dZNvX1NjB05RE9LIzOIpxdEn6c6sXaJfSKXXpvygdfsv/KQCweQvxjANv0N2/qqy/o2/BmHb5BXuaCym+A8uOxozjjjhQvvfnZ2C8bxvJhxMScwRCqQ2TIri27180LCZVYbm5cBh0CggjsGe8dhLfMARptWwi4AWx3cNhODuaDKXVuuuCjGvauFEKejluNY7jT0x5Y5IEJbY2ybKt2ppTu60uXinhcMWLWgTUTrTVufLWIEHYqICX0VUjhjaRAnQUt2dfLt/kVt6to6fuwDGYBnUQna6AGoCkBJsUEyt9N19hYF4OzNwCDBpvSYYU4OxV/OcVP50R6bBal5eCeCfMmhHQC8SVM62orJqwH8PYGGtAFCfsBykBMh+l79QaC1ZNa1//8kwGZRwdl2aHj9vxAWCH72L1sbKGmM8Ha/pAZA4GFzRKX9T2OUYXRVUb/ri5/7YnMM3Hn2Ceei2YN20HMSoYPvliC9zxmw0JI+MQM6ASuE8CwsdBt0spqUpuZmUf5gHfAH5RbmdynCLVB4LFum+MiU3fF20ZCt0LjsEomUxFfS/k/4VGFeLaBGy4deedD66/TL0ZorIouDDIYgqb9HVInVcm8H3I3323A6T5tANum+2wYHNygjBMrtPc/Ax2hc0w+XEpzt3YpaccbV3El23vV7P+jyX/VzQ3OHj9+9skqmJqI+BZPEcTlnrnKJWvNYs1xYHVlL4/N135pIPghDPmr1f4tAQEtcYpaDqIt551vudYM2g5hSJN6Ppg5+1Hprjudt4KtLahSUlQIgH55xfPe9bF0tw5n45+LA9+EFWeG70gl0GHfrI1C4cZ/Ad89w/U=",
    u_shape=(16, 24), u="eNpTiuFy4f9vO+eGSvjhqe3vH9ZDQWRRQMYOhv8e81IZLp4O12eAia+cuGn2Bu/Wlg+cLXsZGKZubAECkPiD5T/29+xWnLPNS/z0741HqzuAACTu5zf1//8EoeASj/xLr4qKXvUBgf7+/frtGZseZmtV/O/aNkEHJD4JCP4vWvT/2M71Icji04EghoEh5tn/XgZkc0Di9ufP2///H8TwP4Qt3mpmKIMCEKhvZ1Dnj2Vg+H91OsPnHDl3O0VWBl0gYGBgMJJzBYr/7wOLKzIwpCYCwZ+cHAZjNzWgeBjYHAYG65nzgECFYYuKU3w7w9//8xgeBMsXCTd31wX2WpQoAgFPyVGG/08rFEDijQufX57GeskRaD4DU2QVw5X/T8DqBRmck/3uCy0OAAKGO7uZL/2emQUST4tMvDg5fE2BLBAwHCzgBQCwy6wy",
    v_shape=(16, 24), v="eNpbM3/T0kYgYAhhyZHjnxJamVi25r+HWv01q//VIHHrM9JrMtaVv+07MVWYYfr3hBPR3zpB4mukz1gzGDDkF5hlveGb/n1e18eEYyDxHJYQhiDnE52tczuCgOak/e9nmD8pYlWBC8v/k/9rav6vDvwfIGMXIfg/lmFHR8GkKtvGjNWxgoKxu3oYfv8XvXlmomjz7apJBR1Zazi9NV1dNZn/F7kwVDMwODK8/VywKmLSxhwVhim/fk1Zx7A2eJfItnKY+P9gBuGsC00MYJDbD1e/7v9TjxOXWnjYGFgZdjIkwcWX/QeCic6+HYrtuhsZ3sLFGRjcHv03ZvDe4r85Mo1BUxkkPvmUR31r3pTSA7NS7CQZCu0zGfhkQOJlcVvmNP9n+P98d22gDkOL/1aG/2BzFP8zfDzw5n/Jskv//x8I/P93Q8Ox1SDxbaVzY3JqGDZIO5bPrWC4MHsKUD0ASpCz+w==",
    rgba_shape=(32, 48, 4), rgba="eNpFmAdYVefy9SeWaGyxGyPXLtdeCPZesCsoYkM0QUXF3gW7iIVgFxVRFBVFicZeYu9dUWOPJc2aYmK8MbH8/mvvw/d8nGdx9j777PfMzDuzZs0+G2WcmGLsjfBif2Ru/thkJPcwlnc2bnxdkLh1hmUwMthMLqTCxGldSNraCufPykdQ8X96P3gJa6/vNRK6CE2FjA0w64kF9cUmdcYuzqO97okcB0tCoc8k6DYX2g5YQvzeVIr18CMseQ5jV8xhSewcjo6Zw9/Bc2DpM4aakbg7Fe8jMQSQhsV04NOO9bl19xZ3xxinJxiroiuyPqokW/wNEoyf1pYnspfh39WoUtfo2GwO6xe9YXb0l8xdMNq1P7tff2z1T1ovHguQzQ2EjkITwWoJ4djg9diGtTR6eYxk3dMh6ACDml6lZ/sDdOuygmq+LYmYOoE8RQrQrXcIwaEh9Po8hLCQECYHhPA6KoXysr9RsD8+sQOxHMYjrdNmRCjZihfkXXBhzg+rwKCENoyL8+N8Tdk/oQZ3Vnfm815VWDx3MWFhXQmPzMXilV2JDLvMya9d86ka5oN9Vg9r3ZWhQZWZEZMBSzGKPvoU/w7xjG70hkK1T+A/6xIHLn7Di5dbWLs1lIMb2vJ6vjdvvqzBqsGB3N9xmCX1u/EwOolTC5NYsimJwAtJVP8uic6vDlJ2+XBy+5Tm/ZX7/BWZBPfeKzbGC8eIliFc7NOb7iuGM2jxYBgZze+FfIhpUZ8NKTvgb8Ws1QAqNjO2HKtJZN9rLBjjsd+r1odaxxvLVJmp4bU5e7YBG6nJ+F8D3OurY5RbOdtQbGgw8VtasflYVdokGr0XG0fCjWvBxrAGxUiZsZCu+SuwpsdI5vYdSfi4kdRcOBLbIuztRdm321172fcdtFtGWsbmjGnXjXGr5rPfBsHyZ2y5eB+/1mH8XHQB/+SLY2Wz2QzuHkcr33jCP1/A6i1tOXNzIGeO3SIpLo3eX/Rh7oR13FgF8bF/E/OmL/cZK6v3ubbP2y3bW/bGrpbD/jDyXTZKfGs0JBZL6MmQebPx9ark2jV/91Yij27FMpt77l24NDPK+dOjsT82tg42sRalG1dnYo6qnLQKHLT/0i9TKeoXLsXFyt9z94tXbJl0ncSeRzn6SRpn895mRZW9TGiySevV5ZMcfgR0qEfk1JbcuLuJ3mGtCQzoysbZ9+C4Zy9iWIwNVIycLP/xFyY9kf3rUrAnzbHrRp6/ZdvZLBS5lkj2BdsInHGCVt0W8eit6nhmFHWXRrFXd5fpHkjlIpVYUborv8/fR5tpI/CZP4TgMeHM6BbGzjpfsOuzHsxu1o1R7bvRxa6BUoolsNhWEVkCRpSCZYXvsKTkdjJZWQrnbEmgXyzjx0SzbENdAnsbA/qFsWLe9+zbBMV7L6cE/Ykiml73MhPzehwDtGTJd/JhxSsq7vsTWzqPJsmbCWi4kbjg60zqm8jGpF1uvB//8JKn3790jzu0DWHb1iNcf/CcM18dhUUHeBu/lw2HdzH2ylZGiATHHtvA7J1rWfj1WhK8b/BOaU/oQ/ZX2Uq99q+oJqKbUxI2FHlMiNc6woP2sGTJM46du8S85RkZNdHoP8SP2JWHOPQM9uv2VmivnmejfJwRe7Ez2/VZivCFHOkVDP7z/6br5FO0sQhuBNzj64YbYNd7uMH//7sLP8Wd4tKa0+z+/SVvnM/SrsLVbzn89hVTdDqQ98JjHR9WJm7mjpXipU9bFEyOH9yE9+Gz5Ir/m341YGFBaGTPiOqlOFoRGg3JTxbFyCu7cuEDIaux4v0N5orRfJhNyZ8qU8+ps5jNTC/wFasVgx52kCf15EvsLTe+bh2egf4WJq6QQXPfcSruOFlK1PD4oBJdYK2xbMXpfzuZKW+GMo+lVNy6jW63YbacanjhHOPZTUUaQae+ENCUfWMrU3O2+PDuerKceE3sMNjsCxHFYXq/F5TuWYWgBUYTHyO/bKjeOKvLxbFcFX6gI6m0PtmXd/EJcEV2HHYIyEloYaFCeOkv/Ff1wcoaBfPW4raPPq/sNDTRR+Ac+ZVDyM/ujkrk5x5XzOtTLLexh9eYbwe3PgYvgi6TjhJwfh7FT7aBjhuhySBmDqpHubW9xFerxFuvWD5QZnSAUzNfMm3KSFbf6MiUbXlo/Jl51rYe7NHef/nWUz4Jf6DeeZS9X10gdfQE2D2Pd8rv31Qfk8WjHycupAtHsTT1tM6t3dw4oV58vstNRFzu37+4W8N552TN71oclx9K2QTXdvPtz4Gpf4J696Weum08vLDJnK40g7HL4+jz5gGFbz2latIfLG36iLQWqu3LD4maU90N1NoTpbhxfRm7lt9np1r76dPiTv3MAV29ehHmz3jBvG8VK+XXjGXZ2b4/jI4z3sjXmVjFXBRSHtid/k7IGfQA7ZpSbdoPvD2lg5e48d+qw34//czZEd8oyeSlkv7tGtnL/6O61yDN4hbdQ3jaD3JbH8YrfnKJdikvGDfsCJdaT4OoZdzevoSxURV0ZRQ//dmFby7MYteuF+ybDzvipYc2/EnnsQnusmYtsWHjseqmyppC8131sbyD5Y/sr1AIi6tNm/drsJBWWLlkTHllM79m5jUlTMxzDv4nmlnzD1NtYhwhM1O1Xl6aHNjAsPfJ2oqWdLpl5L2gGrooHOiI7ZjK4M7wQYULWIFoZAWTI59y3F9JFuoHs4L44/QFpkwbpSAs4OaVpuz9fgQbL+zh8Do4ujSdN5xkEJXEJ10h+5FEOvEr1lC/0fpDimrRJsvFzee+42ceMDZxuOzKjeVZTfBtp0ekcdFZQ33+eItkTiy+xZXH8JWTL0FVyXmhPYWuFKXRMfW+U0YQFainVxVFuyxDyCGuHPdU3432lNvmDt+CrwRiZGHVnXz4Ub1A17h1iVNbarPx1wokv2zBiVMLuLN5F3Uss7unqSmjsVxGg9fxeHMZqy1d0WY+KaK/yLrvaGG5xDlGkmWTvkpjUaCzX9J91pzspQPkr/Chl869CG0wmcKdtZ53XjoOzIHfMPk7Qzp28jxdL+3hsTxCaaON2r19cEV1C6OVV2f91PhbqHAjVKfJ7XBE0m4nzsefcGKdL3MfGglvM3L5nj8vdo3grwhl3bvvWLFVmuCx9MrOqtINWvtmIrnvPsGraTJ7OqsP7VO2X7zK0xwfwao9PFT+Nmi7hvwFKjDz0mGKvflRedXI5eTzf51n0v8OKQfP4NXcaBkhXagebU2m07fuYsY16Ej10dIk4kPfFbK/gGpsFnwonjjdZib4ZAVp+H/bGYMrXKFp6Rek9JlIiPR961WyrbHx53uRB4c4rZjzi1OAr7DY9gzlNvZPeXqxQJpiDgNv1+OfX/Tdtyr4/03GIf3v/+ksTkyV0gulBm1pLO1RVFcy6d7COitLHrx0pbQQo5X6UZ8+zyP4zVXOK9wuluOG7HBe9g4fcXVJJ98+nJduv/ZYGv5fzSQxrZ659f73jiucS/VlwAETtZciZunHHq22uDk8Vqd9co5DL3czS+SW7QcjmCxSQt7Meiz/3lbSd4NdxEWrd181WV0G0/csUhguaGYyzRv2QvhVuCZ849SpoFwwzSAlYhW/2UYnp4ZjBGnCLgdl96fivOIH6fHIyR91/vKNXfvfaiaJ7/6HfFxE+yw1CG+he8ppzxY785XxH+VhM6GXMFjonX6exenPfkI9zQKF5Is+21rS+Eb359VxxrD0OW2U4NiyQ9ginBOmClPSbe4neJvb89yZqI1QK33t8cJSQXqt+kn5ECv0esi5JmfBuzsoR95pltqtrd+gvEoMmsP1rb1VqRF8S2tHITNA64xUP4vJaSx1dEFhY7Xew4UcyuPMWT0+xTnXhmfgVVJRmmm+G3ynINY2Pc5z0m0/KqQKb4SXwivhirEw3umXg1mk3zNp2HJL9Hl3E/NkdfPHf5fsbuDwGPxXrfiSXxpUCALZRpAxrs45YofCmEphrBxXkToznPkthJ5DjHOb5Pzt6txQPF8qvow0LsjWbY69inWaauMHHd+UH6yTTmEXrZZ8wjTFoMnTdm5OWB71gkzSLZ103Myzvy7mCqrdzM5MIA1hyrky/+R3tcsdZ580+9gso+sh2a5+bIV+Q+2Iy61VDNXkkDgEzfDjaqd57K/Sk5WRxSivff3gC2P9rqJU1N4W1n7uP23U0rqLimu/KhmTdbzS8UGzxhm9Rwk9SuQhOOELl/OcWb/kzl4EpyYyacADt4Ws5DrVzvsxOKon4xc0Jed6o8hOo472y1t22HfZxWl5SF1X2OUAJ+daquJNVNNQgqOPU78ZV3Glk8iynoSnuAfN7uNq3iJ2iOyv5s/6mR/jo/pzZvV9p+qTQbY6865bd9Hpeflfo5ved2cszSotflx8PkzazKtcC3KmSj/sm6uZQD2sqPRaJuPM+ghX07Y46Fkns44j2vXQdZ1XE5STVkrw9/yus/50JmsdHY9w9s+VGGSQhrKm33MlcCXU9fLYrxqb5pvGUmmMqEpN2RmbgzZrlB/in6j44ozfptlwj/hEysaWa637wjxPbQeqx1I/mbPWRD2rPctTbxHnxKhpXnI92irm/A2fRT3JrfoppP3Iv9Pz/CWoRSm3mZuXaj3OydXRDBJ/2s/KsQXyObyKGHYf5nDIz0aj9VpztHAHhvymMSynsmjKWomBgnwr37+TdNgWIlkeGsHlOf+htewPvSceG/4R0xNrSBP40+qgJy47pMlzVsrg9sfxIeFqIdnYXKQYq/IXc3PkL8f+ag7/pknPqGcOTX9WFJDORYFG89XirK7pz5LEXxaezq9fOrWueB36RjNxdc+e6/7pkk49f9G6l4XGarYX4Ih+/6STv7en8XCUtMHn0tFDRnMmwZueqv9JFzITFJ6PxQvburF2FPT7B5dkdy5qN56k9/Ksm3CIkYVbsL1MZW62rKXByhkKHrm+Tb07Bpv2iYcLE4RlgrSNrTRP79aMYZON+rfSa7mK0M5Tz1ZE/b2kh4PcV1XRpTionFaXnObHXioG344ufxDqzSV9GKX9mbJwNMn7KjNb/HxyY2YmBuVj3fT+6m0iX95yu3I0aZ1uUt15ZmL6p35Ovqu8zB7tPqPhej93tjfLQNzBe+SMlP11zJN38encnyTUlHZ9bxxE9VpDXJFfn33qaEFzz7PJ/5zm4QDnNU6y5DOH/zX21JAmSSygaWSkVPis6pwXV6Sq7YdFQfT80WzeVZkI9b/9mzOzrGU+Lg3tT7hvbs7178IhywkdNvBlsmP/cFwh3/A3jloX2CL1HidO/veI2koBN5de/n4cL+WL+abbNsrz7O64+m8B7anJ7tafG33kY+Mm6b2sXRmu1p9IjKXvSR+h9nN6/+MZ5Uzb/ECSk4+kRBsYrwZmZNzG1+zRbLDKpxG+uq/fc2Pgo9y8mi+NOjIc9rSSdtB+ddN+7VDfG99LbUO/W6i0KDgTIx19NEGD1HTNTZedQW0uLFJRSeZO0vcS1FMbB6XXgHjGT59NE0YLoUJLZ9527M1Rwp35/Kwti6waAc6zymLSAqmyW7OIacYprx4mchHndWetk//PUsQSmuG73pXUueTmeSv1kcbSJqcmt+BNnzakqbbYYKSU0bv6/r8js9JB9/rk8MzqQ4bVcHWGO9MmO89odDzaX4P4LQVtPPtqf0SccrLv3bKsfKbgbZDmjRZihaQKrGzs1Jf40ipzX9IgMfPX/Bsax551qvUxRs/rsl2t0aQTOkmrH6yogdB7h3J/Gs8KNoV7uBq6XjbFsq/x5Tb1o+16X9mC+UtCmTqnKnv3+xGoeWXllnK0PV7D5ZhSHwSSVbxpH+Vg4J8n8Z7axc2b8HbBvEg6zv1hi2goXz52YlvR00sdTqyq82FCgPOMwNkD2V+3t8NNgViLFPytIBOdexyOUn5VXu/JfZN2KOPEXzzq9B03/sdgu53nlprblvULsY+N09KEhw7kZvbpUMacnUnK89WaY48SkVBfW5fIx1K7FpCJGp8kUNYS1NdUs2tCWatvHdIwZNmq0q7RDNeXicH5SDnxEe2kI51ndJZsbJQeejLYOBBlrFsonepyjrBQPS9/OxaYLw+7lqPANY9m+j8AIUy0",
  ),
}


def _unpack_bytes(s: str) -> bytes:
    return zlib.decompress(base64.b64decode(s))


def _unpack_arr(fx, label):
    return np.frombuffer(_unpack_bytes(fx[label]), np.uint8).reshape(
        fx[f"{label}_shape"])


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_fixture_bit_exact(name):
    """Every fixture decodes BIT-EXACT to the captured reference YUV
    planes and RGBA output — pinning the bool decoder, header parse,
    mode contexts, token decode, dequant, transforms, prediction, loop
    filter (normal AND simple), segmentation, skip flags, token
    partitions, and the fancy-upsample RGBA conversion."""
    fx = FIXTURES[name]
    stream = _unpack_bytes(fx["stream"])
    y, u, v = decode_vp8_yuv(_vp8_body(stream))
    assert np.array_equal(y, _unpack_arr(fx, "y")), name
    assert np.array_equal(u, _unpack_arr(fx, "u")), name
    assert np.array_equal(v, _unpack_arr(fx, "v")), name
    assert np.array_equal(yuv420_to_rgba(y, u, v),
                          _unpack_arr(fx, "rgba")), name


def test_container_dispatch_returns_rgba():
    """decode_webp must route lossy VP8 chunks through the native
    decoder and return the same (H, W, 4) RGBA the fixtures pin."""
    fx = FIXTURES["real_mixed_32x48_q60"]
    out = decode_webp(_unpack_bytes(fx["stream"]))
    assert np.array_equal(out, _unpack_arr(fx, "rgba"))


def test_bool_encoder_decoder_roundtrip():
    """Property: the §7.2 encoder and decoder are exact duals for any
    (prob, bit) sequence — including long carry chains."""
    rng = np.random.default_rng(5)
    for _ in range(30):
        n = int(rng.integers(1, 400))
        probs = [int(rng.integers(1, 255)) for _ in range(n)]
        bits = [int(rng.integers(0, 2)) for _ in range(n)]
        be = _BoolEnc()
        for p, b in zip(probs, bits):
            be.bit(p, b)
        buf = be.flush()
        bd = V._Bool(buf, 0, len(buf))
        assert [bd.bit(p) for p in probs] == bits


def test_synthetic_roundtrip_all_knobs_self():
    """Library-free: synthetic streams from the in-file encoder decode
    through every header path without error and reproduce the encoded
    mode/coefficient structure (spot-checked via the skip map: skipped
    MBs reconstruct to pure prediction)."""
    rng = np.random.default_rng(77)
    mbs = [_rand_mb(rng, seg=i % 4, skip=i % 3 == 0) for i in range(12)]
    body = _encode_frame(
        4, 3, mbs, use_skip=1, skip_prob=150,
        seg={"abs": 0, "quant": [8, -8, 4, 0], "lf": [2, -2, 0, 4],
             "tree_probs": [100, 150, 200]},
        n_parts=2, filter_type=1, filter_level=18, sharpness=1,
        lf_deltas={"ref": [-1, 0, 0, 0], "mode": [2, 0, 0, 0]})
    y, u, v = decode_vp8_yuv(body)
    assert y.shape == (48, 64) and u.shape == (24, 32)


@needs_libwebp
def test_oracle_real_encoder_battery():
    """Live sweep: reference-encoder streams across sizes, qualities,
    and content classes — YUV planes and RGBA output both bit-exact."""
    rng = np.random.default_rng(31)
    n = 0
    for (h, w) in ((16, 16), (17, 23), (32, 48), (64, 64), (48, 31),
                   (33, 33), (16, 80)):
        for q in (10, 50, 75, 95):
            kind = n % 3
            if kind == 0:
                img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            elif kind == 1:
                gx = np.linspace(0, 255, w, dtype=np.uint8)
                img = np.stack([np.tile(gx, (h, 1))] * 3, axis=2)
            else:
                img = np.zeros((h, w, 3), np.uint8)
                img[h // 3:2 * h // 3, w // 3:2 * w // 3] = 255
            data = _oracle_encode_rgb(img, q)
            ry, ru, rv = _oracle_yuv(data)
            y, u, v = decode_vp8_yuv(_vp8_body(data))
            assert np.array_equal(y, ry) and np.array_equal(u, ru) \
                and np.array_equal(v, rv), (h, w, q, kind)
            assert np.array_equal(yuv420_to_rgba(y, u, v),
                                  _oracle_rgba(data)), (h, w, q, kind)
            n += 1
    assert n == 28


@needs_libwebp
def test_oracle_segmentation_from_real_encoder():
    """Mixed-content frames make the reference encoder enable
    segmentation with a map update — decode must stay bit-exact."""
    rng = np.random.default_rng(9)
    size = 128
    img = np.zeros((size, size, 3), np.uint8)
    img[:64, :64] = 128
    img[:64, 64:] = rng.integers(0, 256, (64, 64, 3))
    gx = np.linspace(0, 255, size, dtype=np.uint8)
    img[64:] = np.stack([np.tile(gx, (64, 1))] * 3, axis=2)
    data = _oracle_encode_rgb(img, 40)
    h, _ = V._parse_header(_vp8_body(data))
    assert h.seg_enabled and h.seg_update_map  # the path this test pins
    y, u, v = decode_vp8_yuv(_vp8_body(data))
    ry, ru, rv = _oracle_yuv(data)
    assert np.array_equal(y, ry) and np.array_equal(u, ru) \
        and np.array_equal(v, rv)


@needs_libwebp
def test_oracle_synthetic_knob_matrix():
    """Header paths the simple encoder API never emits, via the in-file
    encoder, decoded by BOTH decoders: simple filter, max sharpness,
    filter level 0, lf deltas, 2/4/8 partitions, skip flags,
    segmentation (delta and absolute), extreme quantizers."""
    rng = np.random.default_rng(43)
    knob_sets = [
        dict(),
        dict(filter_type=1, filter_level=30),
        dict(filter_type=1, filter_level=63, sharpness=7),
        dict(filter_level=0),
        dict(filter_level=40, sharpness=3),
        dict(n_parts=2), dict(n_parts=4), dict(n_parts=8),
        dict(use_skip=1, skip_prob=180),
        dict(lf_deltas={"ref": [3, -2, 0, 1], "mode": [-4, 2, 0, 0]}),
        dict(seg={"abs": 0, "quant": [10, -10, 0, 5], "lf": [6, -6, 0, 0],
                  "tree_probs": [100, 150, 200]}),
        dict(seg={"abs": 1, "quant": [20, 60, 90, 120],
                  "lf": [10, 30, 0, 63], "tree_probs": [128, 128, 128]},
             filter_type=1, filter_level=35),
        dict(q=0), dict(q=127), dict(q=80, q_deltas=(5, -5, 3, -3, 2)),
        dict(use_skip=1,
             seg={"abs": 0, "quant": [15, -15, 7, 0], "lf": [0, 0, 0, 0],
                  "tree_probs": [80, 170, 220]},
             n_parts=4, filter_level=25, sharpness=2,
             lf_deltas={"ref": [-2, 0, 0, 0], "mode": [3, 0, 0, 0]}),
    ]
    for kw in knob_sets:
        for (mw, mh) in ((2, 2), (4, 3)):
            mbs = []
            for i in range(mw * mh):
                seg_id = int(rng.integers(0, 4)) if kw.get("seg") else 0
                skip = int(rng.random() < 0.4) if kw.get("use_skip") else 0
                mbs.append(_rand_mb(
                    rng, seg=seg_id, skip=skip,
                    amp=40 if kw.get("q", 40) < 20 else 6))
            body = _encode_frame(mw, mh, mbs, **kw)
            ry, ru, rv = _oracle_yuv(_wrap_webp(body))
            y, u, v = decode_vp8_yuv(body)
            assert np.array_equal(y, ry) and np.array_equal(u, ru) \
                and np.array_equal(v, rv), (kw, mw, mh)


# ---------------------------------------------------------------------------
# Hostile payloads
# ---------------------------------------------------------------------------

def test_dimension_bomb_rejected_before_allocation():
    """A 16-Mpx-plus frame header must refuse before any plane
    allocation or per-symbol work — sub-second even though a real
    decode of that size would take minutes."""
    body = bytearray(_vp8_body(_unpack_bytes(
        FIXTURES["real_grad_16x16_q95"]["stream"])))
    struct.pack_into("<HH", body, 6, 0x3FFF, 0x3FFF)  # 16383 x 16383
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="Mpx"):
        decode_vp8_yuv(bytes(body))
    assert time.monotonic() - t0 < 1.0


def test_interframe_bad_startcode_zero_dims_rejected():
    good = _vp8_body(_unpack_bytes(
        FIXTURES["real_grad_16x16_q95"]["stream"]))
    bad = bytes([good[0] | 1]) + good[1:]  # interframe bit
    with pytest.raises(ValueError, match="key frame"):
        decode_vp8_yuv(bad)
    bad = good[:3] + b"\x00\x01\x2a" + good[6:]
    with pytest.raises(ValueError, match="start code"):
        decode_vp8_yuv(bad)
    bad = bytearray(good)
    struct.pack_into("<HH", bad, 6, 0, 16)
    with pytest.raises(ValueError, match="zero dimension"):
        decode_vp8_yuv(bytes(bad))
    with pytest.raises(ValueError):
        decode_vp8_yuv(good[:8])


def test_truncations_never_hang_or_crash():
    """Every truncation point: ValueError or a clean decode (virtual
    zero bytes are spec-legal past the end) — never an exception of any
    other type, never unbounded work."""
    stream = _unpack_bytes(FIXTURES["real_noise_17x23_q30"]["stream"])
    body = _vp8_body(stream)
    t0 = time.monotonic()
    outcomes = {"ok": 0, "refused": 0}
    for cut in range(len(body)):
        try:
            decode_vp8_yuv(body[:cut])
            outcomes["ok"] += 1
        except ValueError:
            outcomes["refused"] += 1
    assert outcomes["refused"] > 0
    assert time.monotonic() - t0 < 60


def test_bitflips_never_hang_or_crash():
    stream = _unpack_bytes(FIXTURES["real_grad_16x16_q95"]["stream"])
    body = _vp8_body(stream)
    t0 = time.monotonic()
    for i in range(len(body)):
        mutated = body[:i] + bytes([body[i] ^ 0xFF]) + body[i + 1:]
        try:
            decode_vp8_yuv(mutated)
        except ValueError:
            pass
    assert time.monotonic() - t0 < 60


# ---------------------------------------------------------------------------
# Lossy-with-alpha (VP8X + ALPH chunk)
# ---------------------------------------------------------------------------

ALPHA_FIXTURE = dict(
    stream="eNoBwAM//FJJRka4AwAAV0VCUFZQOFgKAAAAEAAAACcAABcAAEFMUEghAAAABRegIG0DFnU3IoILitq2gcj2GqQOwOjuG9H/gLTtSPclAFZQOCBwAwAAkBEAnQEqKAAYAD6NNpdHpSMiISqt+KARiWwAnTKDGD2OxgNsBzuX93/Wb3AdCJ6gH7M+w1+gHpUftn8BP7cekd/////F6DATi25GvoHEBwt/5bww+wPOf6nX69/0/775tfk79h/gB/ln9X/5vqq+rv9gPYp/UAOT199ijCfH2T3fOGoNbv/JAD7HzkirCAJgIDLk9kAA/jgCh4Nk9e12HzMiBtb/WPlDCxODMNPD5/gRCaJbl9hK+3Gge754bqwZUnvGqRBjG59sbfKhCRe5Ch9n51C5j0ptbbaKFn88OV5LUF7Sa6wXOyMwOyx1bD8AOkiQzoFIUpv7erWtmUvGbfbPbkYVIsIjlykiS59nXZomgeLnhqk8E3XE/MpK9szO9dftBSU+xXKfCks8Q5ShZj5qnS4uymHY6L78qznzbjgtgfnl7JkExH7pzWHlaubjewOeMR/5PFC3E08C6jwDetMO0tmJlx6eWNnkE5UZ1mb1LKkyBAB9LHzfU547eIT2pfHN+2vcoHX3eIoGSklBc/CAZBUafD7CsN0BrYhHCw4PZlghRtLFxv2BuSnAJtiB4EKbwEuExglaliFvryQ0TRxZJioBeEen1SUh2/Pyir6egZk3nj1R1wv7h8kqzf3oLi+rE9lcW/vt9U3nzy7/zosgvPNJ3b7sqF3QQCEFHqgx+IPLcxvC+94K0fQQwRKuTXWI0GR/ZJx6X0zoCpduAt4HPJxRSqDOd91/8qPPitEcyp3V8ABLy1e/DYA9obm/mZYwqQp0Tq0ViV3LTSq5YL6b/jNDeLLLf9VoVdRTO50+EP5TutCm7MFnwj2EdzvUVAf5J05paEjyafeVXr4ErgwMkM1XcSs2WmCQZYUE1i4cwtFqXqT5Q60IkBfHyf+PpLOjy+7zOXfKEfs/1YtzypMvjcSJNSxaUnz7aaG264lnL/kW3EpcmmkU26KB6cFQk89COIzgelc+ORjJY8y/+4ik0/qt0ZUfm69PAvJwn6dcRK5NoEf3NLlEUrYI59M7H+Gvl6JS666rtR4120JkhCWIb1eBkSZlSf5bAKZfCCNyf7qVNYP1q/f3B2YajkcwZzdsbbn8qg/fIWCy2h8ymkeI16nvyZTdl4GC96neeLOW3zXp519WP+nreeTprarLFwoq43/k6QxfKdnkO4AAANfIz6Q=",
    rgba_shape=(24, 40, 4), rgba="eNoFwQlYWgeCAGB2d5Zvv/nKzs4wmWnoZEoTOySm1MSQoyQxkmjwBC80ikF9eKCiT4JPRZ6iTzzwegKCIgjq88QLBYMXXiExIY0JNglJJyXblsxMS7/doZ39lj2+Zf+/o7wKd+kDCr6JV0u4N7lBXBoZJRXGpJOhcJDSHzNItbc5aRHn0+niB1sMxYsDZuJVLmuiWseZbNNyv3vpBrpkZQIxPwPMupIA5ZzlwiXUKkSXolL8YNxG3d1z2oWWB4Zvd/4P05XB5tBXh5ZlU4f9iW3SEfrindMzZHU59FNugJfouXuo8or1Jb6Bu4/8NxKQwKvVn4JwfFtokF+CU+eV4RF2EQEtaSJ2QK0kYXopGUmup+R/zKVuofdpxn47HZqeYtTOTzLpF+NYF46e4ThnbFzSz/4e2JgaEJh6YLBPKoW+sB3AccQ0pDISVBRF3kSB6CTtJOY0fPRxDCarqTVPDnZZslMZ9nIO24GBjU45q8gF5Za76VfPezS2Vm/jiNTXpjb705ObAx2VI8Hk8JyQNSkZ90bahJ9KAQgz5Qoi4ySHNDbkIF89f5bSWSOmdhd00Npvd9HH+ycYnT3dzC98XlYYNZyTeOUGd9M4DlhVCgE/7gLYKuVDBalpsLrUiPSLxhVIaxPauaTSDny7ZyjbNmKy3XFz78aUBWpF7MtTi465jn5n6idXXYf7X7k7BzHP+awEL4hIfbahdX/JDTBw3+4Joj1TofkMJm45Nxvf9GkUYeCWlBh4FSItLDwmf3jy55TNtWHqOGKizTRO0TmXYxhtshrm5rM9Vg82wHn6+WPuy+0t4J1jXpAeeRRs7SiFHE4b3NugRob7JhUsQSbatqfRlu62GIZ+dGBHMhjmYhS1xBQU2NefPHK88D5z9qtR150iibtHMeppGTR59eNLvj4A9fcW9geYWWDwWGJWSALG4948vIsHE24T0iIyiEpkglQMCMm53M8oh4/mqI3FMG1qyErf/WKPMe4YYSZlsVm/OfYBZ3TRxLXMq4HDCbnABOeAYIsQgjEUhpVi5N2PHoXj0IGmClO1ycLPDPfcS9j25H0zP1ViqR1E7ZItlYM9XuSEzA2u25fj3bHEsx5BUbU3npnnq7xc70fvWAOJvVNBunk5VF7Px3leu/HJNDYh5WwW8di/hJGMQzpySuJZyvrqFDXi0xs0BDXR9fcwxnsRf8csEjBZo9oWTk52GndxbBhQ5KcLtkaVYAc2CFm/fg63Y33ILX6m4lZWHlqUx9UePYIzfPdiBWvliM012c2Wks5W+7GyaEfTN0PO+tV6173pIfdGZ79H1an09nYZfZmRfP/KzKtA+dxuMHJoJFRd3o7bnNrHf0aIJAiucIkcRgIpJuoz8vukX1Emlu1UsXqRBukX6NF5sQyeiMb0PK9nfXeg5GgKJFxZQivQVqgSrC+6QFiphHa+/BpOTmlBEi9KFdVxbWhTWoV2Y1JmSGH+AtP01Jq/DwQs0Xyh/R9pEY79Hx87efB117c/WN0PHug9U5N67/PnL33+H77zDxqGA2bbZnBqZSck5dbgXlsf45GEPII8OY94f+QuyTY8Q96wzFMon5yk8mvbadFZhfSewV5G/4CAmZ6OY3n3WzjxPz/NlcdpgO66LUFR2TDYrByDTkTEw9GXOpDkC30KNrUQrWBxtZLyWIO0LhYzz6nNeXzAoh5ctg+P2hzuZ5tOq63DVdMY755ZbPdwUhO9sKTeV1VX5AeK0gLpsbHBvxx6Q0aQjfPO9+Lrrh0nPEFVxE4mQqqLEpF3hrsooT9tURc6INrGwCDdOjTDGBkYZL58a2XFJ4ZxNvSz3NWBR4CwclYwbf8RnFt5Cx0PS4Wrq2wIOx1RqBeM6HU+TWt9oDOcv/AhNqEaN9em11umajH7RI3SsWfod3YJua6eCtBdEJvuwVRm79qsw9dQWea3TRsC+dnZwalRc8ggSsN9v2PAf7uuJNTejCK232wloWwF+amhnZJxAkfd66qiZYSfoPcgKIOdxWXOrGhYFy7/lgOWFHD/8NEZIDKmSHApoRp0bP4F0vU44IP1vyL1tVpFWn0euvz1onZ+fdBQWZKDYRrM3FnaZRFRC+yS87mOnWGts0NU4oJvQ276EYbn0pGbXuvAmq+cx/OPDikDu2u7wVcHb0PddWrc1dOX8HdndIQX99eJ88ol0r5xk7zcUEb5t/UhqkKQR4s8H0GXrY4wjK8tzJ/+e5v11z/Pc9qUFdzSxlKAVZgpGFuYA++tuaCKJCEsT6hFFppnFP/8y1NofEq29tYFmiHu1G+whOxIs35cbXmoeWBnH0109Gu6nYys667+gVk3m17m4VMrvPv6z30Xrl3zj9lmAmPKiaBv511IAWK4LcyFL2VlEy4e+5BYnJJNYhwPJ2OiKoqMnUxVSpppA+ZpetqEnNH4ZIg5Zq5ksW68x0ksoHPRxT5gcmNYoNa3gaLyYijl0nV4tKodSfwwSnHxDAv9/MFb7Vi13FBy7RLWN3rHjA43WKqZ5faGjEbHdW6is8rU5krgCd0TQzue4osl3mfzB77tV0/8lcqWQHa6MChIqgsNF/TheuNr8U2nMgkV5CvElsxUUs7l82Qwroiyrdum1vMgWrFQRBfZxxiDb3eYtu0JlqSGx5nYm+cSzx0HOLw0wfr2IsjMZECm+SHYPDuJPHLtK9b3t1BefoG2vUxuuP7RRaytvtJMC/utpeZmhr0kIdMx/WjFaXiy4mLllbiful57qgDA++bNUx+DH+dPhcsDV7OEQfv+v4eQkiYcn56FH2BDBF1mGVFdA5Aaynjk9cFdSklMA3VueIdWUCSmA7I6xi/CjzBFIJclbyzjyDVy7rb7PsDNSRPUiUvBi1FnIN3cEDzrsiBCVaWiY0GG1nWLtcd/HWlQ1pgwuLjC3MQvsGx1aux3ErIczYoeZ2xuoatRrne/exvw7G/bvAfPN3znMqL93NbGQFSeIIgjngzd7EZwJXol/kjY+4TNXQvx/psN0vTSGDnnHIcyLJmj8iETDUT0dFU5yGhJ/IwZewLH2jLLOJX8WO6ItgmYNSoEPfVicEljhmIux8IRtyMR6V6dIl17FR3Y69TKmnQG9pVyLOzoR+aqrFuWlZo+e9WpTEflVYmTfoznwvqfuROvFntmuge90xqdb9T6wF+rGgvce/IoiCDVoStdjbiW+6t4UNNBSK8AiBnVJaRWbS9Z0yKnnPr9aepJdiEtrxGlD1ZBjHHgFtMGF7NmpIUcPj2cO98rB77YsQsOHHvgrNoOPX/8LTx2D0OSWxiKzu07KKgq1AoELYbVudcYv6DcvGqet4yL+uwadptDwVA5+WcaXMzoUjcPEHtyYpK8e3NWn1o35w+LiApsrq4Ete2NoUaZGpfBqcSbjDsESfUwsb1phnT84wjyV3+7R0FtEFWgkdL6HFY6FxYznLsPmK+G1lldl25zxBE3uSOiFqA6XyK4xuCB4vYpKPJ6DpyWnIrws1gKSW0R2tPdoZ00OAxlhR1Yi6LPrNObLGJevV1danCM5E87d7R7rtNMilu1p/DEZ172QtWAT6WS+uH6isC0aT7IOJcSqmhuwVl3DvH5BUpCBruTmJ7USkrlVZEFJgEFfd5JrRxvoL0J/S89HMhlVHYqmVt6C6vhUg4ntPcTV5XSBmRfKhJs73wDgn1jkFRjhPeX15D+MlBhlDSjKNSuVcjHDXfXX2MdPQPmFjlqkYlV9nhqpkMnVDl7a2CX4Z7CrT/s8tR2V3k1mg5fb7fI73atB4qzK4OcODAUNluOoygr8HFQJ8Gw8CUxXzpMisyrIjNVcgouNoJq+vIJ7R8iPqWjCw7G6VgG0/5siDWgFHMk5yCuq9oNPBs6EKibVaCkowma3ZyEz4e9h9h6GxQLEilam1GkPRd1y1Ao6cdKC2vMZRnllqaiXrtr6cCRFXfBubLa62rSidxCudBTcFvgrS2X+XT6UX9Obn4gh50bvBEZG/q1vRbHejSGn3j8hjBg2iW2Ta6QSk0YmTWgo1St2anGw0e0Ankz3bz7OcP+4hFz66c51pxTxTEWDXPZuFTgPx6+E+haZGBfJwQ51vTwlApCpttqFC2p+SjjxHXtnve/DNlyDcYBis0rZrulNg+xA4k8h8PW7SwuP+ea3xl1O1899OjHRrxNTV2+u9bn/sykisBUrykIJmeGzuv1uKNZAF5RrSLcSSwm3v98n/Sz0x+Ql//8r5TigR5qHlxEq5AL6VnVxYzS3gYmW5rLmtue5by27XO3lRiwsaQTbG1oQY2EDyWdPAqnn/sYEaXdUiR/wkNbpXbtsOt7w+/yAUy2ajRf5TEtS4sOe8zpS47RpnInL5HialSL3Yb9YU+TTeTtXlD4LoTn+rvyZgLdHHGwISo2dE25gEuW9uEVYA1hsUNGDAsnkkpbq8itY8OUiOgr1E37FO3gvo1+b3+boR0bY5aKG1gTc3YOF8jjxqdEA3985xREXf8d2Ajdgv72zVPYs7uB8Fm5iuhzuah17Ttt89RDQ/PaNhYjKzS/nxhumT94aK+GJQ5h1g2npp3vul54xn1bn+a5Gxrx1o+LfNF/4PtLqW2B/tvSoLNPGaIZFnEfCgvxJlsd4eUfNcQrWWdIycXZ5KS4dIowhU9dbu2jNSfn0MUMLkN0rYTZlalkUY8ncQpmRrmCtTHgBostMJh0oAiTQJ1bWlg9PIi8dL9QjM0a0ZFFsxaE1Ib51ZdY5+iI+ZfRn1rOycvtZVatw/p4zml1Kl3pXWfdbO1Zz8Sfer0tJpnPqfvSzz9VH+DdzA4OqNtD4QYzTvhgCY89hQgC5PfEsX0dqWt0iNwslFGWZEYqBtTTQo5XdEtRL2NXbGE+lR6w/scX4pzRdXOpmAIA4W6BSFQP8hZlUJvXDLeP6pEoRrRiflePCuF8bdw1riGXXYctLu2YJeNDFsHhkr3gyZgjtfGWM+3ORdfd/+xyTwRgD70uzEv46J98vbeN/q5UY2BteSdod62G/h+gcIo8",
)


def test_alpha_fixture_bit_exact():
    """A real lossy-with-alpha stream (VP8X container, lossless-coded
    ALPH plane) decodes bit-exact to the captured reference RGBA — the
    alpha plane must be decoded, never silently dropped as 255."""
    fx = ALPHA_FIXTURE
    stream = _unpack_bytes(fx["stream"])
    out = decode_webp(stream)
    ref = np.frombuffer(_unpack_bytes(fx["rgba"]), np.uint8).reshape(
        fx["rgba_shape"])
    assert np.array_equal(out, ref)
    assert len(np.unique(ref[:, :, 3])) > 1  # the plane is non-trivial


def _alpha_fwd_filter(a: np.ndarray, filt: int) -> np.ndarray:
    """Forward alpha filter (tests only): the exact inverse of the
    decoder's unfilter, so synthetic ALPH chunks can drive every
    filtering method."""
    h, w = a.shape
    a = a.astype(np.int32)
    d = np.zeros_like(a)
    d[0, 0] = a[0, 0]
    d[0, 1:] = (a[0, 1:] - a[0, :-1]) & 0xFF
    if filt == 1:
        d[1:, 0] = (a[1:, 0] - a[:-1, 0]) & 0xFF
        d[1:, 1:] = (a[1:, 1:] - a[1:, :-1]) & 0xFF
    elif filt == 2:
        d[1:] = (a[1:] - a[:-1]) & 0xFF
    elif filt == 3:
        for y in range(1, h):
            for x in range(w):
                left = a[y, x - 1] if x else a[y - 1, 0]
                top = a[y - 1, x]
                tl = a[y - 1, x - 1] if x else a[y - 1, 0]
                g = min(255, max(0, left + top - tl))
                d[y, x] = (a[y, x] - g) & 0xFF
    return d.astype(np.uint8)


def _build_alpha_container(vp8_body_bytes: bytes, alph: bytes, w: int,
                           h: int) -> bytes:
    def chunk(fcc, body):
        return (fcc + struct.pack("<I", len(body)) + body
                + (b"\x00" if len(body) & 1 else b""))
    vp8x = (bytes([0x10, 0, 0, 0]) + struct.pack("<I", w - 1)[:3]
            + struct.pack("<I", h - 1)[:3])
    inner = (b"WEBP" + chunk(b"VP8X", vp8x) + chunk(b"ALPH", alph)
             + chunk(b"VP8 ", vp8_body_bytes))
    return b"RIFF" + struct.pack("<I", len(inner)) + inner


def test_alpha_raw_filter_variants_recover_plane():
    """Library-free: raw ALPH planes under every filtering method (the
    reference encoder only ever emits none/horizontal) must invert to
    the original alpha exactly on top of a fixture lossy frame."""
    fx = FIXTURES["real_mixed_32x48_q60"]
    vp8_b = _vp8_body(_unpack_bytes(fx["stream"]))
    hh, ww = fx["y_shape"]
    alpha = ((np.arange(hh)[:, None] * 3 + np.arange(ww) * 5) % 256
             ).astype(np.uint8)
    for filt in (1, 2, 3):
        alph = bytes([filt << 2]) + _alpha_fwd_filter(alpha, filt).tobytes()
        out = decode_webp(_build_alpha_container(vp8_b, alph, ww, hh))
        assert np.array_equal(out[:, :, 3], alpha), filt
    # filt 0: the plane passes through untouched
    alph = bytes([0]) + alpha.tobytes()
    out = decode_webp(_build_alpha_container(vp8_b, alph, ww, hh))
    assert np.array_equal(out[:, :, 3], alpha)


@needs_libwebp
def test_oracle_alpha_battery():
    """Live: reference-encoder lossy+alpha streams (raw and
    lossless-compressed planes, smooth/binary/flat/noise alphas) and
    synthetic filtered ALPH variants — full RGBA bit-exact."""
    _LIB.WebPEncodeRGBA.restype = ctypes.c_size_t
    _LIB.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(_U8P),
    ]
    rng = np.random.default_rng(3)
    for (h, w) in ((16, 16), (17, 23), (48, 64)):
        for kind in ("rand", "smooth", "binary", "flat"):
            img = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
            if kind == "smooth":
                ax = np.linspace(0, 255, w, dtype=np.uint8)
                img[:, :, 3] = np.tile(ax, (h, 1))
            elif kind == "binary":
                img[:, :, 3] = 255
                img[:h // 2, :, 3] = 0
            elif kind == "flat":
                img[:, :, 3] = 200
            out = _U8P()
            n = _LIB.WebPEncodeRGBA(
                np.ascontiguousarray(img).tobytes(), w, h, w * 4, 75.0,
                ctypes.byref(out))
            assert n > 0
            data = ctypes.string_at(out, n)
            _LIB.WebPFree(out)
            assert np.array_equal(decode_webp(data), _oracle_rgba(data)), \
                (h, w, kind)
    # synthetic filtered variants, reference-decoded
    fx = FIXTURES["real_mixed_32x48_q60"]
    vp8_b = _vp8_body(_unpack_bytes(fx["stream"]))
    hh, ww = fx["y_shape"]
    alpha = ((np.arange(hh)[:, None] + np.arange(ww) * 7) % 256
             ).astype(np.uint8)
    for filt in (0, 1, 2, 3):
        alph = bytes([filt << 2]) + _alpha_fwd_filter(alpha, filt).tobytes()
        data = _build_alpha_container(vp8_b, alph, ww, hh)
        assert np.array_equal(decode_webp(data), _oracle_rgba(data)), filt


def test_alpha_hostile_payloads_refused():
    fx = FIXTURES["real_mixed_32x48_q60"]
    vp8_b = _vp8_body(_unpack_bytes(fx["stream"]))
    hh, ww = fx["y_shape"]
    with pytest.raises(ValueError, match="ALPH"):
        decode_webp(_build_alpha_container(vp8_b, b"", ww, hh))
    with pytest.raises(ValueError, match="truncated"):
        decode_webp(_build_alpha_container(
            vp8_b, bytes([0]) + b"\x00" * 10, ww, hh))
    for bad_hdr in (0x40, 0x80, 0x02, 0x03, 0x20):  # rsv bits, comp 2/3, pre 2
        with pytest.raises(ValueError, match="out of spec"):
            decode_webp(_build_alpha_container(
                vp8_b, bytes([bad_hdr]) + b"\x00" * (ww * hh), ww, hh))


def test_animated_webp_refused_explicitly():
    """Animated WebP nests frames inside ANMF — the still decoder must
    name the refusal, not report a missing image chunk."""
    vp8x = (bytes([0x02, 0, 0, 0]) + b"\x0f\x00\x00" + b"\x0f\x00\x00")
    anim = b"\x00\x00\x00\xff\x00\x00"  # bg color + loop count
    def chunk(fcc, body):
        return (fcc + struct.pack("<I", len(body)) + body
                + (b"\x00" if len(body) & 1 else b""))
    inner = b"WEBP" + chunk(b"VP8X", vp8x) + chunk(b"ANIM", anim)
    data = b"RIFF" + struct.pack("<I", len(inner)) + inner
    with pytest.raises(ValueError, match="animated WebP"):
        decode_webp(data)
