"""Property tests for the native media decoders (SURVEY §5 model applied
to the r06 decode surface): encode→decode must be the identity for EVERY
image/signal the formats can carry, not just the fixture shapes — and the
decoders must never crash with anything but ValueError on arbitrary
byte-mangled inputs (the hardened-contract invariant)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import enterprise_data_warehouse_spark.operators.multimodal as mm
from tests.test_multimodal import (
    _make_bmp,
    _make_jpeg,
    _make_png,
    _make_mp4,
    _make_progressive_jpeg,
    _make_tiff,
    _make_wav,
)

HYP = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@HYP
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    channels=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
    data=st.data(),
)
def test_png_roundtrip_any_shape_any_filters(h, w, channels, seed, data):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h), label="filters"
    )
    decoded = mm.decode_png(_make_png(img, filters=filters))
    assert decoded.shape == img.shape
    assert (decoded == img).all()


@HYP
@given(
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    seed=st.integers(0, 2**31 - 1),
    top_down=st.booleans(),
)
def test_bmp_roundtrip_any_shape(h, w, seed, top_down):
    import struct

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    payload = bytearray(_make_bmp(img))
    if top_down:
        # rewrite as the top-down variant: negate height, reverse row order
        row_bytes = (w * 3 + 3) & ~3
        struct.pack_into("<i", payload, 22, -h)
        body_off = 54
        rows = [
            bytes(payload[body_off + i * row_bytes: body_off + (i + 1) * row_bytes])
            for i in range(h)
        ]
        payload[body_off:] = b"".join(reversed(rows))
    decoded = mm.decode_bmp(bytes(payload))
    assert (decoded == img).all()


@HYP
@given(
    n_frames=st.integers(1, 200),
    n_ch=st.integers(1, 6),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_any_shape(n_frames, n_ch, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-(2**15), 2**15, size=(n_frames, n_ch)).astype(np.int16)
    got_rate, got_ch, out = mm.decode_wav(_make_wav(samples, rate))
    assert (got_rate, got_ch) == (rate, n_ch)
    assert (out == samples).all()


@HYP
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    gray=st.booleans(),
    sub=st.sampled_from(["444", "420"]),
    rst=st.sampled_from([0, 1, 3]),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_error_bounds_any_shape(h, w, gray, sub, rst, seed):
    """JPEG is lossy (quantized DCT), so the property is a reconstruction
    ERROR BOUND, not identity: with flat q=1 tables every shape /
    grayscale / restart-interval combination stays within a few levels.
    4:2:0 uses gray-content RGB so chroma subsampling is exact and the
    same tight bound applies."""
    rng = np.random.default_rng(seed)
    if gray:
        img = rng.integers(0, 256, size=(h, w, 1), dtype=np.uint8)
        payload = _make_jpeg(img, restart_interval=rst)
    elif sub == "420":
        g = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        img = np.stack([g, g, g], axis=-1)
        payload = _make_jpeg(img, "420", restart_interval=rst)
    else:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payload = _make_jpeg(img, "444", restart_interval=rst)
    decoded = mm.decode_jpeg(payload)
    assert decoded.shape == img.shape
    err = np.abs(decoded.astype(np.int32) - img.astype(np.int32))
    assert err.max() <= 6, err.max()


@HYP
@given(
    which=st.sampled_from(["png", "bmp", "wav", "jpeg", "jpeg-prog", "tiff", "mp4"]),
    seed=st.integers(0, 2**31 - 1),
    cut=st.integers(0, 200),
    flips=st.lists(st.tuples(st.integers(0, 199), st.integers(1, 255)),
                   min_size=0, max_size=4),
)
def test_mangled_payloads_never_crash_outside_valueerror(which, seed, cut, flips):
    """Truncate and bit-flip valid payloads arbitrarily: the decoders
    must either still decode or raise ValueError — never IndexError,
    struct.error, zlib.error, reshape crashes, or MemoryError."""
    rng = np.random.default_rng(seed)
    if which == "png":
        payload = bytearray(
            _make_png(rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8))
        )
        decode = mm.decode_png
    elif which == "bmp":
        payload = bytearray(
            _make_bmp(rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8))
        )
        decode = mm.decode_bmp
    elif which == "jpeg":
        payload = bytearray(
            _make_jpeg(rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8))
        )
        decode = mm.decode_jpeg
    elif which == "jpeg-prog":
        payload = bytearray(
            _make_progressive_jpeg(
                rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8))
        )
        decode = mm.decode_jpeg
    elif which == "tiff":
        payload = bytearray(
            _make_tiff(rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8))
        )
        decode = mm.decode_tiff
    elif which == "mp4":
        payload = bytearray(_make_mp4())
        decode = mm.parse_mp4
    else:
        payload = bytearray(
            _make_wav(rng.integers(-100, 100, size=(8, 2)).astype(np.int16), 8000)
        )
        decode = mm.decode_wav
    payload = payload[: max(1, len(payload) - cut % len(payload))]
    for pos, xor in flips:
        if pos < len(payload):
            payload[pos] ^= xor
    try:
        decode(bytes(payload))
    except ValueError:
        pass  # the hardened contract


def test_jpeg_non_divisible_sampling_refused_clearly():
    """ADVICE r07: legal-but-unsupported sampling combos (3x1 beside 4x1)
    must raise the decoder's promised clear ValueError at SOF parse time,
    not an opaque np.stack shape mismatch."""
    rng = np.random.default_rng(3)
    payload = bytearray(
        _make_jpeg(rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8))
    )
    at = bytes(payload).find(b"\xff\xc0")
    assert at != -1
    # SOF0 layout: marker(2) len(2) prec(1) h(2) w(2) ncomp(1) then
    # (cid, hv, tq) per component — set comp0=4x1, comp1=3x1
    comp0_hv = at + 2 + 2 + 1 + 2 + 2 + 1 + 1
    payload[comp0_hv] = 0x41
    payload[comp0_hv + 3] = 0x31
    with pytest.raises(ValueError, match="sampling"):
        mm.decode_jpeg(bytes(payload))


@HYP
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    mode=st.sampled_from(["gray", "420", "444"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_progressive_equals_baseline_any_shape(h, w, mode, seed):
    """Progressive (SOF2) decode is bit-identical to baseline (SOF0)
    decode of the same image for EVERY shape/subsampling — both scripts
    transmit the same quantized coefficients, so any divergence is a
    successive-approximation / EOB-run / band bookkeeping bug."""
    rng = np.random.default_rng(seed)
    if mode == "gray":
        img = rng.integers(0, 256, size=(h, w, 1), dtype=np.uint8)
        sub = "444"
    else:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        sub = mode
    base = mm.decode_jpeg(_make_jpeg(img, sub))
    prog = mm.decode_jpeg(_make_progressive_jpeg(img, sub))
    assert prog.shape == base.shape
    assert (prog == base).all(), int(
        np.abs(prog.astype(int) - base.astype(int)).max())
