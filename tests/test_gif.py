"""GIF decoder tests: an independent minimal encoder (always run), real
GIF files shipped inside system packages pinned against the system
giflib's pixel output (skip-gated), and the hostile-payload contract."""

from __future__ import annotations

import ctypes
import struct

import numpy as np
import pytest

from enterprise_data_warehouse_spark.operators import multimodal as mm


def _gif_lzw_encode_literals(indices, min_code_size: int) -> bytes:
    """Literal-only GIF LZW encoder mirroring the decoder-side table
    growth (LSB-first, LATE width change, 4096-entry cap)."""
    clear = 1 << min_code_size
    out = bytearray()
    acc = accbits = 0

    def put(code, size):
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += size
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    size = min_code_size + 1
    table_len = clear + 2
    put(clear, size)
    first = True
    for v in indices:
        put(int(v), size)
        if first:
            first = False
        elif table_len < 4096:
            table_len += 1
        if table_len >= (1 << size) and size < 12:
            size += 1
    put(clear + 1, size)  # EOI
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _make_gif(idx, palette, interlace=False, transparent=None,
              frame_at=(0, 0), screen=None, sub_block=255,
              min_code_size=None) -> bytes:
    """Serialize an (H, W) uint8 index array + (N, 3) palette as a
    GIF89a with a global color table."""
    fh, fw = idx.shape
    fx, fy = frame_at
    sw, sh = screen or (fx + fw, fy + fh)
    n = len(palette)
    ctbits = max(1, (n - 1).bit_length())
    full = np.zeros((1 << ctbits, 3), np.uint8)
    full[:n] = palette
    mcs = min_code_size or max(2, ctbits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (ctbits - 1), 0, 0)
    out += full.tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    data = idx
    if interlace:
        rows = np.concatenate([np.arange(0, fh, 8), np.arange(4, fh, 8),
                               np.arange(2, fh, 4), np.arange(1, fh, 2)])
        data = idx[rows]
    out += struct.pack("<BHHHHB", 0x2C, fx, fy, fw, fh,
                       0x40 if interlace else 0)
    out += bytes([mcs])
    stream = _gif_lzw_encode_literals(data.reshape(-1), mcs)
    for i in range(0, len(stream), sub_block):
        chunk = stream[i:i + sub_block]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0, 0x3B])
    return bytes(out)


REAL_GIFS = [
    "/usr/lib/node_modules/npm/node_modules/retry/equation.gif",
    "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/"
    "test.gif",
]


def test_roundtrip_plain_and_interlaced():
    rng = np.random.default_rng(13)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    for h, w in ((1, 1), (3, 7), (20, 20), (33, 17)):
        idx = rng.integers(0, 16, (h, w)).astype(np.uint8)
        for il in (False, True):
            got = mm.decode_gif(_make_gif(idx, pal, interlace=il))
            assert got.shape == (h, w, 3), (h, w, il)
            assert (got == pal[idx]).all(), (h, w, il)


def test_roundtrip_every_palette_width_and_sub_block_splits():
    rng = np.random.default_rng(14)
    for ctbits in (1, 2, 4, 8):
        n = 1 << ctbits
        pal = rng.integers(0, 256, (n, 3)).astype(np.uint8)
        idx = rng.integers(0, n, (25, 31)).astype(np.uint8)
        for sb in (255, 7, 1):  # sub-block chaining must be transparent
            got = mm.decode_gif(_make_gif(idx, pal, sub_block=sb))
            assert (got == pal[idx]).all(), (ctbits, sb)


def test_lzw_table_growth_through_wide_codes():
    """A long noisy stream drives the decoder across 10/11/12-bit code
    widths and the 4096-entry cap (literal-only encoder mirrors the
    late-change rule exactly, so any width desync corrupts pixels)."""
    rng = np.random.default_rng(15)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    idx = rng.integers(0, 256, (80, 90)).astype(np.uint8)
    got = mm.decode_gif(_make_gif(idx, pal))
    assert (got == pal[idx]).all()


def test_transparency_and_frame_offset_composite():
    pal = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250], [9, 9, 9]],
                   np.uint8)
    idx = np.array([[0, 1], [2, 1]], np.uint8)
    got = mm.decode_gif(_make_gif(idx, pal, transparent=1,
                                  frame_at=(2, 1), screen=(5, 4)))
    assert got.shape == (4, 5, 4)  # RGBA once a transparent index exists
    assert (got[1, 2, :3] == pal[0]).all() and got[1, 2, 3] == 255
    assert got[1, 3, 3] == 0  # the transparent pixel
    assert (got[0, 0, :3] == pal[0]).all()  # background fill (index 0)


def test_hostile_payloads_raise_clearly():
    rng = np.random.default_rng(16)
    pal = rng.integers(0, 256, (4, 3)).astype(np.uint8)
    idx = rng.integers(0, 4, (6, 6)).astype(np.uint8)
    good = _make_gif(idx, pal)
    with pytest.raises(ValueError, match="not a GIF"):
        mm.decode_gif(b"PNG....." + good)
    for cut in range(len(good) - 2):
        with pytest.raises(ValueError):
            mm.decode_gif(good[:cut])
    # dimension bomb
    bomb = bytearray(good)
    struct.pack_into("<HH", bomb, 6, 60000, 60000)
    with pytest.raises(ValueError, match="out of bounds|outside"):
        mm.decode_gif(bytes(bomb))
    # bit flips: refuse or decode, never hang/crash
    for i in range(6, len(good)):
        mutated = good[:i] + bytes([good[i] ^ 0xFF]) + good[i + 1:]
        try:
            out = mm.decode_gif(mutated)
            assert out.dtype == np.uint8
        except ValueError:
            pass


def test_real_package_gifs_decode():
    import os

    for path in REAL_GIFS:
        if not os.path.exists(path):
            pytest.skip(f"{path} not shipped on this system")
        img = mm.decode_gif(open(path, "rb").read())
        assert img.ndim == 3 and img.dtype == np.uint8
        assert img.shape[0] > 0 and img.shape[1] > 0


# --- giflib oracle (skip-gated) -----------------------------------------

try:
    _G = ctypes.CDLL("libgif.so.7")

    class _GifColorType(ctypes.Structure):
        _fields_ = [("Red", ctypes.c_ubyte), ("Green", ctypes.c_ubyte),
                    ("Blue", ctypes.c_ubyte)]

    class _ColorMapObject(ctypes.Structure):
        _fields_ = [("ColorCount", ctypes.c_int),
                    ("BitsPerPixel", ctypes.c_int),
                    ("SortFlag", ctypes.c_bool),
                    ("Colors", ctypes.POINTER(_GifColorType))]

    class _GifImageDesc(ctypes.Structure):
        _fields_ = [("Left", ctypes.c_int), ("Top", ctypes.c_int),
                    ("Width", ctypes.c_int), ("Height", ctypes.c_int),
                    ("Interlace", ctypes.c_bool),
                    ("ColorMap", ctypes.POINTER(_ColorMapObject))]

    class _ExtensionBlock(ctypes.Structure):
        _fields_ = [("ByteCount", ctypes.c_int),
                    ("Bytes", ctypes.POINTER(ctypes.c_ubyte)),
                    ("Function", ctypes.c_int)]

    class _SavedImage(ctypes.Structure):
        _fields_ = [("ImageDesc", _GifImageDesc),
                    ("RasterBits", ctypes.POINTER(ctypes.c_ubyte)),
                    ("ExtensionBlockCount", ctypes.c_int),
                    ("ExtensionBlocks", ctypes.POINTER(_ExtensionBlock))]

    class _GifFileType(ctypes.Structure):
        _fields_ = [("SWidth", ctypes.c_int), ("SHeight", ctypes.c_int),
                    ("SColorResolution", ctypes.c_int),
                    ("SBackGroundColor", ctypes.c_int),
                    ("AspectByte", ctypes.c_ubyte),
                    ("SColorMap", ctypes.POINTER(_ColorMapObject)),
                    ("ImageCount", ctypes.c_int),
                    ("Image", _GifImageDesc),
                    ("SavedImages", ctypes.POINTER(_SavedImage)),
                    ("ExtensionBlockCount", ctypes.c_int),
                    ("ExtensionBlocks", ctypes.POINTER(_ExtensionBlock)),
                    ("Error", ctypes.c_int)]

    _G.DGifOpenFileName.restype = ctypes.POINTER(_GifFileType)
    _G.DGifOpenFileName.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_int)]
    _G.DGifSlurp.argtypes = [ctypes.POINTER(_GifFileType)]
except OSError:  # pragma: no cover - exercised only off-container
    _G = None

needs_giflib = pytest.mark.skipif(
    _G is None, reason="system giflib not available for oracle runs")


def _giflib_first_frame(path: str):
    err = ctypes.c_int()
    f = _G.DGifOpenFileName(path.encode(), ctypes.byref(err))
    assert f, err.value
    assert _G.DGifSlurp(f) == 1
    ft = f.contents
    desc = ft.SavedImages[0].ImageDesc
    n = desc.Width * desc.Height
    # DGifSlurp already restores natural row order for interlaced files
    idx = np.ctypeslib.as_array(
        ft.SavedImages[0].RasterBits, (n,)).copy().reshape(
        desc.Height, desc.Width)
    cm = desc.ColorMap if desc.ColorMap else ft.SColorMap
    cc = cm.contents.ColorCount
    pal = np.array(
        [[cm.contents.Colors[i].Red, cm.contents.Colors[i].Green,
          cm.contents.Colors[i].Blue] for i in range(cc)], np.uint8)
    return desc.Left, desc.Top, pal[idx]


@needs_giflib
def test_real_gifs_pixel_exact_vs_giflib():
    import os

    ran = 0
    for path in REAL_GIFS:
        if not os.path.exists(path):
            continue
        left, top, want = _giflib_first_frame(path)
        got = mm.decode_gif(open(path, "rb").read())[..., :3]
        frame = got[top:top + want.shape[0], left:left + want.shape[1]]
        assert (frame == want).all(), path
        ran += 1
    if not ran:
        pytest.skip("no real GIFs shipped on this system")


@needs_giflib
def test_own_encoder_cross_checked_by_giflib(tmp_path):
    """Triangulate: giflib must read the test encoder's files back to the
    same pixels decode_gif produces — so encoder bugs can't hide a
    matching decoder bug."""
    rng = np.random.default_rng(17)
    pal = rng.integers(0, 256, (32, 3)).astype(np.uint8)
    for il in (False, True):
        idx = rng.integers(0, 32, (24, 19)).astype(np.uint8)
        payload = _make_gif(idx, pal, interlace=il)
        p = tmp_path / "t.gif"
        p.write_bytes(payload)
        _, _, want = _giflib_first_frame(str(p))
        assert (want == pal[idx]).all(), il
        assert (mm.decode_gif(payload) == pal[idx]).all(), il
