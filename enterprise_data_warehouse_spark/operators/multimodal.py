"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata (driver-mandated extension; BASELINE.json north star).

The reference has no media pipeline (SURVEY.md §1.1 — warehouse types only),
so this layer is designed Spark-first for a 100 TB training-data pipeline:

- media payloads are **opaque binary columns** + a typed metadata struct;
  Parquet stores them page-compressed and Spark never materializes a payload
  until a UDF touches the row (column pruning keeps metadata-only queries
  payload-free — verify with ``ReadSchema`` in ``.explain``);
- plan-level operators (frame sampling, audio chunking) are **pure JVM
  explode/sequence** — no Python in the hot path, whole-stage codegen'd;
- decode / feature-extraction crosses the Arrow boundary ONCE per batch via
  ``mapInPandas``; the actual pixel/sample decode is STUBBED (PIL/librosa are
  not in this container — see ``_decode_image_real``) behind a deterministic
  fake so the batch shape, schema, and partitioning are real and tested.

The test corpus has no binary column, so the manifest derives one
deterministically from ``documents.text`` (UTF-8 encode) — at production
scale this is the column a crawler would have written.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import query
from ..sources.tables import load_table

FPS = 4  # deterministic synthetic frame rate for the video plan
CHUNK_S = 10  # audio chunk length in seconds


def media_type(doc_id: Column) -> Column:
    """Deterministic modality assignment for the synthetic corpus."""
    return (
        F.when(doc_id % 3 == 0, "image")
        .when(doc_id % 3 == 1, "audio")
        .otherwise("video")
    )


def media_manifest_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manifest with the *payload*: binary column + typed metadata.

    ``payload`` is real binary (``encode(text)``); width/height/duration/
    n_frames are arithmetic on doc_id so every engine derives identical
    metadata. Partitioning note: at 100 TB you'd write this
    ``partitionBy(media_type)`` so modality-specific pipelines prune."""
    d = load_table(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    return d.select(
        doc_id,
        media_type(doc_id).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            (F.lit(64) + (doc_id % 16) * 32).cast("int").alias("width"),
            (F.lit(64) + (doc_id % 12) * 32).cast("int").alias("height"),
            (F.lit(1) + doc_id % 60).cast("double").alias("duration_s"),
            ((F.lit(1) + doc_id % 60) * FPS).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


MANIFEST_ORACLE = """
SELECT doc_id,
  CASE WHEN doc_id % 3 = 0 THEN 'image'
       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
  octet_length(encode(text)) AS n_bytes,
  md5(text) AS payload_md5,
  CAST(64 + (doc_id % 16) * 32 AS INT) AS width,
  CAST(64 + (doc_id % 12) * 32 AS INT) AS height,
  CAST(1 + doc_id % 60 AS DOUBLE) AS duration_s
FROM documents
"""


@query("media_manifest", oracle=MANIFEST_ORACLE, bench=True)
def media_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest projection: payload stays binary internally; the oracle-facing
    row carries size + md5 (engines render raw bytes differently, hashes
    identically — Spark md5(binary) == DuckDB md5(utf8 text))."""
    m = media_manifest_df(spark, sf_dir)
    return m.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.duration_s").alias("duration_s"),
    )


FRAME_ORACLE = f"""
SELECT doc_id,
  unnest(range(0, CAST((1 + doc_id % 60) * {FPS} AS BIGINT), {FPS})) AS frame_idx,
  CAST(unnest(range(0, CAST((1 + doc_id % 60) * {FPS} AS BIGINT), {FPS})) AS DOUBLE)
    / {FPS} AS frame_ts_s
FROM documents WHERE doc_id % 3 = 2
"""


@query("video_frame_sample_plan", oracle=FRAME_ORACLE)
def video_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling *plan*: one row per sampled frame (every FPS-th frame
    = 1 frame/sec), pure sequence+explode — the decode stub joins this plan
    to payload batches. Explode is narrow (no shuffle): each input row fans
    out inside its partition, so the plan scales with video count."""
    m = media_manifest_df(spark, sf_dir).where(F.col("media_type") == "video")
    idx = F.explode(
        F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(FPS))
    ).alias("frame_idx")
    return m.select("doc_id", idx).select(
        "doc_id",
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        (F.col("frame_idx").cast("double") / FPS).alias("frame_ts_s"),
    )


CHUNK_ORACLE = f"""
SELECT doc_id,
  unnest(range(0, CAST(ceil((1 + doc_id % 60) / {CHUNK_S}.0) AS BIGINT))) AS chunk_idx,
  CAST(unnest(range(0, CAST(ceil((1 + doc_id % 60) / {CHUNK_S}.0) AS BIGINT))) * {CHUNK_S} AS DOUBLE) AS chunk_start_s,
  LEAST(CAST(1 + doc_id % 60 AS DOUBLE),
        CAST((unnest(range(0, CAST(ceil((1 + doc_id % 60) / {CHUNK_S}.0) AS BIGINT))) + 1) * {CHUNK_S} AS DOUBLE)) AS chunk_end_s
FROM documents WHERE doc_id % 3 = 1
"""


@query("audio_chunk_plan", oracle=CHUNK_ORACLE)
def audio_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio chunking plan: fixed 10 s windows over each clip's duration,
    last chunk clamped to the clip end. Same narrow explode shape as the
    frame plan."""
    m = media_manifest_df(spark, sf_dir).where(F.col("media_type") == "audio")
    n_chunks = F.ceil(F.col("meta.duration_s") / CHUNK_S).cast("bigint")
    row = m.select(
        "doc_id",
        F.col("meta.duration_s").alias("duration_s"),
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias("chunk_idx"),
    )
    return row.select(
        "doc_id",
        "chunk_idx",
        (F.col("chunk_idx") * CHUNK_S).cast("double").alias("chunk_start_s"),
        F.least(
            F.col("duration_s"), ((F.col("chunk_idx") + 1) * CHUNK_S).cast("double")
        ).alias("chunk_end_s"),
    )


# --- decode / feature-extraction stubs (Arrow boundary) ----------------------


def decode_bmp(payload: bytes):
    """REAL image decode for uncompressed 24-bit BMP — pure numpy, no
    external codec. Parses the BITMAPFILEHEADER/BITMAPINFOHEADER, strips
    the 4-byte row padding, flips the bottom-up row order, and returns an
    (H, W, 3) uint8 array in RGB. Compressed formats (JPEG/PNG) stay
    behind the PIL gate in _decode_image_real — this covers the
    uncompressed interchange format end-to-end in-container."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    if len(payload) < 34:
        raise ValueError(
            f"BMP header truncated: {len(payload)} bytes, need >= 34"
        )
    data_off = struct.unpack_from("<I", payload, 10)[0]
    # biHeight is SIGNED: negative means top-down row order (legal BMP)
    hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP (got bpp={bpp}, "
                         f"compression={compression})")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ValueError(f"invalid BMP dimensions {width}x{height}")
    row_bytes = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    if data_off + row_bytes * height > len(payload):
        raise ValueError(
            f"BMP pixel data truncated: needs {row_bytes * height} bytes at "
            f"offset {data_off}, payload is {len(payload)}"
        )
    raw = np.frombuffer(payload, np.uint8, count=row_bytes * height,
                        offset=data_off)
    rows = raw.reshape(height, row_bytes)[:, : width * 3]
    img = rows.reshape(height, width, 3)[:, :, ::-1]  # BGR→RGB
    if not top_down:
        img = img[::-1]  # bottom-up storage → flip to natural order
    return np.ascontiguousarray(img)


def decode_png(payload: bytes):
    """REAL image decode for 8-bit non-interlaced PNG — stdlib zlib +
    numpy, no external codec. Walks the chunk stream (IHDR/IDAT/IEND),
    inflates the concatenated IDAT bodies, reverses the per-row filters
    (None/Sub/Up/Average/Paeth per the PNG spec §9), and returns an
    (H, W, C) uint8 array with C=3 (RGB), 4 (RGBA), or 1 (grayscale).
    Palette, 16-bit, and Adam7-interlaced PNGs are rejected with a clear
    error; JPEG stays behind the PIL gate in _decode_image_real."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(payload):
        size, ctype = struct.unpack_from(">I4s", payload, pos)
        body = pos + 8
        if body + size > len(payload):
            raise ValueError(f"PNG chunk {ctype!r} overruns the payload")
        if ctype == b"IHDR":
            if size < 13:
                raise ValueError(f"PNG IHDR chunk truncated ({size} bytes)")
            ihdr = struct.unpack_from(">IIBBBBB", payload, body)
        elif ctype == b"IDAT":
            idat += payload[body:body + size]
        elif ctype == b"IEND":
            break
        pos = body + size + 4  # skip the CRC
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    width, height, bit_depth, color_type, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if bit_depth != 8 or channels is None or comp != 0 or filt != 0:
        raise ValueError(
            f"only 8-bit gray/RGB/RGBA PNG (got depth={bit_depth}, "
            f"color_type={color_type})"
        )
    if interlace != 0:
        raise ValueError("Adam7-interlaced PNG not supported")
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid PNG dimensions {width}x{height}")
    bpp = channels  # bytes per pixel at depth 8
    stride = width * bpp
    expected = height * (stride + 1)
    # bounded inflate: a crafted IDAT can expand a few KB into tens of GB,
    # so never materialize more than the dimensions declare (+1 byte to
    # detect overflow) — the bomb fails HERE, not in an executor OOM
    inflater = zlib.decompressobj()
    try:
        inflated = inflater.decompress(bytes(idat), expected + 1)
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT stream is not valid zlib: {exc}") from exc
    if len(inflated) > expected or inflater.unconsumed_tail:
        raise ValueError(
            f"PNG pixel stream inflates past the {expected} bytes its "
            f"declared {width}x{height}x{channels} dimensions allow"
        )
    raw = np.frombuffer(inflated, np.uint8)
    if raw.size != expected:
        raise ValueError(
            f"PNG pixel stream is {raw.size} bytes, expected {expected}"
        )
    rows = raw.reshape(height, stride + 1)
    out = np.zeros((height, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(height):
        ftype, row = int(rows[y, 0]), rows[y, 1:].copy()
        if ftype == 0:  # None
            recon = row
        elif ftype == 1:  # Sub: + left → modular cumsum along x per lane
            recon = np.add.accumulate(
                row.reshape(width, bpp), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif ftype == 2:  # Up: + above (uint8 wrap is the spec's mod 256)
            recon = row + prev
        elif ftype in (3, 4):  # Average / Paeth: sequential along x.
            # The left-pixel recurrence forces a serial pass; plain Python
            # ints over list buffers run ~10× faster than per-element
            # numpy scalar indexing here (at deploy scale compressed decode
            # routes through PIL anyway — this keeps the pure-python path
            # usable for real images, not just fixtures).
            r = row.tolist()
            p = prev.tolist()
            if ftype == 3:
                for i in range(stride):
                    a = r[i - bpp] if i >= bpp else 0
                    r[i] = (r[i] + ((a + p[i]) >> 1)) & 0xFF
            else:
                for i in range(stride):
                    a = r[i - bpp] if i >= bpp else 0
                    b = p[i]
                    c = p[i - bpp] if i >= bpp else 0
                    pa = abs(b - c)
                    pb = abs(a - c)
                    pc = abs(a + b - 2 * c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    r[i] = (r[i] + pred) & 0xFF
            recon = np.asarray(r, np.uint8)
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = recon
        prev = out[y]
    return out.reshape(height, width, bpp)


def decode_wav(payload: bytes):
    """REAL audio decode for PCM WAV — pure numpy RIFF parsing. Returns
    (sample_rate, n_channels, samples) with samples shaped (n_frames,
    n_channels) as int16. Compressed codecs (MP3/AAC) remain gated on an
    external decoder — this covers the uncompressed interchange format."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, n_ch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        chunk_id, size = payload[pos:pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = pos + 8
        if chunk_id == b"fmt ":
            if size < 16 or body + 16 > len(payload):
                raise ValueError(
                    f"WAV fmt chunk truncated ({size} declared bytes, "
                    f"{len(payload) - body} remain)"
                )
            fmt, n_ch, rate = struct.unpack_from("<HHI", payload, body)
            bits = struct.unpack_from("<H", payload, body + 14)[0]
            if fmt != 1 or bits != 16:
                raise ValueError(f"only PCM16 WAV (got fmt={fmt}, bits={bits})")
            if n_ch < 1:
                raise ValueError(f"invalid WAV channel count {n_ch}")
        elif chunk_id == b"data":
            if body + size > len(payload):
                raise ValueError(
                    f"WAV data chunk declares {size} bytes but only "
                    f"{len(payload) - body} remain in the payload"
                )
            data = payload[body:body + size]
        pos = body + size + (size & 1)  # chunks pad to even offsets
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    frame = 2 * n_ch
    if len(data) % frame:
        raise ValueError(
            f"WAV data chunk truncated mid-frame: {len(data)} bytes is not "
            f"a multiple of the {frame}-byte frame ({n_ch} ch × 16-bit)"
        )
    samples = np.frombuffer(data, np.int16).reshape(-1, n_ch)
    return rate, n_ch, samples


def _decode_image_real(payload: bytes, width: int, height: int):
    """The real decode path. Uncompressed 24-bit BMP (decode_bmp) and
    8-bit non-interlaced PNG (decode_png, stdlib zlib) decode
    IN-CONTAINER with a nearest-neighbor resize; JPEG requires PIL,
    absent here, and stays import-gated so the pipeline degrades to the
    deterministic fake rather than crashing."""
    img = None
    if payload[:2] == b"BM":
        img = decode_bmp(payload)
    elif payload[:8] == b"\x89PNG\r\n\x1a\n":
        img = decode_png(payload)
    if img is not None:
        import numpy as np

        h, w = img.shape[:2]
        ys = (np.arange(height) * h // height).clip(0, h - 1)
        xs = (np.arange(width) * w // width).clip(0, w - 1)
        return img[ys][:, xs]
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "JPEG decode requires pillow; deterministic fake used instead "
            "(uncompressed BMP and 8-bit PNG decode natively — decode_bmp/"
            "decode_png)"
        ) from exc
    raise NotImplementedError("real decode wired at deploy time")


def _fake_pixel_stats(payload: bytes) -> tuple[float, float]:
    """Deterministic stand-in for decoded-pixel statistics: byte-value mean
    and population std of the payload.

    Computed from EXACT integer moments (s1=Σb, s2=Σb²) and then combined
    with the same double-arithmetic shape the SQL oracle uses — for payloads
    under ~1 MB both moments are < 2^53, every intermediate is exactly
    representable, and the two engines produce bit-identical doubles, which
    is what lets the Arrow boundary be value-hash-verified."""
    import math

    n = len(payload)
    if n == 0:
        return 0.0, 0.0
    s1 = sum(payload)
    s2 = sum(b * b for b in payload)
    mean = s1 / n
    var = (float(s2) - float(s1) * float(s1) / n) / n
    # math.sqrt, NOT `** 0.5`: pow(x, 0.5) routes through libm pow, which
    # is allowed to (and measured to, 13/16667 sf1 docs) mis-round by one
    # ULP relative to IEEE sqrt — the hardware-correctly-rounded sqrt is
    # what every SQL engine's SQRT computes, so it is the portable one
    return float(mean), math.sqrt(max(var, 0.0))


IMAGE_FEATURE_ORACLE = """
WITH imgs AS (
  SELECT doc_id, text,
    CAST(64 + (doc_id % 16) * 32 AS INT) AS width,
    CAST(64 + (doc_id % 12) * 32 AS INT) AS height
  FROM documents WHERE doc_id % 3 = 0
), chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM imgs
), moments AS (
  SELECT doc_id, COUNT(*) AS n,
         SUM(ord(ch)) AS s1, SUM(ord(ch) * ord(ch)) AS s2
  FROM chars GROUP BY doc_id
)
SELECT i.doc_id, i.width, i.height,
  CAST(m.s1 AS DOUBLE) / m.n AS mean_intensity,
  SQRT(GREATEST((CAST(m.s2 AS DOUBLE) - CAST(m.s1 AS DOUBLE) * CAST(m.s1 AS DOUBLE) / m.n) / m.n, 0.0))
    AS std_intensity,
  CAST(i.width AS DOUBLE) / i.height AS aspect_ratio
FROM imgs i JOIN moments m ON m.doc_id = i.doc_id
"""


@query("image_feature_extract", oracle=IMAGE_FEATURE_ORACLE)
def image_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-style decode→feature batch: mapInPandas over (payload, meta) — one
    Arrow batch per ~10k rows, model/decoder initialized once per batch
    iterator (not per row).

    Oracle-paired: the deterministic byte-stat fake (the stand-in for pixel
    statistics while the real decoder is import-gated, see
    _decode_image_real) is itself SQL-expressible, so the whole Arrow
    round-trip — schema, batching, column alignment — is value-verified
    against DuckDB, not just row-counted. The corpus is ASCII, so byte
    values equal character ordinals on the oracle side."""
    import pandas as pd

    m = media_manifest_df(spark, sf_dir).where(F.col("media_type") == "image")
    src = m.select(
        "doc_id",
        "payload",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [_fake_pixel_stats(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "mean_intensity": [s[0] for s in stats],
                    "std_intensity": [s[1] for s in stats],
                    "aspect_ratio": pdf["width"] / pdf["height"],
                }
            )
            yield out

    schema = (
        "doc_id bigint, width int, height int, mean_intensity double, "
        "std_intensity double, aspect_ratio double"
    )
    return src.mapInPandas(extract, schema)
