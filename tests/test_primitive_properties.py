"""Property tests for the engine's shared primitives (SURVEY §5 model:
randomized invariants on the pieces everything else leans on).

- ``portable_hash64`` is THE cross-engine contract (dedup bands, sampling,
  splits, sketches): pin it against an independent pure-Python md5 mirror,
  plus determinism, range, and seed sensitivity.
- ``interleave_bits`` (Z-order) must be a bijection — a lossy interleave
  would silently merge distinct (a, b) cells and break clustering claims.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from enterprise_data_warehouse_spark.operators.dedup import portable_hash64
from enterprise_data_warehouse_spark.operators.layout import ZBITS, interleave_bits

HYP = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_portable_hash64(x: str, seed: int) -> int:
    # independent mirror of the SQL definition:
    # CAST(('0x' || SUBSTR(MD5(x || '#' || seed), 1, 15)) AS BIGINT)
    return int(hashlib.md5(f"{x}#{seed}".encode()).hexdigest()[:15], 16)


@HYP
@given(
    st.lists(
        st.tuples(st.text(min_size=0, max_size=40), st.integers(0, 63)),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
def test_portable_hash_matches_python_mirror(spark, pairs):
    df = spark.createDataFrame(pairs, "s string, seed int")
    rows = df.select(
        "s", "seed", portable_hash64(F.col("s"), F.col("seed")).alias("h")
    ).collect()
    for r in rows:
        expect = _py_portable_hash64(r["s"], r["seed"])
        assert r["h"] == expect, (r["s"], r["seed"], r["h"], expect)
        assert 0 <= r["h"] < 1 << 60


def test_portable_hash_deterministic_and_seed_sensitive(spark):
    vals = [(f"doc-{i}",) for i in range(500)]
    df = spark.createDataFrame(vals, "s string")
    out = df.select(
        portable_hash64(F.col("s"), 0).alias("h0"),
        portable_hash64(F.col("s"), 0).alias("h0b"),
        portable_hash64(F.col("s"), 1).alias("h1"),
        (portable_hash64(F.col("s"), 0) % 16).alias("bucket"),
    )
    rows = out.collect()
    assert all(r["h0"] == r["h0b"] for r in rows)
    diff = sum(1 for r in rows if r["h0"] != r["h1"])
    assert diff == len(rows), "seed must reshuffle essentially every key"
    # crude uniformity: no 16-bucket holds more than 3x its fair share
    from collections import Counter

    counts = Counter(r["bucket"] for r in rows)
    assert len(counts) == 16 and max(counts.values()) <= 3 * (500 / 16)


def _deinterleave(z: int, bits: int) -> tuple[int, int]:
    a = b = 0
    for i in range(bits):
        a |= ((z >> (2 * i)) & 1) << i
        b |= ((z >> (2 * i + 1)) & 1) << i
    return a, b


@HYP
@given(
    st.lists(
        st.tuples(st.integers(0, (1 << ZBITS) - 1), st.integers(0, (1 << ZBITS) - 1)),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
def test_zorder_interleave_is_a_bijection(spark, pairs):
    df = spark.createDataFrame(pairs, "a long, b long")
    rows = df.select(
        "a", "b", interleave_bits(F.col("a"), F.col("b")).alias("z")
    ).collect()
    for r in rows:
        assert _deinterleave(r["z"], ZBITS) == (r["a"], r["b"])
    assert len({r["z"] for r in rows}) == len(pairs), "distinct cells must stay distinct"
