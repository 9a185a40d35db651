"""The replica generator's explode path must reproduce the historical
per-index unionByName chain EXACTLY — same multiset of rows — for every
table family it mutates (keys, documents text/n_chars, embeddings first
component). The sf1/sf10/sf100 scaling sets are regenerated from this
code at bench time, so a silent drift here would silently re-baseline
every measured decade in SCALING.md."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from make_sf1 import KEY_COLS, OFF, replicate  # noqa: E402

from enterprise_data_warehouse_spark.sources.tables import (  # noqa: E402
    load_table,
)

SF = "/root/testdata/sf0.001"


def _legacy_replicate(df, name: str, i: int):
    """The pre-r09 per-index builder, kept verbatim as the oracle."""
    out = df
    for k in KEY_COLS.get(name, []):
        out = out.withColumn(k, F.col(k) + F.lit(i * OFF))
    if name == "documents" and i > 0:
        out = out.withColumn(
            "text", F.regexp_replace("text", r"(\S+)", f"$1x{i}")
        ).withColumn("n_chars", F.length("text").cast("long"))
    if name == "embeddings" and i > 0:
        out = out.withColumn(
            "embedding",
            F.concat(
                F.array(F.element_at("embedding", 1) + F.lit(i * 0.01)),
                F.slice("embedding", 2, F.size("embedding") - 1),
            ).cast("array<float>"),
        )
    return out


def _norm(df):
    rows = df.collect()
    out = []
    for r in rows:
        d = r.asDict(recursive=True)
        vals = []
        for k in sorted(d):
            v = d[k]
            if isinstance(v, list):
                v = tuple(
                    round(float(x), 5) if isinstance(x, float) else x
                    for x in v
                )
            elif isinstance(v, float):
                v = round(v, 9)
            vals.append((k, v))
        out.append(tuple(vals))
    return sorted(out)


def test_explode_matches_legacy_union(spark):
    copies = 3
    for name in ("orders", "documents", "embeddings"):
        base = load_table(spark, SF, name)
        legacy = _legacy_replicate(base, name, 0)
        for i in range(1, copies):
            legacy = legacy.unionByName(_legacy_replicate(base, name, i))
        got = replicate(base, name, 0, copies)
        assert got.columns == base.columns, name
        assert _norm(got) == _norm(legacy), name


def test_chunked_ranges_cover_exactly_once(spark):
    base = load_table(spark, SF, "orders").limit(50)
    whole = replicate(base, "orders", 0, 5)
    parts = replicate(base, "orders", 0, 2).unionByName(
        replicate(base, "orders", 2, 5)
    )
    assert _norm(whole) == _norm(parts)
