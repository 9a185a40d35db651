"""Regression pins for the r09 review findings: fail-open contracts on
char(n) partition probes, incomparable watermark forms, and out-of-range
inherited bloom geometry."""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import functions as F

from enterprise_data_warehouse_spark.sources.versioned import VersionedTable

SF = "/root/testdata/sf0.001"


def _rewrite_marker(marker: Path, meta: dict) -> None:
    """Out-of-band marker edit: drop Hadoop's local-FS .crc sidecar too,
    or the next checksummed open raises ChecksumException."""
    marker.write_text(json.dumps(meta))
    crc = marker.parent / f".{marker.name}.crc"
    if crc.exists():
        crc.unlink()


def test_char_partition_probe_fails_open():
    """char(n) columns compare space-PADDED in Spark, so the parts-map
    key ('ab   ') would key-miss an unpadded probe ('ab') and wrongly
    return zero rows — the gate must fail open (None → full read).
    varchar and string don't pad and stay faithful."""
    assert VersionedTable._part_key("ab", "char(5)") is None
    assert VersionedTable._part_key("ab", "varchar(5)") == "ab"
    assert VersionedTable._part_key("ab", "string") == "ab"
    assert VersionedTable._part_key(7, "int") == "7"


def test_wm_meta_drops_memo_on_incomparable_forms(spark):
    """An offset-aware delta max against a naive prior watermark raises
    TypeError on >, which must DROP the memo (next run does the exact
    scan) — not crash the incremental commit."""
    delta = spark.createDataFrame(
        [("2024-01-01T00:00:00+00:00",)], "wm_col string"
    )
    out = VersionedTable._wm_meta(
        "wm_col", "1900-01-01 00:00:00", delta
    )
    assert out == {}
    # sanity: comparable forms still memoize
    delta2 = spark.createDataFrame(
        [("2024-01-01 00:00:00",)], "wm_col string"
    )
    out2 = VersionedTable._wm_meta("wm_col", "1900-01-01 00:00:00", delta2)
    assert out2 == {"wm": {"wm_col": "2024-01-01 00:00:00"}}


def test_out_of_range_inherited_bloom_does_not_break_merge(spark, tmp_path):
    """A marker recording bloom geometry outside commit()'s accepted
    range (written before validation existed, or by a build with other
    limits) must not make every maintenance op raise through the
    explicit-argument check: the merge proceeds and commits WITHOUT a
    bloom (fail-open), readers scan every file."""
    root = str(tmp_path / "t")
    t = VersionedTable(spark, root)
    nat = spark.read.parquet(f"{SF}/nation.parquet")
    t.commit(nat, bloom_cols=["n_nationkey"])
    v1 = t.current_version()
    marker = Path(root) / "_commits" / f"v{v1:08d}.json"
    meta = json.loads(marker.read_text())
    assert meta["bloom"]["m"] >= 64
    meta["bloom"]["m"] = 1 << 30  # over-cap geometry from another build
    _rewrite_marker(marker, meta)

    assert t._inherited_bloom(v1) == {}
    v2 = t.merge(nat.limit(1), keys=["n_nationkey"])
    m2 = t._read_marker(v2)
    assert "bloom" not in (m2 or {})
    assert t.read().count() == nat.count()

    # in-range geometry still inherits through maintenance ops
    t2 = VersionedTable(spark, str(tmp_path / "t2"))
    t2.commit(nat, bloom_cols=["n_nationkey"])
    v = t2.merge(nat.limit(1), keys=["n_nationkey"])
    assert "bloom" in (t2._read_marker(v) or {})


def test_missing_bloom_cols_does_not_break_merge(spark, tmp_path):
    """r09 ADVICE: the geometry guard validated m and k but not cols — a
    foreign/hand-edited marker whose bloom entry lacks a cols dict (or
    carries a non-dict) raised KeyError at the inherit return, crashing
    every merge/compact. Same fail-open contract: drop the inheritance,
    commit without a bloom."""
    root = str(tmp_path / "t")
    t = VersionedTable(spark, root)
    nat = spark.read.parquet(f"{SF}/nation.parquet")
    t.commit(nat, bloom_cols=["n_nationkey"])
    v1 = t.current_version()
    marker = Path(root) / "_commits" / f"v{v1:08d}.json"
    meta = json.loads(marker.read_text())
    del meta["bloom"]["cols"]  # foreign marker without a cols map
    _rewrite_marker(marker, meta)
    assert t._inherited_bloom(v1) == {}
    v2 = t.merge(nat.limit(1), keys=["n_nationkey"])
    assert "bloom" not in (t._read_marker(v2) or {})
    assert t.read().count() == nat.count()

    # a present-but-empty or non-dict cols map is equally dropped
    meta["bloom"]["cols"] = []
    _rewrite_marker(marker, meta)
    assert t._inherited_bloom(v1) == {}
    meta["bloom"]["cols"] = {}
    _rewrite_marker(marker, meta)
    assert t._inherited_bloom(v1) == {}


def test_bloom_probe_on_unbloomed_version_scans_fine(spark, tmp_path):
    """After the fail-open merge above, a pruned read against the
    bloom-less version must return the same rows as the plain read."""
    root = str(tmp_path / "t")
    t = VersionedTable(spark, root)
    nat = spark.read.parquet(f"{SF}/nation.parquet")
    t.commit(nat, bloom_cols=["n_nationkey"])
    marker = Path(root) / "_commits" / f"v{t.current_version():08d}.json"
    meta = json.loads(marker.read_text())
    meta["bloom"]["m"] = 0
    _rewrite_marker(marker, meta)
    t.merge(nat.limit(1), keys=["n_nationkey"])
    got = (
        t.read(prune={"n_nationkey": 7})
        .where(F.col("n_nationkey") == 7)
        .count()
    )
    assert got == 1
