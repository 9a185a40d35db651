"""Time-travel / schema-evolution registry queries (operators/timetravel.py):
value semantics are oracle-pinned by the driver; these pin the local
contracts — pinned reads differ from current, evolved merges null-fill,
and repeated runs reuse one scratch tree instead of leaking mkdtemps."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from enterprise_data_warehouse_spark.queries import load_registry

SF = "/root/testdata/sf0.001"
REG = load_registry()


def test_time_travel_versions_differ_and_are_pinned(spark):
    df = REG["time_travel_read"].fn(spark, SF)
    rows = df.collect()
    v1 = {(r["c_mktsegment"]): r["n_customers"] for r in rows if r["snapshot"] == "v1"}
    v2 = {(r["c_mktsegment"]): r["n_customers"] for r in rows if r["snapshot"] == "v2"}
    assert set(v1) == set(v2)  # same segments in both snapshots
    # v1 was the half-corpus (even custkeys) — strictly fewer per segment
    assert all(v1[s] < v2[s] for s in v1)
    assert sum(v2.values()) == 150  # sf0.001 customer count


def test_schema_evolution_nullfills_old_rows_only(spark):
    df = REG["schema_evolution_merge"].fn(spark, SF)
    # rows restated by the wide delta carry the new column; pre-evolution
    # survivors null-fill it — and only they
    n_null = df.where(F.col("o_orderpriority").isNull()).count()
    n_wide = df.where(F.col("o_orderpriority").isNotNull()).count()
    assert n_null > 0 and n_wide > 0
    assert df.count() == n_null + n_wide


def test_repeated_runs_reuse_one_scratch_tree(spark):
    base = os.path.join(tempfile.gettempdir(), "edw_query_work")
    for _ in range(2):
        REG["time_travel_read"].fn(spark, SF).collect()
    trees = [d for d in os.listdir(base) if d.startswith("timetravel_")]
    # one tree per (query, sf, process): the previous run's tree was
    # removed, not accumulated (trees from OTHER harness processes on the
    # same sf may coexist — that's the pid suffix's whole point)
    mine = f"timetravel_sf0.001_pid{os.getpid()}"
    assert trees.count(mine) == 1

def test_work_dir_is_per_process_and_reaps_only_stale_peers(tmp_path, monkeypatch):
    """Concurrent harness processes (bench + verify_local on the same sf)
    must not rmtree each other's live versioned tables: the scratch root is
    PID-suffixed, and peer trees are reaped only when >1h untouched."""
    import os
    import time

    import enterprise_data_warehouse_spark.operators.timetravel as tt

    monkeypatch.setattr("tempfile.gettempdir", lambda: str(tmp_path))
    root = tt._work_dir("tt", "/root/testdata/sf0.01")
    assert f"pid{os.getpid()}" in root

    base = os.path.dirname(root)
    fresh_peer = os.path.join(base, "tt_sf0.01_pid99998")
    stale_peer = os.path.join(base, "tt_sf0.01_pid99999")
    os.makedirs(fresh_peer)
    os.makedirs(stale_peer)
    old = time.time() - 7200
    os.utime(stale_peer, (old, old))

    root2 = tt._work_dir("tt", "/root/testdata/sf0.01")
    assert root2 == root
    assert os.path.isdir(fresh_peer), "live peer must survive"
    assert not os.path.exists(stale_peer), "stale peer must be reaped"


def test_incremental_fact_merge_partitioned_protocol_shape(spark):
    """The registry query's SECOND incremental commit must show the
    steady-state 100 TB shape in its marker: a wm memo (next run reads
    the watermark in O(1)), a narrow touched list ({1998, 2000, 2001} of
    seven year partitions — the replayed batch-1 rows were dropped by
    the watermark, or 1999 would appear), and typed partition pruning
    metadata (pcol/ptype)."""
    from enterprise_data_warehouse_spark.sources.versioned import VersionedTable

    sf = "/root/testdata/sf0.001"
    REG["incremental_fact_merge_partitioned"].fn(spark, sf).count()
    base = os.path.join(tempfile.gettempdir(), "edw_query_work",
                        f"incrpart_{os.path.basename(sf)}_pid{os.getpid()}")
    t = VersionedTable(spark, os.path.join(base, "fact"))
    assert t.current_version() == 3
    m = t._read_marker(3)
    assert m["op"] == "merge_partitioned"
    assert m["pcol"] == "o_year" and m["ptype"] == "int"
    assert m["touched"] == ["1998", "2000", "2001"], m["touched"]
    assert m["wm"]["updated_at"] >= "2000-06-15 00:00:00"
    # batch 1's marker memoized its own watermark too
    m2 = t._read_marker(2)
    assert m2["wm"]["updated_at"] < "2000-01-01"
    # untouched year partitions (1995-1997, 1999) still point at the
    # PREVIOUS version's immutable dirs — only touched ones were rewritten
    assert all(m["parts"][y].startswith("v00000002-")
               for y in ("1995", "1996", "1997", "1999"))
    assert all(m["parts"][y].startswith("v00000003-")
               for y in ("1998", "2000", "2001"))
