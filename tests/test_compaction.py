"""Small-file compaction: the parquet-lake maintenance op Snowflake hides
from the reference (micro-partition compaction) made explicit."""

from __future__ import annotations

from pyspark.sql import functions as F

from enterprise_data_warehouse_spark.sources.sink import compact_parquet, _dir_stats
from enterprise_data_warehouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_compaction_shrinks_file_count_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "orders_small_files")
    orders = load_table(spark, SF, "orders")
    orders.repartition(64).write.parquet(path)  # simulate small-file debris
    n_before, _ = _dir_stats(spark, path)
    assert n_before == 64
    before_rows = spark.read.parquet(path).count()
    before_sum = spark.read.parquet(path).agg({"o_totalprice": "sum"}).first()[0]

    stats = compact_parquet(spark, path)  # tiny table → one 128MB-target file
    assert stats["files_before"] == 64 and stats["files_after"] == 1

    after = spark.read.parquet(path)
    assert after.count() == before_rows
    assert abs(after.agg({"o_totalprice": "sum"}).first()[0] - before_sum) < 1e-6


def test_partitioned_compaction_cannot_increase_file_count(spark, tmp_path):
    """The partition_by path: round-robin + partitionBy would emit
    n_files × |values| files (more debris than it started with); the
    salted partition-column shuffle must emit ≤ files_per_partition files
    per directory and strictly shrink the total."""
    import os

    path = str(tmp_path / "orders_part")
    orders = load_table(spark, SF, "orders").withColumn(
        "prio", F.col("o_orderpriority")
    )
    # 16 tasks × 5 priorities ≈ 80 small files of debris
    orders.repartition(16).write.partitionBy("prio").parquet(path)
    n_before, _ = _dir_stats(spark, path)
    assert n_before > 16
    before_rows = spark.read.parquet(path).count()

    stats = compact_parquet(spark, path, partition_by=["prio"])
    assert stats["files_after"] < stats["files_before"]
    # tiny table → 1 target file per partition value
    part_dirs = [d for d in os.listdir(path) if d.startswith("prio=")]
    assert len(part_dirs) == 5
    for d in part_dirs:
        files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)

    after = spark.read.parquet(path)
    assert after.count() == before_rows


def test_compact_refuses_versioned_root(spark, tmp_path):
    """Compacting a commit-manifest root would read every version dir as
    one dataset and swap the manifest away — must refuse loudly."""
    import pytest

    from enterprise_data_warehouse_spark.sources.sink import compact_parquet
    from enterprise_data_warehouse_spark.sources.versioned import VersionedTable

    path = str(tmp_path / "t")
    VersionedTable(spark, path).commit(
        spark.createDataFrame([(1, "a")], "id int, val string")
    )
    with pytest.raises(ValueError, match="commit-manifest"):
        compact_parquet(spark, path)


def test_interrupted_compaction_heals_and_nothing_is_lost(spark, tmp_path):
    """Crash between the two swap renames: the table lives under the aside
    name and `path` is missing. The next compact_parquet must rename it
    back BEFORE doing anything else (no reliance on the staged copy), then
    compact normally — and a stale aside left by a crash AFTER the swap
    must be garbage-collected, not renamed over the fresh layout."""
    import os
    import shutil

    path = str(tmp_path / "t")
    orders = load_table(spark, SF, "orders")
    orders.repartition(8).write.parquet(path)
    rows = spark.read.parquet(path).count()

    # simulate the mid-swap crash: current layout renamed aside, staged
    # copy complete, path missing
    shutil.move(path, path + "__compact_old-deadbeef")
    orders.repartition(2).write.parquet(path + "__compact_staged")
    assert not os.path.exists(path)

    stats = compact_parquet(spark, path)
    assert stats["files_before"] == 8 and stats["files_after"] == 1
    assert spark.read.parquet(path).count() == rows
    assert not os.path.exists(path + "__compact_old-deadbeef")
    assert not os.path.exists(path + "__compact_staged")
    leftovers = [d for d in os.listdir(tmp_path) if "__compact" in d]
    assert leftovers == []

    # crash AFTER the swap (aside delete lost): stale aside next to a live
    # table is removed, the live table untouched
    shutil.copytree(path, path + "__compact_old-cafecafe")
    stats = compact_parquet(spark, path)
    assert spark.read.parquet(path).count() == rows
    assert not os.path.exists(path + "__compact_old-cafecafe")


def test_compaction_refuses_non_atomic_rename_stores(spark, tmp_path, monkeypatch):
    """The two-rename swap and its heal are sound only under atomic
    directory rename; on copy+delete emulations (bare s3a) a crash
    mid-rename splits rows across path and aside and the heal would delete
    live data — so the probe must refuse up front, with an explicit
    opt-in."""
    import pytest as _pytest

    from enterprise_data_warehouse_spark.sources import sink as S
    from enterprise_data_warehouse_spark.sources.versioned import (
        UnsupportedStoreError,
    )

    path = str(tmp_path / "t")
    load_table(spark, SF, "orders").repartition(4).write.parquet(path)
    monkeypatch.setattr(S, "_ATOMIC_RENAME_SCHEMES", frozenset())
    with _pytest.raises(UnsupportedStoreError, match="rename"):
        compact_parquet(spark, path)
    stats = compact_parquet(spark, path, assume_atomic_rename=True)
    assert stats["files_after"] <= stats["files_before"]
