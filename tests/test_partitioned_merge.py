"""Partition-scoped MERGE: correctness AND the file-level guarantee — a
delta touching one partition must leave every other partition's files
physically untouched."""

from __future__ import annotations

import os

from enterprise_data_warehouse_spark.sources.sink import merge_upsert_partitioned


def _files_with_mtimes(root: str, part: str) -> dict[str, float]:
    d = os.path.join(root, part)
    return {
        f: os.path.getmtime(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    }


def test_partition_scoped_merge(spark, tmp_path):
    path = str(tmp_path / "fact")
    initial = spark.createDataFrame(
        [
            (1, "2024-01-01", 10.0),
            (2, "2024-01-01", 20.0),
            (3, "2024-01-02", 30.0),
            (4, "2024-01-03", 40.0),
        ],
        "id int, date_key string, amount double",
    )
    merge_upsert_partitioned(spark, path, initial, ["id"], "date_key")

    untouched_before = {
        p: _files_with_mtimes(path, f"date_key={p}")
        for p in ("2024-01-02", "2024-01-03")
    }

    delta = spark.createDataFrame(
        [(2, "2024-01-01", 99.0), (5, "2024-01-01", 50.0)],
        "id int, date_key string, amount double",
    )
    merge_upsert_partitioned(spark, path, delta, ["id"], "date_key")

    # partition values type-infer back as dates; compare as strings
    got = {
        (r["id"]): (str(r["date_key"]), r["amount"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        1: ("2024-01-01", 10.0),
        2: ("2024-01-01", 99.0),  # updated
        3: ("2024-01-02", 30.0),
        4: ("2024-01-03", 40.0),
        5: ("2024-01-01", 50.0),  # inserted
    }

    # untouched partitions: identical files, byte-for-byte timestamps
    for p, before in untouched_before.items():
        after = _files_with_mtimes(path, f"date_key={p}")
        assert after == before, p


def test_partitioned_merge_idempotent(spark, tmp_path):
    path = str(tmp_path / "fact")
    batch = spark.createDataFrame(
        [(1, "2024-01-01", 1.0), (2, "2024-01-02", 2.0)],
        "id int, date_key string, amount double",
    )
    merge_upsert_partitioned(spark, path, batch, ["id"], "date_key")
    merge_upsert_partitioned(spark, path, batch, ["id"], "date_key")
    assert spark.read.parquet(path).count() == 2
