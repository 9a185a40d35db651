"""Plan-fingerprint result cache: canonicalization (identical semantics →
identical key across independent builds), semantic and version
invalidation, hit correctness, staged-write atomicity, eviction."""

from __future__ import annotations

from pyspark.sql import functions as F

from enterprise_data_warehouse_spark.plans.result_cache import (
    ResultCache,
    plan_fingerprint,
)
from enterprise_data_warehouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _rollup(spark, status):
    o = load_table(spark, SF, "orders")
    return (
        o.where(F.col("o_orderstatus") == status)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


def test_fingerprint_stable_across_independent_builds(spark):
    a = plan_fingerprint(_rollup(spark, "F"))
    b = plan_fingerprint(_rollup(spark, "F"))  # fresh scan, fresh exprIds
    assert a == b


def test_fingerprint_changes_on_semantics_and_versions(spark):
    base = plan_fingerprint(_rollup(spark, "F"))
    assert plan_fingerprint(_rollup(spark, "O")) != base
    assert plan_fingerprint(_rollup(spark, "F"), {"orders": 2}) != base
    assert plan_fingerprint(_rollup(spark, "F"), {"orders": 2}) == plan_fingerprint(
        _rollup(spark, "F"), {"orders": 2}
    )


def test_cache_hits_and_returns_identical_rows(spark, tmp_path):
    cache = ResultCache(spark, str(tmp_path / "rc"))
    df1, hit1 = cache.get_or_build("rollup", _rollup(spark, "F"), {"orders": 1})
    df2, hit2 = cache.get_or_build("rollup", _rollup(spark, "F"), {"orders": 1})
    assert (hit1, hit2) == (False, True)
    assert sorted(map(tuple, df1.collect())) == sorted(map(tuple, df2.collect()))
    assert sorted(map(tuple, df2.collect())) == sorted(
        map(tuple, _rollup(spark, "F").collect())
    )
    assert (cache.hits, cache.misses) == (1, 1)
    assert len(cache.entries("rollup")) == 1


def test_version_bump_builds_new_entry(spark, tmp_path):
    cache = ResultCache(spark, str(tmp_path / "rc"))
    _, h1 = cache.get_or_build("rollup", _rollup(spark, "F"), {"orders": 1})
    _, h2 = cache.get_or_build("rollup", _rollup(spark, "F"), {"orders": 2})
    assert (h1, h2) == (False, False)
    assert len(cache.entries("rollup")) == 2
    keep = {cache.entries("rollup")[0]}
    assert cache.evict("rollup", keep=keep) == 1
    assert len(cache.entries("rollup")) == 1


def test_no_staged_leftovers_after_build(spark, tmp_path):
    cache = ResultCache(spark, str(tmp_path / "rc"))
    cache.get_or_build("rollup", _rollup(spark, "F"))
    import os

    names = os.listdir(str(tmp_path / "rc" / "rollup"))
    assert all(not n.startswith("_staged-") for n in names), names
