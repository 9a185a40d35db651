"""Row-level contract gate (quality.write_with_quarantine): planted bad
rows route to quarantine with the right labels; the clean table never
carries a dirty row; counts reconcile."""

from __future__ import annotations

from pyspark.sql import functions as F

from enterprise_data_warehouse_spark.operators.quality import (
    Check,
    violation_flags,
    write_with_quarantine,
)
from enterprise_data_warehouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _dirty_customers(spark):
    c = load_table(spark, SF, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    planted = spark.createDataFrame(
        [
            (None, "BUILDING", 10.0),  # null key
            (990001, "NOT_A_SEGMENT", 10.0),  # bad segment
            (990002, "BUILDING", 10.0),  # dangling FK probe (see checks)
        ],
        "c_custkey bigint, c_mktsegment string, c_acctbal double",
    )
    return c.unionByName(planted)


CHECKS = [
    Check("not_null", "customer", "c_custkey"),
    Check(
        "accepted_values",
        "customer",
        "c_mktsegment",
        values=("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"),
    ),
]


def test_quarantine_routes_and_labels(spark, tmp_path):
    df = _dirty_customers(spark)
    n_total = df.count()
    audit = write_with_quarantine(
        df, CHECKS, str(tmp_path / "clean"), str(tmp_path / "quarantine")
    )
    assert audit["n_clean"] + audit["n_quarantined"] == n_total
    assert audit["n_quarantined"] == 2
    bad = spark.read.parquet(str(tmp_path / "quarantine")).collect()
    labels = {tuple(r["_violations"]) for r in bad}
    assert ("not_null:c_custkey",) in labels
    assert ("accepted_values:c_mktsegment",) in labels
    clean = spark.read.parquet(str(tmp_path / "clean"))
    assert "_violations" not in clean.columns
    assert clean.where(F.col("c_custkey").isNull()).count() == 0


def test_unique_and_relationship_flags(spark):
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    dup = orders.limit(1)
    dangling = spark.createDataFrame(
        [(999999901, 999999901)], "o_orderkey bigint, o_custkey bigint"
    )
    df = orders.unionByName(dup).unionByName(dangling)
    checks = [
        Check("unique", "orders", "o_orderkey"),
        Check(
            "relationships",
            "orders",
            "o_custkey",
            ref_table="customer",
            ref_column="c_custkey",
        ),
    ]
    tables = {"customer": load_table(spark, SF, "customer")}
    flagged = violation_flags(df, checks, tables)
    by_label = (
        flagged.select(F.explode("_violations").alias("v"))
        .groupBy("v")
        .count()
        .collect()
    )
    counts = {r["v"]: r["count"] for r in by_label}
    assert counts["unique:o_orderkey"] == 2  # both copies of the dup key
    assert counts["relationships:o_custkey"] == 1


def test_two_relationship_checks_do_not_collide(spark):
    """Two relationships checks in one suite (the shape the catalog facts
    declare) must not collide on the join marker column — regression for
    the AMBIGUOUS_REFERENCE `_parent_hit` failure with ≥2 FK checks."""
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    dangling = spark.createDataFrame(
        [(999999901, 999999902, 999999903)],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint",
    )
    df = li.unionByName(dangling)
    checks = [
        Check(
            "relationships", "lineitem", "l_orderkey",
            ref_table="orders", ref_column="o_orderkey",
        ),
        Check(
            "relationships", "lineitem", "l_partkey",
            ref_table="part", ref_column="p_partkey",
        ),
        Check(
            "relationships", "lineitem", "l_suppkey",
            ref_table="supplier", ref_column="s_suppkey",
        ),
    ]
    tables = {
        "orders": load_table(spark, SF, "orders"),
        "part": load_table(spark, SF, "part"),
        "supplier": load_table(spark, SF, "supplier"),
    }
    flagged = violation_flags(df, checks, tables)
    assert not [c for c in flagged.columns if c.startswith("_parent_hit")]
    bad = flagged.where(F.size("_violations") > 0).collect()
    assert len(bad) == 1
    assert sorted(bad[0]["_violations"]) == [
        "relationships:l_orderkey",
        "relationships:l_partkey",
        "relationships:l_suppkey",
    ]
    assert flagged.where(F.size("_violations") == 0).count() == li.count()
