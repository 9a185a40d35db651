"""Bucketed co-located join: the shuffle must disappear, and results must
match the plain shuffled join."""

from __future__ import annotations

import pytest

from enterprise_data_warehouse_spark.sources.bucketed import (
    colocated_join,
    write_bucketed,
)
from enterprise_data_warehouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(li, "b_lineitem", 8, "l_orderkey")
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"), "b_orders", 8, "l_orderkey"
    )
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = colocated_join(spark, left, right, "l_orderkey")
    # disable broadcast so the test exercises the bucketed SMJ path (at real
    # scale neither side would be broadcastable anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan


def test_bucketed_join_matches_shuffled_join(spark, bucketed_tables):
    left, right = bucketed_tables
    got = sorted(
        map(tuple, colocated_join(spark, left, right, "l_orderkey").collect())
    )
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    want = sorted(
        map(
            tuple,
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .drop("o_orderkey")
            .collect(),
        )
    )
    assert got == want
