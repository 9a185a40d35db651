"""Runtime bloom-filter join pruning — the shuffle-join half of the 100 TB
join story.

Small dims broadcast (star.py pins that plan). When the build side is too
big to broadcast but still selective, Spark injects a bloom filter built
from the (filtered) build-side keys and applies it to the probe-side SCAN —
rows that cannot join die before the shuffle, which is exactly where a
1000-executor join spends its time. Default thresholds are production-sized
(10 GB probe scan); this test shrinks them to prove the engine picks the
plan at test scale, and restores every conf it touches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from enterprise_data_warehouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
}


def test_shuffle_join_gets_bloom_filter_on_probe_scan(spark):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    try:
        for k, v in _CONFS.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF, "lineitem")
        o = (
            load_table(spark, SF, "orders")
            .where(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy().agg(
            F.sum("l_quantity")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        # bloom built from the filtered build-side keys...
        assert "bloom_filter_agg" in plan, plan
        # ...and applied to the lineitem (probe) side, pre-shuffle
        probe_filters = [ln for ln in plan.splitlines() if "might_contain" in ln]
        assert probe_filters and all("l_orderkey" in ln for ln in probe_filters), plan
        # correctness unchanged by the filter
        [(total,)] = j.collect()
        plain = (
            load_table(spark, SF, "lineitem")
            .join(
                load_table(spark, SF, "orders").where(
                    F.col("o_orderpriority") == "1-URGENT"
                ),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy()
            .agg(F.sum("l_quantity"))
            .collect()[0][0]
        )
        assert total == plain
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
