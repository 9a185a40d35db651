"""Semantic sanity for the data-selection operators (operators/importance.py).

The value-level correctness of all three queries is DuckDB-oracle-paired;
these tests pin the properties the oracle can't express: that DSIR weights
actually rank target-source documents above the rest, that perplexity
buckets are ordered and near-tertile, that the epoch sharding is a
permutation, and that the DSIR scoring join stays broadcast.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from enterprise_data_warehouse_spark.queries import load_registry

SF = "/root/testdata/sf0.001"
REG = load_registry()


def test_dsir_ranks_target_source_docs_higher(spark):
    from enterprise_data_warehouse_spark.operators.importance import (
        DSIR_TARGET_SOURCE,
    )
    from enterprise_data_warehouse_spark.sources.tables import load_table

    w = REG["dsir_importance_weights"].fn(spark, SF)
    src = load_table(spark, SF, "documents").select("doc_id", "source")
    by_side = (
        w.join(src, "doc_id")
        .groupBy(F.col("source") == DSIR_TARGET_SOURCE)
        .agg(F.avg("avg_log_ratio").alias("m"))
        .collect()
    )
    means = {r[0]: r["m"] for r in by_side}
    assert means[True] > means[False], (
        f"target-source docs should score higher: {means}"
    )
    # and the map-side selection predicate agrees with the sign of the score
    bad = w.where((F.col("selected")) != (F.col("weight_micro") > 0)).count()
    assert bad == 0


def test_dsir_scoring_join_is_broadcast(spark):
    plan = REG["dsir_importance_weights"].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, "bucket-weight join must not shuffle the gram stream"


def test_perplexity_buckets_are_ordered_near_tertiles(spark):
    d = REG["perplexity_buckets"].fn(spark, SF)
    rows = (
        d.groupBy("ppl_bucket")
        .agg(F.count("*").alias("n"), F.avg("avg_nll_micro").alias("m"))
        .collect()
    )
    stats = {r["ppl_bucket"]: (r["n"], r["m"]) for r in rows}
    assert set(stats) == {"head", "middle", "tail"}
    assert stats["head"][1] < stats["middle"][1] < stats["tail"][1]
    total = sum(n for n, _ in stats.values())
    for name, (n, _) in stats.items():
        assert 0.25 <= n / total <= 0.42, f"{name} far from a tertile: {n}/{total}"


def test_training_order_shards_is_a_permutation_and_deterministic(spark):
    a = REG["training_order_shards"].fn(spark, SF).collect()
    b = REG["training_order_shards"].fn(spark, SF).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)), "ordering must be reproducible"
    assert len({r["doc_id"] for r in a}) == len(a) == 500
    # positions are contiguous 1..|shard| within each shard
    by_shard: dict[int, list[int]] = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), f"shard {shard} gapped"
