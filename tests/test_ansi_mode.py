"""ANSI-mode hardening: the driver's session may run with
spark.sql.ansi.enabled=true (Spark 4 defaults to ANSI), where integer
overflow, bad casts, and array index misuse THROW instead of wrapping or
returning null. Every engine primitive was designed for this (xxhash64 /
md5-conv instead of multiply-add hashing, explicit guards on division) —
this test pins it by running the arithmetic-heaviest queries under ANSI.
"""

from __future__ import annotations

import pytest

from enterprise_data_warehouse_spark.queries import load_registry

SF = "/root/testdata/sf0.001"
REG = load_registry()

# integer/bit/hash arithmetic-heavy representatives of each family
ANSI_PROBES = [
    "pricing_summary",         # decimal sums
    "zorder_keys",             # bit shifts/interleave on bigints
    "minhash_lsh_candidates",  # nested hash lambdas
    "sequence_packing",        # distributed prefix sums
    "dsir_importance_weights", # fixed-point micro-nat sums
    "salted_skew_join",        # salt pmod + shuffled hash join
    "bipartite_pagerank",      # integer floor-division rank transfer
    "train_test_split",        # md5-derived bucketing
    "embedding_quantize",      # floor/cast int8 quantization (r04 rewrite)
    "embedding_centroids",     # decimal component means (r04 rows form)
    "pq_encode",               # subspace slicing + cast (r04 CSV rewrite)
    "ts_features_pandas",      # decimal-exact Arrow boundary (r04 oracle)
    "score_customers_pandas",  # floor-rounded logistic (r04 oracle)
    "trigram_lm_counts",       # clamped slice lengths (r04 fix)
]


@pytest.mark.parametrize("name", ANSI_PROBES)
def test_queries_survive_ansi_mode(spark, name):
    prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        assert REG[name].fn(spark, SF).limit(5).count() >= 0
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
