"""Measured data-volume gates: the quantitative versions of the plan-string
claims. Each assertion states a shuffle budget in ROWS/BYTES, read from
Spark's own execution metrics after a real run — a regression that doubles
a shuffle's volume fails here even if the plan string still looks right.

sf0.001 inputs: lineitem 6000, documents 500 (+100 synthetic dupes).
Bounds are ~2× generous over observed values so AQE/partition-count
changes don't flake them, while a shape regression (lost map-side combine,
un-broadcast join) overshoots them by orders of magnitude.
"""

from __future__ import annotations

from enterprise_data_warehouse_spark.plans.metrics import run_with_metrics
from enterprise_data_warehouse_spark.queries import load_registry

SF = "/root/testdata/sf0.001"
REG = load_registry()


def _metrics(spark, name):
    return run_with_metrics(spark, REG[name].fn(spark, SF))


def test_pricing_summary_combines_map_side(spark):
    m = _metrics(spark, "pricing_summary")
    assert m["max_output_rows"] >= 6000  # the scan actually ran
    # r13: the single-row-group test file triggers parallelize_degenerate_scan,
    # so the raw (filtered) rows cross the round-robin exchange ONCE (~5.9k at
    # this SF); the aggregation exchange on top still combines map-side
    # (6 (flag,status) groups × partitions partials ≤ ~400). A lost map-side
    # combine would ship the rows TWICE (~12k) and overshoot the bound.
    assert 0 < m["shuffle_records_written"] <= 6400, m


def test_exact_dedup_shuffles_hashes_not_text(spark):
    m = _metrics(spark, "exact_dedup")
    # one record per doc (600 with synthetic dupes) and ~50 B each
    # (md5 + doc_id), NOT corpus text bytes
    assert 0 < m["shuffle_records_written"] <= 1300, m
    assert m["shuffle_bytes_written"] <= 200_000, m


def test_star_rollup_broadcasts_dims_small_shuffle(spark):
    m = _metrics(spark, "star_revenue_rollup")
    # dims broadcast, so no JOIN ever shuffles the fact; r13's
    # parallelize_degenerate_scan adds ONE round-robin pass of the raw fact
    # rows (~6k at this SF) on the single-row-group test file, plus the
    # aggregation partials. An un-broadcast join would shuffle the fact
    # again (12k+) and overshoot.
    assert 0 < m["shuffle_records_written"] <= 7000, m


def test_salted_rollup_partials_bounded_by_salt_fanout(spark):
    m = _metrics(spark, "salted_event_rollup")
    # ≤ |event_type| × N_SALTS × shuffle-partition partials, not 1000 events
    assert 0 < m["shuffle_records_written"] <= 600, m
