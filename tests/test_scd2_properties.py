"""SCD2 property tests (SURVEY.md §5 implication (c)): random monotonic
update-batch sequences must preserve the dimension invariants after every
apply — exactly one current row per key, contiguous version intervals, the
current row reflecting the latest value, and history growing only on real
changes. Batches are monotone in updated_at (the incremental predicate P5
guarantees this in the pipeline — it is the operator's input contract).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from enterprise_data_warehouse_spark.operators.scd2 import (
    scd2_apply,
    scd2_initial_load,
    scd2_integrity_violations,
)

KEYS = list(range(6))
VALS = ["a", "b", "c"]
T0 = datetime(2024, 1, 1)

# a run = initial snapshot assignment + a few batches of (key, new_value)
batches_strategy = st.lists(
    st.lists(
        st.tuples(st.sampled_from(KEYS), st.sampled_from(VALS)),
        min_size=1,
        max_size=4,
    ),
    min_size=1,
    max_size=3,
)


def _apply_all(spark, batches):
    init = spark.createDataFrame(
        [(k, "a", T0) for k in KEYS[:3]], "k int, val string, updated_at timestamp"
    )
    dim = scd2_initial_load(init, "k", ["val"], "2024-01-01")
    seq = 0
    for bi, batch in enumerate(batches):
        rows = []
        for k, v in batch:
            seq += 1
            rows.append((k, v, T0 + timedelta(days=bi + 1, seconds=seq)))
        updates = spark.createDataFrame(rows, "k int, val string, updated_at timestamp")
        dim = scd2_apply(dim, updates, "k", ["val"])
    return dim.cache()


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=batches_strategy)
def test_scd2_invariants_hold(spark, batches):
    dim = _apply_all(spark, batches)
    rows = dim.collect()

    # integrity checker agrees with first-principles checks
    assert scd2_integrity_violations(dim, "k").count() == 0

    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append(r)

    # latest value per key across the whole run
    expected_latest = {k: "a" for k in KEYS[:3]}
    for batch in batches:
        for k, v in batch:
            expected_latest[k] = v

    for k, versions in by_key.items():
        current = [r for r in versions if r["is_current"]]
        assert len(current) == 1, (k, versions)
        assert current[0]["effective_to"] is None
        assert current[0]["val"] == expected_latest[k], (k, versions)
        # intervals contiguous & ordered
        versions.sort(key=lambda r: r["effective_from"])
        for prev, nxt in zip(versions, versions[1:]):
            assert prev["effective_to"] == nxt["effective_from"], (k, versions)
        # consecutive versions always differ (no no-op versions recorded)
        for prev, nxt in zip(versions, versions[1:]):
            assert prev["change_hash"] != nxt["change_hash"], (k, versions)

    dim.unpersist()


@settings(
    max_examples=2,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=batches_strategy)
def test_scd2_noop_reapply_is_identity(spark, batches):
    """Re-applying the final state of every key as a fresh batch (same
    values, later ts) must not create versions: change detection is by
    hash, not recency."""
    dim = _apply_all(spark, batches)
    latest = {r["k"]: r["val"] for r in dim.where("is_current").collect()}
    rows = [
        (k, v, T0 + timedelta(days=90, seconds=i))
        for i, (k, v) in enumerate(sorted(latest.items()))
    ]
    updates = spark.createDataFrame(rows, "k int, val string, updated_at timestamp")
    again = scd2_apply(dim, updates, "k", ["val"])
    assert again.count() == dim.count()
    assert scd2_integrity_violations(again, "k").count() == 0
    dim.unpersist()
