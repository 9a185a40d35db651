"""The local correctness gate: every registered query with an oracle must
match DuckDB exactly at sf0.01 — same check the driver runs."""

from __future__ import annotations

import pytest

from enterprise_data_warehouse_spark.queries import load_registry

from .oracle_utils import compare_query

REGISTRY = load_registry()
ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    spec = REGISTRY[name]
    problems = compare_query(spark, duck, name, spec)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_all_queries_return_rows(spark):
    """Rows-only smoke for queries without an oracle."""
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            df = spec.fn(spark, "/root/testdata/sf0.001")
            assert df.count() >= 0, name
