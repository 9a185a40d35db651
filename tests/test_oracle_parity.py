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


def test_approx_distinct_bounded_error(spark):
    """approx_distinct_users (rows-only): HLL++ estimate within 2% of exact
    countDistinct per event_type at rsd=0.5%."""
    from pyspark.sql import functions as F

    from enterprise_data_warehouse_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.01"
    approx = {
        r["event_type"]: r["approx_users"]
        for r in REGISTRY["approx_distinct_users"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["exact_users"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .collect()
    }
    assert set(approx) == set(exact)
    for etype, est in approx.items():
        rel_err = abs(est - exact[etype]) / max(exact[etype], 1)
        assert rel_err < 0.02, f"{etype}: approx={est} exact={exact[etype]}"


def test_ts_features_null_values_skip_not_crash(spark, tmp_path):
    """Events with NULL values: the pandas path must drop them exactly like
    the oracle's null-skipping aggregates (a NaN reaching the decimal-exact
    summer raises InvalidOperation and fails the job; counting it diverges
    from SQL COUNT(value))."""
    import duckdb
    from pyspark.sql import functions as F

    from enterprise_data_warehouse_spark.sources.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "events")
    nulled = e.withColumn(
        "value",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value")),
    )
    nulled.write.parquet(str(tmp_path / "events.parquet"))
    spec = REGISTRY["ts_features_pandas"]
    srows = sorted(
        tuple(str(v) for v in r)
        for r in spec.fn(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    drows = sorted(
        tuple(str(v) for v in r) for r in con.execute(spec.oracle).fetchall()
    )
    assert srows == drows and len(srows) > 0
